from . import host, ntt, ops  # noqa: F401

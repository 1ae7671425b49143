"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding is
exercised without TPU hardware (the driver separately dry-runs the multichip
path).  Must run before any jax import.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel and
# preloads jax at interpreter startup, so the env var alone is read too early;
# jax.config.update works as long as no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from iyokan_tpu import params as params_mod  # noqa: E402
from iyokan_tpu.crypto import host  # noqa: E402


@pytest.fixture(scope="session")
def toy():
    return params_mod.TOY


@pytest.fixture(scope="session")
def toy_sk(toy):
    return host.keygen(toy, seed=42)


@pytest.fixture(scope="session")
def toy_ek(toy_sk):
    return host.genevalkey(toy_sk, seed=43)


@pytest.fixture(scope="session")
def toy_dk(toy_ek):
    from iyokan_tpu.crypto import ops

    return ops.DeviceKeys.from_evalkey(toy_ek)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)

import numpy as np
import jax.numpy as jnp

from iyokan_tpu.crypto import ntt
from iyokan_tpu.crypto.host import negacyclic_conv_i64


def test_roundtrip():
    N = 256
    rng = np.random.default_rng(0)
    x = rng.integers(0, ntt.P1, (4, N), dtype=np.int64)
    for pi in (0, 1):
        p = ntt.PRIMES[pi]
        y = ntt.ntt_fwd(jnp.asarray(x % p), N, pi)
        z = ntt.ntt_inv(y, N, pi)
        np.testing.assert_array_equal(np.asarray(z), x % p)


def test_negacyclic_conv_vs_reference():
    N = 128
    rng = np.random.default_rng(1)
    digits = rng.integers(-32, 32, (3, N), dtype=np.int64)
    other = rng.integers(0, 1 << 32, (3, N), dtype=np.int64)
    want = negacyclic_conv_i64(digits, other).astype(np.uint32)
    got = ntt.negacyclic_mul_exact_u32(
        jnp.asarray(digits), jnp.asarray(other.astype(np.uint32)), N
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_crt_center():
    vals = np.array([0, 1, -1, 2**51, -(2**51)], dtype=np.int64)
    r1 = jnp.asarray(vals % ntt.P1)
    r2 = jnp.asarray(vals % ntt.P2)
    got = ntt.crt_center(r1, r2)
    np.testing.assert_array_equal(np.asarray(got), vals)


def test_full_fwd_matches_4step():
    """Single-matmul digit NTT (int8/s32 config) is bit-identical to the
    4-step transform for every prime at both levels."""
    import numpy as np
    import jax.numpy as jnp
    from iyokan_tpu.crypto import polymul as pm

    rng = np.random.default_rng(7)
    for N, primes, bound in ((1024, pm.PRIMES1, 32), (2048, pm.PRIMES2, 128)):
        tabs = pm.tables(N, primes)
        x = rng.integers(-bound, bound, size=(3, N)).astype(np.int32)
        x[0, 0], x[0, 1] = bound - 1, -bound
        for pi, tab in enumerate(tabs):
            import jax
            ref = np.asarray(jax.jit(
                lambda v: pm._fwd(v, N, tab, small_input=True)
            )(jnp.asarray(x)))
            fh, fl = pm.full_fwd_tables(N, primes)[pi]
            # emulate the int32-accumulator matmul exactly in numpy
            zh = x.astype(np.int64) @ fh.astype(np.int64)
            zl = x.astype(np.int64) @ fl.astype(np.int64)

            def cred(v, p=tab.p):
                r = v % p
                return np.where(r > p // 2, r - p, r)

            got = cred((cred(zh) << 8) + zl)
            assert np.array_equal(ref, got), (N, tab.p)

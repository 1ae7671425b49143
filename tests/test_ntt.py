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

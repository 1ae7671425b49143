"""Negacyclic NTT over CRT primes, in JAX.

The runtime polynomial products are ``small signed digit poly  x  torus poly``
(external products inside blind rotation / CMUX).  They are computed *exactly*
over the integers with a two-prime CRT NTT and then reduced mod 2^32 (or, for
the 64-bit torus, per 32-bit half):

  lvl1: |digit| <= Bg/2 = 32, torus < 2^32, N = 1024  =>  |conv| < 2^47
  lvl2 halves: |digit| <= 256, half < 2^32, N2 = 2048 =>  |conv| < 2^51

  p1 * p2 ~= 2^61.8 > 2^52, so CRT reconstruction is exact in int64.

Both primes have 2^26 | p-1, so 2N-th roots of unity exist for N <= 2^25.
The transforms use the standard merged-psi iterative NTT (forward CT with
bit-reversed output, inverse GS consuming bit-reversed input), expressed as
reshapes + vectorized butterflies so XLA fuses each stage into a handful of
elementwise kernels over the whole batch.

The reference delegates this layer to TFHEpp's AVX double-FFT and cuFHE's
CUDA NTT (reference src/tfhepp_cufhe_wrapper.hpp:6-27); here it is one code
path for CPU tests and TPU execution, with a Pallas specialization in
:mod:`iyokan_tpu.ops` for the hot batched kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

P1 = 2013265921  # 15 * 2^27 + 1
P2 = 1811939329  # 27 * 2^26 + 1
PRIMES = (P1, P2)
_GENERATORS = {P1: 31, P2: 13}

P1P2 = P1 * P2
# Modular inverse of P1 mod P2 for CRT reconstruction.
_INV_P1_MOD_P2 = pow(P1, -1, P2)


def _bit_reverse(x: np.ndarray, bits: int) -> np.ndarray:
    out = np.zeros_like(x)
    for i in range(bits):
        out |= ((x >> i) & 1) << (bits - 1 - i)
    return out


@functools.lru_cache(maxsize=None)
def tables(N: int) -> dict:
    """Per-ring-size twiddle tables for both primes (host numpy, cached)."""
    logn = int(np.log2(N))
    assert 1 << logn == N
    out = {"psirev": [], "psiinvrev": [], "ninv": []}
    for p in PRIMES:
        g = _GENERATORS[p]
        psi = pow(g, (p - 1) // (2 * N), p)      # primitive 2N-th root
        assert pow(psi, N, p) == p - 1
        pows = np.array(
            [pow(psi, int(i), p) for i in range(N)], dtype=np.int64
        )
        ipows = np.array(
            [pow(psi, -int(i) % (2 * N) * 1, p) for i in range(N)], dtype=np.int64
        )
        rev = _bit_reverse(np.arange(N), logn)
        out["psirev"].append(pows[rev])
        out["psiinvrev"].append(ipows[rev])
        out["ninv"].append(pow(N, -1, p))
    out["psirev"] = np.stack(out["psirev"])        # [2, N]
    out["psiinvrev"] = np.stack(out["psiinvrev"])  # [2, N]
    out["ninv"] = np.array(out["ninv"], np.int64)  # [2]
    return out


def ntt_fwd(x: jnp.ndarray, N: int, pi: int) -> jnp.ndarray:
    """Forward negacyclic NTT; x int64 [..., N] in [0, p); bit-reversed output."""
    p = PRIMES[pi]
    psirev = jnp.asarray(tables(N)["psirev"][pi], jnp.int64)
    x = x.astype(jnp.int64)
    lead = x.shape[:-1]
    m = 1
    while m < N:
        t = N // (2 * m)
        x = x.reshape(*lead, m, 2, t)
        s = psirev[m : 2 * m].reshape(m, 1)
        u = x[..., 0, :]
        v = (x[..., 1, :] * s) % p
        x = jnp.stack([(u + v) % p, (u - v) % p], axis=-2).reshape(*lead, N)
        m *= 2
    return x


def ntt_inv(x: jnp.ndarray, N: int, pi: int) -> jnp.ndarray:
    """Inverse negacyclic NTT; consumes bit-reversed input, natural output."""
    p = PRIMES[pi]
    tab = tables(N)
    psiinvrev = jnp.asarray(tab["psiinvrev"][pi], jnp.int64)
    ninv = int(tab["ninv"][pi])
    x = x.astype(jnp.int64)
    lead = x.shape[:-1]
    m = N
    while m > 1:
        h = m // 2
        t = N // m
        x = x.reshape(*lead, h, 2, t)
        s = psiinvrev[h : 2 * h].reshape(h, 1)
        u = x[..., 0, :]
        v = x[..., 1, :]
        x = jnp.stack([(u + v) % p, ((u - v) * s) % p], axis=-2).reshape(*lead, N)
        m = h
    return (x * ninv) % p


def to_residues(x_signed: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """int array (any sign, |x| < p) -> residues mod each prime, int64."""
    x = x_signed.astype(jnp.int64)
    return (x % P1, x % P2)


def crt_center(r1: jnp.ndarray, r2: jnp.ndarray) -> jnp.ndarray:
    """CRT-reconstruct the centered integer in (-P1P2/2, P1P2/2), int64."""
    r1 = r1.astype(jnp.int64)
    r2 = r2.astype(jnp.int64)
    diff = (r2 - r1) % np.int64(P2)
    t = (diff.astype(jnp.int64) * np.int64(_INV_P1_MOD_P2)) % np.int64(P2)
    x = r1.astype(jnp.int64) + np.int64(P1) * t   # in [0, P1P2)
    # NB: 64-bit constants only survive as 0-d numpy arrays with an explicit
    # dtype -- jnp scalar constructors and numpy scalars truncate to 32 bits
    # when x64 defaults are off.
    big = jnp.asarray(np.array(P1P2 // 2, np.int64), jnp.int64)
    pp = jnp.asarray(np.array(P1P2, np.int64), jnp.int64)
    return x - (x >= big).astype(jnp.int64) * pp


def negacyclic_mul_exact_u32(digits: jnp.ndarray, other_u32: jnp.ndarray,
                             N: int) -> jnp.ndarray:
    """Exact (digits * other) mod (X^N+1) mod 2^32.

    digits: signed int [..., N] with |d| <= 2^12; other_u32: uint32 [..., N]
    (broadcastable against digits).  Mostly a test/utility path -- the hot
    paths pre-transform one operand (see ops.py).
    """
    o = other_u32.astype(jnp.int64)
    acc = None
    rs = []
    for pi in (0, 1):
        p = PRIMES[pi]
        dn = ntt_fwd(digits.astype(jnp.int64) % p, N, pi)
        on = ntt_fwd(o % p, N, pi)
        rs.append(ntt_inv((dn * on) % p, N, pi))
    c = crt_center(rs[0], rs[1])
    return c.astype(jnp.uint32)

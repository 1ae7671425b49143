"""Batched homomorphic operations (JAX).

Everything here is *batched over gates*: the unit of work is never one
ciphertext but an array of them, because the levelized executor evaluates all
ready gates of a circuit level in one call.  This replaces the reference's
per-gate `TaskTFHEppGate*` tasks scheduled on a thread pool
(reference src/iyokan_tfhepp.hpp:109-146, src/iyokan.hpp:829-883).

Shapes (u32 = jnp.uint32, u64 = jnp.uint64):
  TLWE lvl0   u32 [..., n+1]
  TLWE lvl1   u32 [..., N+1]
  TRLWE lvl1  u32 [..., 2, N]
  TRGSW lvl1  u32 [..., 2l, 2, N]     row i*l+j: digit j on part i
  TRLWE lvl2  u64 [..., 2, N2]

All arithmetic is exact: torus ops are native wrap-around uint ops, and the
negacyclic products run through the two-prime CRT NTT (crypto/ntt.py).
"""

from __future__ import annotations

import collections
import dataclasses
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from . import polymul
from .polymul import c64
from .host import EvalKey

u32 = jnp.uint32
u64 = jnp.uint64
i8 = jnp.int8
i64 = jnp.int64


# --------------------------------------------------------------------------- #
# gadget decomposition
# --------------------------------------------------------------------------- #


def decompose1(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Signed gadget decomposition, 32-bit torus.

    x: u32 [..., 2, N]  ->  int32 [..., 2l, N], digit (i*l+j) for part i.

    The offset both centers the digits (Bg/2 per level) and rounds the
    truncated tail to nearest (the 2^(31-l*Bgbit) term) -- without the
    rounding bit the recomposition residual has a +half-step *bias* that
    accumulates coherently through s1 and costs ~2.5 bits of noise budget.
    """
    offset = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(p.l))
    offset += 1 << (31 - p.l * p.Bgbit)
    xp = x + u32(offset & 0xFFFFFFFF)
    outs = []
    for j in range(p.l):
        shift = 32 - (j + 1) * p.Bgbit
        d = ((xp >> u32(shift)) & u32(p.Bg - 1)).astype(jnp.int32) - p.Bg // 2
        outs.append(d)
    dig = jnp.stack(outs, axis=-3)                      # [..., l, 2, N]
    # reorder to rows (part-major): row i*l+j
    dig = jnp.moveaxis(dig, -3, -2)                     # [..., 2, l, N]
    return dig.reshape(*dig.shape[:-3], 2 * p.l, dig.shape[-1])


def decompose2(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Signed gadget decomposition, 64-bit torus: u64 [..., 2, N2] -> int32."""
    offset = sum((p.Bg2 // 2) << (64 - (j + 1) * p.Bgbit2) for j in range(p.l2))
    offset += 1 << (63 - p.l2 * p.Bgbit2)
    xp = x + c64(offset)
    outs = []
    for j in range(p.l2):
        shift = 64 - (j + 1) * p.Bgbit2
        d = ((xp >> np.uint64(shift)) & np.uint64(p.Bg2 - 1)).astype(jnp.int32) - p.Bg2 // 2
        outs.append(d)
    dig = jnp.stack(outs, axis=-3)
    dig = jnp.moveaxis(dig, -3, -2)
    return dig.reshape(*dig.shape[:-3], 2 * p.l2, dig.shape[-1])


# --------------------------------------------------------------------------- #
# external product / CMUX (lvl1)
# --------------------------------------------------------------------------- #


def prep_trgsw(trgsw: jnp.ndarray, p: Params,
               backend=None) -> jnp.ndarray:
    """u32 TRGSW rows [..., 2l, 2, N] -> backend-prepared transform."""
    be = backend or polymul.get_backend()
    return be.prep1(trgsw, p)


def extprod_term(g_prep: jnp.ndarray, c: jnp.ndarray, p: Params,
                 backend=None) -> jnp.ndarray:
    """TRGSW (x) TRLWE product term: returns decomp(c) * G as u32 [..., 2, N].

    g_prep: backend-prepared rows (leading dims broadcastable with c).
    """
    be = backend or polymul.get_backend()
    return be.extprod1(decompose1(c, p), g_prep, p)


def cmux(g_prep: jnp.ndarray, c1: jnp.ndarray, c0: jnp.ndarray,
         p: Params, backend=None) -> jnp.ndarray:
    """CMUX(g, c1, c0) = c0 + g (x) (c1 - c0): g ? c1 : c0.

    Semantics match TFHEpp CMUXFFT as used by the reference ROM/RAM trees
    (reference src/iyokan_tfhepp.hpp:248-271, :416-444).
    """
    return c0 + extprod_term(g_prep, c1 - c0, p, backend)


def trgsw_invert(trgsw: jnp.ndarray, p: Params) -> jnp.ndarray:
    """TRGSW(1-m) from TRGSW(m): trivial gadget of 1 minus the rows.

    Same trick as TFHEpp's CircuitBootstrappingFFTwithInv output pair
    (reference src/iyokan_tfhepp.hpp:384-407 uses {normal, inverted}).
    """
    g = np.zeros((2 * p.l, 2, p.N), np.uint32)
    for j in range(p.l):
        val = np.uint32((1 << (32 - (j + 1) * p.Bgbit)) & 0xFFFFFFFF)
        g[j, 0, 0] = val
        g[p.l + j, 1, 0] = val
    return jnp.asarray(g) - trgsw


# --------------------------------------------------------------------------- #
# polynomial rotation / sample extraction
# --------------------------------------------------------------------------- #


def _nega_roll(poly: jnp.ndarray, s: int, N: int) -> jnp.ndarray:
    """X^s * poly for a static s in [1, N]: wrap-around goes in negated."""
    if s == 0:
        return poly
    if s == N:                      # X^N = -1
        return jnp.zeros((), poly.dtype) - poly
    lo = jnp.zeros((), poly.dtype) - poly[..., N - s :]
    return jnp.concatenate([lo, poly[..., : N - s]], axis=-1)


def rot_poly(poly: jnp.ndarray, r: jnp.ndarray, N: int) -> jnp.ndarray:
    """X^r * poly mod (X^N + 1), batched: barrel shifter.

    poly: u32/u64 [..., N]; r: int32 [...] broadcastable against the leading
    dims (one rotation amount per batch row), values in [0, 2N).

    log2(2N) conditional static rolls instead of a per-element gather:
    TPU gathers along the minor axis serialize, while static rolls are
    concats and the selects are plain vector ops.
    """
    x = poly
    nbits = (2 * N - 1).bit_length()
    for b in range(nbits):
        rolled = _nega_roll(x, 1 << b, N) if (1 << b) <= N else (
            jnp.zeros((), x.dtype) - x
        )
        # minor-dim insertion happens on the 32-bit value, not the i1:
        # Mosaic only supports non-no-op minor reshapes for 32-bit types
        bit = ((r[..., None] >> b) & 1) != 0
        x = jnp.where(bit, rolled, x)
    return x


def sample_extract(trlwe: jnp.ndarray, idx: int) -> jnp.ndarray:
    """TRLWE [..., 2, N] -> TLWE lvl1 [..., N+1] extracting coefficient idx.

    a'_j = a_{idx-j} (j <= idx), -a_{N+idx-j} (j > idx); b' = b_idx.
    (Reference counterpart: TFHEpp SampleExtractIndex used at
    src/iyokan_tfhepp.hpp:350.)
    """
    N = trlwe.shape[-1]
    a = trlwe[..., 0, :]
    j = np.arange(N)
    src = (idx - j) % N
    neg = j > idx
    a2 = jnp.where(jnp.asarray(neg), -a[..., src], a[..., src])
    b = trlwe[..., 1, idx : idx + 1]
    return jnp.concatenate([a2, b], axis=-1)


# --------------------------------------------------------------------------- #
# identity key switch lvl1 -> lvl0
# --------------------------------------------------------------------------- #


def _ks_digits(a: jnp.ndarray, t: int, basebit: int, width: int) -> jnp.ndarray:
    """Signed digits of each torus coefficient, [..., t] int32."""
    base = 1 << basebit
    prec = t * basebit
    if width == 32:
        off = (1 << (32 - prec - 1)) + sum(
            (base // 2) << (32 - (j + 1) * basebit) for j in range(t)
        )
        xp = a + u32(off & 0xFFFFFFFF)
        shifts = [32 - (j + 1) * basebit for j in range(t)]
        cast = u32
    else:
        off = (1 << (64 - prec - 1)) + sum(
            (base // 2) << (64 - (j + 1) * basebit) for j in range(t)
        )
        xp = a + c64(off)
        shifts = [64 - (j + 1) * basebit for j in range(t)]
        cast = u64
    ds = [
        ((xp >> cast(s)) & cast(base - 1)).astype(jnp.int32) - base // 2
        for s in shifts
    ]
    return jnp.stack(ds, axis=-1)


def matmul_mod32(d: jnp.ndarray, key_u32: jnp.ndarray,
                 limb_bits: int) -> jnp.ndarray:
    """Exact (d @ key) mod 2^32 via bf16 limb matmuls on the MXU.

    d: small signed ints [..., K]; key_u32: u32 [K, M].  Each 32-bit key
    column is split into ceil(32/limb_bits) limbs; every limb product is an
    exact integer in f32 provided K * max|d| * (2^limb_bits - 1) < 2^24
    (callers pick limb_bits accordingly).  TPU's MXU multiplies bf16 exactly
    for integer inputs < 2^8 and accumulates in f32.
    """
    nl = -(-32 // limb_bits)
    mask = (1 << limb_bits) - 1
    df = d.astype(jnp.bfloat16)
    acc = jnp.zeros((*d.shape[:-1], key_u32.shape[1]), u32)
    for l in range(nl):
        limb = ((key_u32 >> u32(limb_bits * l)) & u32(mask)).astype(
            jnp.bfloat16
        )
        part = jnp.dot(df, limb, preferred_element_type=jnp.float32)
        acc = acc + (part.astype(jnp.int32).astype(u32) << u32(limb_bits * l))
    return acc


def key_i8_limbs(key_u32: np.ndarray) -> np.ndarray:
    """Host: u32 key matrix [K, M] -> balanced radix-256 limbs
    int8 [4, K, M] with exact reconstruction key = sum_j limb_j * 256^j
    (mod 2^32).  Centered digits fit int8 exactly, so limb matmuls ride
    the MXU's int8 path (~4x the bf16 rate the u32 form needs)."""
    v = key_u32.astype(np.int64)
    limbs = []
    for _ in range(4):
        l0 = ((v + 128) & 255) - 128
        limbs.append(l0.astype(np.int8))
        v = (v - l0) >> 8
    return np.stack(limbs, axis=0)


def matmul_mod32_i8(d: jnp.ndarray, key_i8: jnp.ndarray) -> jnp.ndarray:
    """Exact (d @ key) mod 2^32 via int8 limb matmuls on the MXU.

    d: small signed ints [..., K] with K * max|d| * 128 < 2^31 (int32
    accumulation is exact); key_i8: balanced limbs [4, K, M] from
    key_i8_limbs.  Bit-identical to matmul_mod32 on the reconstructed
    key: limb products accumulate in int32 and the shift-add
    recombination is exact mod 2^32 (two's complement)."""
    di = d.astype(i8) if d.dtype != i8 else d
    acc = None
    for l in range(4):
        part = jnp.dot(di, key_i8[l], preferred_element_type=jnp.int32)
        term = part.astype(u32) << u32(8 * l)
        acc = term if acc is None else acc + term
    return acc


def keyswitch_10(tlwe1: jnp.ndarray, ksk_mat: jnp.ndarray,
                 p: Params) -> jnp.ndarray:
    """Identity key switch lvl1 -> lvl0 as one (limbed) matmul.

    tlwe1: u32 [..., N+1]; ksk_mat: u32 [N * t, n+1].
    The signed-digit scalar formulation turns the reference's per-digit table
    lookups (TFHEpp IdentityKeySwitch, used at src/iyokan_tfhepp.hpp:351)
    into a dense [G, N*t] x [N*t, n+1] product -- the MXU-friendly shape.
    Exactness: K = N*t = 16384, |d| <= 1, limb 8 bits -> sums < 2^22.
    """
    a = tlwe1[..., : p.N]
    b = tlwe1[..., p.N]
    d = _ks_digits(a, p.ks_t, p.ks_basebit, 32)          # [..., N, t]
    d = d.reshape(*d.shape[:-2], p.N * p.ks_t)
    if ksk_mat.ndim == 3 and ksk_mat.dtype == i8:
        # balanced-limb key (key_i8_limbs): int8 MXU path, bit-identical
        acc = matmul_mod32_i8(d, ksk_mat)
    else:
        acc = matmul_mod32(d, ksk_mat, limb_bits=8)
    out = u32(0) - acc
    return out.at[..., p.n].add(b)


# --------------------------------------------------------------------------- #
# blind rotation (lvl1) and the batched gate bootstrap
# --------------------------------------------------------------------------- #


def _modswitch(x: jnp.ndarray, log2n: int) -> jnp.ndarray:
    """u32 torus -> Z_{2N} with rounding."""
    sh = 32 - log2n - 1
    return ((x + u32(1 << (sh - 1))) >> u32(sh)).astype(jnp.int32) & (
        (1 << (log2n + 1)) - 1
    )


def blind_rotate(tlwe0: jnp.ndarray, bk_prep: jnp.ndarray, testv: jnp.ndarray,
                 p: Params, backend=None) -> jnp.ndarray:
    """Batched blind rotation lvl0 -> TRLWE lvl1.

    tlwe0: u32 [G, n+1]; bk_prep: backend-prepared BK with leading [n] axis;
    testv: u32 [N].  Returns u32 [G, 2, N] with phase testv * X^{-phase_2N}.

    The whole gate batch advances through the n CMUX steps together: the
    per-step TRGSW is shared (it is the bootstrapping key), only the rotation
    amounts differ per row.  This is the TPU-native inversion of the
    reference's one-bootstrap-per-task design.
    """
    import os as _os

    impl = _os.environ.get("IYOKAN_BR_IMPL")
    # layout dispatch: plain/unrolled prep1 keys are 5-d
    # [n, rows, 2, P, N]; the pallas_ep kernel-layout key is 6-d
    # [n, P, R, RR, 2, C].  The ndim guard prevents a kernel-layout key
    # whose R happens to equal 2l from being misrouted (advisor, round 1).
    if bk_prep.ndim == 5 and bk_prep.shape[-4] == 2 * p.l:
        if impl == "pallas":
            from ..ops.pallas_br import blind_rotate_pallas

            return blind_rotate_pallas(tlwe0, bk_prep, testv, p)
        if impl == "pallas2":
            from ..ops.pallas_br2 import blind_rotate_pallas2

            return blind_rotate_pallas2(tlwe0, bk_prep, testv, p)
    if bk_prep.ndim in (3, 4) and bk_prep.dtype == jnp.int8:
        # Toeplitz-slab kernel key (built only when IYOKAN_BR_IMPL=tkey):
        # the no-NTT direct-convolution kernel.  [n, 2l, N, 2L*128] =
        # thin layout, [n, 2l*N, 2L*128] = fat (j in the contraction).
        from ..ops.pallas_tk import blind_rotate_tkey
        from ..parallel import mesh as mesh_mod

        # GSPMD cannot partition a pallas_call (no partitioning rule is
        # declared), so under an active mesh a sharded batch would be
        # all-gathered back to every chip before the kernel.  shard_map
        # keeps the gates axis sharded: each chip runs the kernel on its
        # own rows against the replicated key (same placement contract
        # as the XLA path, tests/test_parallel.py).
        mesh = mesh_mod.get_mesh()
        G = tlwe0.shape[0]
        if mesh is not None:
            n_dev = mesh.devices.size
            if (G % n_dev == 0
                    and G // n_dev >= mesh_mod._min_rows_per_device()):
                from jax.sharding import PartitionSpec as P

                fn = jax.shard_map(
                    lambda t, bk, tv: blind_rotate_tkey(t, bk, tv, p),
                    mesh=mesh,
                    in_specs=(P("gates"), P(*([None] * bk_prep.ndim)),
                              P(None)),
                    out_specs=P("gates"),
                    # pallas_call declares no varying-mesh-axes info, so
                    # the vma check cannot see through it
                    check_vma=False,
                )
                return fn(tlwe0, bk_prep, testv)
        return blind_rotate_tkey(tlwe0, bk_prep, testv, p)
    if (
        impl == "v3"
        and bk_prep.ndim == 5
        and bk_prep.shape[-4] in (2 * p.l, 6 * p.l)
        and bk_prep.shape[-2] == len(polymul.PRIMES1)
    ):
        # v3 consumes the MXUBackend prep1 layout only (PRIMES1 residues
        # in the 4-step slot order), plain or 2-bit-unrolled rows; the
        # crt64 prep has a 2-wide prime axis and falls through to the
        # XLA path.
        from ..ops.pallas_br3 import blind_rotate_pallas3

        return blind_rotate_pallas3(tlwe0, bk_prep, testv, p)

    be = backend or polymul.get_backend()
    G = tlwe0.shape[0]
    abar = _modswitch(tlwe0[:, : p.n], p.logN)           # [G, n]
    bbar = _modswitch(tlwe0[:, p.n], p.logN)             # [G]

    acc_b = rot_poly(
        jnp.broadcast_to(testv, (G, p.N)), (-bbar) % (2 * p.N), p.N
    )
    acc = jnp.stack([jnp.zeros((G, p.N), u32), acc_b], axis=1)  # [G, 2, N]

    # bk row count distinguishes the plain key (2l rows/step) from the
    # 2-bit unrolled key (3*2l rows per key-bit *pair*): the unrolled form
    #   X^(a1 s1 + a2 s2) = 1 + s1(1-s2)(X^a1 - 1) + s2(1-s1)(X^a2 - 1)
    #                         + s1 s2 (X^(a1+a2) - 1)
    # halves the sequential depth at 1.5x products per consumed key bit,
    # fused into one 3*2l-row external product.
    if bk_prep.ndim == 5 and bk_prep.shape[-4] == 6 * p.l:
        nh = bk_prep.shape[0]
        pad = 2 * nh - p.n
        if pad:
            abar = jnp.concatenate(
                [abar, jnp.zeros((G, pad), abar.dtype)], axis=1
            )
        a1s = abar[:, 0::2]
        a2s = abar[:, 1::2]
        a12s = (a1s + a2s) % (2 * p.N)

        def body(i, acc):
            sh = acc.shape[:-1]
            d = jnp.concatenate(
                [
                    decompose1(
                        rot_poly(acc, jnp.broadcast_to(
                            aa[:, i][:, None], sh), p.N) - acc, p
                    )
                    for aa in (a1s, a2s, a12s)
                ],
                axis=-2,
            )                                            # [G, 3*2l, N]
            g = jax.lax.dynamic_index_in_dim(bk_prep, i, axis=0,
                                             keepdims=False)
            return acc + be.extprod1(d, g, p)

        return jax.lax.fori_loop(0, nh, body, acc)

    if bk_prep.ndim == 6:
        # kernel-layout key [n, P, R, RR, 2, C]: fused Pallas external
        # product (ops/pallas_ep.py), whole per-prime pipeline in VMEM.
        from ..ops.pallas_ep import extprod1_fused

        def body(i, acc):
            r = abar[:, i][:, None]
            rot = rot_poly(acc, jnp.broadcast_to(r, acc.shape[:-1]), p.N)
            g = jax.lax.dynamic_index_in_dim(bk_prep, i, axis=0,
                                             keepdims=False)
            return acc + extprod1_fused(decompose1(rot - acc, p), g, p)

        return jax.lax.fori_loop(0, p.n, body, acc)

    def body(i, acc):
        r = abar[:, i][:, None]                          # [G, 1] per part
        rot = rot_poly(acc, jnp.broadcast_to(r, acc.shape[:-1]), p.N)
        diff = rot - acc
        g = jax.lax.dynamic_index_in_dim(bk_prep, i, axis=0, keepdims=False)
        return acc + be.extprod1(decompose1(diff, p), g, p)

    return jax.lax.fori_loop(0, p.n, body, acc)


def gate_bootstrap_tlwe1(pre: jnp.ndarray, bk_prep: jnp.ndarray,
                         p: Params, backend=None) -> jnp.ndarray:
    """pre-linear-combined TLWE lvl0 batch -> TLWE lvl1 (+-mu) batch."""
    testv = jnp.full((p.N,), u32(p.mu))
    acc = blind_rotate(pre, bk_prep, testv, p, backend)
    return sample_extract(acc, 0)


# --------------------------------------------------------------------------- #
# blind rotation lvl2 (circuit bootstrapping inner loop)
# --------------------------------------------------------------------------- #


def blind_rotate2(tlwe0: jnp.ndarray, bk2_prep: jnp.ndarray,
                  testv: jnp.ndarray, p: Params, backend=None) -> jnp.ndarray:
    """Batched blind rotation lvl0 -> TRLWE lvl2 (64-bit torus)."""
    be = backend or polymul.get_backend()
    G = tlwe0.shape[0]
    abar = _modswitch(tlwe0[:, : p.n], p.logN2)
    bbar = _modswitch(tlwe0[:, p.n], p.logN2)

    acc_b = rot_poly(
        jnp.broadcast_to(testv, (G, p.N2)), (-bbar) % (2 * p.N2), p.N2
    )
    acc = jnp.stack([jnp.zeros((G, p.N2), u64), acc_b], axis=1)

    # 2-bit unrolled CB key (rows per pair step: 3*2l2, see host.genevalkey
    # bk2u): halves the sequential depth of this latency-bound loop.
    if bk2_prep.shape[-4] == 6 * p.l2:
        nh = bk2_prep.shape[0]
        pad = 2 * nh - p.n
        if pad:
            abar = jnp.concatenate(
                [abar, jnp.zeros((G, pad), abar.dtype)], axis=1
            )
        a1s = abar[:, 0::2]
        a2s = abar[:, 1::2]
        a12s = (a1s + a2s) % (2 * p.N2)

        def body_u(i, acc):
            sh = acc.shape[:-1]
            d = jnp.concatenate(
                [
                    decompose2(
                        rot_poly(acc, jnp.broadcast_to(
                            aa[:, i][:, None], sh), p.N2) - acc, p
                    )
                    for aa in (a1s, a2s, a12s)
                ],
                axis=-2,
            )                                            # [G, 3*2l2, N2]
            g = jax.lax.dynamic_index_in_dim(bk2_prep, i, axis=0,
                                             keepdims=False)
            return acc + be.extprod2(d, g, p)

        return jax.lax.fori_loop(0, nh, body_u, acc)

    def body(i, acc):
        r = abar[:, i][:, None]
        rot = rot_poly(acc, jnp.broadcast_to(r, acc.shape[:-1]), p.N2)
        diff = rot - acc
        g = jax.lax.dynamic_index_in_dim(bk2_prep, i, axis=0, keepdims=False)
        return acc + be.extprod2(decompose2(diff, p), g, p)

    return jax.lax.fori_loop(0, p.n, body, acc)


def sample_extract2(trlwe2: jnp.ndarray, idx: int) -> jnp.ndarray:
    return sample_extract(trlwe2, idx)


# --------------------------------------------------------------------------- #
# private functional key switch lvl2 -> lvl1, circuit bootstrapping
# --------------------------------------------------------------------------- #


def privks(tlwe2: jnp.ndarray, pksk_mat: jnp.ndarray, part: int,
           p: Params) -> jnp.ndarray:
    """TLWE lvl2 (u64) -> TRLWE lvl1 (u32) under f0(x) = -s1*x (part=0) or
    f1(x) = x (part=1).

    pksk_mat: u32 [N2 * t21, 2 * N].
    Exactness: K = N2*t = 20480, |d| <= 4, limb 6 bits -> sums < 2^23.
    """
    a = tlwe2[..., : p.N2]
    b = tlwe2[..., p.N2]
    d = _ks_digits(a, p.pks_t, p.pks_basebit, 64)        # [..., N2, t]
    d = d.reshape(*d.shape[:-2], p.N2 * p.pks_t)
    if pksk_mat.ndim == 3 and pksk_mat.dtype == i8:
        # balanced-limb key: |d| <= 4, K*4*128 = 2^23.3 -- exact in i32
        acc = matmul_mod32_i8(d, pksk_mat)
    else:
        acc = matmul_mod32(d, pksk_mat, limb_bits=6)     # [..., 2N]
    out = (u32(0) - acc).reshape(*acc.shape[:-1], 2, p.N)
    b32 = ((b + c64(1 << 31)) >> np.uint64(32)).astype(u32)
    # trivial realization of f(b): f1 -> b-part const, f0 -> a-part const
    return out.at[..., part, 0].add(b32)


def circuit_bootstrap(tlwe0: jnp.ndarray, bk2_prep: jnp.ndarray,
                      pksk_mats: Tuple[jnp.ndarray, jnp.ndarray],
                      p: Params, backend=None) -> jnp.ndarray:
    """Batched circuit bootstrapping: TLWE lvl0 bits -> TRGSW lvl1.

    For digit j (1-based): one lvl2 blind rotation with test vector
    mu_j = 2^(64-j*Bgbit-1) gives TLWE2(+-mu_j); adding the trivial mu_j maps
    it to TLWE2(m * 2^(64-j*Bgbit)); the two private key switches then embed
    it as TRGSW rows (part 0: -s1*m*g_j, part 1: m*g_j).
    Functional equivalent of TFHEpp CircuitBootstrappingFFT as used by the
    reference (src/iyokan_tfhepp.hpp:194-213).
    """
    G = tlwe0.shape[0]
    # All l per-digit rotations share the same phase, so they run as ONE
    # batch of l*G rows with per-row test vectors (the reference performs
    # l separate bootstraps per CB).
    mus = np.array(
        [1 << (64 - j * p.Bgbit - 1) for j in range(1, p.l + 1)], np.uint64
    )
    testv = jnp.repeat(jnp.asarray(mus, u64)[:, None], p.N2, axis=1)  # [l,N2]
    testv = jnp.repeat(testv, G, axis=0)                 # [l*G, N2]
    batch = jnp.tile(tlwe0, (p.l, 1))                    # [l*G, n+1]
    acc2 = blind_rotate2(batch, bk2_prep, testv, p, backend)
    tl2 = sample_extract2(acc2, 0)                       # [l*G, N2+1]
    tl2 = tl2.at[..., p.N2].add(
        jnp.repeat(jnp.asarray(mus, u64), G, axis=0)
    )
    parts = []
    for part in (0, 1):
        r = privks(tl2, pksk_mats[part], part, p)        # [l*G, 2, N]
        parts.append(r.reshape(p.l, G, 2, p.N))
    rows = jnp.concatenate(parts, axis=0)                # [2l, G, 2, N]
    return jnp.moveaxis(rows, 0, -3)                     # [G, 2l, 2, N]


# --------------------------------------------------------------------------- #
# device-resident keys
# --------------------------------------------------------------------------- #

def tkey_default_config(p: Params):
    """The tkey-kernel config the engine uses on TPU when no IYOKAN_*
    knob overrides it: (limbs, layout, lb).  Single source of truth for
    from_evalkey AND the noise-regression test (test_noise_and_params.py),
    so a default flip that eats the noise margin fails in CI, not in a
    100k-gate device run."""
    L = int(os.environ.get("IYOKAN_TKEY_LIMBS", "3"))
    lay = os.environ.get("IYOKAN_TK_LAYOUT", "fat")
    # default lb=2 (asymmetric gadget): drops the least-significant b-part
    # digit rows, cutting contraction rows 2l -> l+2 (5/6 of the MACs at
    # l=3).  The dropped digit's error enters the phase directly (not via
    # the secret): measured sigma 2^-9.51 pre-KS vs 2^-9.73 at lb=l, well
    # inside the 2^-8.2 budget (test_noise_and_params.py asserts this
    # config).
    lb = int(os.environ.get("IYOKAN_TK_LB", str(min(2, p.l))))
    if not 1 <= lb <= p.l:
        raise ValueError(
            f"IYOKAN_TK_LB={lb} out of range: need 1 <= lb <= "
            f"l={p.l} (lb=0 would be misread as a plain fat layout "
            f"by the kernel's row-count inference)")
    return L, lay, lb


# Bounded LRU: one prepared key set is multi-GB on device (the tkey slab
# alone is ~2.9 GB at cggi128), so only the most recent few (params, config,
# fingerprint) variants are pinned; older entries are dropped so the device
# allocator can reclaim them (config sweeps toggle IYOKAN_* knobs per run).
_DEVICE_KEY_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_DEVICE_KEY_CACHE_MAX = int(os.environ.get("IYOKAN_KEY_CACHE_SLOTS", "2"))


def _slab_disk_path(cache_key):
    """On-disk cache location for the expanded tkey slab (or None).

    The host-side Toeplitz expansion is ~31 s at cggi128 for a 2.33 GiB
    int8 slab that np.load brings back in ~2 s -- and every fresh process
    (bench, the registry runner, each tool) pays it otherwise.  Keyed by
    the same fingerprint tuple as the in-process LRU (key material hash +
    every prep-affecting env knob), so a stale hit is as unlikely as a
    wrong in-process hit.  IYOKAN_SLAB_CACHE=0 disables; a directory
    value overrides the location (default: the IYOKAN_KEY_CACHE dir)."""
    d = os.environ.get("IYOKAN_SLAB_CACHE", "")
    if d == "0":
        return None
    if not d:
        d = os.environ.get("IYOKAN_KEY_CACHE", "/tmp/iyokan-keys")
    import hashlib

    tag = hashlib.sha1(repr(cache_key).encode()).hexdigest()[:16]
    return os.path.join(d, f"tkslab-{tag}.npy")


@dataclasses.dataclass
class DeviceKeys:
    """Evaluation key pre-transformed for the runtime ops.

    Registered as a jax pytree so jitted entry points take the keys as an
    *argument*: closing over them would embed hundreds of MB of key material
    as HLO constants.
    """

    params: Params
    backend: object         # polymul backend
    bkntt: jnp.ndarray      # backend-prepared BK, leading [n] axis
    ksk_mat: jnp.ndarray    # u32 [N*t, n+1]
    bk2ntt: jnp.ndarray     # backend-prepared BK2, leading [n] axis (or [0])
    pksk_mats: Tuple[jnp.ndarray, jnp.ndarray]  # u32 [N2*t21, 2N] each
    bkuntt: jnp.ndarray = None  # 2-bit-unrolled BK prep (latency path)
    bk2untt: jnp.ndarray = None  # 2-bit-unrolled BK2 prep (CB latency path)
    bk_tk_small: jnp.ndarray = None  # 2-bit-unrolled tkey slab (small G)

    def bk_for(self, batch: int) -> jnp.ndarray:
        """Route a batch to the fastest blind-rotate key for its size.

        On the tkey (Toeplitz-slab) impl the plain slab wins at EVERY
        batch size (SMALLG_r04.log: 2945/3997/4713 gates/s at G=32/64/128
        via kmaj vs 1208/1476/1596 on the round-3 bku-NTT route, and the
        2-bit unrolled slab loses too -- tripled per-step VPU work beats
        the halved depth at latency-bound sizes), so the default is: slab
        for everything.  IYOKAN_UNROLL_MAX > 0 re-enables the bku NTT
        route for batches <= the threshold (and stays the small-batch
        default on non-tkey backends, where it is the only latency play);
        IYOKAN_TK_SMALL=1 builds + routes an unrolled slab for batches <=
        IYOKAN_TK_SMALL_MAX (kept as an opt-in experiment)."""
        tkey = self.bkntt.dtype == jnp.int8
        thr = int(os.environ.get("IYOKAN_UNROLL_MAX",
                                 "0" if tkey else "256"))
        if self.bkuntt is not None and batch <= thr:
            return self.bkuntt
        if self.bk_tk_small is not None and batch <= int(
                os.environ.get("IYOKAN_TK_SMALL_MAX", "256")):
            return self.bk_tk_small
        return self.bkntt

    def bk2_for(self) -> jnp.ndarray:
        """CB batches are always tiny (one row per address bit), so the
        depth-halved unrolled key wins whenever present."""
        if self.bk2untt is not None:
            return self.bk2untt
        return self.bk2ntt

    @staticmethod
    def from_evalkey(ek: EvalKey, with_cb: bool = True,
                     backend=None) -> "DeviceKeys":
        p = ek.params
        be = backend or polymul.get_backend()
        if ek.bk2.shape[0] == 0:
            with_cb = False

        # Device-key prep is expensive (the tkey expansion alone is a
        # 2.9 GB host build + transfer at cggi128): cache on key-material
        # fingerprint + prep-affecting config so repeated engine builds
        # within one process (e.g. the integration registry) reuse it.
        import hashlib

        # Prefix hash: only the leading rows of each key component are
        # hashed, on the assumption that an eval key's components come from
        # a single RNG stream (any material difference shows up in the first
        # rows).  Keys hand-assembled from mixed streams must not share a
        # process with this cache.
        h = hashlib.sha1()
        h.update(np.asarray(ek.bk[:2]).tobytes())
        h.update(np.asarray(ek.ksk[:1]).tobytes())
        if with_cb:
            h.update(np.asarray(ek.bk2[:1]).tobytes())
            h.update(np.asarray(ek.pksk[:1, :1]).tobytes())
            if ek.bk2u is not None and ek.bk2u.size:
                h.update(np.asarray(ek.bk2u[:1]).tobytes())
        if ek.bku is not None:
            h.update(np.asarray(ek.bku[:1]).tobytes())
        cache_key = (
            p.name, bool(with_cb), be.name, h.hexdigest(),
            tuple(os.environ.get(k) for k in (
                "IYOKAN_BR_IMPL", "IYOKAN_TK_LAYOUT", "IYOKAN_TKEY_LIMBS",
                "IYOKAN_NO_UNROLL", "IYOKAN_TK_UNROLL", "IYOKAN_EP",
                "IYOKAN_TK_LB", "IYOKAN_TK_SMALL", "IYOKAN_UNROLL_MAX",
                "IYOKAN_KS_I8")),
        )
        hit = _DEVICE_KEY_CACHE.get(cache_key)
        if hit is not None:
            _DEVICE_KEY_CACHE.move_to_end(cache_key)
            return hit

        # Default blind-rotate implementation: the Toeplitz-slab matmul
        # kernel on TPU (fastest measured path, PERF.md round 2: 6187
        # gates/s vs 2061 for the XLA NTT pipeline), the XLA NTT pipeline
        # on CPU (where Pallas only runs in interpret mode).
        impl = os.environ.get("IYOKAN_BR_IMPL")
        if impl is None and be.name == "mxu":
            impl = "tkey"
        if impl == "tkey":
            # Toeplitz-slab key (host expansion + one transfer): the
            # gate-bootstrap path runs the no-NTT ops/pallas_tk kernel.
            L, lay, lb = tkey_default_config(p)
            # 2-bit unrolled slabs (opt-in): per KEY BIT, 3/4 the matmul
            # MACs and 3/4 the VPU work at half the sequential depth.
            # Composes with the asymmetric gadget (lb) and the pipelined
            # kernel; the round-2 "throughput loss" (232 vs 165 ms/1024
            # gates) was the SERIAL kernel, whose per-step VPU work sits
            # on the critical path.
            tku = (ek.bku is not None and lay == "fat"
                   and os.environ.get("IYOKAN_TK_UNROLL", "0") != "0")
            if tku:
                src = ek.bku.reshape(ek.bku.shape[0], 6 * p.l, 2, p.N)
            else:
                src = ek.bk
            if L < 4 and np.any(src[:2, :, 0, :] & ((1 << (8 * (4 - L))) - 1)):
                # host.genevalkey quantizes bk masks to the 256-grid so the
                # truncated slab is exact on the mask component; a key with
                # full-torus masks (pre-quantization snapshot, or
                # IYOKAN_BK_MASK_BITS=32) rides this kernel with ~2^-6
                # phase noise -- enough to corrupt cascaded gates.
                import warnings

                warnings.warn(
                    "eval key has unquantized bootstrapping-key masks: the "
                    f"{L}-limb Toeplitz-slab kernel adds ~2^-6 phase noise "
                    "on such keys. Regenerate the eval key (host.genevalkey "
                    "quantizes masks by default) or set IYOKAN_TKEY_LIMBS=4.")
            # asymmetric gadget (see tkey_kernel_key): lb b-part digits
            slab = None
            spath = _slab_disk_path(cache_key)
            if spath and os.path.exists(spath):
                try:
                    slab = np.load(spath)
                except (OSError, ValueError):
                    slab = None
            if slab is None:
                slab = polymul.tkey_kernel_key(src, p, L, lay, lb=lb)
                if spath:
                    try:
                        os.makedirs(os.path.dirname(spath), exist_ok=True)
                        tmp = f"{spath}.tmp{os.getpid()}"
                        with open(tmp, "wb") as f:
                            np.save(f, slab)
                        os.replace(tmp, spath)
                    except OSError:
                        pass
            bkntt = jnp.asarray(slab)
        else:
            tku = False
            bkntt = jax.jit(lambda bk: be.prep1(bk, p))(jnp.asarray(ek.bk))
        if (os.environ.get("IYOKAN_EP") == "pallas" and be.name == "mxu"
                and impl != "tkey"):
            from ..ops.pallas_ep import prep_kernel_key

            bkntt = jax.jit(lambda b: prep_kernel_key(b, p.N))(bkntt)
        # OPT-IN 2-bit-unrolled tkey slab for small batches (bk_for): a
        # measured LOSS at G=32..128 (SMALLG_r04.log: tripled per-step VPU
        # work beats the halved depth), kept behind IYOKAN_TK_SMALL=1 as
        # the documented experiment.  Skipped when the main slab is
        # already unrolled (IYOKAN_TK_UNROLL=1).
        bk_tk_small = None
        if (impl == "tkey" and not tku and ek.bku is not None
                and lay == "fat"
                and os.environ.get("IYOKAN_TK_SMALL", "0") == "1"):
            bku_rows = ek.bku.reshape(ek.bku.shape[0], 6 * p.l, 2, p.N)
            bk_tk_small = jnp.asarray(
                polymul.tkey_kernel_key(bku_rows, p, L, "fat", lb=lb))
        bkuntt = None
        # the 2-bit-unrolled NTT key is kept when bk_for can still route
        # to it: always on non-tkey backends (the only small-batch play
        # there), on tkey only when IYOKAN_UNROLL_MAX > 0 re-enables the
        # legacy route (default 0: the slab beats it at every size)
        if (ek.bku is not None and not os.environ.get("IYOKAN_NO_UNROLL")
                and (impl != "tkey"
                     or int(os.environ.get("IYOKAN_UNROLL_MAX", "0")) > 0)):
            bku = ek.bku.reshape(ek.bku.shape[0], 3 * 2 * p.l, 2, p.N)
            bkuntt = jax.jit(lambda bk: be.prep1(bk, p))(jnp.asarray(bku))
        # key switches as int8 limb matmuls on the MXU backend (~4x the
        # bf16 limb path, bit-identical; IYOKAN_KS_I8=0 restores u32 keys)
        ks_i8 = (be.name == "mxu"
                 and os.environ.get("IYOKAN_KS_I8", "1") != "0")
        ksk_flat = ek.ksk.reshape(p.N * p.ks_t, p.n + 1)
        ksk_mat = jnp.asarray(key_i8_limbs(ksk_flat) if ks_i8
                              else ksk_flat)

        bk2untt = None
        if with_cb:
            bk2ntt = jax.jit(lambda bk2: be.prep2(bk2, p))(
                jnp.asarray(ek.bk2, u64)
            )
            if (ek.bk2u is not None and ek.bk2u.size
                    and not os.environ.get("IYOKAN_NO_UNROLL")):
                b2u = ek.bk2u.reshape(
                    ek.bk2u.shape[0], 3 * 2 * p.l2, 2, p.N2
                )
                bk2untt = jax.jit(lambda z: be.prep2(z, p))(
                    jnp.asarray(b2u, u64)
                )
            pk = ek.pksk  # u32 [2, N2, t, 2, N]
            mats = tuple(
                jnp.asarray(
                    key_i8_limbs(pk[i].reshape(p.N2 * p.pks_t, 2 * p.N))
                    if ks_i8 else
                    pk[i].reshape(p.N2 * p.pks_t, 2 * p.N))
                for i in (0, 1)
            )
        else:
            bk2ntt = jax.jit(lambda z: be.prep2(z, p))(
                jnp.zeros((0, 2 * p.l2, 2, p.N2), u64)
            )
            mats = (
                jnp.zeros((p.N2 * p.pks_t, 2 * p.N), u32),
                jnp.zeros((p.N2 * p.pks_t, 2 * p.N), u32),
            )
        dk = DeviceKeys(p, be, bkntt, ksk_mat, bk2ntt, mats, bkuntt,
                        bk2untt, bk_tk_small)
        _DEVICE_KEY_CACHE[cache_key] = dk
        while len(_DEVICE_KEY_CACHE) > _DEVICE_KEY_CACHE_MAX:
            _DEVICE_KEY_CACHE.popitem(last=False)
        return dk


jax.tree_util.register_pytree_node(
    DeviceKeys,
    lambda dk: (
        (dk.bkntt, dk.ksk_mat, dk.bk2ntt, dk.pksk_mats, dk.bkuntt,
         dk.bk2untt, dk.bk_tk_small),
        (dk.params, dk.backend),
    ),
    lambda aux, children: DeviceKeys(aux[0], aux[1], *children),
)


# --------------------------------------------------------------------------- #
# batched homomorphic gates
# --------------------------------------------------------------------------- #


def gate_linear(A: jnp.ndarray, B: jnp.ndarray, ca: jnp.ndarray,
                cb: jnp.ndarray, kmu: jnp.ndarray, p: Params) -> jnp.ndarray:
    """pre = ca*A + cb*B + k*mu per row; coefficients int32 [G]."""
    pre = A * ca[:, None].astype(u32) + B * cb[:, None].astype(u32)
    return pre.at[:, p.n].add((kmu * p.mu).astype(u32))


def hom_not(c: jnp.ndarray) -> jnp.ndarray:
    """NOT: torus negation, no bootstrap (reference HomNOT)."""
    return (-c.astype(jnp.int64)).astype(u32) if c.dtype != u32 else (u32(0) - c)

"""Fused Pallas TPU kernel for the blind-rotation step.

The XLA path materializes every intermediate of a CMUX step (digit NTTs,
pointwise products, inverse transforms) in HBM -- roughly 400 MB of traffic
per step for a 1024-gate batch, which caps the whole engine at under
1K bootstraps/s.  This kernel runs one complete step

  rotate(acc) -> gadget-decompose -> forward NTTs -> pointwise j-sum ->
  inverse NTTs -> CRT -> limb-recombine -> accumulate

for a block of gates entirely in VMEM.  HBM traffic collapses to the
accumulator block in/out plus one stream of the step's bootstrapping-key
slice, shared by every gate in the block.

The arithmetic is exactly crypto/polymul's MXU formulation (the jnp ops in
the kernel body lower through Mosaic): small-radix NTT stages as unrolled
scalar i32 MACs on the VPU, the 128-wide stages as bf16 limb matmuls on the
MXU, f32-Barrett reductions, all-int32 CRT.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto import polymul
from ..crypto.polymul import PRIMES1, center_reduce, tables
from ..params import Params

u32 = jnp.uint32
i32 = jnp.int32


def _decompose1(x, p: Params):
    offset = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(p.l))
    offset += 1 << (31 - p.l * p.Bgbit)   # round-to-nearest tail
    xp = x + u32(offset & 0xFFFFFFFF)
    outs = []
    for i in range(2):
        for j in range(p.l):
            shift = 32 - (j + 1) * p.Bgbit
            d = ((xp[:, i, :] >> u32(shift)) & u32(p.Bg - 1)).astype(i32) \
                - p.Bg // 2
            outs.append(d)
    return jnp.stack(outs, axis=1)        # [BG, 2l, N] (part-major rows)


def _nega_roll(poly, s, N):
    if s == 0:
        return poly
    if s == N:                      # X^N = -1
        return jnp.zeros((), poly.dtype) - poly
    lo = jnp.zeros((), poly.dtype) - poly[..., N - s:]
    return jnp.concatenate([lo, poly[..., : N - s]], axis=-1)


def _rot(poly, r, N):
    # arithmetic select (Mosaic: no bool minor-dim broadcasts)
    x = poly
    for b in range((2 * N - 1).bit_length()):
        rolled = _nega_roll(x, 1 << b, N)
        m = ((r >> b) & 1).astype(u32)[..., None]
        x = x + (rolled - x) * m
    return x


TABLE_FIELDS = ("w1_hi", "w1_lo", "t", "w2_hi", "w2_lo",
                "iw1_hi", "iw1_lo", "it", "iw2_hi", "iw2_lo")


def step_math(acc, r, g_step, tabrefs, p: Params):
    """One CMUX step on in-VMEM values (shared by both kernels).

    acc u32 [BG, 2, N]; r i32 [BG, >=2]; g_step i32 [2l, 2, P, N];
    tabrefs: refs for TABLE_FIELDS, each stacked over primes.
    """
    tabs = tables(p.N, PRIMES1)
    w1h, w1l, tfw, w2h, w2l, iw1h, iw1l, tinv, iw2h, iw2l = tabrefs
    rot = _rot(acc, r[:, :2], p.N)
    d = _decompose1(rot - acc, p)          # [BG, 2l, N] i32

    res = []
    for pi, tab in enumerate(tabs):
        dn = polymul._fwd(
            d, p.N, tab, small_input=True,
            consts=(w1h[pi], w1l[pi], tfw[pi], w2h[pi], w2l[pi]),
        )
        g = g_step[:, :, pi, :]                      # [2l, 2, N] i32
        prod = dn[:, :, None, :] * g                 # [BG, 2l, 2, N]
        chunk = polymul._pointwise_chunk(tab.p)
        s = None
        for j0 in range(0, prod.shape[1], chunk):
            part = prod[:, j0 : j0 + chunk].sum(axis=1, dtype=jnp.int32)
            s = part if s is None else s + part
            s = center_reduce(s, tab.p)
        res.append(polymul._inv(
            s, p.N, tab,
            consts=(iw1h[pi], iw1l[pi], tinv[pi], iw2h[pi], iw2l[pi]),
        ))
    return acc + polymul.garner_mod32(res, tuple(t.p for t in tabs))


def _step_kernel(a_ref, acc_ref, bk_ref, *rest, p: Params):
    tab_refs, out_ref = rest[:-1], rest[-1]
    acc = acc_ref[...]                     # [BG, 2, N] u32
    out_ref[...] = step_math(acc, a_ref[...], bk_ref[...], tab_refs, p)


def _table_shape(field: str, R: int, C: int):
    return (R, C) if field in ("t", "it") else (
        (R, R) if field.startswith(("w1", "iw2")) else (C, C)
    )


@functools.lru_cache(maxsize=None)
def _step_tables(p: Params):
    """Stacked per-prime twiddle tables (numpy; converted at call sites --
    caching jnp arrays here would leak tracers across jit traces)."""
    tabs = tables(p.N, PRIMES1)
    return tuple(
        np.stack([getattr(t, f) for t in tabs]).astype(np.int32)
        for f in TABLE_FIELDS
    )


@functools.lru_cache(maxsize=None)
def _step_call(p: Params, G: int, BG: int):
    kernel = functools.partial(_step_kernel, p=p)
    R, C = polymul._split_rc(p.N)
    grid = (G // BG,)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BG, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            full((2 * p.l, 2, len(PRIMES1), p.N)),
        ] + [
            full((len(PRIMES1),) + _table_shape(f, R, C))
            for f in TABLE_FIELDS
        ],
        out_specs=pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 2, p.N), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("IYOKAN_PALLAS_INTERPRET")),
    )


def blind_rotate_pallas(tlwe0: jnp.ndarray, bk_prep: jnp.ndarray,
                        testv: jnp.ndarray, p: Params,
                        block_g: int = None) -> jnp.ndarray:
    """Drop-in replacement for ops.blind_rotate on TPU (lvl1)."""
    from ..crypto import ops as cops

    if block_g is None:
        block_g = int(os.environ.get("IYOKAN_PALLAS_BG", "64"))

    G = tlwe0.shape[0]
    BG = min(block_g, G)
    pad = (-G) % BG
    if pad:
        tlwe0 = jnp.concatenate(
            [tlwe0, jnp.zeros((pad, tlwe0.shape[1]), u32)], axis=0
        )
    Gp = G + pad

    abar = cops._modswitch(tlwe0[:, : p.n], p.logN)    # [Gp, n]
    bbar = cops._modswitch(tlwe0[:, p.n], p.logN)
    acc_b = cops.rot_poly(
        jnp.broadcast_to(testv, (Gp, p.N)), (-bbar) % (2 * p.N), p.N
    )
    acc = jnp.stack([jnp.zeros((Gp, p.N), u32), acc_b], axis=1)
    abar_t = abar.T                                    # [n, Gp]

    call = _step_call(p, Gp, BG)
    tabs_in = _step_tables(p)

    def body(i, acc):
        a_i = jax.lax.dynamic_index_in_dim(abar_t, i, 0, keepdims=False)
        a_i = jnp.broadcast_to(a_i[:, None], (Gp, 128))
        bk_i = jax.lax.dynamic_index_in_dim(bk_prep, i, 0, keepdims=False)
        return call(a_i, acc, bk_i, *tabs_in)

    out = jax.lax.fori_loop(0, p.n, body, acc)
    return out[:G]

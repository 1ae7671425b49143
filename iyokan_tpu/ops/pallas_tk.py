"""Toeplitz-slab fused blind rotation: the external product as pure int8
MXU matmuls, exact mod 2^32 -- no NTT, no primes, no Barrett, no CRT.

Stage ablation of the NTT kernel (ops/pallas_br3.py) showed ~80% of its
time is VPU modular plumbing (digit reduction, pointwise j-sums, CRT
recombination).  This kernel removes that entire layer: the negacyclic
convolution of the per-gate digit polynomials against the *shared* per-step
TRGSW rows is computed directly as matmuls against a precomputed Toeplitz
window of the key (crypto/polymul.tkey_prep1):

  out[g, u, 128K + b] = sum_{j,t} ext[g, j, 128(K+1) + t] * slab_j[t, ub]

with ext = [d, -d] the negacyclic digit extension.  All slices are
128-lane-aligned static windows (no relayouts); each step is 6j x N/128
dots of [BG, N] x [N, 2*L*128] int8 -> int32, whose products
(|d| <= Bg/2 = 32, |limb| <= 128, contraction N, j-sum 2l = 6) stay inside
int32: 6*1024*32*128 < 2^25.  Limb recombination is u32 shift-adds (exact
mod 2^32); with all 4 key limbs the result is bit-identical to the XLA
blind rotate.  The default keeps the top 3 limbs (2.9 GB key instead of
3.8 GB), adding truncation noise of sigma ~ 2^-10.6 against the 2^-8.8
bootstrap noise (see tests/test_noise_and_params.py).

The per-gate rotation is the rotate-first CMUX form: acc's barrel rotation
(ops.rot_poly, log2(2N) static rolls + selects) runs inside the kernel on
VMEM-resident data.

Replaces the cuFHE fused-bootstrap kernel role
(reference src/iyokan_cufhe.hpp:207-262, thirdparty/cuFHE NTT kernels).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..params import Params

u32 = jnp.uint32
i32 = jnp.int32
i8 = jnp.int8


def _kernel(p: Params, n_steps, L, fat, ablate, abar_ref, acc0_ref, bk_hbm,
            out_ref, bk_buf, sems):
    """fat=False: one dot [BG, N] x [N, 2L*128] per (j, K).
    fat=True: the digit extension is interleaved at 128-lane granularity
    as lanes (block, j, 128) so j folds into the contraction: one dot
    [BG, RR*N] x [RR*N, 2L*128] per K."""
    N = p.N
    BG = acc0_ref.shape[0]
    NB = N // 128
    offset = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(p.l))
    offset += 1 << (31 - p.l * p.Bgbit)
    RR = 2 * p.l

    from ..crypto import ops as cops

    def dma(i, slot):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                     sems.at[slot])

    dma(0, 0).start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_steps)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        bk = bk_buf[slot]                              # [RR, N, 2*L*128] i8

        # rotate-first CMUX: diff = X^r * acc - acc (barrel, in VMEM)
        r = abar_ref[i, :]                             # [BG]
        if "rot" in ablate:
            diff = acc + acc
        else:
            rot = cops.rot_poly(acc, r[:, None], N)
            diff = rot - acc

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=i32)

        # gadget decomposition -> negacyclic digit extension, i8.
        # negate before the i8 cast: Mosaic has no packed-i8 subtraction
        if "decompose" in ablate:
            d = jnp.broadcast_to(
                diff[:, :1, :].astype(i32) & 31, (BG, RR, N))
            ext = jnp.concatenate([d, -d], axis=-1).astype(i8)
        elif fat:
            # lanes ordered (block, j, 128): negacyclic blocks 0..NB-1
            # are +d, NB..2NB-1 are -d.  Every piece is an elementwise
            # function of a 128-aligned lane slice of a 2D array, so all
            # concat operands share tile offset {0,0} (Mosaic's
            # tpu.concatenate rejects mixed sublane offsets, which
            # slicing a [BG, RR, N] stack across RR would produce).
            xparts = [diff[:, 0, :] + u32(offset & 0xFFFFFFFF),
                      diff[:, 1, :] + u32(offset & 0xFFFFFFFF)]
            pieces = []
            for b in range(2 * NB):
                neg = b >= NB
                bb = b - NB if neg else b
                for part in range(2):
                    for j in range(p.l):
                        sh = 32 - (j + 1) * p.Bgbit
                        w = ((xparts[part][:, 128 * bb:128 * (bb + 1)]
                              >> u32(sh)) & u32(p.Bg - 1)).astype(i32)
                        pieces.append(p.Bg // 2 - w if neg
                                      else w - p.Bg // 2)
            ext = jnp.concatenate(pieces, axis=-1).astype(i8)
        else:
            xp = diff + u32(offset & 0xFFFFFFFF)
            rows = []
            for part in range(2):
                for j in range(p.l):
                    sh = 32 - (j + 1) * p.Bgbit
                    d_ = ((xp[:, part, :] >> u32(sh))
                          & u32(p.Bg - 1)).astype(i32) - p.Bg // 2
                    rows.append(d_)
            d = jnp.stack(rows, axis=1)                # [BG, RR, N] i32
            ext = jnp.concatenate([d, -d], axis=-1).astype(i8)

        grp = RR * 128
        wks = []
        for K in range(NB):
            w0 = 128 * (K + 1)
            if "mm" in ablate:
                s = jnp.broadcast_to(ext[:, :1].astype(i32)
                                     if fat else ext[:, 0, :1].astype(i32),
                                     (BG, 2 * L * 128))
            elif fat:
                s = mm(ext[:, grp * (K + 1):grp * (K + 1) + RR * N], bk)
            else:
                s = None
                for j in range(RR):
                    t = mm(ext[:, j, w0:w0 + N], bk[j])  # [BG, 2*L*128]
                    s = t if s is None else s + t
            # limb recombination, exact mod 2^32 (columns are
            # [u, limb, 128] with limb scales 256^(4-L) .. 256^3)
            zu = []
            for u in range(2):
                z = jnp.zeros((BG, 128), u32)
                for li in range(L):
                    c0 = (u * L + li) * 128
                    sh = 8 * (4 - L + li)
                    z = z + (s[:, c0:c0 + 128].astype(u32) << u32(sh))
                zu.append(z)
            wks.append(jnp.stack(zu, axis=1))          # [BG, 2, 128]
        wfull = jnp.concatenate(wks, axis=-1)          # [BG, 2, N]
        return acc + wfull

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, acc0_ref[...])


@functools.lru_cache(maxsize=None)
def _call(p: Params, G: int, BG: int, n_steps: int, L: int, fat: bool,
          ablate: frozenset = frozenset()):
    kernel = functools.partial(_kernel, p, n_steps, L, fat, ablate)
    RR = 2 * p.l
    bk_scratch = ((2, RR * p.N, 2 * L * 128) if fat
                  else (2, RR, p.N, 2 * L * 128))

    return pl.pallas_call(
        kernel,
        grid=(G // BG,),
        in_specs=[
            pl.BlockSpec((n_steps, BG), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # bk stays in HBM
        ],
        out_specs=pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 2, p.N), u32),
        scratch_shapes=[
            pltpu.VMEM(bk_scratch, i8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("IYOKAN_PALLAS_INTERPRET")),
    )


def blind_rotate_tkey(tlwe0: jnp.ndarray, bk_tk: jnp.ndarray,
                      testv: jnp.ndarray, p: Params,
                      block_g: int = None) -> jnp.ndarray:
    """Drop-in for ops.blind_rotate given a tkey-layout key: int8
    [n, 2l, N, 2*L*128] (thin) or [n, 2l*N, 2*L*128] (fat), from
    crypto/polymul.tkey_kernel_key."""
    from ..crypto import ops as cops

    fat = bk_tk.ndim == 3
    L = bk_tk.shape[-1] // 256
    if block_g is None:
        block_g = int(os.environ.get("IYOKAN_PALLAS_BG", "1024"))
    G = tlwe0.shape[0]
    BG = min(block_g, max(8, G))
    pad = (-G) % BG
    if pad:
        tlwe0 = jnp.concatenate(
            [tlwe0, jnp.zeros((pad, tlwe0.shape[1]), u32)], axis=0
        )
    Gp = G + pad

    abar = cops._modswitch(tlwe0[:, : p.n], p.logN)     # [Gp, n]
    bbar = cops._modswitch(tlwe0[:, p.n], p.logN)
    acc_b = cops.rot_poly(
        jnp.broadcast_to(testv, (Gp, p.N)), (-bbar) % (2 * p.N), p.N
    )
    acc0 = jnp.stack([jnp.zeros((Gp, p.N), u32), acc_b], axis=1)

    ablate = frozenset(
        x for x in os.environ.get("IYOKAN_TK_ABLATE", "").split(",") if x
    )
    out = _call(p, Gp, BG, p.n, L, fat, ablate)(abar.T, acc0, bk_tk)
    return out[:G]

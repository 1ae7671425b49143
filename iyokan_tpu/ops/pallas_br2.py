"""Fully-fused Pallas blind rotation: the whole n-step loop in one kernel.

v1 (pallas_br.py) launches one kernel per CMUX step from an XLA fori_loop:
the accumulator round-trips HBM 635 times and each launch pays dispatch
overhead.  Here the loop lives *inside* the kernel:

  * the accumulator block stays in VMEM for all n steps;
  * the per-step bootstrapping-key slice is DMA'd HBM -> VMEM with double
    buffering, overlapping the previous step's compute;
  * per-gate rotation amounts sit in VMEM for the whole run.

HBM traffic per gate block collapses to  n * |bk_step|  for the key stream
(shared by all gates of the block) plus the accumulator in/out once.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto import polymul
from ..crypto.polymul import PRIMES1
from ..params import Params
from .pallas_br import TABLE_FIELDS, _step_tables, _table_shape

u32 = jnp.uint32
i32 = jnp.int32


def _kernel(abar_ref, acc0_ref, *rest, p: Params):
    from .pallas_br import step_math

    tab_refs = rest[:-4]
    bk_hbm, out_ref, bk_buf, sems = rest[-4:]

    def dma(i, slot):
        return pltpu.make_async_copy(
            bk_hbm.at[i], bk_buf.at[slot], sems.at[slot]
        )

    dma(0, 0).start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < p.n)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        g_step = bk_buf[slot]                   # [2l, 2, P, N] i32
        r = abar_ref[i, :][:, None]             # [BG, 1]
        r2 = jnp.broadcast_to(r, (acc.shape[0], 2))
        return step_math(acc, r2, g_step, tab_refs, p)

    out_ref[...] = jax.lax.fori_loop(0, p.n, body, acc0_ref[...])


@functools.lru_cache(maxsize=None)
def _call(p: Params, G: int, BG: int):
    kernel = functools.partial(_kernel, p=p)
    R, C = polymul._split_rc(p.N)

    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(G // BG,),
        in_specs=[
            pl.BlockSpec((p.n, BG), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            full((len(PRIMES1),) + _table_shape(f, R, C))
            for f in TABLE_FIELDS
        ] + [
            pl.BlockSpec(memory_space=pltpu.ANY),   # bk stays in HBM
        ],
        out_specs=pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 2, p.N), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * p.l, 2, len(PRIMES1), p.N), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("IYOKAN_PALLAS_INTERPRET")),
    )


def blind_rotate_pallas2(tlwe0: jnp.ndarray, bk_prep: jnp.ndarray,
                         testv: jnp.ndarray, p: Params,
                         block_g: int = None) -> jnp.ndarray:
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
    acc0 = jnp.stack([jnp.zeros((Gp, p.N), u32), acc_b], axis=1)

    out = _call(p, Gp, BG)(abar.T, acc0, *_step_tables(p), bk_prep)
    return out[:G]

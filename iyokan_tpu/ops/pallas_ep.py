"""Fused external-product Pallas kernel (lvl1).

The XLA pipeline materializes every stage of

    digits -> fwd NTT -> pointwise j-sum -> inverse NTT -> CRT

to HBM (~350 MB per CMUX step at G=1024); profiling shows the chain is
simultaneously near VPU- and HBM-bound while the MXU idles between dots.
This kernel keeps the whole per-prime pipeline resident in VMEM: per
64-gate tile it runs

    stage1 (K=R dot) -> batched-twist stage (q-batched K=C dots)
    -> pointwise j-sum (VPU, chunked Barretts)
    -> batched inverse-twist -> stage2 (K=R dot) -> direct CRT mod 2^32

using the twist2 transform tables (polymul.twist_tables -- bit-exact, and
the batching that XLA lowers poorly is free inside the kernel).  HBM
traffic per step drops to the int8 digit tile, the step's key slice, and
the u32 result (~20 MB at G=1024).

Layout: everything is q-major ([R, rows, C]) so each contraction is a
plain or q-batched Mosaic dot with a 128-lane minor dim; the host-side
wrapper pre-transposes digits and post-transposes the result (cheap, XLA
fuses them into the neighbouring elementwise chains).

Replaces the role of cuFHE's fused gate-bootstrap CUDA kernels in the
reference (reference thirdparty/cuFHE, used via src/iyokan_cufhe.hpp).
Enable with IYOKAN_EP=pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..crypto import polymul as pm
from ..crypto.polymul import PRIMES1, _centered, _split_rc, center_reduce
from ..params import Params

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32
F32 = jnp.float32

TG = 64  # gate rows per program


@functools.lru_cache(maxsize=None)
def _kernel_tables(N: int):
    """Packed transform tables for the kernel (numpy, lru-cached).

    tw2/itw: [P, 2, R, C, C] int8 (limb-major batched twist stages)
    w1T:     [P, 2, R(q), R(r)] int8 (stage-1, transposed for lhs use)
    iw2T:    [P, 2, R(r), R(q)] int8 (stage-2, transposed for lhs use)
    """
    tt = pm.twist_tables(N, PRIMES1)
    base = pm.tables(N, PRIMES1)
    P = len(PRIMES1)
    tw2 = np.stack([np.stack([tt[pi][0], tt[pi][1]]) for pi in range(P)])
    itw = np.stack([np.stack([tt[pi][2], tt[pi][3]]) for pi in range(P)])
    w1T = np.stack(
        [np.stack([base[pi].w1_hi.T, base[pi].w1_lo.T]) for pi in range(P)]
    ).astype(np.int8)
    iw2T = np.stack(
        [np.stack([base[pi].iw2_hi.T, base[pi].iw2_lo.T]) for pi in range(P)]
    ).astype(np.int8)
    Eks, alphas, Pm = pm._crt_direct_consts(PRIMES1, 32)
    return tw2, itw, w1T, iw2T, Eks, alphas, Pm


def _limbs(x):
    """Centered int32 -> (hi, lo) radix-256 int8 limbs."""
    lo = ((x + 128) & 255) - 128
    hi = (x - lo) >> 8
    return hi.astype(I8), lo.astype(I8)


def _combine(z11, zmid, z00, p: int):
    """(hi@hi, mid, lo@lo) partials -> centered residue, all in int32."""
    c16 = np.int32(_centered(1 << 16, p))
    return center_reduce(
        center_reduce(z11, p) * c16 + (zmid << 8) + z00, p
    )


def _ep_kernel(RR: int, d_ref, bk_ref, w1T_ref, tw2_ref, itw_ref, iw2T_ref,
               o_ref):
    R, rows, C = d_ref.shape
    tg = rows // RR
    _, _, _, _, Eks, alphas, Pm = _kernel_tables(R * C)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=I32
        )

    def bdot(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))), preferred_element_type=I32
        )

    d = d_ref[...]
    dflat = d.reshape(R, rows * C)
    out_acc = None
    mf = None
    for pi, p in enumerate(pm.PRIMES1):
        # stage 1: u[q, x] = sum_r w1T[q, r] * d[r, x]
        zh = dot(w1T_ref[pi, 0], dflat)
        zl = dot(w1T_ref[pi, 1], dflat)
        u = center_reduce((zh << 8) + zl, p).reshape(R, rows, C)
        u1, u0 = _limbs(u)
        # batched twist stage: X[q, row, s] = sum_c u[q, row, c]*tw2[q, c, s]
        th, tl = tw2_ref[pi, 0], tw2_ref[pi, 1]
        X = _combine(bdot(u1, th), bdot(u1, tl) + bdot(u0, th),
                     bdot(u0, tl), p)
        # pointwise j-sum against the step's key slice
        Xr = X.reshape(R, tg, RR, C)
        g = bk_ref[pi]                                  # [R, RR, 2, C] i32
        chunk = pm._pointwise_chunk(p)
        halves = []
        for ui in range(2):
            acc = None
            pending = 0
            for j in range(RR):
                term = Xr[:, :, j, :] * g[:, j, ui, :][:, None, :]
                acc = term if acc is None else acc + term
                pending += 1
                if pending >= chunk:
                    acc = center_reduce(acc, p)
                    pending = 0
            halves.append(center_reduce(acc, p) if pending else acc)
        S = jnp.stack(halves, axis=2)                   # [R, tg, 2, C]
        # batched inverse twist: T2[q, y, c] = sum_s S[q, y, s]*itw[q, s, c]
        Sf = S.reshape(R, tg * 2, C)
        s1, s0 = _limbs(Sf)
        ih, il = itw_ref[pi, 0], itw_ref[pi, 1]
        T2 = _combine(bdot(s1, ih), bdot(s1, il) + bdot(s0, ih),
                      bdot(s0, il), p)
        # stage 2: res[r, y] = sum_q iw2T[r, q] * T2[q, y]
        t1, t0 = _limbs(T2.reshape(R, tg * 2 * C))
        res = _combine(
            dot(iw2T_ref[pi, 0], t1),
            dot(iw2T_ref[pi, 1], t1) + dot(iw2T_ref[pi, 0], t0),
            dot(iw2T_ref[pi, 1], t0), p,
        ).reshape(R, tg, 2, C)
        # direct CRT accumulation
        ru = res.astype(U32) * U32(Eks[pi])
        rf = res.astype(F32) * alphas[pi]
        out_acc = ru if out_acc is None else out_acc + ru
        mf = rf if mf is None else mf + rf
    m = jnp.round(mf).astype(I32)
    o_ref[...] = out_acc - m.astype(U32) * U32(Pm)


def extprod1_fused(digits: jnp.ndarray, bk_step: jnp.ndarray,
                   p: Params, interpret: bool = False) -> jnp.ndarray:
    """digits i32 [G, RR, N]; bk_step [P, R, RR, 2, C] (kernel key layout,
    see prep_kernel_key) -> conv u32 [G, 2, N]."""
    G, RR, N = digits.shape
    R, C = _split_rc(N)
    if G % TG:
        pad = TG - G % TG
        padded = jnp.concatenate(
            [digits, jnp.zeros((pad, RR, N), digits.dtype)], axis=0
        )
        return extprod1_fused(padded, bk_step, p, interpret)[:G]
    tw2, itw, w1T, iw2T, _, _, _ = _kernel_tables(N)

    D = digits.astype(I8).reshape(G, RR, R, C)
    D = D.transpose(2, 0, 1, 3).reshape(R, G * RR, C)

    kern = functools.partial(_ep_kernel, RR)
    out = pl.pallas_call(
        kern,
        grid=(G // TG,),
        in_specs=[
            pl.BlockSpec((R, TG * RR, C), lambda i: (0, i, 0)),
            pl.BlockSpec(bk_step.shape, lambda i: (0,) * bk_step.ndim),
            pl.BlockSpec(w1T.shape, lambda i: (0,) * w1T.ndim),
            pl.BlockSpec(tw2.shape, lambda i: (0,) * tw2.ndim),
            pl.BlockSpec(itw.shape, lambda i: (0,) * itw.ndim),
            pl.BlockSpec(iw2T.shape, lambda i: (0,) * iw2T.ndim),
        ],
        out_specs=pl.BlockSpec((R, TG, 2, C), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, G, 2, C), U32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(D, bk_step, jnp.asarray(w1T), jnp.asarray(tw2), jnp.asarray(itw),
      jnp.asarray(iw2T))
    return out.transpose(1, 2, 0, 3).reshape(G, 2, N)


def prep_kernel_key(bkntt: jnp.ndarray, N: int) -> jnp.ndarray:
    """Backend prep1 layout [n, RR, 2, P, N] -> kernel layout
    [n, P, R, RR, 2, C] (q-major, lane-sized minor)."""
    n, RR, two, P, _ = bkntt.shape
    R, C = _split_rc(N)
    x = bkntt.reshape(n, RR, two, P, R, C)
    return x.transpose(0, 3, 4, 1, 2, 5)

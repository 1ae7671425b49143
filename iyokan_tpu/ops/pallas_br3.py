"""v3 fused blind rotation: whole n-step loop in one kernel, no lane rolls.

Design (from tools/microbench.py measurements on v5e, 2026-08):
  * lane-axis rolls/gathers are ~30x a basic VPU op, so the per-step
    accumulator rotation is NOT a barrel shifter.  Instead the step uses the
    decompose-first identity
        CMUX(acc) = acc + invNTT[ (psi^r - 1) * sum_j NTT(d_j) * bk_j ]
    with d = decompose(acc): rotating after decomposition multiplies the
    decomposition error by (X^r - 1) (~2x noise variance per step, well
    inside the budget) and turns the rotation into one exact per-gate
    twiddle row, fetched by a one-hot int8 matmul from a precomputed
    (psi^(r(2k+1)) - 1) table -- MXU work instead of VPU shuffles.
  * i32 multiplies are ~2.5x slower than adds and i16 multiplies do not
    exist on v5e (Mosaic aborts), so modular reductions are f32-round
    Barretts: exact when the input is f32-representable (< 2^24, round-tie
    distance 1/2p beats the error), a coarse +-3p/2 pass otherwise,
    two-stage (coarse then exact) when a centered result is required.
  * forward digit NTT: one [N,N] radix-256-limb int8 matmul pair per prime
    (digits are single-limb); inverse: the same full-matrix form on the two
    result rows.  Everything stays in VMEM across all n steps; the
    bootstrapping key streams HBM->VMEM with double buffering.

Key layout: the backend prep1 layout [n, 2l, 2, P, N] i32 (crypto/polymul
MXUBackend), P = 4 primes; no separate kernel key needed.

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

from ..crypto import polymul as pm
from ..crypto.polymul import PRIMES1, _centered, _generator
from ..params import Params

u32 = jnp.uint32
i32 = jnp.int32
i8 = jnp.int8
f32 = jnp.float32


# --------------------------------------------------------------------------- #
# tables
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _v3_tables(N: int):
    """int8 limb tables: fwd [P,2,N,N], inv [P,2,N,N], twiddle [P,2,2N,N].

    Twiddle row r of prime p is (psi^(r(2k+1)) - 1) mod p, centered, in the
    full-matrix slot layout (flat index q*C+s holds frequency k = s*R+q) --
    multiplying the NTT-domain j-sum by row r realizes X^r - 1.
    """
    R, C = pm._split_rc(N)
    q = np.arange(R, dtype=np.int64)[:, None]
    s = np.arange(C, dtype=np.int64)[None, :]
    k_of_flat = (s * R + q).reshape(-1)
    fwd, inv, tw = [], [], []
    for p in PRIMES1:
        fh, fl = pm.full_fwd_tables(N, PRIMES1)[PRIMES1.index(p)]
        ih, il = pm.full_inv_tables(N, PRIMES1)[PRIMES1.index(p)]
        fwd.append(np.stack([fh, fl]))
        inv.append(np.stack([ih, il]))
        g = _generator(p)
        psi = pow(g, (p - 1) // (2 * N), p)
        psi_pows = np.empty(2 * N, np.int64)
        v = 1
        for j in range(2 * N):
            psi_pows[j] = v
            v = v * psi % p
        r = np.arange(2 * N, dtype=np.int64)[:, None]
        e = (r * (2 * k_of_flat[None, :] + 1)) % (2 * N)
        T = (psi_pows[e] - 1) % p
        Tc = np.where(T > p // 2, T - p, T)
        th, tl = pm._limbs_i8(Tc)
        tw.append(np.stack([th.astype(np.int8), tl.astype(np.int8)]))
    return (np.stack(fwd), np.stack(inv), np.stack(tw))


@functools.lru_cache(maxsize=None)
def _crt_consts():
    Eks, alphas, Pm = pm._crt_direct_consts(PRIMES1, 32)
    return Eks, alphas, Pm


# --------------------------------------------------------------------------- #
# in-kernel arithmetic helpers
# --------------------------------------------------------------------------- #


def _coarse(x, p):
    """x - p*round(x/p): within +-3p/2 for any i32 x (f32 q may be off by
    one); exact centered +-p/2 when |x| < 2^24 (f32-exact input, round-tie
    distance 1/(2p) dominates the 2^-24 relative error)."""
    q = jnp.round(x.astype(f32) * np.float32(1.0 / p)).astype(i32)
    return x - q * np.int32(p)


def _fix(r, p):
    """One conditional fix-up pair: +-3p/2 -> exact centered +-p/2."""
    r = r - np.int32(p) * (r > np.int32(p // 2)).astype(i32)
    return r + np.int32(p) * (r < -np.int32(p // 2)).astype(i32)


def _full(x, p):
    """Exact centered residue for any i32 x: coarse to +-3p/2 (< 2^17.2,
    f32-exact, ties at +-p/2 resolve because 1/(2p) beats the f32 error),
    then exact."""
    return _coarse(_coarse(x, p), p)


def _fwd_reduce(zh, zl, p):
    """Raw fwd-matmul limb outputs (|zh|,|zl| <= N*32*128 < 2^22) ->
    exact centered digit NTT.  The second Barrett input reaches 2^23.4
    where a round-tie can slip one quotient step (f32 error ~8e-5 >
    1/(2p) for the small primes), so a fix-up pair pins the result to
    +-p/2 -- the _pointwise accumulation bound requires it."""
    rh = _coarse(zh, p)                    # exact: zh < 2^22, ties resolve
    return _fix(_coarse((rh << 8) + zl, p), p)


def _pointwise(dn, bk_p, p):
    """sum_j dn[:, j, :] * bk_p[j, u, :] with i32 products and chunked
    coarse Barretts; dn exact-centered.  Returns [BG, 2, N] exact-centered.
    """
    half = p // 2 + 1
    chunk = max(1, ((1 << 31) - 1 - 3 * p // 2) // (half * half))
    outs = []
    for u in range(2):
        acc = None
        pending = 0
        for j in range(6):
            t = dn[:, j, :] * bk_p[j, u, :][None, :]
            acc = t if acc is None else acc + t
            pending += 1
            if pending >= chunk and j < 5:
                acc = _coarse(acc, p)      # +-3p/2; next products still fit
                pending = 0
        outs.append(_full(acc, p))
    return outs


# --------------------------------------------------------------------------- #
# kernel
# --------------------------------------------------------------------------- #


def _kernel(p: Params, n_steps, abar_ref, acc0_ref, fwd_ref, inv_ref, tw_ref,
            bk_hbm, out_ref, bk_buf, sems):
    N = p.N
    BG = acc0_ref.shape[0]
    Eks, alphas, Pm = _crt_consts()
    offset = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(p.l))
    offset += 1 << (31 - p.l * p.Bgbit)

    def dma(i, slot):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                     sems.at[slot])

    dma(0, 0).start()
    iota2n = jax.lax.broadcasted_iota(i32, (BG, 2 * N), 1)

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_steps)
        def _():
            dma(i + 1, 1 - slot).start()

        dma(i, slot).wait()
        bk_step = bk_buf[slot]                         # [6, 2, P, N] i32

        # gadget decomposition of acc (not of a rotated diff)
        xp = acc + u32(offset & 0xFFFFFFFF)
        rows = []
        for part in range(2):
            for j in range(p.l):
                sh = 32 - (j + 1) * p.Bgbit
                d = ((xp[:, part, :] >> u32(sh)) & u32(p.Bg - 1)).astype(i32) \
                    - p.Bg // 2
                rows.append(d)
        d8 = jnp.stack(rows, axis=1).astype(i8).reshape(BG * 6, N)

        # one-hot of the per-gate rotation amount (shared by all primes)
        a_i = abar_ref[i, :]                           # [BG]
        oh = (iota2n == a_i[:, None]).astype(i8)       # [BG, 2N]

        ru = jnp.zeros((BG, 2, N), u32)
        mf = jnp.zeros((BG, 2, N), f32)
        for pi, pr in enumerate(PRIMES1):
            def mm(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=i32)

            zh = mm(d8, fwd_ref[pi, 0])
            zl = mm(d8, fwd_ref[pi, 1])
            dn = _fwd_reduce(zh, zl, pr).reshape(BG, 6, N)

            th = mm(oh, tw_ref[pi, 0])
            tl = mm(oh, tw_ref[pi, 1])
            tw = (th << 8) + tl                        # exact row select

            s0, s1 = _pointwise(dn, bk_step[:, :, pi, :], pr)
            # rotation twiddle: s * (psi^r - 1); |s|<=p/2+1, |tw|<=p/2
            sr = jnp.stack([_full(s0 * tw, pr), _full(s1 * tw, pr)], axis=1)

            x = sr.reshape(BG * 2, N)
            x0 = ((x + 128) & 255) - 128
            x1 = ((x - x0) >> 8).astype(i8)
            x0 = x0.astype(i8)
            z11 = mm(x1, inv_ref[pi, 0])
            zmid = mm(x1, inv_ref[pi, 1]) + mm(x0, inv_ref[pi, 0])
            z00 = mm(x0, inv_ref[pi, 1])
            c16 = np.int32(_centered(1 << 16, pr))
            # z11 must be exactly centered before the c16 scale: a tie-slip
            # to 3p/2 would push 3p/2 * p/2 past int32 for the largest prime
            z11r = _fix(_coarse(z11, pr), pr)
            res = _coarse(
                z11r * c16 + (_coarse(zmid, pr) << 8) + z00, pr
            ).reshape(BG, 2, N)                        # +-3p/2: CRT-safe

            ru = ru + res.astype(u32) * u32(Eks[pi])
            mf = mf + res.astype(f32) * np.float32(alphas[pi])

        m = jnp.round(mf).astype(i32).astype(u32)
        return acc + (ru - m * u32(Pm))

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, acc0_ref[...])


@functools.lru_cache(maxsize=None)
def _call(p: Params, G: int, BG: int):
    fwd, inv, tw = _v3_tables(p.N)
    kernel = functools.partial(_kernel, p, p.n)
    P = len(PRIMES1)

    def fixed(shape):
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
            fixed(fwd.shape),
            fixed(inv.shape),
            fixed(tw.shape),
            pl.BlockSpec(memory_space=pl.ANY),         # bk stays in HBM
        ],
        out_specs=pl.BlockSpec((BG, 2, p.N), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, 2, p.N), u32),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * p.l, 2, P, p.N), i32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("IYOKAN_PALLAS_INTERPRET")),
    )


def blind_rotate_pallas3(tlwe0: jnp.ndarray, bk_prep: jnp.ndarray,
                         testv: jnp.ndarray, p: Params,
                         block_g: int = None) -> jnp.ndarray:
    """Drop-in for ops.blind_rotate (lvl1, plain prep1 key layout)."""
    from ..crypto import ops as cops

    if block_g is None:
        block_g = int(os.environ.get("IYOKAN_PALLAS_BG", "256"))
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

    fwd, inv, tw = _v3_tables(p.N)
    out = _call(p, Gp, BG)(
        abar.T, acc0, jnp.asarray(fwd), jnp.asarray(inv), jnp.asarray(tw),
        bk_prep,
    )
    return out[:G]

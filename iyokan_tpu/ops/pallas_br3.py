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
    """Exact centered residue for any i32 x: coarse to +-3p/2, then a
    fix-up pair (int compares, cheaper than a second f32 Barrett)."""
    return _fix(_coarse(x, p), p)


def _relaxed(p: int) -> bool:
    """True when the whole per-prime pipeline tolerates +-3p/2 residues:
    the j-sum of 6 products (3p/2)(p/2) must fit int32, and the sr limb
    split's high limb (3p/2)/256 must fit int8.  Holds for the two small
    primes (12289, 18433); the larger two keep the exact-centered paths."""
    return 6 * (3 * p // 2) * (p // 2) < (1 << 31) - 1 and (
        (3 * p // 2 + 128) >> 8
    ) <= 127


def _fwd_reduce(zh, zl, p):
    """Raw fwd-matmul limb outputs (|zh|,|zl| <= N*32*128 < 2^22) ->
    centered digit NTT.  One Barrett on the recombined value (< 2^30,
    quotient off by at most one -> +-3p/2); relaxed primes stop there,
    the rest pin to +-p/2 with a fix-up pair (their pointwise
    accumulation bound needs exact-centered inputs)."""
    r = _coarse((zh << 8) + zl, p)
    return r if _relaxed(p) else _fix(r, p)


def _pointwise(dn, bk_p, p):
    """sum_j dn[:, j, :] * bk_p[j, u, :] with i32 products and chunked
    coarse Barretts.  dn is +-3p/2 for relaxed primes (all 6 products
    then still fit int32 unchunked), exact-centered otherwise.
    Returns two [BG, N] arrays, +-3p/2 (relaxed) or exact-centered."""
    dmax = 3 * p // 2 if _relaxed(p) else p // 2 + 1
    chunk = max(1, ((1 << 31) - 1 - 3 * p // 2) // (dmax * (p // 2 + 1)))
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
        outs.append(_coarse(acc, p) if _relaxed(p) else _full(acc, p))
    return outs


# --------------------------------------------------------------------------- #
# kernel
# --------------------------------------------------------------------------- #


def _kernel(p: Params, n_steps, M, ablate, abar_ref, acc0_ref, fwd_ref,
            inv_ref, tw_ref, bk_hbm, out_ref, bk_buf, sems):
    """M = 1: plain key (one rotation amount per step); M = 3: the 2-bit
    unrolled key (amounts a1, a2, a1+a2 sharing one decomposition of acc,
    per X^(a1 s1 + a2 s2) = 1 + s1(1-s2)(X^a1-1) + s2(1-s1)(X^a2-1)
    + s1 s2 (X^(a1+a2)-1)); bk rows are grouped [M, 2l] per step."""
    N = p.N
    BG = acc0_ref.shape[0]
    Eks, alphas, Pm = _crt_consts()
    offset = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(p.l))
    offset += 1 << (31 - p.l * p.Bgbit)

    def dma(i, slot):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                     sems.at[slot])

    # tw12-on-VPU: fetch twiddle rows only for a1 and a2 and derive the
    # a1+a2 row as t12 = t1*t2 + t1 + t2 (from X^(a1+a2)-1 =
    # (X^a1-1)(X^a2-1) + (X^a1-1) + (X^a2-1)), trading one third of the
    # one-hot matmul work for ~10 VPU lane-ops per element.
    tw12_vpu = M == 3 and os.environ.get("IYOKAN_BR3_TW12") == "vpu"
    Mt = 2 if tw12_vpu else M

    dma(0, 0).start()
    iota2n = jax.lax.broadcasted_iota(i32, (Mt * BG, 2 * N), 1)

    def body(i, acc):
        slot = jax.lax.rem(i, 2)

        if "dma" not in ablate:
            @pl.when(i + 1 < n_steps)
            def _():
                dma(i + 1, 1 - slot).start()

            dma(i, slot).wait()
        bk_step = bk_buf[slot]                         # [M*6, 2, P, N] i32

        # gadget decomposition of acc (not of a rotated diff)
        if "decompose" in ablate:
            d8 = jnp.broadcast_to(
                acc.astype(i32).astype(i8).reshape(BG * 2, 1, N),
                (BG * 2, p.l, N),
            ).reshape(BG * 2 * p.l, N)
        else:
            xp = acc + u32(offset & 0xFFFFFFFF)
            rows = []
            for part in range(2):
                for j in range(p.l):
                    sh = 32 - (j + 1) * p.Bgbit
                    d = ((xp[:, part, :] >> u32(sh))
                         & u32(p.Bg - 1)).astype(i32) - p.Bg // 2
                    rows.append(d)
            d8 = jnp.stack(rows, axis=1).astype(i8).reshape(BG * 6, N)

        # one-hot of the per-gate rotation amounts (shared by all primes)
        a_i = abar_ref[i, :Mt].reshape(Mt * BG)        # [Mt*BG]
        if "onehot" in ablate:
            oh = (iota2n & 1).astype(i8)
        else:
            oh = (iota2n == a_i[:, None]).astype(i8)   # [Mt*BG, 2N]

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=i32)

        # ---- software pipeline over primes: the VPU front-end of prime
        # pi runs while prime pi-1's inverse matmuls occupy the MXU, and
        # the recombine of pi-1 runs while pi's inverse matmuls issue.
        P = len(PRIMES1)
        # MXU burst: every forward/twiddle matmul up front
        if "fwdmm" in ablate:
            zs = [(d8.astype(i32), d8.astype(i32)) for _ in range(P)]
        else:
            zs = [(mm(d8, fwd_ref[pi, 0]), mm(d8, fwd_ref[pi, 1]))
                  for pi in range(P)]
        if "twmm" in ablate:
            ts = [(oh[:, :N].astype(i32), oh[:, :N].astype(i32))
                  for _ in range(P)]
        else:
            ts = [(mm(oh, tw_ref[pi, 0]), mm(oh, tw_ref[pi, 1]))
                  for pi in range(P)]

        def front(pi):
            """VPU: digit reduce -> j-sum -> rotation twiddle -> limb
            split feeding the inverse matmuls."""
            pr = PRIMES1[pi]
            if "fwdred" in ablate:
                dn = zs[pi][0].reshape(BG, 6, N)
            else:
                dn = _fwd_reduce(*zs[pi], pr).reshape(BG, 6, N)
            twm = ((ts[pi][0] << 8) + ts[pi][1]).reshape(Mt, BG, N)
            red = _coarse if _relaxed(pr) else _full
            if tw12_vpu:
                # t1, t2 are exact-centered table rows (+-p/2): the
                # product fits int32 for every prime; relaxed primes
                # tolerate a +-3p/2 t12 downstream, the rest pin it.
                t12 = red(twm[0] * twm[1] + twm[0] + twm[1], pr)
                tw = [twm[0], twm[1], t12]
            else:
                tw = twm
            if "pointwise" in ablate:
                ss = [(dn[:, 0, :], dn[:, 0, :])] * M
            else:
                ss = [
                    _pointwise(dn, bk_step[6 * m:6 * (m + 1), :, pi, :], pr)
                    for m in range(M)
                ]
            if "twiddle" in ablate:
                sr = jnp.stack([ss[0][0], ss[0][1]], axis=1)
            elif M == 1:
                sr = jnp.stack([red(ss[0][0] * tw[0], pr),
                                red(ss[0][1] * tw[0], pr)], axis=1)
            else:
                # sum the M twiddled j-sums mod p: each coarse term is
                # +-3p/2 so the M-sum fits int32 with room; one final red
                # pins the range the int8 limb split needs.
                su = [sum(_coarse(ss[m][u] * tw[m], pr) for m in range(M))
                      for u in range(2)]
                sr = jnp.stack([red(su[0], pr), red(su[1], pr)], axis=1)
            x = sr.reshape(BG * 2, N)
            x0 = ((x + 128) & 255) - 128
            x1 = ((x - x0) >> 8).astype(i8)
            return x0.astype(i8), x1

        def invmm(pi, x0, x1):
            if "invmm" in ablate:
                return (x1.astype(i32), x1.astype(i32), x0.astype(i32))
            return (mm(x1, inv_ref[pi, 0]),
                    mm(x1, inv_ref[pi, 1]) + mm(x0, inv_ref[pi, 0]),
                    mm(x0, inv_ref[pi, 1]))

        def recombine(pi, z11, zmid, z00, ru, mf):
            pr = PRIMES1[pi]
            if "recombine" in ablate:
                res = z00.reshape(BG, 2, N)[: BG]
                return ru + res.astype(u32), mf
            c16 = np.int32(_centered(1 << 16, pr))
            # z11 must be exactly centered before the c16 scale: a
            # tie-slip to 3p/2 would push 3p/2 * p/2 past int32
            z11r = _fix(_coarse(z11, pr), pr)
            res = _coarse(
                z11r * c16 + (_coarse(zmid, pr) << 8) + z00, pr
            ).reshape(BG, 2, N)                        # +-3p/2: CRT-safe
            ru = ru + res.astype(u32) * u32(Eks[pi])
            mf = mf + res.astype(f32) * np.float32(alphas[pi])
            return ru, mf

        ru = jnp.zeros((BG, 2, N), u32)
        mf = jnp.zeros((BG, 2, N), f32)
        pending = None
        for pi in range(P):
            x0, x1 = front(pi)
            z = invmm(pi, x0, x1)
            if pending is not None:
                ru, mf = recombine(pi - 1, *pending, ru, mf)
            pending = z
        ru, mf = recombine(P - 1, *pending, ru, mf)

        m = jnp.round(mf).astype(i32).astype(u32)
        return acc + (ru - m * u32(Pm))

    out_ref[...] = jax.lax.fori_loop(0, n_steps, body, acc0_ref[...])


@functools.lru_cache(maxsize=None)
def _call(p: Params, G: int, BG: int, n_steps: int, M: int = 1,
          ablate: frozenset = frozenset()):
    fwd, inv, tw = _v3_tables(p.N)
    kernel = functools.partial(_kernel, p, n_steps, M, ablate)
    P = len(PRIMES1)

    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g, _n=nd: (0,) * _n,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(G // BG,),
        in_specs=[
            pl.BlockSpec((n_steps, M, BG), lambda g: (0, 0, g),
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
            pltpu.VMEM((2, M * 2 * p.l, 2, P, p.N), i32),
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
    """Drop-in for ops.blind_rotate (lvl1, prep1 key layout).

    Accepts both the plain key ([n, 2l, 2, P, N], one step per key bit)
    and the 2-bit unrolled key ([ceil(n/2), 3*2l, 2, P, N], one step per
    key-bit pair at 1.5x products -- half the sequential depth).
    """
    from ..crypto import ops as cops

    unrolled = bk_prep.shape[1] == 6 * p.l
    M = 3 if unrolled else 1
    n_steps = bk_prep.shape[0]
    if block_g is None:
        block_g = int(os.environ.get(
            "IYOKAN_PALLAS_BG", "128" if unrolled else "256"))
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

    if unrolled:
        kpad = 2 * n_steps - p.n
        if kpad:
            abar = jnp.concatenate(
                [abar, jnp.zeros((Gp, kpad), abar.dtype)], axis=1
            )
        a1s = abar[:, 0::2]
        a2s = abar[:, 1::2]
        a12s = (a1s + a2s) % (2 * p.N)
        steps = jnp.stack([a1s.T, a2s.T, a12s.T], axis=1)  # [n2, 3, Gp]
    else:
        steps = abar.T[:, None, :]                         # [n, 1, Gp]

    fwd, inv, tw = _v3_tables(p.N)
    ablate = frozenset(
        x for x in os.environ.get("IYOKAN_BR3_ABLATE", "").split(",") if x
    )
    out = _call(p, Gp, BG, n_steps, M, ablate)(
        steps, acc0, jnp.asarray(fwd), jnp.asarray(inv), jnp.asarray(tw),
        bk_prep,
    )
    return out[:G]

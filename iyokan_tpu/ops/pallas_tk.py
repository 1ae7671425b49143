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
128-lane-aligned static windows (no relayouts); products
(|d| <= Bg/2 = 32, |limb| <= 128, contraction N, j-sum 2l = 6) stay inside
int32: 6*1024*32*128 < 2^25.  Limb recombination is u32 shift-adds (exact
mod 2^32); with all 4 key limbs the result is bit-identical to the XLA
blind rotate.  The default keeps the top 3 limbs (2.9 GB key instead of
3.8 GB), adding truncation noise of sigma ~ 2^-10.6 against the 2^-8.8
bootstrap noise (see tests/test_noise_and_params.py).

Key layouts (crypto/polymul.tkey_kernel_key):
  thin [n, 2l, N, 2L*128] -- per step, 2l x N/128 dots [BG,N] x [N,2L*128]
       with an i32 accumulate chain over j.
  fat  [n, 2l*N, 2L*128], contraction rows ordered (block, j, 128) -- the
       digit extension is interleaved at 128-lane granularity so the j-sum
       folds into the contraction: one dot [BG, 2l*N] x [2l*N, 2L*128] per
       output block K (or two complementary-length dots on the +d half
       alone with IYOKAN_TK_DOTS=split, the default: the negacyclic
       wraparound becomes a subtraction, halving the extension build).

The accumulator is carried as two separate [BG, N] arrays (the a and b
TRLWE parts): Mosaic's tpu.concatenate requires all operands at tile
offset {0,0}, which part-slices of a [BG, 2, N] array would violate.

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


def _kernel(p: Params, n_steps, L, fat, split, unroll, fat2, ablate, lb,
            abar_ref, acca_ref, accb_ref, bk_hbm, outa_ref, outb_ref,
            bk_buf, sems):
    N = p.N
    BG = acca_ref.shape[0]
    NB = N // 128
    ls = (p.l, lb)      # per-part digit counts (asymmetric gadget)

    def round_off(ndig):
        o = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(ndig))
        o += 1 << (31 - ndig * p.Bgbit)
        return u32(o & 0xFFFFFFFF)

    offs = (round_off(p.l), round_off(lb))
    # 2-bit unrolled key: one step consumes a key-bit *pair* via three fused
    # external products (X^(a1 s1 + a2 s2) = 1 + s1(1-s2)(X^a1 - 1)
    # + s2(1-s1)(X^a2 - 1) + s1 s2 (X^(a1+a2) - 1)): 3/4 the matmul MACs of
    # two plain steps at half the sequential depth.  Contraction rows per
    # step become (block, m, part, j, 128), matching the bku row order
    # (crypto/host.genevalkey) fed through polymul.tkey_kernel_key.
    M = 3 if unroll else 1
    RR = M * (p.l + lb)

    from ..crypto import ops as cops

    def dma(i, slot):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                     sems.at[slot])

    dma(0, 0).start()

    def body(i, acc):
        a0, a1 = acc                                   # [BG, N] u32 each
        if "dma" in ablate:
            # reuse the step-0 rows every step: exposes the DMA wait cost
            @pl.when(i == 0)
            def _():
                dma(0, 0).wait()

            bk = bk_buf[0]
        else:
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_steps)
            def _():
                dma(i + 1, 1 - slot).start()

            dma(i, slot).wait()
            bk = bk_buf[slot]            # [RR, N, 2L*128] or [RR*N, 2L*128]

        # rotate-first CMUX: diff = X^r * acc - acc (barrel, in VMEM),
        # one (r1, r2, r1+r2) triple per step when unrolled
        xs = []
        for m in range(M):
            r = abar_ref[M * i + m, :]                 # [BG]
            if "rot" in ablate:
                d0, d1 = a0 + a0, a1 + a1
            else:
                d0 = cops.rot_poly(a0, r, N) - a0
                d1 = cops.rot_poly(a1, r, N) - a1
            xs.append((d0 + offs[0], d1 + offs[1]))

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=i32)

        def digit(m, part, j, bb=None):
            """Gadget digit j of TRLWE part `part` of rotation m (lane
            block bb or all), centered, i32."""
            x = xs[m][part]
            if bb is not None:
                x = x[:, 128 * bb:128 * (bb + 1)]
            sh = 32 - (j + 1) * p.Bgbit
            return ((x >> u32(sh)) & u32(p.Bg - 1)).astype(i32) - p.Bg // 2

        # gadget decomposition -> negacyclic digit extension, i8.
        # negate before the i8 cast: Mosaic has no packed-i8 subtraction
        if fat:
            # lanes ordered (block, m, part, j, 128).  With split dots only
            # the +d half is materialized; otherwise blocks 0..NB-1 are +d
            # and NB..2NB-1 are -d.  Every piece is an elementwise function
            # of a 128-aligned lane slice of a 2D array, so all concat
            # operands share tile offset {0,0}.
            nblk = NB if split else 2 * NB
            if "decompose" in ablate:
                ext = jnp.broadcast_to(
                    (xs[0][0][:, :1].astype(i32) & 31).astype(i8),
                    (BG, nblk * RR * 128))
            else:
                pieces = []
                for b in range(nblk):
                    neg = b >= NB
                    bb = b - NB if neg else b
                    for m in range(M):
                        for part in range(2):
                            for j in range(ls[part]):
                                w = digit(m, part, j, bb)
                                pieces.append(-w if neg else w)
                ext = jnp.concatenate(pieces, axis=-1).astype(i8)
        else:
            if "decompose" in ablate:
                d = jnp.broadcast_to(
                    (xs[0][0][:, None, :].astype(i32) & 31), (BG, RR, N))
            else:
                d = jnp.stack([digit(m, part, j)
                               for m in range(M)
                               for part in range(2)
                               for j in range(ls[part])], axis=1)  # [BG,RR,N]
            ext = jnp.concatenate([d, -d], axis=-1).astype(i8)

        grp = RR * 128
        wka, wkb = [], []
        for K in range(NB):
            w0 = 128 * (K + 1)
            if "mm" in ablate:
                s = jnp.broadcast_to(ext[..., :1].reshape(BG, 1).astype(i32),
                                     (BG, 2 * L * 128))
            elif fat and split and fat2:
                # doubled slab (negated copy first): the wraparound sign
                # is baked in, so block K is ONE contiguous-window dot
                cut = grp * (K + 1)
                s = mm(ext, bk[RR * N - cut:2 * RR * N - cut])
            elif fat and split:
                # negacyclic Toeplitz as two complementary-length dots on
                # the +d lanes alone: rows of bk are (block, j, 128), so
                # window K = blocks K+1.. against bk[0..] minus the
                # wrapped blocks 0..K against bk's tail rows.
                cut = grp * (K + 1)
                s = -mm(ext[:, :cut], bk[RR * N - cut:])
                if cut < RR * N:
                    s = s + mm(ext[:, cut:], bk[:RR * N - cut])
            elif fat:
                s = mm(ext[:, grp * (K + 1):grp * (K + 1) + RR * N], bk)
            else:
                s = None
                for j in range(RR):
                    t = mm(ext[:, j, w0:w0 + N], bk[j])  # [BG, 2*L*128]
                    s = t if s is None else s + t
            # limb recombination, exact mod 2^32 (columns are
            # [u, limb, 128] with limb scales 256^(4-L) .. 256^3)
            for u, wk in ((0, wka), (1, wkb)):
                z = jnp.zeros((BG, 128), u32)
                for li in range(L):
                    c0 = (u * L + li) * 128
                    sh = 8 * (4 - L + li)
                    z = z + (s[:, c0:c0 + 128].astype(u32) << u32(sh))
                wk.append(z)
        return (a0 + jnp.concatenate(wka, axis=-1),
                a1 + jnp.concatenate(wkb, axis=-1))

    outa, outb = jax.lax.fori_loop(
        0, n_steps, body, (acca_ref[...], accb_ref[...]))
    outa_ref[...] = outa
    outb_ref[...] = outb


def _kernel_pipe(p: Params, n_steps, L, fat2, ablate, ext8, chains, lb,
                 kmaj, unroll, slots, abar_ref, acca_ref, accb_ref, bk_hbm,
                 outa_ref, outb_ref, bk_buf, sems):
    """Software-pipelined fat+split kernel: C independent gate chains
    (rows [c*BG:(c+1)*BG]) interleaved so one chain's VPU work
    (rotation, decomposition, recombination) overlaps another chain's
    matmuls on the MXU.  Ablations of the serial kernel show its per-step
    stages strictly serialize (dots-only 84 ms + vpu-only 31 ms vs
    165 ms full, PERF.md round 2); the interleave recovers the
    overlap that a single chain's rot -> ext -> dots -> acc data
    dependency forbids.  Same math as _kernel (fat layout, split dots),
    so bit-identical results per chain.

    Modulo schedule (II = 1), window c of step i:
      issue dots[c](i) | recomb + next ext of chain (c-1) mod C
    where chain C-1's dot results cross the iteration boundary in the
    carry and its step-i ext is built in window 0 (before window C-1
    consumes it).

    kmaj ("K-major") reshapes the per-step matmuls for SMALL gate
    batches: output block K's split dot is algebraically the negacyclic
    rotation of the digit extension by cut = 128*RR*(K+1) lanes dotted
    against the plain fat slab --
        s_K = concat(ext[:, cut:], -ext[:, :cut]) . bk
    -- so the NB blocks stack along the matmul M dimension into ONE
    [NB*BG, RR*N] x [RR*N, 2L*128] dot per step: identical MACs and key
    DMA, but 8x the M rows.  At BG <= 16 the default scheme feeds the
    128x128 MXU 8..16-row operands (<= 12% row occupancy); kmaj restores
    a 64..128-row operand, which is what makes routing the task graph's
    small per-level batches to this kernel profitable.  The rotated rows
    are assembled in i32 (8x128 tiles, so BG = 8 sublane concats stay
    tile-aligned) and cast to i8 once.

    unroll consumes a key-bit PAIR per step through the 2-bit unrolled
    key (X^(a1 s1 + a2 s2) = 1 + s1(1-s2)(X^a1 - 1) + s2(1-s1)(X^a2 - 1)
    + s1 s2 (X^(a1+a2) - 1)): three rotate-diff digit extensions per
    step against 3x the key rows (ordered (block, m, part, j, 128)).
    Per KEY BIT that is 3/4 the matmul MACs and 3/4 the VPU work at half
    the sequential depth -- a measured throughput LOSS on the serial
    kernel (232 vs 165 ms/1024 gates, round 2: the extra per-step VPU
    work sits on the critical path there) but a pure MAC cut here,
    where the chains hide the VPU under the MXU."""
    N = p.N
    C = chains
    BG = acca_ref.shape[0] // C
    NB = N // 128
    # asymmetric gadget: the a part keeps all l digits (its decomposition
    # error multiplies the secret), the b part keeps lb (error enters the
    # phase directly) -- see polymul.tkey_kernel_key
    ls = (p.l, lb)
    RR = p.l + lb
    M = 3 if unroll else 1
    RT = M * RR * N                  # contraction rows per step

    def round_off(ndig):
        o = sum((p.Bg // 2) << (32 - (j + 1) * p.Bgbit) for j in range(ndig))
        o += 1 << (31 - ndig * p.Bgbit)
        return u32(o & 0xFFFFFFFF)

    offs = (round_off(p.l), round_off(lb))
    grp = M * RR * 128

    from ..crypto import ops as cops

    def dma(i, slot):
        return pltpu.make_async_copy(bk_hbm.at[i], bk_buf.at[slot],
                                     sems.at[slot])

    # S-deep DMA pipeline (S=2 is classic double buffering).  At small G
    # the step loop is DMA-BOUND (G=32: 17 us/step for a 3.9 MB step slab
    # = ~230 GB/s, a quarter of the chip's HBM bandwidth): keeping S-1
    # copies outstanding lets the memory system overlap latency across
    # steps, which is the task-graph level floor's lever.
    for k in range(slots - 1):
        dma(k, k).start()

    def ext_of(pa, pb, rs):
        """Rotate-diff + gadget decomposition -> interleaved +d digit
        extension [BG, M*RR*N] (lanes ordered (block, m, part, j, 128),
        matching the key rows; rs = M rotation rows).  i8 normally; i32
        under kmaj (the rotated-row assembly negates and concatenates
        in i32 before one final i8 cast)."""
        xs = []
        for m in range(M):
            if "rot" in ablate:
                xs.append((pa + pa + offs[0], pb + pb + offs[1]))
            else:
                xs.append((cops.rot_poly(pa, rs[m], N) - pa + offs[0],
                           cops.rot_poly(pb, rs[m], N) - pb + offs[1]))
        if "decompose" in ablate:
            w = xs[0][0][:, :1].astype(i32) & 31
            return jnp.broadcast_to(w if kmaj else w.astype(i8),
                                    (pa.shape[0], RT))
        pieces = []
        for b in range(NB):
            for m in range(M):
                for part in range(2):
                    xp = xs[m][part][:, 128 * b:128 * (b + 1)]
                    for j in range(ls[part]):
                        sh = 32 - (j + 1) * p.Bgbit
                        w = (((xp >> u32(sh)) & u32(p.Bg - 1)).astype(i32)
                             - p.Bg // 2)
                        # ext8: cast per piece so the concat copies i8,
                        # not i32 (4x less VMEM traffic on the hot path)
                        pieces.append(w.astype(i8) if ext8 and not kmaj
                                      else w)
        out = jnp.concatenate(pieces, axis=-1)
        if kmaj:
            return out
        return out if ext8 else out.astype(i8)

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)

    def dots_raw(ext, bk):
        """The per-step split matmuls (MXU): raw i32 blocks, one per K."""
        if "mm" in ablate:
            return [jnp.broadcast_to(ext[:, :1].astype(i32),
                                     (ext.shape[0], 2 * L * 128))
                    for _ in range(NB)]
        if kmaj:
            # one M-stacked dot: row block K = ext negacyclically
            # rotated left by cut (equals the split two-dot form).
            # A fat2 key's second copy IS the plain slab; use it so
            # both key layouts ride the same math.
            bkp = bk[RT:] if fat2 else bk
            Bl = ext.shape[0]
            if Bl % 32 == 0:
                # i8 assembly: cast (+ the negated copy -- Mosaic has no
                # packed-i8 negation, so negate in i32 first) ONCE, then
                # build the NB rotated row blocks as i8 concats: ~4x less
                # VMEM traffic than assembling in i32 and casting the
                # [NB*BG, RT] matrix.  Needs 32-sublane-aligned blocks
                # (i8 tile is (32, 128)); smaller BG keeps the i32 path.
                pos = ext.astype(i8)
                neg = (-ext).astype(i8)
                rows = []
                for K in range(NB):
                    cut = grp * (K + 1)
                    if cut < RT:
                        rows.append(jnp.concatenate(
                            [pos[:, cut:], neg[:, :cut]], axis=-1))
                    else:
                        rows.append(neg)
                E = jnp.concatenate(rows, axis=0)
            else:
                rows = []
                for K in range(NB):
                    cut = grp * (K + 1)
                    if cut < RT:
                        rows.append(jnp.concatenate(
                            [ext[:, cut:], -ext[:, :cut]], axis=-1))
                    else:
                        rows.append(-ext)
                E = jnp.concatenate(rows, axis=0).astype(i8)
            S = mm(E, bkp)                       # [NB*BG, 2L*128]
            return [S[K * Bl:(K + 1) * Bl] for K in range(NB)]
        ss = []
        for K in range(NB):
            cut = grp * (K + 1)
            if fat2:
                s = mm(ext, bk[RT - cut:2 * RT - cut])
            else:
                s = -mm(ext[:, :cut], bk[RT - cut:])
                if cut < RT:
                    s = s + mm(ext[:, cut:], bk[:RT - cut])
            ss.append(s)
        return ss

    def recomb(ss):
        """Limb recombination (VPU): consumes the dot results."""
        if "recomb" in ablate:
            z = jnp.broadcast_to(ss[0][:, :1].astype(u32),
                                 (ss[0].shape[0], N))
            return z, z
        wka, wkb = [], []
        for s in ss:
            for u, wk in ((0, wka), (1, wkb)):
                z = jnp.zeros((s.shape[0], 128), u32)
                for li in range(L):
                    c0 = (u * L + li) * 128
                    sh = 8 * (4 - L + li)
                    z = z + (s[:, c0:c0 + 128].astype(u32) << u32(sh))
                wk.append(z)
        return jnp.concatenate(wka, axis=-1), jnp.concatenate(wkb, axis=-1)

    def rows_of(c):
        return slice(c * BG, (c + 1) * BG)

    def body(i, carry):
        accs, exts, ss_last = carry
        accs, exts = list(accs), list(exts)
        slot = jax.lax.rem(i, slots)

        @pl.when(i + slots - 1 < n_steps)
        def _():
            nxt = i + slots - 1
            dma(nxt, jax.lax.rem(nxt, slots)).start()

        dma(i, slot).wait()
        bk = bk_buf[slot]
        ss = [None] * C
        for c in range(C):
            ss[c] = dots_raw(exts[c], bk)        # MXU: chain c step i
            prev = (c - 1) % C
            if prev == C - 1:
                # chain C-1's dots of step i-1 (carried); its step-i ext
                # is built here, a window before dots[C-1](i) needs it
                ua, ub = recomb(tuple(ss_last))
                rs = [abar_ref[M * i + m, rows_of(prev)] for m in range(M)]
            else:
                # chain prev's dots were issued one window ago (step i);
                # rows M*n_steps.. of abar are a zero pad so the final
                # iteration's lookahead stays in bounds
                ua, ub = recomb(ss[prev])
                rs = [abar_ref[M * (i + 1) + m, rows_of(prev)]
                      for m in range(M)]
            accs[2 * prev] = accs[2 * prev] + ua
            accs[2 * prev + 1] = accs[2 * prev + 1] + ub
            exts[prev] = ext_of(accs[2 * prev], accs[2 * prev + 1], rs)
        return tuple(accs), tuple(exts), tuple(ss[C - 1])

    accs0 = []
    for c in range(C):
        accs0 += [acca_ref[rows_of(c)], accb_ref[rows_of(c)]]
    exts0 = [
        ext_of(accs0[2 * c], accs0[2 * c + 1],
               [abar_ref[m, rows_of(c)] for m in range(M)])
        if c < C - 1 else
        jnp.zeros((BG, RT), i32 if kmaj else i8)     # built in window 0
        for c in range(C)
    ]
    ss0 = [jnp.zeros((BG, 2 * L * 128), i32) for _ in range(NB)]
    accs, _, ss_last = jax.lax.fori_loop(
        0, n_steps, body, (tuple(accs0), tuple(exts0), tuple(ss0)))
    ua, ub = recomb(tuple(ss_last))              # epilogue: last chain C-1
    accs = list(accs)
    accs[2 * (C - 1)] = accs[2 * (C - 1)] + ua
    accs[2 * (C - 1) + 1] = accs[2 * (C - 1) + 1] + ub
    outa_ref[...] = jnp.concatenate(accs[0::2], axis=0)
    outb_ref[...] = jnp.concatenate(accs[1::2], axis=0)


@functools.lru_cache(maxsize=None)
def _call_pipe(p: Params, G: int, BG: int, n_steps: int, L: int,
               fat2: bool = False, ablate: frozenset = frozenset(),
               ext8: bool = False, chains: int = 2, lb: int = None,
               kmaj: bool = False, unroll: bool = False, slots: int = 2):
    if lb is None:
        lb = p.l
    slots = max(2, min(slots, n_steps))
    kernel = functools.partial(_kernel_pipe, p, n_steps, L, fat2, ablate,
                               ext8, chains, lb, kmaj, unroll, slots)
    M = 3 if unroll else 1
    part_spec = pl.BlockSpec((chains * BG, p.N), lambda g: (g, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G // (chains * BG),),
        in_specs=[
            pl.BlockSpec((M * (n_steps + 1), chains * BG), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            part_spec,
            part_spec,
            pl.BlockSpec(memory_space=pl.ANY),         # bk stays in HBM
        ],
        out_specs=(part_spec, part_spec),
        out_shape=(jax.ShapeDtypeStruct((G, p.N), u32),
                   jax.ShapeDtypeStruct((G, p.N), u32)),
        scratch_shapes=[
            pltpu.VMEM(
                (slots,
                 (2 if fat2 else 1) * M * (p.l + lb) * p.N, 2 * L * 128),
                i8),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=bool(os.environ.get("IYOKAN_PALLAS_INTERPRET")),
    )


def _probe_compile(p: Params, Gp: int, BG: int, n_steps: int, L: int,
                   fat2: bool, ext8: bool, chains: int, lb: int,
                   kmaj: bool, unroll: bool, bk_shape: tuple,
                   slots: int = 2):
    """Compile a pipe-kernel config standalone (abstract inputs, no
    execution).  Mosaic compiles a Pallas kernel deterministically from
    its own module, independent of the surrounding XLA program, so a
    standalone compile success/failure predicts the embedded one.
    Raises on compile failure."""
    import jax

    M = 3 if unroll else 1
    call = _call_pipe(p, Gp, BG, n_steps, L, fat2, frozenset(), ext8,
                      chains, lb, kmaj, unroll, slots)
    rows = jax.ShapeDtypeStruct((M * (n_steps + 1), Gp), jnp.int32)
    acc = jax.ShapeDtypeStruct((Gp, p.N), u32)
    bk = jax.ShapeDtypeStruct(bk_shape, jnp.int8)
    jax.jit(call).lower(rows, acc, acc, bk).compile()


@functools.lru_cache(maxsize=None)
def _pipe_compile_ok(p: Params, Gp: int, BG: int, n_steps: int, L: int,
                     fat2: bool, ext8: bool, chains: int, lb: int,
                     kmaj: bool, unroll: bool, bk_shape: tuple,
                     slots: int = 2) -> bool:
    """Per-shape guard for the pipelined kernel: some shapes crash the
    Mosaic compiler (kmaj at BG=128, SMALLG_r03.log; the plain pipe at
    BG=128 with grid padding, SMALLG_r04.log), and a production engine
    must reroute INSIDE the library rather than via an external watcher
    script.  Cached per shape; a probe costs one standalone kernel
    compile (~6-60 s on device, paid once per shape per process)."""
    try:
        _probe_compile(p, Gp, BG, n_steps, L, fat2, ext8, chains, lb,
                       kmaj, unroll, bk_shape, slots)
        return True
    except Exception as e:  # noqa: BLE001 - any compile failure reroutes
        import warnings

        warnings.warn(
            f"tkey pipe kernel fails to compile at (G={Gp}, BG={BG}, "
            f"chains={chains}, lb={lb}, kmaj={kmaj}, unroll={unroll}, "
            f"slots={slots}): "
            f"{str(e).splitlines()[0][:200]} -- rerouting this shape")
        return False


@functools.lru_cache(maxsize=None)
def _call(p: Params, G: int, BG: int, n_steps: int, L: int, fat: bool,
          split: bool, unroll: bool = False, fat2: bool = False,
          ablate: frozenset = frozenset(), lb: int = None):
    if lb is None:
        lb = p.l
    kernel = functools.partial(_kernel, p, n_steps, L, fat, split, unroll,
                               fat2, ablate, lb)
    M = 3 if unroll else 1
    RR = M * (p.l + lb)
    bk_scratch = ((2, (2 if fat2 else 1) * RR * p.N, 2 * L * 128) if fat
                  else (2, RR, p.N, 2 * L * 128))

    part_spec = pl.BlockSpec((BG, p.N), lambda g: (g, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(G // BG,),
        in_specs=[
            pl.BlockSpec((M * n_steps, BG), lambda g: (0, g),
                         memory_space=pltpu.VMEM),
            part_spec,
            part_spec,
            pl.BlockSpec(memory_space=pl.ANY),         # bk stays in HBM
        ],
        out_specs=(part_spec, part_spec),
        out_shape=(jax.ShapeDtypeStruct((G, p.N), u32),
                   jax.ShapeDtypeStruct((G, p.N), u32)),
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
    [n, l+lb, N, 2*L*128] (thin), [n, (l+lb)*N, 2*L*128] (fat),
    [n, 2*(l+lb)*N, 2*L*128] (fat2, doubled slab), or the 2-bit
    unrolled fat key [ceil(n/2), 3*(l+lb)*N, 2*L*128], all from
    crypto/polymul.tkey_kernel_key (lb = l when symmetric)."""
    from ..crypto import ops as cops

    fat = bk_tk.ndim == 3
    if fat:
        # row count encodes layout + gadget asymmetry: fat = l+lb rows
        # per step (<= 2l), fat2 (doubled slab) = 2(l+lb), 2-bit
        # unrolled = 3(l+lb).  The ranges only collide where
        # 3(l+lb) == 2(l+lb') (e.g. l=3: unroll lb=1 vs fat2 lb=3);
        # fat2 wins and tkey_kernel_key refuses to BUILD the ambiguous
        # unrolled variant.
        rr = bk_tk.shape[1] // p.N
        unroll = fat2 = False
        if 1 <= rr - p.l <= p.l:
            lb = rr - p.l
        elif rr % 2 == 0 and 1 <= rr // 2 - p.l <= p.l:
            fat2, lb = True, rr // 2 - p.l
        elif rr % 3 == 0 and 1 <= rr // 3 - p.l <= p.l:
            unroll, lb = True, rr // 3 - p.l
        else:
            raise ValueError(
                f"cannot infer tkey layout from {rr} rows/step at l={p.l}")
    else:
        rr = bk_tk.shape[1]
        unroll = False
        fat2 = False
        lb = rr - p.l
    L = bk_tk.shape[-1] // 256
    if block_g is None:
        block_g = int(os.environ.get("IYOKAN_PALLAS_BG", "512"))
    G = tlwe0.shape[0]

    ablate = frozenset(
        x for x in os.environ.get("IYOKAN_TK_ABLATE", "").split(",") if x
    )
    split = fat and os.environ.get("IYOKAN_TK_DOTS", "split") == "split"
    pipe_env = os.environ.get("IYOKAN_TK_PIPE", "1")
    chains = int(os.environ.get("IYOKAN_TK_CHAINS", "2"))
    # the pipe kernel's modulo schedule needs >= 2 chains: chain C-1's
    # window-0 extension is a zero placeholder that is only rebuilt in
    # time when another chain leads it -- at C=1 the first window's dots
    # consume the zeros and the output is WRONG (measured: 13/32 and
    # 70/128 bad NANDs, SMALLG_r05.log).  chains=1 routes to the serial
    # kernel instead.
    pipe = (fat and split and chains >= 2
            and (not ablate or pipe_env == "force")
            and pipe_env != "0")
    if pipe:
        # small batches: shrink the block so G still fills `chains`
        # pipeline chains.  BG snaps to a POWER OF TWO (>= 8, the i32
        # sublane tile): the kernel's per-chain row slices sit at offsets
        # c*BG, and Mosaic miscompiles some non-128-multiple offsets
        # (BG=96 at G=192: "dynamic load with unaligned indices",
        # SMALLG_r04.log) while every pow2 block size measures clean.
        base = -(-G // chains)
        bg2 = 8
        while bg2 < base:
            bg2 *= 2
        BG = min(block_g, bg2)
        pad = (-G) % (chains * BG)
    else:
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
    acc_a = jnp.zeros((Gp, p.N), u32)

    n_steps = bk_tk.shape[0]
    if unroll:
        # rotation rows per pair step: (a1, a2, a1+a2), zero-padded odd n
        apad = (-p.n) % (2 * n_steps)
        if apad:
            abar = jnp.concatenate(
                [abar, jnp.zeros((Gp, apad), abar.dtype)], axis=1
            )
        a1 = abar[:, 0::2].T                            # [nh, Gp]
        a2 = abar[:, 1::2].T
        a12 = (a1 + a2) & (2 * p.N - 1)
        rows = jnp.stack([a1, a2, a12], axis=1).reshape(3 * n_steps, Gp)
    else:
        rows = abar.T

    # C-chain software-pipelined kernel (VPU work of one chain hides
    # under another chain's matmuls); ablations run on the serial kernel
    # unless IYOKAN_TK_PIPE=force.
    if pipe and Gp % (chains * BG) == 0:
        # one step's worth of zero pad rows for the final iteration's
        # lookahead (M = 3 rotation rows per step when unrolled)
        M = 3 if unroll else 1
        rows = jnp.concatenate(
            [rows, jnp.zeros((M, Gp), rows.dtype)], axis=0)
        ext8 = os.environ.get("IYOKAN_TK_EXT8", "0") == "1"
        # K-major for small blocks: the 8 output-block dots stack along
        # M (identical MACs/DMA), filling the MXU's 128 rows
        kmaj_env = os.environ.get("IYOKAN_TK_KMAJ", "auto")
        kmaj = BG < 128 if kmaj_env == "auto" else kmaj_env == "1"
        # Candidate ladder: the preferred (BG, kmaj), its no-kmaj twin,
        # then halved block sizes (grid splits; smaller pow2 blocks are
        # the shapes that measure clean) -- Mosaic crashes on some
        # configs (kmaj at BG>=128, plain pipe at BG=128 under grid
        # padding), so each candidate is compile-probed (cached) and the
        # first good one runs; the serial kernel is the final fallback.
        cands = [(BG, kmaj)]
        if kmaj:
            cands.append((BG, False))
        bg_c = BG // 2
        while bg_c >= 8:
            cands.append((bg_c, bg_c < 128 if kmaj_env == "auto"
                          else kmaj_env == "1"))
            bg_c //= 2
        # DMA pipeline depth: small (latency-bound) batches default to a
        # deeper pipeline -- the step loop is DMA-bound there and extra
        # outstanding copies recover HBM bandwidth; large batches keep
        # classic double buffering (DMA already fully hidden, round-2
        # dma-ablation) and the VMEM for wide accumulators.
        slots_env = os.environ.get("IYOKAN_TK_SLOTS", "auto")
        if slots_env == "auto":
            slots = 4 if Gp <= 256 else 2
        else:
            slots = max(2, int(slots_env))
        pc_env = os.environ.get("IYOKAN_TK_PRECHECK")
        precheck = pc_env != "0" and (
            pc_env == "1" or not os.environ.get("IYOKAN_PALLAS_INTERPRET"))
        # a deeper DMA pipeline is schedule-only, but if slots > 2 itself
        # upsets Mosaic on some shape, fall back to classic double
        # buffering before giving up on the pipe kernel entirely
        slot_cands = [slots] + ([2] if slots != 2 else [])
        for s_c in slot_cands:
            for bg_c, km_c in cands:
                if precheck and not _pipe_compile_ok(
                        p, Gp, bg_c, n_steps, L, fat2, ext8, chains, lb,
                        km_c, unroll, bk_tk.shape, s_c):
                    continue
                outa, outb = _call_pipe(
                    p, Gp, bg_c, n_steps, L, fat2, ablate, ext8, chains,
                    lb, km_c, unroll, s_c)(rows, acc_a, acc_b, bk_tk)
                return jnp.stack([outa, outb], axis=1)[:G]
        rows = rows[:M * n_steps]                   # serial takes no pad
    BG = min(block_g, max(8, Gp))
    while Gp % BG:                   # serial grid needs BG to divide Gp
        BG //= 2
    outa, outb = _call(p, Gp, BG, n_steps, L, fat, split, unroll,
                       fat2, ablate, lb)(rows, acc_a, acc_b, bk_tk)
    return jnp.stack([outa, outb], axis=1)[:G]

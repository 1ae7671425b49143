"""Stage microbenchmarks for the blind-rotation hot path on TPU.

Each case times a jitted fori_loop of ITERS applications with the output fed
back into the input (prevents loop-invariant hoisting), then divides by ITERS.
The axon tunnel's block_until_ready is a no-op; np.asarray forces execution.

Usage: python tools/microbench.py [case ...]   (default: all)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("BENCH_G", "1024")

import jax
import jax.numpy as jnp

from iyokan_tpu import params as params_mod
from iyokan_tpu.crypto import ops, polymul
from iyokan_tpu.crypto.polymul import PRIMES1, center_reduce, tables

P = params_mod.by_name("cggi128")
G = int(os.environ.get("BENCH_G", "1024"))
ITERS = int(os.environ.get("BENCH_ITERS", "50"))
u32, i32, i8 = jnp.uint32, jnp.int32, jnp.int8


def timeit(name, fn, *args, iters=None):
    iters = iters or ITERS
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm up + compile
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e6:10.1f} us/iter   ({dt*1e3*635:8.1f} ms/635)")
    return dt


def chain(op, x0):
    """jit a fori_loop of op with carry feedback; returns a tiny scalar so
    the forcing transfer through the axon tunnel is not part of the timing."""
    @jax.jit
    def run(x):
        out = jax.lax.fori_loop(0, ITERS, lambda i, x: op(x), x)
        return sum(jnp.sum(l[..., :1].astype(jnp.int32))
                   for l in jax.tree_util.tree_leaves(out))
    return lambda: run(x0)


def mm_int8_case():
    """Pure int8 MXU throughput at fwd-NTT shape: [6G,N]@[N,N]."""
    a = jnp.ones((6 * G, P.N), i8)
    b = jnp.ones((P.N, P.N), i8)

    def op(a):
        z = jnp.einsum("gk,km->gm", a, b, preferred_element_type=i32)
        return (z & 127).astype(i8)

    dt = timeit("mm_int8 [6G,N]@[N,N]", chain(op, a))
    macs = 6 * G * P.N * P.N
    print(f"    -> {macs/dt/1e12:.1f} TOPS")


def mm_int8_pallas_case():
    """Same matmul inside a Pallas kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M = 6 * G

    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = (jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=i32) & 127).astype(i8)

    BM = 512
    call = pl.pallas_call(
        kern,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, P.N), lambda g: (g, 0)),
                  pl.BlockSpec((P.N, P.N), lambda g: (0, 0))],
        out_specs=pl.BlockSpec((BM, P.N), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((M, P.N), i8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    a = jnp.ones((M, P.N), i8)
    b = jnp.ones((P.N, P.N), i8)
    dt = timeit("mm_int8 pallas", chain(lambda x: call(x, b), a))
    macs = M * P.N * P.N
    print(f"    -> {macs/dt/1e12:.1f} TOPS")


def vpu_case():
    """Elementwise i32 chain on [G,2,N]: 10 mult+add ops."""
    x = jnp.ones((G, 2, P.N), i32)

    def op(x):
        for _ in range(5):
            x = x * np.int32(3) + np.int32(1)
        return x & np.int32(0xFFFF)

    dt = timeit("vpu 11 i32 ops [G,2,N]", chain(op, x))
    ops_n = 11 * G * 2 * P.N
    print(f"    -> {ops_n/dt/1e12:.2f} Tops/s")


def barrett_case():
    x = jnp.full((G, 2, P.N), 12345, i32)
    p = PRIMES1[3]

    def op(x):
        return center_reduce(x + 1, p)

    dt = timeit("center_reduce [G,2,N]", chain(op, x))
    print(f"    -> {G*2*P.N/dt/1e9:.1f} Gelem/s")


def rot_case():
    acc = jnp.ones((G, 2, P.N), u32)
    r = jnp.arange(G, dtype=i32) % (2 * P.N)

    def op(acc):
        return ops.rot_poly(acc, r[:, None], P.N) + u32(1)

    dt = timeit("rot_poly [G,2,N]", chain(op, acc))


def decomp_case():
    x = jnp.ones((G, 2, P.N), u32)

    def op(x):
        d = ops.decompose1(x, P)
        return x + d[:, :2, :].astype(u32)

    timeit("decompose1 [G,2,N]", chain(op, x))


def fwd_case():
    d = jnp.ones((G, 6, P.N), i32)
    tabs = tables(P.N, PRIMES1)

    def op(d):
        outs = [polymul.fwd_digits(d, P.N, PRIMES1, pi, tab)
                for pi, tab in enumerate(tabs)]
        return outs[0] + outs[1] + outs[2] + outs[3]

    timeit("fwd_digits x4 primes", chain(op, d))


def pointwise_case():
    tabs = tables(P.N, PRIMES1)
    dn = [jnp.ones((G, 6, P.N), i32) for _ in PRIMES1]
    g = jnp.ones((6, 2, len(PRIMES1), P.N), i32)

    @jax.jit
    def run(dn):
        def op(i, dn):
            res = []
            for pi, tab in enumerate(tabs):
                prod = dn[pi][..., :, None, :] * g[:, :, pi, :]
                chunk = polymul._pointwise_chunk(tab.p)
                s = None
                for j0 in range(0, 6, chunk):
                    part = prod[..., j0:j0 + chunk, :, :].sum(
                        axis=-3, dtype=i32)
                    s = part if s is None else s + part
                    s = center_reduce(s, tab.p)
                res.append(s)
            # fold back into carry shape (xor prevents cancellation)
            return [jnp.bitwise_xor(d, r[:, :1, :])
                    for d, r in zip(dn, res)]
        out = jax.lax.fori_loop(0, ITERS, op, dn)
        return sum(jnp.sum(o[..., :1]) for o in out)

    timeit("pointwise jsum x4", lambda: run(dn))


def inv_case():
    tabs = tables(P.N, PRIMES1)
    s = [jnp.ones((G, 2, P.N), i32) for _ in PRIMES1]

    @jax.jit
    def run(s):
        def op(i, s):
            outs = [polymul._inv_dispatch(s[pi], P.N, PRIMES1, pi, tab)
                    for pi, tab in enumerate(tabs)]
            return [center_reduce(o + 1, tab.p)
                    for o, tab in zip(outs, tabs)]
        out = jax.lax.fori_loop(0, ITERS, op, s)
        return sum(jnp.sum(o[..., :1]) for o in out)

    timeit("inv ntt x4 primes", lambda: run(s))


def crt_case():
    res = [jnp.ones((G, 2, P.N), i32) for _ in PRIMES1]

    @jax.jit
    def run(res):
        def op(i, res):
            c = polymul.crt_mod32(res, PRIMES1)
            return [jnp.bitwise_xor(r, c.astype(i32)) & 0xFFFF for r in res]
        out = jax.lax.fori_loop(0, ITERS, op, res)
        return sum(jnp.sum(o[..., :1]) for o in out)

    timeit("crt_mod32 x4", lambda: run(res))


def step_case():
    """Marginal cost of one full CMUX step (diff between n-step loops)."""
    from iyokan_tpu.crypto import host
    sk = host.keygen(P, seed=0)
    ek = host.genevalkey(sk, seed=1, with_cb=False)
    keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
    tlwe = jnp.ones((G, P.n + 1), u32)
    testv = jnp.full((P.N,), u32(P.mu))

    def run_n(nsteps):
        bk = keys.bkntt[:nsteps]
        pp = params_mod.Params(**{**P.__dict__, "n": nsteps})

        @jax.jit
        def f(tl, bk):
            return ops.blind_rotate(tl[:, : nsteps + 1].at[:, nsteps].set(
                tl[:, P.n]), bk, testv, pp)
        out = f(tlwe, bk)
        np.asarray(out)
        t0 = time.time()
        np.asarray(f(tlwe, bk))
        return time.time() - t0

    t_a, t_b = run_n(32), run_n(160)
    per = (t_b - t_a) / 128
    print(f"{'blind_rotate marginal step':34s} {per*1e6:10.1f} us/step   "
          f"({per*635*1e3:8.1f} ms/635)")


CASES = {
    "mm": mm_int8_case, "mmp": mm_int8_pallas_case, "vpu": vpu_case,
    "barrett": barrett_case, "rot": rot_case, "decomp": decomp_case,
    "fwd": fwd_case, "pw": pointwise_case, "inv": inv_case,
    "crt": crt_case, "step": step_case,
}



# --------------------------------------------------------------------- #
# In-kernel (VMEM-resident) rates: the true budget for fused kernels.
# Each kernel loops INNER times over VMEM data inside one pallas_call.
# --------------------------------------------------------------------- #
INNER = int(os.environ.get("BENCH_INNER", "200"))


def _pallas_loop_case(name, body, x0, ops_per_elem_iter, extra=()):
    """Times body() on VMEM-resident data; reports the marginal per-iter cost
    (difference between a 4*INNER and an INNER loop, immune to dispatch and
    transfer overheads).  extra: additional VMEM operands passed to body."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def make(inner):
        def kern(x_ref, *rest):
            e_refs, o_ref = rest[:-1], rest[-1]
            es = [e[...] for e in e_refs]

            def it(i, x):
                return body(x, *es)
            o_ref[...] = jax.lax.fori_loop(0, inner, it, x_ref[...])

        call = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x0.shape, x0.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def run(x):
            return jnp.sum(call(x, *extra)[..., :1].astype(i32))
        return run

    r1, r4 = make(INNER), make(4 * INNER)
    np.asarray(r1(x0)); np.asarray(r4(x0))
    d1s, d4s = [], []
    for _ in range(3):
        t0 = time.time(); np.asarray(r1(x0)); d1s.append(time.time() - t0)
        t0 = time.time(); np.asarray(r4(x0)); d4s.append(time.time() - t0)
    dt = (min(d4s) - min(d1s)) / (3 * INNER)
    n = x0.size * ops_per_elem_iter
    print(f"{name:34s} {dt*1e6:10.1f} us/inner   "
          f"{n/dt/1e12:8.2f} Tops/s")
    return dt


def pk_vpu_case():
    """i32 mult+add chain on VMEM [512, 8, 1024] (=4M elems), 10 ops."""
    x = jnp.ones((512, 8, 1024), i32)
    def body(x):
        for _ in range(5):
            x = x * np.int32(3) + np.int32(1)
        return x & np.int32(0xFFFFF)
    _pallas_loop_case("pk_vpu 11 i32 ops", body, x, 11)


def pk_f32_case():
    """f32 mult+add chain (VPU native width)."""
    x = jnp.ones((512, 8, 1024), jnp.float32)
    def body(x):
        for _ in range(5):
            x = x * np.float32(1.0001) + np.float32(0.5)
        return jnp.minimum(x, np.float32(1e6))
    _pallas_loop_case("pk_f32 11 ops", body, x, 11)


def pk_barrett_case():
    """fixup-free Barrett (f32 round trick) on VMEM i32 [512,8,1024]."""
    p = PRIMES1[3]
    x = jnp.full((512, 8, 1024), 1 << 21, i32)
    def body(x):
        q = jnp.round(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(i32)
        r = x - q * np.int32(p)
        return r + np.int32(1 << 21)
    _pallas_loop_case("pk_barrett(nofix)+add", body, x, 7)


def pk_roll_case():
    """pltpu.roll + masked negate (one barrel-shift round) on u32 [512,2,1024]."""
    from jax.experimental.pallas import tpu as pltpu
    x = jnp.ones((512, 2, 1024), u32)
    N = 1024
    mask = jnp.asarray((np.arange(N) < 128)[None, None, :].astype(np.uint32))
    def body(x, m):
        r = pltpu.roll(x, 128, 2)
        r = r + m * (u32(0) - 2 * r)
        return r + u32(1)
    _pallas_loop_case("pk_roll+negmask+add", body, x, 5, extra=(mask,))


def pk_i16_case():
    """i16 mult chain (wrap mod 2^16)."""
    x = jnp.ones((512, 8, 1024), jnp.int16)
    def body(x):
        for _ in range(5):
            x = x * jnp.int16(12289) + jnp.int16(1)
        return x
    _pallas_loop_case("pk_i16 10 mult/add", body, x, 10)


def pk_i32var_case():
    """i32 variable*variable mult chain."""
    x = jnp.ones((512, 8, 1024), i32)
    y = jnp.full((512, 8, 1024), 3, i32)
    def body(x, y):
        for _ in range(5):
            x = (x * y + np.int32(1)) & np.int32(0xFFFFF)
        return x
    _pallas_loop_case("pk_i32 5 var-mult", body, x, 10, extra=(y,))


def pk_conv_case():
    """i32<->f32 convert + f32 mult + round chain (fix-free Barrett core)."""
    p = float(PRIMES1[3])
    x = jnp.full((512, 8, 1024), 1 << 21, i32)
    def body(x):
        q = jnp.round(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(i32)
        return x - q + np.int32(7)
    _pallas_loop_case("pk_conv f32Barrett-no-mult", body, x, 6)


def pk_select_case():
    """compare+select chain (rotation ingredient)."""
    x = jnp.ones((512, 8, 1024), u32)
    def body(x):
        for _ in range(5):
            x = jnp.where(x > u32(5), x + u32(1), x)
        return x
    _pallas_loop_case("pk_where 5 rounds", body, x, 10)


def pk_mm_case():
    """int8 matmul in-kernel, operands resident: [3072,1024]@[1024,1024]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    M = 3072
    a0 = jnp.ones((M, 1024), i8)
    b0 = jnp.ones((1024, 1024), i8)

    def kern(a_ref, b_ref, o_ref):
        def it(i, a):
            z = jax.lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                                    preferred_element_type=i32)
            return (z & 127).astype(i8)
        o_ref[...] = jax.lax.fori_loop(0, INNER, it, a_ref[...])

    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, 1024), i8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run(a):
        return jnp.sum(call(a, b0)[..., :1].astype(i32))

    run(a0); np.asarray(run(a0))
    t0 = time.time()
    np.asarray(run(a0))
    dt = (time.time() - t0 - 0.029) / INNER
    macs = M * 1024 * 1024
    print(f"{'pk_mm int8 [3072,1024]@[1024,1024]':34s} {dt*1e6:10.1f} us/inner"
          f"   {macs/dt/1e12:8.1f} TOPS")


def pk_smallk_case():
    """K=8 contraction [8,8]@[8, 3072*128] styled as q-stage matmul."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    Y = 3072 * 128
    a0 = jnp.ones((8, Y // 128, 128), i8)
    w0 = jnp.ones((8, 8), i8)

    def kern(a_ref, w_ref, o_ref):
        def it(i, a):
            z = jax.lax.dot_general(
                w_ref[...], a.reshape(8, Y),
                (((1,), (0,)), ((), ())), preferred_element_type=i32)
            return (z & 63).astype(i8).reshape(8, Y // 128, 128)
        o_ref[...] = jax.lax.fori_loop(0, INNER, it, a_ref[...])

    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Y // 128, 128), i8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run(a):
        return jnp.sum(call(a, w0)[..., :1].astype(i32))

    run(a0); np.asarray(run(a0))
    t0 = time.time()
    np.asarray(run(a0))
    dt = (time.time() - t0 - 0.029) / INNER
    macs = 8 * 8 * Y
    print(f"{'pk_smallk [8,8]@[8,384K]':34s} {dt*1e6:10.1f} us/inner"
          f"   {macs/dt/1e12:8.2f} TOPS (K=8)")


def pk_bdot_case():
    """q-batched K=128 dot: [8, 768, 128] x [8, 128, 128] (twist2 stage)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    a0 = jnp.ones((8, 768, 128), i8)
    w0 = jnp.ones((8, 128, 128), i8)

    def kern(a_ref, w_ref, o_ref):
        def it(i, a):
            z = jax.lax.dot_general(
                a, w_ref[...],
                (((2,), (1,)), ((0,), (0,))), preferred_element_type=i32)
            return (z & 63).astype(i8)
        o_ref[...] = jax.lax.fori_loop(0, INNER, it, a_ref[...])

    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 768, 128), i8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run(a):
        return jnp.sum(call(a, w0)[..., :1].astype(i32))

    run(a0); np.asarray(run(a0))
    t0 = time.time()
    np.asarray(run(a0))
    dt = (time.time() - t0 - 0.029) / INNER
    macs = 8 * 768 * 128 * 128
    print(f"{'pk_bdot [8,768,128]x[8,128,128]':34s} {dt*1e6:10.1f} us/inner"
          f"   {macs/dt/1e12:8.2f} TOPS (batched)")


def tkey_step_case():
    """One Toeplitz-slab blind-rotate step (XLA form): the whole external
    product as 48*L [BG,1024]x[1024,128] int8 matmuls against per-(j,u,limb)
    key slabs (K-blocks share the slab), plus decompose, digit extension,
    j-sum, limb combine and accumulator update.  Target: <= ~250 us/step
    at BG=1024 for 10k bootstraps/s over 635 steps."""
    L = int(os.environ.get("BENCH_TKEY_L", "3"))
    BG = G
    N = P.N
    slabs = jnp.ones((6, 2, L, N, 128), i8)
    acc0 = jnp.ones((BG, 2, N), u32)
    offset = sum((P.Bg // 2) << (32 - (j + 1) * P.Bgbit) for j in range(P.l))
    offset += 1 << (31 - P.l * P.Bgbit)

    def op(acc):
        # decompose -> ext [BG, 6, 2N]
        xp = acc + u32(offset & 0xFFFFFFFF)
        rows = []
        for part in range(2):
            for j in range(P.l):
                sh = 32 - (j + 1) * P.Bgbit
                d = ((xp[:, part, :] >> u32(sh))
                     & u32(P.Bg - 1)).astype(i32) - P.Bg // 2
                rows.append(d.astype(i8))
        d8 = jnp.stack(rows, axis=1)                      # [BG, 6, N]
        ext = jnp.concatenate([d8, -d8], axis=-1)         # [BG, 6, 2N]

        outs = []
        for u in range(2):
            zl = []
            for li in range(L):
                ks = []
                for K in range(8):
                    w = 128 * (K + 1)
                    s = None
                    for j in range(6):
                        t = jax.lax.dot_general(
                            ext[:, j, w:w + N], slabs[j, u, li],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=i32)
                        s = t if s is None else s + t
                    ks.append(s)
                zl.append(jnp.concatenate(ks, axis=-1))   # [BG, N]
            z = zl[0].astype(u32)
            for li in range(1, L):
                z = z + (zl[li].astype(u32) << u32(8 * li))
            outs.append(z)
        w = jnp.stack(outs, axis=1)                       # [BG, 2, N]
        return acc + w

    dt = timeit(f"tkey step L={L} BG={BG}", chain(op, acc0))
    macs = 48 * L * BG * P.N * 128
    print(f"    -> {macs/dt/1e12:.1f} TOPS   "
          f"(635 steps = {dt*635*1e3:.1f} ms -> "
          f"{BG/(dt*635):.0f} gates/s)")


def tkey_step_rot_case():
    """tkey step + the per-gate barrel rotation (rotate-first CMUX)."""
    os.environ.setdefault("BENCH_TKEY_L", "3")
    L = int(os.environ["BENCH_TKEY_L"])
    BG = G
    N = P.N
    slabs = jnp.ones((6, 2, L, N, 128), i8)
    acc0 = jnp.ones((BG, 2, N), u32)
    r = jnp.arange(BG, dtype=i32) % (2 * N)
    offset = sum((P.Bg // 2) << (32 - (j + 1) * P.Bgbit) for j in range(P.l))
    offset += 1 << (31 - P.l * P.Bgbit)

    def op(acc):
        diff = ops.rot_poly(acc, r[:, None], N) - acc
        xp = diff + u32(offset & 0xFFFFFFFF)
        rows = []
        for part in range(2):
            for j in range(P.l):
                sh = 32 - (j + 1) * P.Bgbit
                d = ((xp[:, part, :] >> u32(sh))
                     & u32(P.Bg - 1)).astype(i32) - P.Bg // 2
                rows.append(d.astype(i8))
        d8 = jnp.stack(rows, axis=1)
        ext = jnp.concatenate([d8, -d8], axis=-1)
        outs = []
        for u in range(2):
            zl = []
            for li in range(L):
                ks = []
                for K in range(8):
                    w = 128 * (K + 1)
                    s = None
                    for j in range(6):
                        t = jax.lax.dot_general(
                            ext[:, j, w:w + N], slabs[j, u, li],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=i32)
                        s = t if s is None else s + t
                    ks.append(s)
                zl.append(jnp.concatenate(ks, axis=-1))
            z = zl[0].astype(u32)
            for li in range(1, L):
                z = z + (zl[li].astype(u32) << u32(8 * li))
            outs.append(z)
        w = jnp.stack(outs, axis=1)
        return acc + w

    dt = timeit(f"tkey step+rot L={L} BG={BG}", chain(op, acc0))
    print(f"    -> 635 steps = {dt*635*1e3:.1f} ms -> "
          f"{BG/(dt*635):.0f} gates/s")


def h2d_case():
    """Host->device transfer rate (sized for the 2.9 GB tkey key)."""
    a = np.ones((256, 1024, 1024), np.int8)               # 256 MB
    t0 = time.time()
    x = jnp.asarray(a)
    np.asarray(x[0, 0, :1])
    dt = time.time() - t0
    print(f"{'h2d 256MB':34s} {dt*1e3:10.1f} ms        "
          f"({0.25/dt:.2f} GB/s; 2.9GB key ~ {2.9/ (0.25/dt):.0f} s)")


CASES.update({
    "pk_vpu": pk_vpu_case, "pk_f32": pk_f32_case,
    "pk_barrett": pk_barrett_case, "pk_roll": pk_roll_case,
    "pk_mm": pk_mm_case, "pk_smallk": pk_smallk_case,
    "pk_bdot": pk_bdot_case, "pk_i16": pk_i16_case,
    "pk_i32var": pk_i32var_case, "pk_conv": pk_conv_case,
    "pk_select": pk_select_case,
    "tkey_step": tkey_step_case, "tkey_step_rot": tkey_step_rot_case,
    "h2d": h2d_case,
})


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print(f"# G={G} iters={ITERS} backend={jax.default_backend()}")
    for n in names:
        CASES[n]()

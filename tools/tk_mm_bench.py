#!/usr/bin/env python
"""Isolated Mosaic dot-core benchmark for the tkey kernel step.

Variant A (fat): per step 8 dots [BG, 6144] x [6144, 768]  (j folded into
  the contraction via 128-lane interleave).
Variant B (thin): per step 48 dots [BG, 1024] x [1024, 768] with per-j
  slices + i32 accumulate chain (the current pallas_tk core).

Both loop STEPS times inside one kernel with the RHS resident in VMEM
(no DMA), isolating pure MXU + slicing/accumulate cost.

Usage: python tools/tk_mm_bench.py [BG] [STEPS] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i8, i32, u32 = jnp.int8, jnp.int32, jnp.uint32
    BG = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    N = 1024

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)

    def kern_fat(x_ref, rhs_ref, o_ref):
        def body(i, acc):
            ws = []
            for K in range(8):
                s = mm(acc[:, 768 * K : 768 * K + 6144], rhs_ref[...])
                ws.append((s[:, :128] + s[:, 128:256]) & 31)
            upd = jnp.concatenate(ws * 12, axis=-1)    # [BG, 12288] i32
            return upd.astype(i8)
        o_ref[...] = jax.lax.fori_loop(0, STEPS, body, x_ref[...])

    def kern_thin(x_ref, rhs_ref, o_ref):
        def body(i, acc):
            ws = []
            for K in range(8):
                w0 = 128 * (K + 1)
                s = None
                for j in range(6):
                    t = mm(acc[:, j, w0 : w0 + N], rhs_ref[...])
                    s = t if s is None else s + t
                ws.append((s[:, :128] + s[:, 128:256]) & 31)
            upd = jnp.concatenate(ws * 2, axis=-1)[:, None, :]
            return jnp.broadcast_to(upd, acc.shape).astype(i8)
        o_ref[...] = jax.lax.fori_loop(0, STEPS, body, x_ref[...])

    def kern_pure(x_ref, rhs_ref, o_ref):
        """Pure-dot ceiling: 8 fat dots/step accumulated into i32; the
        loop-carried dependency is one 128-lane splice of acc into the
        LHS (cheap), so XLA cannot hoist the dots."""
        def body(i, carry):
            lhs, acc = carry
            s = None
            for K in range(8):
                t = mm(lhs[:, 768 * K : 768 * K + 6144], rhs_ref[...])
                s = t if s is None else s + t
            acc = acc + s
            lhs = jnp.concatenate(
                [acc[:, :128].astype(i8), lhs[:, 128:]], axis=-1)
            return lhs, acc
        lhs0 = x_ref[...]
        acc0 = jnp.zeros((lhs0.shape[0], 768), i32)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (lhs0, acc0))
        o_ref[...] = acc

    def kern_puret(x_ref, rhs_ref, o_ref):
        """Like pure, but RHS stored transposed [768, 6144] and contracted
        minor-minor (dims ((1,),(1,)))."""
        def mmt(a, b):
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=i32)
        def body(i, carry):
            lhs, acc = carry
            s = None
            for K in range(8):
                t = mmt(lhs[:, 768 * K : 768 * K + 6144], rhs_ref[...])
                s = t if s is None else s + t
            acc = acc + s
            lhs = jnp.concatenate(
                [acc[:, :128].astype(i8), lhs[:, 128:]], axis=-1)
            return lhs, acc
        lhs0 = x_ref[...]
        acc0 = jnp.zeros((lhs0.shape[0], 768), i32)
        _, acc = jax.lax.fori_loop(0, STEPS, body, (lhs0, acc0))
        o_ref[...] = acc

    cases = []
    if "puret" in sys.argv:
        x = jnp.ones((BG, 12288), i8)
        rhs = jnp.ones((768, 6144), i8)
        call = pl.pallas_call(
            kern_puret,
            out_shape=jax.ShapeDtypeStruct((BG, 768), i32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        cases.append(("puret 8x[BG,6144]x[768,6144]T", call, x, rhs,
                      8 * BG * 6144 * 768))
    if "pure" in sys.argv:
        x = jnp.ones((BG, 12288), i8)
        rhs = jnp.ones((6144, 768), i8)
        call = pl.pallas_call(
            kern_pure,
            out_shape=jax.ShapeDtypeStruct((BG, 768), i32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        cases.append(("pure 8x[BG,6144]x[6144,768]", call, x, rhs,
                      8 * BG * 6144 * 768))
    if "fat" in sys.argv or len(sys.argv) < 5:
        x = jnp.ones((BG, 12288), i8)
        rhs = jnp.ones((6144, 768), i8)
        call = pl.pallas_call(
            kern_fat,
            out_shape=jax.ShapeDtypeStruct((BG, 12288), i8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        cases.append(("fat  8x[BG,6144]x[6144,768]", call, x, rhs,
                      8 * BG * 6144 * 768))
    if "thin" in sys.argv or len(sys.argv) < 5:
        x = jnp.ones((BG, 6, 2048), i8)
        rhs = jnp.ones((N, 768), i8)
        call = pl.pallas_call(
            kern_thin,
            out_shape=jax.ShapeDtypeStruct((BG, 6, 2048), i8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        cases.append(("thin 48x[BG,1024]x[1024,768]", call, x, rhs,
                      48 * BG * N * 768))

    for name, call, x, rhs, macs in cases:
        t0 = time.time()
        out = call(x, rhs)
        _ = np.asarray(out[0, 0])
        print(f"# {name} compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for _ in range(reps):
            out = call(x, rhs)
        _ = np.asarray(out[0, 0])
        dt = (time.time() - t0) / reps / STEPS
        print(f"{name}: {dt*1e6:8.1f} us/step  "
              f"{macs/dt/1e12:7.1f} TOPS  "
              f"(635 steps x {1024//BG} blocks = "
              f"{dt*635*(1024//BG)*1e3:.1f} ms/1024 gates)", flush=True)


if __name__ == "__main__":
    main()

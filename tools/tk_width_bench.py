#!/usr/bin/env python
"""Mosaic int8 dot-rate vs output width / contraction length.

The tkey kernel's dots are [BG, <=6144] x [<=6144, 768]; the measured rate
(~180 TMAC/s effective, from the IYOKAN_TK_ABLATE=mm subtraction) is well
below the chip's big-square int8 rate.  This sweeps the (K, Nout) shape
space with the RHS resident in VMEM.  Each dot uses a distinct 128-lane
window of the LHS (like the real kernel's per-K windows) so XLA/Mosaic
cannot CSE the dots, and a loop-carried splice keeps them un-hoistable.

Answers:
  - is the 768-wide output the limiter (widen -> faster)?
  - how does a 3x longer contraction (the tk2 unrolled-key shape) schedule?

Usage: python tools/tk_width_bench.py [BG] [STEPS] [reps] [case...]
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

    i8, i32 = jnp.int8, jnp.int32
    BG = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    names = set(sys.argv[4:])

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)

    def make(K, NO, ndots):
        """ndots dots of [BG, K] x [K, NO] per step; dot d reads LHS window
        [:, 128*d : 128*d + K] of a [BG, K + 128*ndots] buffer."""
        W = K + 128 * ndots

        def kern(x_ref, rhs_ref, o_ref):
            def body(i, carry):
                lhs, acc = carry
                s = None
                for d in range(ndots):
                    t = mm(lhs[:, 128 * d : 128 * d + K], rhs_ref[...])
                    s = t if s is None else s + t
                acc = acc + s[:, :128]
                lhs = jnp.concatenate(
                    [acc[:, :128].astype(i8), lhs[:, 128:]], axis=-1)
                return lhs, acc
            lhs0 = x_ref[...]
            acc0 = jnp.zeros((BG, 128), i32)
            _, acc = jax.lax.fori_loop(0, STEPS, body, (lhs0, acc0))
            o_ref[...] = acc

        x = jnp.ones((BG, W), i8)
        rhs = jnp.ones((K, NO), i8)
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((BG, 128), i32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )
        return call, x, rhs, ndots * BG * K * NO

    cases = [
        ("w768", "8x[BG,6144]x[6144,768]", (6144, 768, 8)),
        ("w1536", "4x[BG,6144]x[6144,1536]", (6144, 1536, 4)),
        ("w3072", "2x[BG,6144]x[6144,3072]", (6144, 3072, 2)),
        ("w6144", "1x[BG,6144]x[6144,6144]", (6144, 6144, 1)),
        ("k18432", "8x[BG,18432]x[18432,768]", (18432, 768, 8)),
        ("k3072", "16x[BG,3072]x[3072,768]", (3072, 768, 16)),
    ]

    for short, desc, args in cases:
        if names and short not in names:
            continue
        try:
            call, x, rhs, macs = make(*args)
            t0 = time.time()
            out = call(x, rhs)
            _ = np.asarray(out[0, 0])
            comp = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                out = call(x, rhs)
            _ = np.asarray(out[0, 0])
            dt = (time.time() - t0) / reps / STEPS
            print(f"{short:7s} {desc}: {dt*1e6:8.1f} us/step  "
                  f"{macs/dt/1e12:7.1f} TMAC/s  [compile {comp:.0f}s]",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - print and continue the sweep
            print(f"{short:7s} {desc}: FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()

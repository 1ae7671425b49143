#!/usr/bin/env python
"""XLA (non-Pallas) dot-core benchmark for the tkey step.

Measures the same 8 fat dots/step as tools/tk_mm_bench.py but as a plain
jitted lax.scan over the per-step key slabs (XLA handles the HBM->VMEM
streaming).  Answers: does XLA's scheduling beat Mosaic's on
[BG, 6144] x [6144, 768] int8 dots?

The loop-carried dependency is one 128-lane splice of the i32 accumulator
into the LHS, so the dots cannot be hoisted.

Usage: python tools/tk_xla_bench.py [BG] [STEPS] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    i8, i32 = jnp.int8, jnp.int32
    BG = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 635
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=i32)

    @jax.jit
    def run(x, bk):
        def body(carry, slab):
            lhs, acc = carry
            s = None
            for K in range(8):
                t = mm(lhs[:, 768 * K : 768 * K + 6144], slab)
                s = t if s is None else s + t
            acc = acc + s
            lhs = jnp.concatenate(
                [acc[:, :128].astype(i8), lhs[:, 128:]], axis=-1)
            return (lhs, acc), None
        acc0 = jnp.zeros((x.shape[0], 768), i32)
        (_, acc), _ = jax.lax.scan(body, (x, acc0), bk)
        return acc

    x = jnp.ones((BG, 12288), i8)
    bk = jnp.ones((STEPS, 6144, 768), i8)   # 2.9 GB at 635 steps
    print(f"# key {bk.nbytes/1e9:.2f} GB on device", flush=True)

    t0 = time.time()
    out = run(x, bk)
    _ = np.asarray(out[0, 0])
    print(f"# compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = run(x, bk)
    _ = np.asarray(out[0, 0])
    dt = (time.time() - t0) / reps / STEPS
    macs = 8 * BG * 6144 * 768
    print(f"xla 8x[BG,6144]x[6144,768]: {dt*1e6:8.1f} us/step  "
          f"{macs/dt/1e12:7.1f} TOPS  "
          f"(635 steps x {1024//BG} blocks = "
          f"{dt*635*(1024//BG)*1e3:.1f} ms/1024 gates)", flush=True)


if __name__ == "__main__":
    main()

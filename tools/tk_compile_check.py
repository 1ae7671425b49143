#!/usr/bin/env python
"""Fast compile/run check of the tkey kernel with an on-device dummy key.

Skips keygen and the 2.9 GB host->device key transfer (values are wrong;
this only validates Mosaic compilation and measures step throughput).

Usage: python tools/tk_compile_check.py [G] [BG] [L] [reps] [thin|fat] [lb]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from iyokan_tpu import params as params_mod
    from iyokan_tpu.ops.pallas_tk import blind_rotate_tkey

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    BG = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    layout = sys.argv[5] if len(sys.argv) > 5 else "thin"
    p = params_mod.CGGI128
    lb = int(sys.argv[6]) if len(sys.argv) > 6 else p.l

    rr = p.l + lb   # asymmetric gadget row count (lb == l -> plain 2l)
    if layout == "fat":
        key = jnp.ones((p.n, rr * p.N, 2 * L * 128), jnp.int8)
    else:
        key = jnp.ones((p.n, rr, p.N, 2 * L * 128), jnp.int8)
    rng = np.random.default_rng(0)
    tlwe = jnp.asarray(rng.integers(0, 1 << 32, (G, p.n + 1),
                                    dtype=np.uint32))
    testv = jnp.full((p.N,), jnp.uint32(p.mu))

    fn = jax.jit(lambda t: blind_rotate_tkey(t, key, testv, p, block_g=BG))
    t0 = time.time()
    out = fn(tlwe)
    _ = np.asarray(out[0, 0, 0])
    print(f"# compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(reps):
        out = fn(tlwe)
    _ = np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / reps
    print(f"RESULT G={G} BG={BG} L={L} lb={lb} {layout}: {dt*1e3:.1f} ms "
          f"-> {G/dt:.0f} gates/s", flush=True)


if __name__ == "__main__":
    main()

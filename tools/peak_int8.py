#!/usr/bin/env python
"""Definitive chip int8 matmul peak: a serially-dependent chain of big
square dots that XLA cannot hoist, CSE, or skip.

Each iteration feeds the previous output back into the LHS (shifted into
int8 range), so every dot must execute.  Reports TMAC/s (= TOPS / 2).

Usage: python tools/peak_int8.py [M] [STEPS] [reps]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    @jax.jit
    def run(x, w):
        def body(carry, _):
            y = jax.lax.dot_general(
                carry, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            nxt = (y >> 8).astype(jnp.int8)
            return nxt, ()
        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-128, 128, (M, M), np.int64).astype(np.int8))
    w = jnp.asarray(rng.integers(-128, 128, (M, M), np.int64).astype(np.int8))

    t0 = time.time()
    out = run(x, w)
    _ = np.asarray(out[0, 0])
    print(f"# compile+first {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    for _ in range(reps):
        out = run(x, w)
    _ = np.asarray(out[0, 0])
    dt = (time.time() - t0) / reps / STEPS
    macs = M * M * M
    print(f"[{M}x{M}]x[{M}x{M}] int8: {dt*1e6:.0f} us/dot  "
          f"{macs/dt/1e12:.1f} TMAC/s  ({2*macs/dt/1e12:.0f} TOPS)",
          flush=True)


if __name__ == "__main__":
    main()

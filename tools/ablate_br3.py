#!/usr/bin/env python
"""Stage ablation of the v3 fused blind-rotate kernel on the TPU.

Compiles kernel variants with one stage knocked out (IYOKAN_BR3_ABLATE)
and times each: the delta vs the full kernel is that stage's cost share.
Results are modeled-cost ground truth for optimizing the kernel.

Usage: python tools/ablate_br3.py [G] [reps]
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
    from iyokan_tpu.crypto import host, ops
    from iyokan_tpu.ops import pallas_br3

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    p = params_mod.CGGI128

    t0 = time.time()
    sk = host.keygen(p, seed=0)
    ek = host.genevalkey(sk, seed=1, with_cb=False)
    keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
    print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    tlwe = jnp.asarray(
        rng.integers(0, 1 << 32, (G, p.n + 1), dtype=np.uint32)
    )
    testv = jnp.full((p.N,), jnp.uint32(p.mu))

    configs = [
        "",                       # full kernel (baseline)
        "decompose",
        "onehot",
        "fwdmm",
        "fwdred",
        "pointwise",
        "twmm",
        "twiddle",
        "invmm",
        "recombine",
        "fwdmm,twmm,invmm",       # all MXU off -> VPU-only time
        "fwdred,pointwise,twiddle,recombine,decompose,onehot",  # MXU-only
    ]

    base = None
    for cfg in configs:
        os.environ["IYOKAN_BR3_ABLATE"] = cfg
        fn = jax.jit(
            lambda t: pallas_br3.blind_rotate_pallas3(t, keys.bkntt,
                                                      testv, p)
        )
        t0 = time.time()
        out = fn(tlwe)
        _ = np.asarray(out[0, 0, 0])    # force first real execution
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            out = fn(tlwe)
        _ = np.asarray(out[0, 0, 0])
        dt = (time.time() - t0) / reps
        if base is None:
            base = dt
        tag = cfg or "FULL"
        print(f"{tag:<55s} {dt*1e3:8.1f} ms  (delta {1e3*(base-dt):+7.1f})"
              f"  [compile {compile_s:.0f}s]", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stage ablation of the v3 fused blind-rotate kernel on the TPU.

Compiles kernel variants with one stage knocked out (IYOKAN_BR3_ABLATE)
and times each: the delta vs the full kernel is that stage's cost share.
Results are modeled-cost ground truth for optimizing the kernel.

Each variant runs in its own subprocess so a Mosaic/TPU failure on one
variant cannot take down the sweep (a TPU backend error aborted the first
in-process sweep).

Usage: python tools/ablate_br3.py [G] [reps]           # full sweep
       python tools/ablate_br3.py --one CFG [G] [reps] # single variant
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    "",                       # full kernel (baseline)
    "fwdmm,twmm,invmm",       # all MXU off -> VPU-only time
    "fwdred,pointwise,twiddle,recombine,decompose,onehot",  # MXU-only
    "pointwise",
    "fwdred",
    "recombine",
    "twiddle",
    "decompose",
    "onehot",
    "fwdmm",
    "twmm",
    "invmm",
]


def run_one(cfg: str, G: int, reps: int):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from iyokan_tpu import params as params_mod
    from iyokan_tpu.crypto import host, ops
    from iyokan_tpu.ops import pallas_br3

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

    os.environ["IYOKAN_BR3_ABLATE"] = cfg
    fn = jax.jit(
        lambda t: pallas_br3.blind_rotate_pallas3(t, keys.bkntt, testv, p)
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
    print(f"RESULT\t{cfg or 'FULL'}\t{dt*1e3:.1f}\t{compile_s:.0f}",
          flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        cfg = sys.argv[2]
        G = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        run_one("" if cfg == "FULL" else cfg, G, reps)
        return

    G = sys.argv[1] if len(sys.argv) > 1 else "1024"
    reps = sys.argv[2] if len(sys.argv) > 2 else "3"
    base = None
    for cfg in CONFIGS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one",
             cfg or "FULL", G, reps],
            capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        if not line:
            print(f"{cfg or 'FULL':<55s} FAILED (rc={r.returncode})",
                  flush=True)
            tail = (r.stderr or "").strip().splitlines()[-3:]
            for t in tail:
                print(f"    {t}", flush=True)
            continue
        _, tag, ms, comp = line[0].split("\t")
        ms = float(ms)
        if base is None:
            base = ms
        print(f"{tag:<55s} {ms:8.1f} ms  (delta {base-ms:+7.1f})"
              f"  [compile {comp}s]", flush=True)


if __name__ == "__main__":
    main()

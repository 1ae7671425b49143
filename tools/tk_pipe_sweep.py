#!/usr/bin/env python
"""One-process sweep over tkey-kernel configs (pipe ablations, BG/G scaling).

Each config re-reads the IYOKAN_TK_* env knobs at trace time, so a single
process (one axon warmup) measures many variants.  Reports ms per batch and
gates/s for the full bootstrap path (linear combine is excluded; modswitch +
blind rotate + extract included, key switch excluded to isolate the kernel).

Usage: python tools/tk_pipe_sweep.py [reps] [--only substr1,substr2]
       (--only runs just the rows whose tag contains a substring --
        e.g. --only ablated re-measures the two rows round 3 lost to
        transient remote-compile SIGABRTs)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ONLY = None
if "--only" in sys.argv:
    i = sys.argv.index("--only")
    ONLY = sys.argv[i + 1].split(",")
    del sys.argv[i:i + 2]


def main():
    import jax
    import jax.numpy as jnp

    from iyokan_tpu import params as params_mod
    from iyokan_tpu.crypto import host, ops

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    p = params_mod.by_name("cggi128")

    t0 = time.time()
    sk = host.keygen(p, seed=0)
    ek = host.genevalkey(sk, seed=1, with_cb=False)
    print(f"# keygen {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(2)

    def run(tag, G, env, _attempt=1):
        if ONLY is not None and not any(s in tag for s in ONLY):
            return
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        try:
            # key prep reads IYOKAN_TK_* at build time; the fingerprint
            # cache keys on the env so each variant gets the right slab
            keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
            bits = rng.integers(0, 2, G, dtype=np.uint8)
            tl = jnp.asarray(host.encrypt_bits(sk, bits, rng))

            @jax.jit
            def f(keys, tl):
                return ops.gate_bootstrap_tlwe1(tl, keys.bk_for(G), p,
                                                keys.backend)

            t0 = time.time()
            out = f(keys, tl)
            _ = np.asarray(out[0, 0])
            comp = time.time() - t0
            t0 = time.time()
            for _ in range(reps):
                out = f(keys, tl)
            _ = np.asarray(out[0, 0])
            dt = (time.time() - t0) / reps
            print(f"{tag:44s} G={G:5d}  {dt*1e3:7.1f} ms  "
                  f"{G/dt:7.0f} gates/s   (compile {comp:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag:44s} G={G:5d}  FAILED (attempt {_attempt}): "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            # the remote compiler fails transiently (round-3 sweep lost
            # both lb=2 ablation rows to one-off SIGABRTs); retry once
            # after a short backoff before recording a hole
            if _attempt < 2:
                time.sleep(30)
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
                return run(tag, G, env, _attempt=_attempt + 1)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    # round 3: the default is now lb=2 (asymmetric gadget, noise-validated
    # on quantized-mask keys).  The matrix: gadget x chains x BG.
    run("pipe default (lb=2)", 1024, {})
    run("pipe lb=3 (full gadget)", 1024, {"IYOKAN_TK_LB": "3"})
    run("pipe lb=2 mm-ablated (exposed VPU+ovh)", 1024,
        {"IYOKAN_TK_ABLATE": "mm", "IYOKAN_TK_PIPE": "force"})
    run("pipe lb=2 vpu-ablated (exposed MXU+ovh)", 1024,
        {"IYOKAN_TK_ABLATE": "rot,decompose,recomb",
         "IYOKAN_TK_PIPE": "force"})
    # fine-grained VPU anatomy on the PIPE kernel (round 4): which of the
    # three VPU stages holds the 128 - 84 ms residual.  Each row knocks
    # out ONE stage; delta vs the pipe-force baseline is that stage's
    # unhidden share.
    run("pipe lb=2 force (fine-ablation baseline)", 1024,
        {"IYOKAN_TK_PIPE": "force"})
    run("pipe lb=2 rot-ablated", 1024,
        {"IYOKAN_TK_ABLATE": "rot", "IYOKAN_TK_PIPE": "force"})
    run("pipe lb=2 decompose-ablated", 1024,
        {"IYOKAN_TK_ABLATE": "decompose", "IYOKAN_TK_PIPE": "force"})
    run("pipe lb=2 recomb-ablated", 1024,
        {"IYOKAN_TK_ABLATE": "recomb", "IYOKAN_TK_PIPE": "force"})
    run("pipe lb=2 + 3 chains BG=341->384", 1152, {"IYOKAN_TK_CHAINS": "3",
                                                   "IYOKAN_PALLAS_BG": "384"})
    run("pipe lb=2 + 4 chains BG=256", 1024,
        {"IYOKAN_TK_CHAINS": "4", "IYOKAN_PALLAS_BG": "256"})
    run("pipe lb=2 + 6 chains BG=170->192", 1152,
        {"IYOKAN_TK_CHAINS": "6", "IYOKAN_PALLAS_BG": "192"})
    run("pipe lb=2 G=2048 BG=512 (grid 2)", 2048, {})
    run("pipe lb=2 G=2048 4 chains BG=512", 2048, {"IYOKAN_TK_CHAINS": "4"})
    # G=4096: isolates the remaining fixed per-dispatch share (G=1024->
    # 2048 bought +4-6%; if that was fixed overhead f, 2048->4096 buys
    # f/2 more) and gives the MXU longer uninterrupted dot chains
    run("pipe lb=2 G=4096 (grid 4)", 4096, {})
    run("pipe lb=2 G=4096 4 chains", 4096, {"IYOKAN_TK_CHAINS": "4"})
    run("serial lb=2 G=2048 BG=1024", 2048,
        {"IYOKAN_TK_PIPE": "0", "IYOKAN_PALLAS_BG": "1024"})
    run("pipe lb=3 + 4 chains BG=256", 1024,
        {"IYOKAN_TK_LB": "3", "IYOKAN_TK_CHAINS": "4",
         "IYOKAN_PALLAS_BG": "256"})
    run("pipe lb=2 ext8 (i8 concat)", 1024, {"IYOKAN_TK_EXT8": "1"})
    # 2-bit unrolled slab in the PIPE kernel: per key bit 3/4 the MACs
    # and 3/4 the VPU work at half the depth (the round-2 loss was the
    # serial kernel).  MXU floor drops ~72 -> ~54 ms/1024 gates.
    run("pipe UNROLLED lb=2 (3/4 MACs)", 1024, {"IYOKAN_TK_UNROLL": "1"})
    run("pipe UNROLLED lb=2 4 chains BG=256", 1024,
        {"IYOKAN_TK_UNROLL": "1", "IYOKAN_TK_CHAINS": "4",
         "IYOKAN_PALLAS_BG": "256"})
    run("pipe UNROLLED lb=3 (full gadget)", 1024,
        {"IYOKAN_TK_UNROLL": "1", "IYOKAN_TK_LB": "3"})
    run("pipe UNROLLED lb=2 G=2048", 2048, {"IYOKAN_TK_UNROLL": "1"})
    # small (latency-bound) batches: diamond levels average ~90 gates.
    # bk_for routes <= IYOKAN_UNROLL_MAX to the unrolled NTT key; forcing
    # it to 0 exposes the tkey kernel at the same sizes.  kmaj (auto at
    # BG < 128) stacks the 8 output-block dots along matmul M; the
    # no-kmaj row isolates its contribution.
    for g in (16, 64, 256):
        run(f"small G={g} default (bku NTT path)", g, {})
        run(f"small G={g} tkey kmaj (M-stacked dots)", g,
            {"IYOKAN_UNROLL_MAX": "0"})
        run(f"small G={g} tkey no-kmaj", g,
            {"IYOKAN_UNROLL_MAX": "0", "IYOKAN_TK_KMAJ": "0"})


if __name__ == "__main__":
    main()

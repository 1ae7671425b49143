"""Headline benchmark: batched gate bootstraps per second on one chip.

The north-star metric (BASELINE.md): homomorphic NAND gates -- each one a
full TFHE gate bootstrap (linear combine -> 635-step blind rotation over
N=1024 polynomials -> sample extract -> key switch to lvl0) -- at 128-bit
parameters, batched over the gate axis.

Prints ONE JSON line:
  {"metric": "gate_bootstraps_per_sec", "value": ..., "unit": "gates/s",
   "vs_baseline": ...}
vs_baseline is against 10_000 gates/s, the order of cuFHE's published V100
gate-bootstrap throughput (the reference's GPU backend; BASELINE.md target is
>= 10x that on TPU).

Env knobs: BENCH_G (batch size), BENCH_REPS, BENCH_PARAMS; the blind-rotate
implementation follows the engine default (Toeplitz-slab matmul kernel on
TPU; override with IYOKAN_BR_IMPL / IYOKAN_TK_LAYOUT).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_GATES_PER_SEC = 10_000.0


def main():
    import jax
    import jax.numpy as jnp

    from iyokan_tpu import gates, params as params_mod
    from iyokan_tpu.crypto import host, ops

    pname = os.environ.get("BENCH_PARAMS", "cggi128")
    G = int(os.environ.get("BENCH_G", "1024"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    p = params_mod.by_name(pname)

    t0 = time.time()
    sk = host.keygen(p, seed=0)
    ek = host.genevalkey(sk, seed=1, with_cb=False)
    keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
    print(f"# keygen {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(2)
    a_bits = rng.integers(0, 2, G, dtype=np.uint8)
    b_bits = rng.integers(0, 2, G, dtype=np.uint8)
    A = jnp.asarray(host.encrypt_bits(sk, a_bits, rng))
    B = jnp.asarray(host.encrypt_bits(sk, b_bits, rng))
    ca, cb, kk = gates.GATE_LIN[gates.NAND]
    ca = jnp.full((G,), ca, jnp.int32)
    cb = jnp.full((G,), cb, jnp.int32)
    kk = jnp.full((G,), kk, jnp.int32)

    @jax.jit
    def nand_batch(keys, A, B, ca, cb, kk):
        pre = ops.gate_linear(A, B, ca, cb, kk, p)
        t1 = ops.gate_bootstrap_tlwe1(pre, keys.bk_for(G), p,
                                      keys.backend)
        return ops.keyswitch_10(t1, keys.ksk_mat, p)

    t0 = time.time()
    out = nand_batch(keys, A, B, ca, cb, kk)
    _ = np.asarray(out[0, 0])   # axon: block_until_ready does not wait
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

    # correctness check on the first batch
    dec = host.decrypt_bits(sk, np.asarray(out))
    want = 1 - (a_bits & b_bits)
    n_bad = int((dec != want).sum())
    if n_bad:
        print(f"# WARNING: {n_bad}/{G} wrong NAND results", file=sys.stderr)

    t0 = time.time()
    for _ in range(reps):
        out = nand_batch(keys, A, B, ca, cb, kk)
    _ = np.asarray(out[0, 0])   # force real completion through the tunnel
    dt = (time.time() - t0) / reps
    rate = G / dt
    print(f"# {dt*1e3:.1f} ms / batch of {G}", file=sys.stderr)

    print(json.dumps({
        "metric": "gate_bootstraps_per_sec",
        "value": round(rate, 1),
        "unit": "gates/s",
        "vs_baseline": round(rate / BASELINE_GATES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Empirical gate-failure measurement at 128-bit parameters on device.

Runs many batches of mixed 2-input gates through the full bootstrap
pipeline and counts decryption errors; also reports the phase-noise sigma
against the documented budget (params.py)."""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from iyokan_tpu import gates, params as params_mod
from iyokan_tpu.crypto import host, ops

G = int(os.environ.get("ER_G", "4096"))
BATCHES = int(os.environ.get("ER_BATCHES", "25"))


def main():
    p = params_mod.by_name(os.environ.get("ER_PARAMS", "cggi128"))
    sk = host.keygen(p, seed=0)
    ek = host.genevalkey(sk, seed=1, with_cb=False)
    keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
    rng = np.random.default_rng(99)

    plain = {
        gates.AND: lambda a, b: a & b,
        gates.NAND: lambda a, b: 1 - (a & b),
        gates.ANDNOT: lambda a, b: a & (1 - b),
        gates.OR: lambda a, b: a | b,
        gates.NOR: lambda a, b: 1 - (a | b),
        gates.ORNOT: lambda a, b: a | (1 - b),
        gates.XOR: lambda a, b: a ^ b,
        gates.XNOR: lambda a, b: 1 - (a ^ b),
    }
    kind_list = list(plain)

    @jax.jit
    def run(keys, A, B, ca, cb, kk):
        pre = ops.gate_linear(A, B, ca, cb, kk, p)
        t1 = ops.gate_bootstrap_tlwe1(pre, keys.bk_for(G), p, keys.backend)
        return ops.keyswitch_10(t1, keys.ksk_mat, p)

    total = wrong = 0
    errs = []
    t0 = time.time()
    for it in range(BATCHES):
        kinds = rng.integers(0, len(kind_list), G)
        a = rng.integers(0, 2, G, dtype=np.uint8)
        b = rng.integers(0, 2, G, dtype=np.uint8)
        A = jnp.asarray(host.encrypt_bits(sk, a, rng))
        B = jnp.asarray(host.encrypt_bits(sk, b, rng))
        lin = np.array([gates.GATE_LIN[kind_list[k]] for k in kinds], np.int32)
        out = np.asarray(run(keys, A, B, jnp.asarray(lin[:, 0]),
                             jnp.asarray(lin[:, 1]), jnp.asarray(lin[:, 2])))
        got = host.decrypt_bits(sk, out)
        want = np.array(
            [plain[kind_list[k]](int(x), int(y))
             for k, x, y in zip(kinds, a, b)], np.uint8
        )
        wrong += int((got != want).sum())
        total += G
        phase = host.tlwe0_phase(sk, out).astype(np.int64)
        signed = np.where(phase > 1 << 31, phase - (1 << 32), phase)
        err = np.where(want == 1, signed - p.mu, signed + p.mu)
        errs.append(err)
        print(f"batch {it+1}/{BATCHES}: cumulative errors {wrong}/{total}",
              flush=True)

    # cascade rounds: outputs feed the next round's inputs, the scenario a
    # fresh-input check never exercises (round 3: this is exactly where the
    # unquantized-mask truncation noise bit -- per-gate sigma that looks
    # fine at the decrypt threshold still breaks the NEXT gate's linear
    # combination, whose noise is the sum of two bootstrapped outputs).
    cascade = int(os.environ.get("ER_CASCADE", "8"))
    c_wrong = c_total = 0
    if cascade:
        a = rng.integers(0, 2, G, dtype=np.uint8)
        b = rng.integers(0, 2, G, dtype=np.uint8)
        A = jnp.asarray(host.encrypt_bits(sk, a, rng))
        B = jnp.asarray(host.encrypt_bits(sk, b, rng))
        for r in range(cascade):
            kinds = rng.integers(0, len(kind_list), G)
            lin = np.array([gates.GATE_LIN[kind_list[k]] for k in kinds],
                           np.int32)
            out = run(keys, A, B, jnp.asarray(lin[:, 0]),
                      jnp.asarray(lin[:, 1]), jnp.asarray(lin[:, 2]))
            want = np.array(
                [plain[kind_list[k]](int(x), int(y))
                 for k, x, y in zip(kinds, a, b)], np.uint8)
            got = host.decrypt_bits(sk, np.asarray(out))
            c_wrong += int((got != want).sum())
            c_total += G
            # outputs become one operand, a shuffled copy the other
            perm = rng.permutation(G)
            A, B = out, out[perm]
            a, b = want, want[perm]
            print(f"cascade {r+1}/{cascade}: cumulative errors "
                  f"{c_wrong}/{c_total}", flush=True)

    err = np.concatenate(errs)
    sigma = err.std() / 2.0 ** 32
    print(f"\n{total} gates, {wrong} wrong "
          f"(rate {wrong/total:.2e})")
    if cascade:
        print(f"cascade: {c_total} chained gates, {c_wrong} wrong "
              f"(rate {c_wrong/max(c_total,1):.2e})")
    print(f"phase sigma = 2^{math.log2(sigma):.2f} "
          f"(threshold 1/16 = 2^-4; margin {(1/16)/sigma:.1f} sigma)")
    print(f"wall: {time.time()-t0:.1f}s")

    # repeatable record for noise-regression tracking (VERDICT round 1 #6)
    out_path = os.environ.get(
        "ER_OUT", os.path.join(os.path.dirname(__file__), "..",
                               "ERROR_RATE.json")
    )
    import json

    budget_sigma = 2.0 ** -8.2
    rec = {
        "params": p.name,
        "gates": total,
        "wrong": wrong,
        "error_rate": wrong / total,
        "sigma": sigma,
        "sigma_log2": math.log2(sigma),
        "budget_sigma_log2": math.log2(budget_sigma),
        "threshold": 1 / 16,
        "margin_sigmas": (1 / 16) / sigma,
        "cascade_gates": c_total,
        "cascade_wrong": c_wrong,
        "backend": jax.default_backend(),
        # gadget/kernel config under test (asymmetric gadget etc.)
        "env": {k: v for k, v in os.environ.items()
                if k.startswith("IYOKAN_")},
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {out_path}")
    if wrong or sigma > budget_sigma * 1.5:
        sys.exit(1)


if __name__ == "__main__":
    main()

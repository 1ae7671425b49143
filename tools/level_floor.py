#!/usr/bin/env python
"""Per-LEVEL cost anatomy inside a fused multi-level program.

The encrypted-CPU cycle time is dominated by sequential task-graph levels
(DIAMOND_r04: gates ~1.0 s warm over 42 levels averaging ~105 gates).
Standalone per-call timings (SMALLG_r04) are inflated by the per-dispatch
device sync, so they cannot say how the ~24 ms/level splits between the
blind rotate and the SEI+KS epilogue INSIDE a fused program -- which is
what decides whether fusing SEI+KS into the Pallas kernel epilogue
(VERDICT r03 task 1b) is worth building.

Measures, as ONE jit per variant (LVLS dependent stages, single final
fetch):
  full      gate_linear -> blind rotate -> SEI -> KS   per level
  br-only   gate_linear -> blind rotate (input re-sliced from lvl1)
  ks-only   SEI+KS chained through a zero-pad embedding
Content after level 1 is cryptographic garbage for br-only/ks-only --
shapes and data deps are what's being timed.  `full` keeps real NAND
semantics and checks the first level's decrypt as a sanity anchor.

Env: LEVEL_GS (default 32,128), LEVEL_LVLS (default 8), LEVEL_REPS (3),
IYOKAN_KEY_CACHE shared with the other tools.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CACHE = os.environ.get("IYOKAN_KEY_CACHE", "/tmp/iyokan-keys")
GS = [int(g) for g in os.environ.get("LEVEL_GS", "32,128").split(",")]
LVLS = int(os.environ.get("LEVEL_LVLS", "8"))
REPS = int(os.environ.get("LEVEL_REPS", "3"))


def main():
    import jax
    import jax.numpy as jnp

    from iyokan_tpu import gates, params as params_mod
    from iyokan_tpu.crypto import host, ops

    p = params_mod.CGGI128
    os.makedirs(CACHE, exist_ok=True)
    skf = os.path.join(CACHE, "sk-cggi128")
    qtag = f"-q{os.environ.get('IYOKAN_BK_MASK_BITS', '24')}"
    ekf = os.path.join(CACHE, "ek-cggi128" + qtag)
    if not os.path.exists(skf):
        host.keygen(p, seed=0).save(skf)
    sk = host.SecretKey.load(skf)
    if not os.path.exists(ekf):
        host.genevalkey(sk, seed=1).save(ekf)
    ek = host.EvalKey.load(ekf)
    keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
    print(f"# keys ready (levels={LVLS}, reps={REPS})", flush=True)

    ca, cb, kk = gates.GATE_LIN[gates.NAND]
    rng = np.random.default_rng(11)

    def timed(fn, *args):
        t0 = time.time()
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        cold = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
        return (time.time() - t0) / REPS, cold, out

    for G in GS:
        cav = jnp.full((G,), ca, jnp.int32)
        cbv = jnp.full((G,), cb, jnp.int32)
        kkv = jnp.full((G,), kk, jnp.int32)
        a_bits = rng.integers(0, 2, G, dtype=np.uint8)
        X = jnp.asarray(host.encrypt_bits(sk, a_bits, rng))

        def nand_level(keys, x):
            pre = ops.gate_linear(x, jnp.roll(x, 1, axis=0), cav, cbv,
                                  kkv, p)
            t1 = ops.gate_bootstrap_tlwe1(pre, keys.bk_for(G), p,
                                          keys.backend)
            return ops.keyswitch_10(t1, keys.ksk_mat, p)

        def chain_full(keys, x):
            for _ in range(LVLS):
                x = nand_level(keys, x)
            return x

        def chain_br_only(keys, x):
            # lvl1 output re-sliced to lvl0 width: keeps the BR->BR data
            # dependency with NO SEI/KS stage (content garbage after L1)
            for _ in range(LVLS):
                pre = ops.gate_linear(x, jnp.roll(x, 1, axis=0), cav, cbv,
                                      kkv, p)
                t1 = ops.gate_bootstrap_tlwe1(pre, keys.bk_for(G), p,
                                              keys.backend)
                x = t1[:, : p.n + 1]
            return x

        def chain_ks_only(keys, x1):
            # lvl1 -> (KS) -> lvl0 -> zero-pad back to lvl1 width
            for _ in range(LVLS):
                t0l = ops.keyswitch_10(x1, keys.ksk_mat, p)
                x1 = jnp.concatenate(
                    [t0l, jnp.zeros((G, p.N - p.n), jnp.uint32)], axis=1)
            return x1

        rows = [("full", jax.jit(chain_full), X)]
        rows.append(("br-only", jax.jit(chain_br_only), X))
        X1 = jnp.concatenate(
            [X, jnp.zeros((G, p.N - p.n), jnp.uint32)], axis=1)
        rows.append(("ks-only", jax.jit(chain_ks_only), X1))

        for name, fn, arg in rows:
            try:
                dt, cold, out = timed(fn, keys, arg)
            except Exception as e:  # noqa: BLE001
                print(f"{name:8s} G={G:4d}  FAILED: "
                      f"{str(e).splitlines()[0][:140]}", flush=True)
                continue
            print(f"{name:8s} G={G:4d}  {dt*1e3/LVLS:7.2f} ms/level  "
                  f"({dt*1e3:.1f} ms/{LVLS} levels, compile {cold:.0f}s)",
                  flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-4 small-batch routing study: which blind-rotate route should a
task-graph LEVEL take, as a function of its batch size G?

The encrypted-CPU cycle is gate-level-bound (DIAMOND_r03: 42 sequential
levels averaging ~105 gates eat 2/3 of the cycle), and the engine's
round-3 routing sent every batch <= IYOKAN_UNROLL_MAX=256 to the 2-bit
unrolled NTT key -- which SMALLG_r03 shows is 3-4x SLOWER than the kmaj
tkey kernel at G=64..256.  This tool measures, per G, with REAL keys and a
decrypt check:

  A. bku NTT route            (ops.blind_rotate w/ the unrolled NTT key)
  B. tkey plain slab, auto    (pipelined kernel; kmaj engages at BG<128)
  C. tkey UNROLLED slab, auto (318 pair steps instead of 635 -- the
     VERDICT r03 task-1a lever: halved depth is a latency play at small G,
     never measured there)

plus the per-level epilogue (sample extract + keyswitch) so the full
level floor is visible.  Writes SMALLG_r04.log lines; the winner sets the
engine's bk_for routing thresholds.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

CACHE = os.environ.get("IYOKAN_KEY_CACHE", "/tmp/iyokan-keys")
GS = [int(g) for g in os.environ.get(
    "SMALLG_GS", "32,64,128,192,256,512").split(",")]
REPS = int(os.environ.get("SMALLG_REPS", "5"))
# Which routes to measure (skips the key prep of the others -- the bku
# NTT prep alone is minutes of device time): subset of
# bku-ntt,tkey,tkey-unroll,sei+ks
ROUTES = set(os.environ.get(
    "SMALLG_ROUTES", "bku-ntt,tkey,tkey-unroll,sei+ks").split(","))
# Pipeline chain counts to sweep for the tkey route (each count is a
# fresh jit trace; the kernel reads IYOKAN_TK_CHAINS at trace time).
CHAINS = [int(c) for c in os.environ.get("SMALLG_CHAINS", "0").split(",")]


def main():
    import jax
    import jax.numpy as jnp

    from iyokan_tpu import gates, params as params_mod
    from iyokan_tpu.crypto import host, ops
    from iyokan_tpu.crypto import polymul as pm
    from iyokan_tpu.ops.pallas_tk import blind_rotate_tkey

    p = params_mod.CGGI128
    os.makedirs(CACHE, exist_ok=True)
    skf = os.path.join(CACHE, "sk-cggi128")
    qtag = f"-q{os.environ.get('IYOKAN_BK_MASK_BITS', '24')}"
    ekf = os.path.join(CACHE, "ek-cggi128" + qtag)
    t0 = time.time()
    if not os.path.exists(skf):
        host.keygen(p, seed=0).save(skf)
    sk = host.SecretKey.load(skf)
    if not os.path.exists(ekf):
        host.genevalkey(sk, seed=1).save(ekf)
    ek = host.EvalKey.load(ekf)
    print(f"# keys ready {time.time()-t0:.1f}s", flush=True)

    L, lay, lb = ops.tkey_default_config(p)
    t0 = time.time()
    slab = slab_u = bkuntt = None
    be = pm.get_backend()
    if ROUTES & {"tkey", "sei+ks"}:
        slab = jnp.asarray(pm.tkey_kernel_key(ek.bk, p, L, "fat", lb=lb))
    if ROUTES & {"tkey-unroll", "bku-ntt"}:
        bku_rows = ek.bku.reshape(ek.bku.shape[0], 6 * p.l, 2, p.N)
        if "tkey-unroll" in ROUTES:
            slab_u = jnp.asarray(
                pm.tkey_kernel_key(bku_rows, p, L, "fat", lb=lb))
        if "bku-ntt" in ROUTES:
            bkuntt = jax.jit(lambda bk: be.prep1(bk, p))(
                jnp.asarray(bku_rows))
    ksk_flat = ek.ksk.reshape(p.N * p.ks_t, p.n + 1)
    if os.environ.get("IYOKAN_KS_I8", "1") != "0":
        ksk_mat = jnp.asarray(ops.key_i8_limbs(ksk_flat))  # int8 MXU path
    else:
        ksk_mat = jnp.asarray(ksk_flat)
    print(f"# key prep {time.time()-t0:.1f}s "
          f"(routes {sorted(ROUTES)}, chains {CHAINS})", flush=True)

    testv = jnp.full((p.N,), jnp.uint32(p.mu))
    rng = np.random.default_rng(7)

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

    ca, cb, kk = gates.GATE_LIN[gates.NAND]
    for G in GS:
        a_bits = rng.integers(0, 2, G, dtype=np.uint8)
        b_bits = rng.integers(0, 2, G, dtype=np.uint8)
        A = jnp.asarray(host.encrypt_bits(sk, a_bits, rng))
        B = jnp.asarray(host.encrypt_bits(sk, b_bits, rng))
        want = 1 - (a_bits & b_bits)

        def pre_of(A, B):
            return ops.gate_linear(
                A, B, jnp.full((G,), ca, jnp.int32),
                jnp.full((G,), cb, jnp.int32),
                jnp.full((G,), kk, jnp.int32), p)

        # keys are ARGUMENTS, never closure constants: a captured 2-3 GB
        # slab ships inside the HLO to the remote compiler (HTTP 413)
        routes = []
        if "bku-ntt" in ROUTES:
            routes.append(("bku-ntt", jax.jit(
                lambda A, B, bk: ops.blind_rotate(
                    pre_of(A, B), bk, testv, p, be)), bkuntt))
        if "tkey" in ROUTES:
            for c in CHAINS:
                if c:
                    os.environ["IYOKAN_TK_CHAINS"] = str(c)
                # fresh jit wrapper per chain count: the kernel reads
                # IYOKAN_TK_CHAINS when it traces
                routes.append((f"tkey-c{c}" if c else "tkey", jax.jit(
                    lambda A, B, bk: blind_rotate_tkey(
                        pre_of(A, B), bk, testv, p)), slab))
        if "tkey-unroll" in ROUTES:
            routes.append(("tkey-unroll", jax.jit(
                lambda A, B, bk: blind_rotate_tkey(
                    pre_of(A, B), bk, testv, p)), slab_u))
        for name, fn, bk in routes:
            if name.startswith("tkey-c"):
                os.environ["IYOKAN_TK_CHAINS"] = name[6:]
            try:
                dt, cold, tr = timed(fn, A, B, bk)
            except Exception as e:  # noqa: BLE001
                print(f"{name:12s} G={G:4d}  FAILED: "
                      f"{str(e).splitlines()[0][:120]}", flush=True)
                continue
            ph = host.trlwe1_phase(sk, np.asarray(tr))[:, 0]
            got = (np.asarray(ph) < (1 << 31)).astype(np.uint8)
            bad = int((got != want).sum())
            print(f"{name:12s} G={G:4d}  {dt*1e3:7.1f} ms  "
                  f"{G/dt:7.0f} gates/s  (compile {cold:.0f}s"
                  f"{', %d WRONG' % bad if bad else ''})", flush=True)

        # per-level epilogue: SEI + KS at this G (consumes route B's out)
        if "sei+ks" not in ROUTES:
            continue
        try:
            tr = jax.jit(lambda A, B, bk: blind_rotate_tkey(
                pre_of(A, B), bk, testv, p))(A, B, slab)

            def epi(tr, ksk):
                t1 = ops.sample_extract(tr, 0)
                return ops.keyswitch_10(t1, ksk, p)

            dt, cold, _ = timed(jax.jit(epi), tr, ksk_mat)
            print(f"{'sei+ks':12s} G={G:4d}  {dt*1e3:7.1f} ms  (compile "
                  f"{cold:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{'sei+ks':12s} G={G:4d}  FAILED: "
                  f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()

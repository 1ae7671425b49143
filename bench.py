"""Headline benchmark: batched gate bootstraps per second on one chip.

The north-star metric (BASELINE.md): homomorphic NAND gates -- each one a
full TFHE gate bootstrap (linear combine -> 635-step blind rotation over
N=1024 polynomials -> sample extract -> key switch to lvl0) -- at 128-bit
parameters, batched over the gate axis.

Always prints a final JSON line (the driver's record), even on failure:
  {"metric": "gate_bootstraps_per_sec", "value": ..., "unit": "gates/s",
   "vs_baseline": ..., "config": {...}}
vs_baseline is against 10_000 gates/s, the order of cuFHE's published V100
gate-bootstrap throughput (the reference's GPU backend,
reference src/iyokan_cufhe.hpp:207-262; BASELINE.md target is >= 10x on TPU).

When the reference fixtures are present it ALSO emits (before the headline
line) the second north-star metric -- the encrypted cahp-diamond CPU:
  {"metric": "diamond_sec_per_cycle", "value": ..., "unit": "s/cycle", ...}

Robustness: the TPU tunnel ("axon") init fails transiently (round 2's
BENCH artifact recorded exactly that crash), and jax caches a failed
backend init for the process lifetime -- so the first device touch happens
in a retried SUBPROBE subprocess, and the measurement only starts once a
probe has succeeded.

Env knobs: BENCH_G (batch size), BENCH_REPS, BENCH_PARAMS, BENCH_DIAMOND=0
(skip the diamond line), BENCH_DIAMOND_TIMEOUT, BENCH_INIT_RETRIES,
BENCH_INIT_BACKOFF, BENCH_PROBE_TIMEOUT; the blind-rotate implementation
follows the engine default (Toeplitz-slab matmul kernel on TPU; override
with IYOKAN_BR_IMPL / IYOKAN_TK_LAYOUT / IYOKAN_TK_LB / IYOKAN_TKEY_LIMBS).

Round-4 lesson (BENCH_r04.json: rc 124, parsed null): the driver kills
bench on a wall-clock budget, and the headline had been MEASURED but not
yet printed when the diamond subprocess ate the rest of the window.  So:
(a) the headline line is emitted IMMEDIATELY after the gate measurement
(and repeated as the final line), (b) a global BENCH_BUDGET (default
2700 s) deadline clamps every optional extra's subprocess timeout, and
(c) SIGTERM re-emits the last headline before dying.  Keys are cached in
IYOKAN_KEY_CACHE (shared with tools/run_diamond_tfhe.py) -- round 4 paid
119.7 s of keygen inside the budget.
"""

import json
import os
import signal
import subprocess
import sys
import time

BASELINE_GATES_PER_SEC = 10_000.0
FIXTURES = "/root/reference/test"

# BENCH_PLATFORM=cpu runs the whole bench off-accelerator (smoke-testing
# the harness itself; the ambient env pins jax to the TPU tunnel and only
# jax.config.update can override it -- see tools/run_tests.py --platform).
PLATFORM = os.environ.get("BENCH_PLATFORM")
_STEER = (f"import jax; jax.config.update('jax_platforms', '{PLATFORM}');"
          if PLATFORM else "")

PROBE_SRC = (
    _STEER +
    "import jax, numpy as np, jax.numpy as jnp;"
    "x = jnp.ones((8, 8), jnp.int8);"
    "print('probe ok:', jax.default_backend(),"
    " np.asarray(jnp.dot(x, x, preferred_element_type=jnp.int32))[0, 0])"
)


_DEADLINE = [None]   # absolute time.time() the driver budget runs out
_HEADLINE = [None]   # last emitted headline record (re-emitted on SIGTERM)


def emit(obj):
    print(json.dumps(obj), flush=True)


def remaining():
    return (_DEADLINE[0] - time.time()) if _DEADLINE[0] else float("inf")


def _on_term(signum, frame):  # noqa: ARG001 - signal signature
    if _HEADLINE[0] is not None:
        emit(_HEADLINE[0])
    else:
        emit({"metric": "gate_bootstraps_per_sec", "value": 0.0,
              "unit": "gates/s", "vs_baseline": 0.0,
              "error": f"killed (signal {signum}) before measurement done"})
    os._exit(1)


def config_snapshot():
    """The knobs that determine what this bench actually measured."""
    cfg = {
        "params": os.environ.get("BENCH_PARAMS", "cggi128"),
        "G": int(os.environ.get("BENCH_G", "2048")),
        "reps": int(os.environ.get("BENCH_REPS", "3")),
    }
    for k, v in sorted(os.environ.items()):
        if k.startswith("IYOKAN_"):
            cfg[k] = v
    return cfg


def probe_backend():
    """Touch the device in a subprocess, retrying with backoff.

    Returns None once a probe succeeds, else the last failure reason.
    A subprocess is mandatory: a failed in-process init would be cached by
    jax (xla_bridge memoizes backend errors) and poison the whole run.
    """
    retries = int(os.environ.get("BENCH_INIT_RETRIES", "4"))
    backoff = float(os.environ.get("BENCH_INIT_BACKOFF", "90"))
    timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "420"))
    last = "no probe ran"
    for i in range(retries):
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", PROBE_SRC],
                               capture_output=True, text=True,
                               timeout=timeout)
            if r.returncode == 0:
                print(f"# backend probe ok ({time.time()-t0:.0f}s)",
                      file=sys.stderr, flush=True)
                return None
            lines = (r.stderr or "").strip().splitlines()
            last = lines[-1][:300] if lines else f"probe rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {timeout:.0f}s"
        print(f"# backend probe {i+1}/{retries} failed: {last}",
              file=sys.stderr, flush=True)
        if i + 1 < retries:
            time.sleep(backoff)
    return last


def cached_keys(host, p):
    """Secret + eval key, cached on disk (shared with run_diamond_tfhe.py:
    same IYOKAN_KEY_CACHE dir and file naming).  Keygen was 119.7 s of
    round 4's bench budget; a cache load is ~2 s.  Prefers the full
    (with-CB) eval key if the diamond run already generated one."""
    if os.environ.get("BENCH_KEY_CACHE", "1") == "0":
        sk = host.keygen(p, seed=0)
        return sk, host.genevalkey(sk, seed=1, with_cb=False)
    cache = os.environ.get("IYOKAN_KEY_CACHE", "/tmp/iyokan-keys")
    os.makedirs(cache, exist_ok=True)
    skf = os.path.join(cache, f"sk-{p.name}")
    qtag = f"-q{os.environ.get('IYOKAN_BK_MASK_BITS', '24')}"
    full = os.path.join(cache, f"ek-{p.name}{qtag}")
    nocb = full + "-nocb"
    if os.path.exists(skf):
        sk = host.SecretKey.load(skf)
    else:
        sk = host.keygen(p, seed=0)
        sk.save(skf)
    for ekf in (full, nocb):
        if os.path.exists(ekf):
            return sk, host.EvalKey.load(ekf)
    ek = host.genevalkey(sk, seed=1, with_cb=False)
    ek.save(nocb)
    return sk, ek


def run_gate_bench():
    """Returns (rate_gates_per_sec, extra_record_fields)."""
    import jax

    if PLATFORM:
        jax.config.update("jax_platforms", PLATFORM)
    import jax.numpy as jnp
    import numpy as np

    from iyokan_tpu import gates, params as params_mod
    from iyokan_tpu.crypto import host, ops

    pname = os.environ.get("BENCH_PARAMS", "cggi128")
    # G=2048 (two grid blocks) amortizes fixed dispatch cost: +4-6% over
    # G=1024 on device (SWEEP_r03.log)
    G = int(os.environ.get("BENCH_G", "2048"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    p = params_mod.by_name(pname)

    t0 = time.time()
    sk, ek = cached_keys(host, p)
    keys = ops.DeviceKeys.from_evalkey(ek, with_cb=False)
    print(f"# keys ready {time.time()-t0:.1f}s", file=sys.stderr)

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
    print(f"# {dt*1e3:.1f} ms / batch of {G}", file=sys.stderr)
    return G / dt, {"wrong_results": n_bad, "ms_per_batch": round(dt * 1e3, 1)}


def run_best_config():
    """The best-known sweep config as a SECOND record line (the headline
    stays the no-flag shipping default, so the two never diverge silently
    -- VERDICT r03: the 8448 gates/s G=2048/4-chain config existed but
    only the 8220 default went into BENCH_r03).  Runs in a subprocess so
    its (long, ~400 s cold) compile and any failure are contained.

    BENCH_BEST=0 skips; BENCH_BEST_ENV overrides the env list, e.g.
    "IYOKAN_TK_CHAINS=4,IYOKAN_PALLAS_BG=256"."""
    if os.environ.get("BENCH_BEST", "1") == "0":
        return
    best_env = os.environ.get("BENCH_BEST_ENV", "IYOKAN_TK_CHAINS=4")
    env = dict(os.environ, BENCH_DIAMOND="0", BENCH_BEST="0")
    # G=4096 + 4 chains is the round-5 sweep best (8738 gates/s,
    # SWEEP_r05.log); the shape guard reroutes its one failing BG point
    env["BENCH_G"] = os.environ.get("BENCH_BEST_G", "4096")
    for kv in best_env.split(","):
        k, _, v = kv.partition("=")
        env[k.strip()] = v.strip()
    timeout = min(float(os.environ.get("BENCH_BEST_TIMEOUT", "1500")),
                  remaining() - 60)
    if timeout < 120:
        emit({"metric": "gate_bootstraps_per_sec_best", "value": 0.0,
              "unit": "gates/s", "error": "skipped: BENCH_BUDGET exhausted"})
        return
    src = ("import bench; rate, extra = bench.run_gate_bench();"
           "bench.emit({'metric': 'gate_bootstraps_per_sec_best',"
           " 'value': round(rate, 1), 'unit': 'gates/s',"
           " 'vs_baseline': round(rate / bench.BASELINE_GATES_PER_SEC, 3),"
           " 'config': bench.config_snapshot(), **extra})")
    try:
        r = subprocess.run([sys.executable, "-c", src],
                           capture_output=True, text=True, timeout=timeout,
                           env=env, cwd=os.path.dirname(
                               os.path.abspath(__file__)))
        line = None
        for ln in (r.stdout or "").splitlines():
            if ln.startswith("{") and "gate_bootstraps_per_sec_best" in ln:
                line = ln
        if line is not None:
            print(line, flush=True)
            return
        tail = ((r.stderr or "").strip().splitlines() or ["no output"])[-1]
        emit({"metric": "gate_bootstraps_per_sec_best", "value": 0.0,
              "unit": "gates/s",
              "error": f"rc={r.returncode}: {tail[:300]}"})
    except subprocess.TimeoutExpired:
        emit({"metric": "gate_bootstraps_per_sec_best", "value": 0.0,
              "unit": "gates/s", "error": f"timed out after {timeout:.0f}s"})


def run_diamond():
    """The second north-star: encrypted cahp-diamond s/cycle, as a
    subprocess (its own compile cache, contained failure/timeout).  Emits
    the diamond JSON line (or a failure record) -- never raises."""
    timeout = min(float(os.environ.get("BENCH_DIAMOND_TIMEOUT", "2700")),
                  remaining() - 120)
    if timeout < 240:
        emit({"metric": "diamond_sec_per_cycle", "value": 0.0,
              "unit": "s/cycle", "error": "skipped: BENCH_BUDGET exhausted"})
        return
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "run_diamond_tfhe.py")]
    env = dict(os.environ, DIAMOND_STAGES="0")
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, env=env)
        line = None
        for ln in (r.stdout or "").splitlines():
            if ln.startswith("{") and "diamond_sec_per_cycle" in ln:
                line = ln
        if line is not None:
            print(line, flush=True)
            return
        tail = ((r.stderr or "").strip().splitlines() or ["no output"])[-1]
        emit({"metric": "diamond_sec_per_cycle", "value": 0.0,
              "unit": "s/cycle", "error": f"rc={r.returncode}: {tail[:300]}"})
    except subprocess.TimeoutExpired:
        emit({"metric": "diamond_sec_per_cycle", "value": 0.0,
              "unit": "s/cycle", "error": f"timed out after {timeout:.0f}s"})


def main():
    _DEADLINE[0] = time.time() + float(os.environ.get("BENCH_BUDGET",
                                                      "2700"))
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    cfg = config_snapshot()
    fail = probe_backend()
    if fail is not None:
        emit({"metric": "gate_bootstraps_per_sec", "value": 0.0,
              "unit": "gates/s", "vs_baseline": 0.0, "config": cfg,
              "error": f"TPU backend unavailable after retries: {fail}"})
        return
    try:
        rate, extra = run_gate_bench()
    except Exception as e:  # noqa: BLE001 - the record IS the deliverable
        emit({"metric": "gate_bootstraps_per_sec", "value": 0.0,
              "unit": "gates/s", "vs_baseline": 0.0, "config": cfg,
              "error": f"{type(e).__name__}: {str(e)[:300]}"})
        return
    headline = {"metric": "gate_bootstraps_per_sec", "value": round(rate, 1),
                "unit": "gates/s",
                "vs_baseline": round(rate / BASELINE_GATES_PER_SEC, 3),
                "config": cfg, **extra}
    # emit the headline the moment it exists (round 4 died holding it),
    # then again as the FINAL line so the driver parses it as THE metric
    emit(headline)
    _HEADLINE[0] = headline
    if (os.environ.get("BENCH_DIAMOND", "1") != "0"
            and os.path.isdir(FIXTURES)):
        run_diamond()
    run_best_config()
    emit(headline)


if __name__ == "__main__":
    main()

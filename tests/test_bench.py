"""The bench harness itself is a deliverable: the driver runs bench.py
at round end and parses its LAST JSON line as THE metric.  Round 4's run
was killed mid-extras with the headline measured but unprinted
(BENCH_r04.json: rc 124, parsed null), so these tests pin the contract:
a headline line exists, it is the final line, and a SIGTERM mid-run
still produces a record."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


def _env(**kw):
    env = dict(
        os.environ,
        BENCH_PLATFORM="cpu",
        BENCH_PARAMS="toy",
        BENCH_G="64",
        BENCH_REPS="1",
        BENCH_DIAMOND="0",
        BENCH_BEST="0",
        BENCH_INIT_RETRIES="1",
    )
    env.update({k: str(v) for k, v in kw.items()})
    return env


def _json_lines(out):
    return [json.loads(ln) for ln in out.splitlines()
            if ln.startswith("{")]


@pytest.mark.slow
def test_bench_headline_first_and_last():
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=300,
                       env=_env())
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json_lines(r.stdout)
    heads = [x for x in recs
             if x["metric"] == "gate_bootstraps_per_sec"]
    # emitted immediately after measurement AND as the final line
    assert len(heads) == 2 and recs[-1] == heads[0]
    assert heads[0]["value"] > 0 and heads[0]["wrong_results"] == 0


@pytest.mark.slow
def test_bench_budget_skips_extras_with_records():
    # a tiny budget must skip diamond/best-known with explicit records,
    # not silently truncate the output
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                       capture_output=True, text=True, timeout=300,
                       env=_env(BENCH_DIAMOND="1", BENCH_BEST="1",
                                BENCH_BUDGET="5"))
    assert r.returncode == 0, r.stderr[-2000:]
    recs = _json_lines(r.stdout)
    by_metric = {x["metric"]: x for x in recs}
    assert "skipped" in by_metric["diamond_sec_per_cycle"]["error"]
    assert "skipped" in by_metric["gate_bootstraps_per_sec_best"]["error"]
    assert recs[-1]["metric"] == "gate_bootstraps_per_sec"
    assert recs[-1]["value"] > 0


@pytest.mark.slow
def test_bench_sigterm_still_emits_record():
    # SIGTERM during the measurement (the driver's timeout path) must
    # still leave a parseable record on stdout
    proc = subprocess.Popen([sys.executable, "bench.py"], cwd=REPO,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL, text=True,
                            env=_env(BENCH_REPS="500"))
    time.sleep(15)   # probe + keys + compile + into the reps loop
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=60)
    recs = _json_lines(out)
    assert recs, "no JSON record after SIGTERM"
    assert recs[-1]["metric"] == "gate_bootstraps_per_sec"

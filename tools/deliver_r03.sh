#!/bin/bash
# Round-3 deliverable batch (run after the config sweep picked the default):
#   1. error-rate + cascade at the no-flag default   -> ERROR_RATE.json (+ log)
#   2. bench.py (G=2048)                             -> BENCH_interim_r03.json
#   3. diamond across execution modes                -> DIAMOND_r03.log
#   4. full tfhe registry at cggi128                 -> TFHE_REGISTRY_r03.{json,log}
cd /root/repo

echo "=== [1/4 error rate + cascade] $(date) ==="
timeout 3600 env ER_BATCHES=25 ER_CASCADE=8 \
  python tools/measure_error_rate.py 2>&1 | tee /root/repo/ERROR_RATE_r03.log

echo "=== [2/4 bench] $(date) ==="
timeout 3600 env BENCH_G=2048 BENCH_DIAMOND=0 python bench.py 2>&1 | tee /tmp/bench_r03.log
grep '^{' /tmp/bench_r03.log > /root/repo/BENCH_interim_r03.json

echo "=== [3/4 diamond modes] $(date) ==="
{
  echo "--- mode: default (FUSE=8, per-level) + stage breakdown ---"
  timeout 3600 python tools/run_diamond_tfhe.py
  echo "--- mode: FUSE=all + scan chunk 4 ---"
  timeout 3600 env IYOKAN_FUSE_LEVELS=all DIAMOND_STAGES=0 \
    python tools/run_diamond_tfhe.py
  echo "--- mode: FUSE=all (whole-cycle fusion, no scan) ---"
  timeout 3600 env IYOKAN_FUSE_LEVELS=all IYOKAN_SCAN_CHUNK=1 DIAMOND_STAGES=0 \
    python tools/run_diamond_tfhe.py
} 2>&1 | tee /root/repo/DIAMOND_r03.log

echo "=== [4/4 tfhe registry cggi128] $(date) ==="
timeout 14400 python tools/run_tests.py tfhe --params cggi128 \
  --results-json /root/repo/TFHE_REGISTRY_r03.json 2>&1 \
  | tee /root/repo/TFHE_REGISTRY_r03.log
echo "[pipeline done] $(date)"

#!/bin/bash
# Round-3 TPU deliverable batch: waits for the axon tunnel, then runs
#   0. lb=2 kernel compile check (fallback gate)   -> /root/repo/TKCHECK_r03.log
#   1. bench.py (default config, incl diamond)     -> /root/repo/BENCH_interim_r03.json
#   2. tkey matrix sweep (gadget x chains x BG)    -> /root/repo/SWEEP_r03.log
#   3. error rate + cascade at default config      -> /root/repo/ERROR_RATE.json
#   4. diamond across execution modes              -> /root/repo/DIAMOND_r03.log
#   5. full tfhe registry at cggi128               -> /root/repo/TFHE_REGISTRY_r03.log
cd /root/repo
n=0
while true; do
  n=$((n+1))
  echo "[probe $n] $(date)"
  if timeout 420 python -c 'import jax; import numpy as np, jax.numpy as jnp; x=jnp.ones((8,8),jnp.int8); print("DEVICES:", jax.devices(), np.asarray(jnp.dot(x,x,preferred_element_type=jnp.int32))[0,0])'; then
    echo "[tunnel up] $(date)"
    break
  fi
  echo "[probe $n failed] $(date)"
  sleep 90
done

echo "=== [0/5 lb=2 compile check] $(date) ==="
if timeout 1800 python tools/tk_compile_check.py 1024 512 3 3 fat 2 \
     2>&1 | tee /root/repo/TKCHECK_r03.log; then
  echo "[lb=2 kernel OK]"
else
  echo "[lb=2 kernel FAILED -> falling back to lb=3 for the rest]"
  export IYOKAN_TK_LB=3
fi

echo "=== [0b kmaj compile check] $(date) ==="
if timeout 1800 env IYOKAN_TK_KMAJ=1 python tools/tk_compile_check.py 128 64 3 3 fat "${IYOKAN_TK_LB:-2}" \
     2>&1 | tee -a /root/repo/TKCHECK_r03.log; then
  echo "[kmaj kernel OK]"
else
  echo "[kmaj kernel FAILED -> IYOKAN_TK_KMAJ=0 for the rest]"
  export IYOKAN_TK_KMAJ=0
fi

echo "=== [1/5 bench] $(date) ==="
timeout 5400 python bench.py 2>&1 | tee /tmp/bench_r03.log
grep '^{' /tmp/bench_r03.log > /root/repo/BENCH_interim_r03.json

echo "=== [2/5 sweep] $(date) ==="
timeout 7200 python tools/tk_pipe_sweep.py 3 2>&1 | tee /root/repo/SWEEP_r03.log

echo "=== [3/5 error rate + cascade] $(date) ==="
timeout 7200 env ER_BATCHES=25 ER_CASCADE=8 \
  python tools/measure_error_rate.py 2>&1 | tee /tmp/er_r03.log

echo "=== [4/5 diamond modes] $(date) ==="
{
  echo "--- mode: default (FUSE=8, per-level) + stage breakdown ---"
  timeout 4800 python tools/run_diamond_tfhe.py
  echo "--- mode: FUSE=all (whole-cycle fusion) ---"
  timeout 4800 env IYOKAN_FUSE_LEVELS=all IYOKAN_SCAN_CHUNK=1 DIAMOND_STAGES=0 \
    python tools/run_diamond_tfhe.py
  echo "--- mode: FUSE=all + scan chunk 4 ---"
  timeout 4800 env IYOKAN_FUSE_LEVELS=all DIAMOND_STAGES=0 \
    python tools/run_diamond_tfhe.py
  echo "--- mode: FUSE=all + scan + small batches routed to tkey kernel ---"
  timeout 4800 env IYOKAN_FUSE_LEVELS=all DIAMOND_STAGES=0 IYOKAN_UNROLL_MAX=0 \
    python tools/run_diamond_tfhe.py
} 2>&1 | tee /root/repo/DIAMOND_r03.log

echo "=== [5/5 tfhe registry cggi128] $(date) ==="
timeout 14400 python tools/run_tests.py tfhe --params cggi128 --results-json /root/repo/TFHE_REGISTRY_r03.json 2>&1 \
  | tee /root/repo/TFHE_REGISTRY_r03.log
echo "[pipeline done] $(date)"

#!/bin/bash
# Round-5 device session plan.  Stage 0 (the cggi128 registry completion)
# runs FIRST and owns the device; stages 1-5 are the measurement agenda
# the round-4 second session never got to run (deliver_r04b.sh, session
# ended after 7 turns), plus the end-of-round cache prewarm.  Run stages
# manually in order; every runner retries transient tunnel failures.
set -x
cd "$(dirname "$0")/.."

# 0. finish the cggi128 registry record (resumable; 6 MUX-memory tests
#    remained after round 4's 17/23)
timeout 11000 python tools/run_tests.py tfhe --order cheap --retries 3 \
  --workdir .testwork-cggi128 \
  --results-json TFHE_REGISTRY_r05.json \
  --resume-from TFHE_REGISTRY_r04.json 2>&1 | tee -a REGISTRY_r05.log

# 1. per-level cost split inside a fused program: BR vs SEI+KS vs full
#    (decides whether the in-kernel SEI+KS epilogue is worth building)
LEVEL_GS=32,128 timeout 2500 python tools/level_floor.py \
  2>&1 | tee -a LEVELFLOOR_r05.log

# 2. the two lb=2 ablation rows round 3 lost + G=4096 fixed-overhead
#    scaling (VERDICT r03 weak #5)
timeout 5000 python tools/tk_pipe_sweep.py 3 --only "ablated,G=4096" \
  2>&1 | tee -a SWEEP_r05.log

# 3. small-batch chains/slots routing rows (r04b stage 2, never ran)
SMALLG_ROUTES=tkey,sei+ks SMALLG_CHAINS=1,2 SMALLG_GS=32,64,128 \
  timeout 3500 python tools/smallg_r04.py 2>&1 | tee -a SMALLG_r05.log

# 4. flagship re-run (slab cache warm; routing defaults updated from 1-3)
timeout 3500 python tools/run_diamond_tfhe.py 2>&1 | tee -a DIAMOND_r05.log

# 5. bench end-to-end -- ALSO the compile-cache prewarm for the driver's
#    own bench invocation at round end (same programs, same shapes)
timeout 3000 python bench.py 2>&1 | tee -a BENCH_r05_pre.log

# ---------------------------------------------------------------------
# POSTSCRIPT (end of round 5): how the plan actually ran.
#   stage 0  DONE  TFHE_REGISTRY_r05.json: 23/23 green at cggi128
#   stage 1  DONE  LEVELFLOOR_r05.log (after fixing the tool to pass
#                  keys as jit args); SEI+KS epilogue lane closed
#   stage 2  DONE  SWEEP_r05.log: 8738 gates/s best; mm/vpu/decompose
#                  ablations SIGABRT permanently (PERF.md round 5)
#   stage 3  DONE  SMALLG_r05{,b}.log (trimmed rows) -- found + fixed
#                  the chains=1 pipe-schedule bug
#   stage 4  DONE  via bench's diamond line: 1.475-1.477 s/cycle MATCH
#                  (BENCH_r05_pre.log, BENCH_r05_rehearsal.log)
#   stage 5  DONE  BENCH_r05_pre{,2}.log + BENCH_r05_rehearsal.log:
#                  full record rc 0 in 19 min warm; key + XLA compile
#                  caches populated in-container for the driver's run

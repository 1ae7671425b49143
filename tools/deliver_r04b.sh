#!/bin/bash
# Round-4 SECOND device session: level-floor anatomy, small-batch
# chains/slots routing, the lb=2 ablation holes, G=4096 scaling -- then
# the diamond + bench re-runs with whatever the data says the default
# routing should be.  Stages are independent; run manually in order.
set -x
cd "$(dirname "$0")/.."

# 1. per-level cost split inside a fused program: BR vs SEI+KS vs full
#    (decides whether the in-kernel SEI+KS epilogue is worth building)
LEVEL_GS=32,128 timeout 2500 python tools/level_floor.py \
  2>&1 | tee -a LEVELFLOOR_r04.log

# 2. small-batch routing: chain count x DMA-slot depth at level sizes
#    (slots=4 is the new small-G default -- the step loop was DMA-bound)
SMALLG_ROUTES=tkey,sei+ks SMALLG_CHAINS=1,2 SMALLG_GS=32,64,128,256 \
  timeout 3500 python tools/smallg_r04.py 2>&1 | tee -a SMALLG_r04.log
# slots=2 comparison rows (pre-slots numbers were measured before the
# compile-probe ladder; re-pin them in the same session)
SMALLG_ROUTES=tkey SMALLG_CHAINS=2 SMALLG_GS=32,128 IYOKAN_TK_SLOTS=2 \
  timeout 2000 python tools/smallg_r04.py 2>&1 | tee -a SMALLG_r04.log

# 3. the two lb=2 ablation rows round 3 lost + the fine VPU-stage rows
#    + G=4096 fixed-overhead scaling
timeout 5000 python tools/tk_pipe_sweep.py 3 --only "ablated,G=4096" \
  2>&1 | tee -a SWEEP_r04.log

# 4. flagship re-run (routing defaults updated from 1-3)
timeout 3500 python tools/run_diamond_tfhe.py 2>&1 | tee -a DIAMOND_r04.log

# 5. bench: default + best-known lines
timeout 3000 python bench.py 2>&1 | tee -a BENCH_r04_pre.log

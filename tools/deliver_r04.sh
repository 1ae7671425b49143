#!/bin/bash
# Round-4 TPU measurement pipeline (run stages MANUALLY or as a whole;
# each stage appends to its own log; every runner involved retries
# transient tunnel failures and the registry resumes from its record).
set -x
cd "$(dirname "$0")/.."

# 1. flagship: encrypted cahp-diamond with the periodic RAM refresh
#    (default period 16), per-level fused groups (default fuse=8)
timeout 3500 python tools/run_diamond_tfhe.py 2>&1 | tee -a DIAMOND_r04.log

# 2. whole-cycle fusion WITHOUT scan (per-cycle single dispatch):
#    never measured in round 3; isolates dispatch overhead from scan
IYOKAN_FUSE_LEVELS=all IYOKAN_SCAN_CHUNK=1 DIAMOND_STAGES=0 \
  timeout 3500 python tools/run_diamond_tfhe.py 2>&1 | tee -a DIAMOND_r04.log

# 3. scan mode (chunked), for the scan-vs-per-level paragraph
IYOKAN_FUSE_LEVELS=all IYOKAN_SCAN_CHUNK=4 DIAMOND_STAGES=0 \
  timeout 3500 python tools/run_diamond_tfhe.py 2>&1 | tee -a DIAMOND_r04.log

# 4. the cggi128 registry record (resumable; cheap-first; retries)
timeout 11000 python tools/run_tests.py tfhe --order cheap --retries 2 \
  --workdir /tmp/iyokan-registry-r04 \
  --results-json TFHE_REGISTRY_r04.json \
  --resume-from TFHE_REGISTRY_r04.json 2>&1 | tee -a TFHE_REGISTRY_r04.log

# 5. bench: default + best-known lines
timeout 3000 python bench.py 2>&1 | tee -a BENCH_r04_pre.log

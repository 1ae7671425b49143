#!/bin/bash
# Post-ablation perf sweep: bench.py under kernel-config combinations.
# Each run is an isolated process; failures don't stop the sweep.
# Usage: bash tools/bench_sweep.sh [G]
G=${1:-1024}
cd "$(dirname "$0")/.."
run() {
    desc=$1; shift
    echo "=== $desc"
    env "$@" BENCH_G=$G BENCH_REPS=3 timeout 1800 python bench.py 2>&1 \
        | grep -E "^#|metric" | sed 's/^/    /'
}
run "xla-plain (r1 default)"      IYOKAN_NO_UNROLL=1
run "v3-plain BG=256"             IYOKAN_BR_IMPL=v3 IYOKAN_NO_UNROLL=1
run "v3-plain BG=128"             IYOKAN_BR_IMPL=v3 IYOKAN_NO_UNROLL=1 IYOKAN_PALLAS_BG=128
run "v3-unroll BG=128"            IYOKAN_BR_IMPL=v3 IYOKAN_UNROLL_MAX=100000
run "v3-unroll BG=64"             IYOKAN_BR_IMPL=v3 IYOKAN_UNROLL_MAX=100000 IYOKAN_PALLAS_BG=64
run "v3-unroll BG=256"            IYOKAN_BR_IMPL=v3 IYOKAN_UNROLL_MAX=100000 IYOKAN_PALLAS_BG=256
run "xla-unroll"                  IYOKAN_UNROLL_MAX=100000

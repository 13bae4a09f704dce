#!/bin/bash
# Round-4 measurement battery: validates the vmap-safe control-flow fixes
# (cond_once/retry_while), the rebuilt batched benchmark (honest reference
# shapes incl. batched_mixed_rq_eq + the two-tier SDP rescue), and fills
# the round-3 gaps (larger_sdp chained number, roofline_verify). Cheapest
# first so partial tunnel windows still yield data; heavy steps run in
# separate processes (fresh timeout + tunnel-worker isolation each).
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks benchmarks/logs_r4

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$BATTERY_STEP_TIMEOUT" "$@" > "benchmarks/logs_r4/${name}.log" 2>&1
  rc=$?
  tail -5 "benchmarks/logs_r4/${name}.log"
  echo "=== $name rc=$rc ==="
}

BATTERY_STEP_TIMEOUT=${BATTERY_STEP_TIMEOUT:-2400}

# 1. headline (regression check: retry_while/cond_once touch the hot path)
run bench python bench.py

# 2. acceptance (correctness on chip after the control-flow changes)
run acceptance python tools/tpu_acceptance.py

# 3. roofline verification (the r3 81 ms composite artifact + the
#    HIGH/HIGHEST precision-mode lowering question) — never ran in r3
run roofline_verify python tools/roofline_verify.py --n 1024

# 4. batched throughput, one family per process (a single multi-family
#    process crashed the tunneled worker in r3); K=1 keeps each execute
#    RPC under the worker watchdog
for fam in batched_box_qp batched_mixed_rq_eq batched_small_sdp \
           batched_mixed_rqs; do
  run "bb_${fam}" python tools/bench_batched.py --batch 64 --K 1 \
      --families "$fam" --out "benchmarks/batched_r4_${fam}.json"
done

# 5. per-family chained incl. the missing larger_sdp number
for fam in box_qp_dense box_qp_sparse single_soc many_small_socs \
           "small_sdp(k=10)" "small_sdp(k=30)" mixed_rq_eq mixed_rqs; do
  safe=$(echo "$fam" | tr -d '()=,' )
  run "chained_${safe}" python profile.py --chained 8 \
      --factor-dtype float32 --backends schur --families "$fam" \
      --json "benchmarks/chained_r4_${safe}.json"
done

# 6. devbench (refresh the cost model incl. small-n blocked-f64 rows)
run devbench python tools/devbench.py --n 1024

echo "battery4 complete: $(date)"

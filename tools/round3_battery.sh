#!/bin/bash
# Round-3 follow-up battery: everything that needs the tunnel after the
# blocked-f64 / last-mile / bench_batched fixes, cheapest first so partial
# tunnel windows still yield data. Heavy profile families run in SEPARATE
# processes (fresh step timeout + tunnel-worker isolation each).
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$BATTERY_STEP_TIMEOUT" "$@" > "/tmp/battery3_${name}.log" 2>&1
  rc=$?
  tail -5 "/tmp/battery3_${name}.log"
  echo "=== $name rc=$rc ==="
}

BATTERY_STEP_TIMEOUT=${BATTERY_STEP_TIMEOUT:-2400}

# 1. headline (validates the ipm/schur changes end to end on chip)
run bench python bench.py

# 2. devbench with the blocked-f64 rows (validates ops/blocked64 on chip)
run devbench python tools/devbench.py --n 1024

# 3. roofline composite verification (trace-grade; settles the 81 ms
#    artifact + the HIGH/HIGHEST precision-mode question)
run roofline_verify python tools/roofline_verify.py --n 1024

# 4. acceptance (correctness after the changes)
run acceptance python tools/tpu_acceptance.py

# 5. per-family chained, split per family
for fam in box_qp_dense box_qp_sparse single_soc many_small_socs \
           "small_sdp(k=10)" "small_sdp(k=30)" mixed_rq_eq mixed_rqs; do
  safe=$(echo "$fam" | tr -d '()=,' )
  run "chained_${safe}" python profile.py --chained 8 \
      --factor-dtype float32 --backends schur --families "$fam" \
      --json "benchmarks/chained_r3_${safe}.json"
done

# 6. batched throughput (short chains — long in-jit chains crashed the
#    tunneled worker watchdog)
run bench_batched python tools/bench_batched.py --batch 64 --K 1

echo "battery3 complete: $(date)"

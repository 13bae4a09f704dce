#!/bin/bash
# Round-2 TPU measurement battery: run everything that needs the tunnel in
# one window, in dependency order (cheapest first so partial windows still
# yield data). Each step logs to benchmarks/ and /tmp/battery_*.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$BATTERY_STEP_TIMEOUT" "$@" > "/tmp/battery_${name}.log" 2>&1
  rc=$?
  tail -5 "/tmp/battery_${name}.log"
  echo "=== $name rc=$rc ==="
}

BATTERY_STEP_TIMEOUT=${BATTERY_STEP_TIMEOUT:-2400}

# 1. headline (chain-differenced; also proves the tunnel works end to end)
run bench python bench.py

# 2. device microbenchmarks (cost model refresh, fast)
run devbench python tools/devbench.py --n 1024

# 3. roofline verdict (VERDICT item 5)
run roofline python tools/roofline.py

# 4. batched throughput story (VERDICT item 1 route b)
run bench_batched python tools/bench_batched.py --batch 64 --K 1

# 5. per-family chained table (production config incl. correctors)
run profile_chained python profile.py --chained 8 --factor-dtype float32 \
    --backends schur --json benchmarks/profile_tpu_v5e_chained_r2b.json

# 6. acceptance sweep
run acceptance python tools/tpu_acceptance.py

echo "battery complete: $(date)"

#!/bin/bash
# Round-5 measurement battery. Crash-proof sequencing (VERDICT r4 item 8):
# one family per process, every dispatch under the ~1 min device-time
# budget, and a TPU health probe GATES each heavy step — a degraded
# tunnel (probe > 30 s) skips the step with an explained marker instead
# of wedging the battery or crashing the worker.
set -u
cd "$(dirname "$0")/.."
mkdir -p benchmarks benchmarks/logs_r5

probe() {
  timeout 240 python - <<'PY' >/dev/null 2>&1
import time, numpy as np
t0 = time.time()
import jax, jax.numpy as jnp
np.asarray(jax.jit(lambda a: a @ a)(jnp.ones((128, 128), jnp.float32)))
raise SystemExit(0 if time.time() - t0 < 30 else 1)
PY
}

run() {
  name=$1; shift
  if ! probe; then
    echo "=== $name SKIPPED: TPU health probe failed/degraded ===" \
      | tee "benchmarks/logs_r5/${name}.log"
    return
  fi
  echo "=== $name: $* ==="
  timeout "${BATTERY_STEP_TIMEOUT:-2400}" "$@" \
    > "benchmarks/logs_r5/${name}.log" 2>&1
  rc=$?
  tail -5 "benchmarks/logs_r5/${name}.log"
  echo "=== $name rc=$rc ==="
}

# 1. headline (regression check for the r5 solver changes)
run bench python bench.py

# 2. acceptance: all 8 reference families Optimal on chip
run acceptance python tools/tpu_acceptance.py

# 3. corrected roofline + end-to-end dense-KKT probes
run roofline python tools/roofline.py
run densekkt_2048 python tools/densekkt_n_probe.py --n 2048
run densekkt_4096 python tools/densekkt_n_probe.py --n 4096

# 4. batched throughput, one family per process
for fam in batched_box_qp batched_mixed_rq_eq batched_small_sdp \
           batched_mixed_rqs; do
  run "bb_${fam}" python tools/bench_batched.py --batch 64 --K 1 \
      --families "$fam" --out "benchmarks/batched_r5_${fam#batched_}.json"
done

# 5. per-family chained incl. larger_sdp(k=30)
for fam in box_qp_dense box_qp_sparse single_soc many_small_socs \
           "small_sdp(k=10)" "small_sdp(k=30)" mixed_rq_eq mixed_rqs; do
  safe=$(echo "$fam" | tr -d '()=,')
  run "chained_${safe}" python profile.py --chained 8 \
      --backends schur --families "$fam" \
      --json "benchmarks/chained_r5_${safe}.json"
done

# 6. anomaly regression probe (all variants must measure f32 costs)
run anomaly_ab python tools/anomaly_ab.py

echo "battery5 complete: $(date)"

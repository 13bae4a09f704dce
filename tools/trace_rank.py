#!/usr/bin/env python
"""Rank device-op costs inside the batched SDP solve from a profiler trace.

The stage-split (benchmarks/sdp_stage_split_tpu.json) shows a batched
small-SDP iteration costs ~60-130 ms on chip while its component stages
(batched_iter_trace) sum to ~15 ms — so the composed while-body must be
paying somewhere invisible to per-stage probes. This tool runs the
production batched solver under ``jax.profiler.trace``, then parses the
emitted trace-events JSON and prints total device time grouped by op
name, so the dominator is identified from the real timeline instead of
guessed.

Usage: python tools/trace_rank.py [--batch 64] [--mode fast|tier2]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["fast", "tier2", "spectral"],
                    default="tier2")
    ap.add_argument("--maxiters", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.models import generators as gen
    from conicip_tpu.parallel.batch import make_batched_solver
    from conicip_tpu.solver import _default_kktsolver as _dk
    from conicip_tpu.solver.ipm import IPMOptions

    B, k = args.batch, args.k
    Q, c, A, b, cones = gen.batched_small_sdp(B, k=k)
    spec = ConeSpec(tuple(cones))
    n = c.shape[-1]
    if args.mode == "fast":
        opts = IPMOptions(optTol=1e-6, mixedResiduals=True, fastEig=True,
                         refinedEig=True, twoModeKKT=False,
                         maxIters=args.maxiters)
        kkt = _dk(jnp.float32)
    elif args.mode == "spectral":
        from conicip_tpu.kkt.spectral import spectral_kktsolver

        opts = IPMOptions(optTol=1e-6, mixedResiduals=False, fastEig=False,
                         refinedEig=True, twoModeKKT=False, stallCutoff=4,
                         maxIters=args.maxiters)
        kkt = spectral_kktsolver("refined")
    else:
        opts = IPMOptions(optTol=1e-6, mixedResiduals=False, fastEig=False,
                         refinedEig=True, twoModeKKT=False,
                         maxIters=args.maxiters)
        kkt = _dk(None)
    solver = make_batched_solver(spec, kkt, opts)
    Qd, cd, Ad, bd = map(jnp.asarray, (Q, c, A, b))
    Gz = jnp.zeros((B, 0, n))
    dz = jnp.zeros((B, 0))

    st = solver(Qd, cd, Ad, bd, Gz, dz)
    np.asarray(st.y)  # compile + warm
    tdir = "/tmp/trace_rank"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        st = solver(Qd, cd, Ad, bd, Gz, dz)
        np.asarray(st.y)
    status = np.asarray(st.status)
    print(f"# mode={args.mode} statuses="
          f"{dict(zip(*map(list, np.unique(status, return_counts=True))))}",
          file=sys.stderr)

    # ── parse the trace: sum durations by op, device tracks only ──
    paths = sorted(glob.glob(os.path.join(
        tdir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
    if not paths:
        print("no trace file found", file=sys.stderr)
        sys.exit(1)
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # identify device process ids (TPU/device tracks, not python/host)
    dev_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname = e.get("args", {}).get("name", "")
            if any(s in pname.lower() for s in ("tpu", "device", "xla")):
                if "host" not in pname.lower():
                    dev_pids.add(e["pid"])
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        agg[name] += dur
        cnt[name] += 1
        total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    print(f"# total device-op time {total:.1f} ms across "
          f"{sum(cnt.values())} events ({len(agg)} distinct ops)")
    for name, ms in rows:
        print(f"{ms:10.2f} ms  x{cnt[name]:<6d} {name[:110]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Macro profiling suite — the reference's benchmark/profile.jl analogue.

Runs the eight problem families (models/generators.py, mirroring
profile.jl:20-131) across KKT backends, reporting per-solve wall time
(median of trials with distinct problem instances, device-resident inputs),
IP iteration counts, statuses, and derived ms/iteration. Optionally emits a
JSON report and an xprof trace.

Usage:
    python profile.py [--trials 3] [--json out.json] [--backends schur,qr,lu]
    python profile.py --trace /tmp/trace   # adds a jax.profiler trace
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--backends", type=str, default="schur,qr,lu")
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--factor-dtype", type=str, default="float32",
                    choices=["float32", "float64"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.kkt import kktsolver_lu, kktsolver_qr, kktsolver_schur
    from conicip_tpu.solver import (_default_kktsolver, _solve_jit,
                                    _solve_warm_jit)
    from conicip_tpu.models import ALL_GENERATORS
    from conicip_tpu.solver.ipm import IPMOptions
    from conicip_tpu.solver.state import STATUS_NAMES, Status, Vec4

    factor_dtype = jnp.float32 if args.factor_dtype == "float32" else None
    backends = {}
    for name in args.backends.split(","):
        if name == "schur":
            backends[name] = _default_kktsolver(factor_dtype)
        elif name == "qr":
            backends[name] = kktsolver_qr
        elif name == "lu":
            backends[name] = kktsolver_lu
        else:
            raise SystemExit(f"unknown backend {name}")

    opts = IPMOptions(optTol=1e-6, mixedResiduals=args.factor_dtype == "float32")
    opts64 = IPMOptions(optTol=1e-6)

    ladder = (
        (_default_kktsolver(jnp.float32, jnp.float64),
         IPMOptions(optTol=1e-6, mixedResiduals=True)),
        (_default_kktsolver(None), opts64),
    )

    def solve_like_conic_ip(staged_p, spec, kkt):
        """Mirror conic_ip's device path: fast solve + warm backstop
        ladder (f64-assembled/f32-factored, then full f64) when the f32
        factorization is exhausted near a solution (solver/__init__.py)."""
        st = _solve_jit(*staged_p, spec=spec, kktsolver=kkt, opts=opts)
        for kkt_next, opts_next in ladder:
            status = int(st.status)
            resid = float(
                jnp.maximum(st.prFeas, jnp.maximum(st.duFeas, st.muFeas))
            )
            if not (status in (Status.ABANDONED, Status.ERROR)
                    and resid < 1e-2):
                break
            Q, c, A, b, G, d = staged_p
            warm = Vec4(st.y, st.w, st.v, A @ st.y - b)
            st = _solve_warm_jit(Q, c, A, b, G, d, warm, spec=spec,
                                 kktsolver=kkt_next, opts=opts_next)
        return st
    print(f"# backend={jax.default_backend()} trials={args.trials} "
          f"factor_dtype={args.factor_dtype}", file=sys.stderr)
    print("# NOTE: absolute times include per-solve host<->device tunnel "
          "round trips (~0.1-0.3 s on axon); bench.py chains solves inside "
          "one jit for tunnel-proof numbers", file=sys.stderr)

    results = []
    for gen in ALL_GENERATORS:
        # distinct instances per trial to defeat any execution caching
        probs = [gen(seed=42 + t) for t in range(args.trials + 1)]
        spec = ConeSpec(probs[0].cone_dims)
        name = probs[0].name

        def put(p):
            n = len(p.c)
            G = p.G if p.G is not None else np.zeros((0, n))
            d = p.d if p.d is not None else np.zeros(0)
            return tuple(
                jax.device_put(jnp.asarray(x))
                for x in (p.Q, p.c, p.A, p.b, G, d)
            )

        staged = [put(p) for p in probs]
        for bname, kkt in backends.items():
            times, iters, stat = [], [], []
            try:
                # warmup/compile on instance 0 — including the warm
                # full-precision backstop path, which otherwise compiles
                # inside a timed trial when only some instances trigger it
                st = _solve_jit(*staged[0], spec=spec, kktsolver=kkt,
                                opts=opts)
                Q0, c0, A0, b0, G0, d0 = staged[0]
                warm0 = Vec4(st.y, st.w, st.v, A0 @ st.y - b0)
                for kkt_next, opts_next in ladder:
                    stw = _solve_warm_jit(Q0, c0, A0, b0, G0, d0, warm0,
                                          spec=spec, kktsolver=kkt_next,
                                          opts=opts_next)
                    np.asarray(stw.Iter)
                np.asarray(st.Iter)
                for t in range(1, args.trials + 1):
                    t0 = time.perf_counter()
                    st = solve_like_conic_ip(staged[t], spec, kkt)
                    np.asarray(st.Iter)  # block_until_ready is unreliable
                    times.append(time.perf_counter() - t0)
                    iters.append(int(st.Iter))
                    stat.append(STATUS_NAMES[int(st.status)])
                med = statistics.median(times)
                it = iters[len(iters) // 2]
                row = dict(problem=name, backend=bname,
                           median_s=round(med, 6), iters=it,
                           ms_per_iter=round(med / max(it, 1) * 1e3, 4),
                           status=stat[0])
            except Exception as e:  # noqa: BLE001 — record and continue
                row = dict(problem=name, backend=bname, median_s=None,
                           iters=None, ms_per_iter=None,
                           status=f"failed: {type(e).__name__}")
            results.append(row)
            print(f"{name:34s} {bname:6s} "
                  f"{row['median_s'] if row['median_s'] is not None else '—':>10} s  "
                  f"iters={row['iters']}  status={row['status']}")

    if args.trace:
        import jax.profiler

        p = ALL_GENERATORS[1](seed=7)
        spec = ConeSpec(p.cone_dims)
        staged = tuple(jax.device_put(jnp.asarray(x)) for x in (
            p.Q, p.c, p.A, p.b,
            np.zeros((0, len(p.c))), np.zeros(0)))
        kkt = _default_kktsolver(factor_dtype)
        jax.block_until_ready(
            _solve_jit(*staged, spec=spec, kktsolver=kkt, opts=opts))
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(
                _solve_jit(*staged, spec=spec, kktsolver=kkt, opts=opts))
        print(f"trace written to {args.trace}", file=sys.stderr)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"report written to {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()

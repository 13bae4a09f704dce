#!/usr/bin/env python
"""Stage-split the batched small-SDP ladder: where do the ~10 s go?

The r4 verdict: batched_small_sdp runs at 6.2 solves/s (0.01x ref) and the
per-stage op trace (batched_iter_trace) cannot explain a ~57 ms batched
iteration — so the cost must live in the LADDER STRUCTURE (fast tier +
cond-gated rescue tiers, each a fresh vmapped while_loop that runs until
its LAST straggler finishes).  This tool times each tier as a separate
dispatch, with per-tier status histograms and Iter statistics, so the
cost decomposition is measured rather than guessed.

Also scans the fast tier over batch sizes (is the batched iteration cost
flat in B? then throughput scales linearly with B) and over maxIters
(is a straggler running the loop far past the median convergence?).

Usage: python tools/sdp_stage_split.py [--batch 64] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--bscan", type=int, nargs="*", default=[64, 256])
    ap.add_argument("--maxiters-scan", type=int, nargs="*", default=[])
    ap.add_argument("--skip-tiers", action="store_true")
    ap.add_argument("--only-bscan", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401  (x64 on)
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.models import generators as gen
    from conicip_tpu.parallel.batch import (make_batched_solver,
                                            make_batched_warm_solver)
    from conicip_tpu.solver import _default_kktsolver as _dk
    from conicip_tpu.solver.ipm import IPMOptions
    from conicip_tpu.solver.state import Vec4

    _HI = jax.lax.Precision.HIGHEST
    B, k = args.batch, args.k
    backend = jax.default_backend()
    out = {"batch": B, "k": k, "backend": backend}
    print(f"# backend={backend} B={B} k={k}", file=sys.stderr)

    def family(batch):
        Q, c, A, b, cones = gen.batched_small_sdp(batch, k=k)
        n = c.shape[-1]
        return (tuple(map(jnp.asarray, (Q, c, A, b))),
                jnp.zeros((batch, 0, n)), jnp.zeros((batch, 0)),
                ConeSpec(tuple(cones)))

    def stats(st):
        status = np.asarray(st.status)
        iters = np.asarray(st.Iter)
        resid = np.maximum(np.asarray(st.prFeas),
                           np.maximum(np.asarray(st.duFeas),
                                      np.asarray(st.muFeas)))
        hist = {int(s): int((status == s).sum()) for s in np.unique(status)}
        return dict(status_hist=hist, iter_max=int(iters.max()),
                    iter_mean=round(float(iters.mean()), 2),
                    resid_max=float(np.max(resid)),
                    n_below_tol=int((resid < 1e-6).sum()))

    def timed(f, *xs):
        st = f(*xs)
        np.asarray(st.y)  # compile + warm
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            st = f(*xs)
            np.asarray(st.y)
            best = min(best, time.perf_counter() - t0)
        return best, st

    def mkopts(**kw):
        base = dict(optTol=1e-6, twoModeKKT=False)
        base.update(kw)
        return IPMOptions(**base)

    opts_fast = mkopts(mixedResiduals=True, fastEig=True, refinedEig=True)
    opts_t1 = mkopts(mixedResiduals=False, fastEig=True, refinedEig=True)
    opts_t2 = mkopts(mixedResiduals=False, fastEig=False, refinedEig=True)

    (Qd, cd, Ad, bd), Gz, dz, spec = family(B)
    if not args.only_bscan:
        # ── stage 1: fast tier alone ──
        fast = make_batched_solver(spec, _dk(jnp.float32), opts_fast)
        t_fast, st_fast = timed(fast, Qd, cd, Ad, bd, Gz, dz)
        out["fast_tier"] = dict(t_s=round(t_fast, 4), **stats(st_fast))
        print(json.dumps({"fast_tier": out["fast_tier"]}), flush=True)

    if not args.skip_tiers and not args.only_bscan:
        # warm start exactly as the fused rescue does
        def warm_from(st, Ad, bd):
            y = jnp.asarray(np.asarray(st.y))
            w = jnp.asarray(np.asarray(st.w))
            v = jnp.asarray(np.asarray(st.v))
            s = jnp.einsum("bij,bj->bi", Ad, y, precision=_HI) - bd
            return Vec4(y, w, v, s)

        warm1 = warm_from(st_fast, Ad, bd)
        tier1 = make_batched_warm_solver(spec, _dk(None), opts_t1)
        t_t1, st_t1 = timed(tier1, Qd, cd, Ad, bd, Gz, dz, warm1)
        out["tier1_f64kkt_fastEig"] = dict(t_s=round(t_t1, 4), **stats(st_t1))
        print(json.dumps({"tier1": out["tier1_f64kkt_fastEig"]}), flush=True)

        warm2 = warm_from(st_t1, Ad, bd)
        tier2 = make_batched_warm_solver(spec, _dk(None), opts_t2)
        t_t2, st_t2 = timed(tier2, Qd, cd, Ad, bd, Gz, dz, warm2)
        out["tier2_full_refined"] = dict(t_s=round(t_t2, 4), **stats(st_t2))
        print(json.dumps({"tier2": out["tier2_full_refined"]}), flush=True)

    # ── cold single-tier configs: which (kkt dtype, decomposition mode)
    # pairs certify, and at what cost, WITHOUT any ladder ──
    cold_configs = {} if args.only_bscan else {
        "cold_f64kkt_refined": (_dk(None), mkopts(
            mixedResiduals=False, fastEig=False, refinedEig=True)),
        "cold_f32kkt_refined": (_dk(jnp.float32), mkopts(
            mixedResiduals=True, fastEig=False, refinedEig=True)),
    }
    for cname, (ckkt, copts) in cold_configs.items():
        f = make_batched_solver(spec, ckkt, copts)
        t, st = timed(f, Qd, cd, Ad, bd, Gz, dz)
        row = dict(t_s=round(t, 4), **stats(st))
        out[cname] = row
        print(json.dumps({cname: row}), flush=True)

    # ── maxIters scan of the fast tier (straggler detector) ──
    for mi in args.maxiters_scan:
        o = mkopts(mixedResiduals=True, fastEig=True, refinedEig=True,
                   maxIters=mi)
        f = make_batched_solver(spec, _dk(jnp.float32), o)
        t, st = timed(f, Qd, cd, Ad, bd, Gz, dz)
        row = dict(t_s=round(t, 4), **stats(st))
        out[f"fast_maxIters_{mi}"] = row
        print(json.dumps({f"fast_maxIters_{mi}": row}), flush=True)

    # ── batch-size scan of the PRODUCTION config (f64 KKT + refined
    # decompositions): the program is op-count-bound, so throughput
    # should scale ~linearly with B — the TPU-native answer to tiny
    # problems ──
    for Bi in args.bscan:
        (Qi, ci, Ai, bi), Gzi, dzi, speci = family(Bi)
        f = make_batched_solver(speci, _dk(None), opts_t2)
        t, st = timed(f, Qi, ci, Ai, bi, Gzi, dzi)
        row = dict(t_s=round(t, 4), per_solve_ms=round(t / Bi * 1e3, 3),
                   solves_per_s=round(Bi / t, 1), **stats(st))
        out[f"refined_B{Bi}"] = row
        print(json.dumps({f"refined_B{Bi}": row}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"sdp_stage_split_{backend}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

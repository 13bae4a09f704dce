#!/usr/bin/env python
"""On-chip acceptance suite: correctness of the production solve path on
real TPU hardware, one command.

Covers what the CPU test suite cannot: the mixed-precision fast path, the
escalation ladder, and the TPU-specific kernel paths (eigh-form SDP
scaling, f32 LU, Ozaki certified products) all running on the actual chip.

Checks (expected: every line ok=True):
1. The 8 benchmark problem families (profile.jl analogues) through
   conic_ip's production path — all must reach Optimal.
2. Miles regression datasets 1-3 under data scalings kappa ∈
   {1e-4, 1, 1e4} — statuses must match the reference semantics
   (Optimal / Infeasible / Optimal).

Writes JSON to --json and exits nonzero on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests")
)

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    import conicip_tpu as ct
    from conicip_tpu.models import ALL_GENERATORS
    from conicip_tpu.preprocess import preprocess_conic_ip
    from miles import load_miles, mpb_to_conicip

    results = []
    failures = 0

    def record(name: str, status: str, resid: float, want: str):
        nonlocal failures
        # Optimal must also hit tolerance; certificates have no residual bar
        ok = status == want and (want != "Optimal" or resid < 1e-6)
        if not ok:
            failures += 1
        results.append(dict(name=name, status=status,
                            resid=float(resid), want=want, ok=bool(ok)))
        print(f"{name:42s} {status:<11s} resid {resid:9.2e} "
              f"want {want:<11s} ok={ok}", flush=True)

    # ── 1. problem families through the production path ──
    for gen in ALL_GENERATORS:
        p = gen(seed=42)
        sol = ct.conic_ip(p.Q, p.c, p.A, p.b, p.cone_dims, p.G, p.d,
                          factor_dtype=jnp.float32)
        record(p.name, sol.status,
               max(sol.prFeas, sol.duFeas, sol.muFeas), "Optimal")

    # ── 2. Miles datasets x scaling sweep ──
    expected = {1: "Optimal", 2: "Infeasible", 3: "Optimal"}
    for idx in (1, 2, 3):
        c, A, b, con, var = load_miles(idx)
        base = list(mpb_to_conicip(c, A, b, con, var))
        for kappa in (1e-4, 1.0, 1e4):
            a2 = list(base)
            a2[0] = np.asarray(a2[0]) * kappa
            a2[1] = np.asarray(a2[1]) * kappa
            sol = preprocess_conic_ip(*a2, factor_dtype=jnp.float32)
            record(f"miles{idx}(kappa={kappa:g})", sol.status,
                   max(sol.prFeas, sol.duFeas, sol.muFeas), expected[idx])

    print(f"\n{len(results) - failures}/{len(results)} checks passed")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

#!/usr/bin/env python
"""Feedback-chained sweep of f32 Cholesky / triangular-inverse cost vs n.

Round-4 finding (tools/roofline_verify.py): with an output-FEEDBACK chain
(each rep's input depends on the previous rep's output, so nothing folds),
XLA's f32 cholesky costs ~70 ms at n=1024 on v5e — while devbench's
scalar-perturbation chain (`x * (1 + 0*acc)`) was constant-folded and
reported 0.21 ms of fiction. This sweep maps the real cost curve for:

  - XLA `jnp.linalg.cholesky` (f32)
  - the Pallas VMEM kernel (ops/pallas_cholesky.py), previously judged
    "10x slower" against the fictitious XLA number
  - blocked f32 Cholesky built from GEMMs + small XLA base cases
    (ops/blocked64.blocked_cholesky applied to f32)
  - XLA `solve_triangular(L, I)` vs blocked_tri_inv (f32)

Usage: python tools/chol_sweep.py [--sizes 256 512 768 1024] [--reps 8]
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
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[256, 512, 768, 1024, 1536, 2048])
    ap.add_argument("--r1", type=int, default=3)
    ap.add_argument("--r2", type=int, default=9)
    ap.add_argument("--target-s", type=float, default=2.0,
                    help="adaptive pass: rep counts are raised until the "
                    "long chain carries ~this many seconds of op work, so "
                    "the slope rises above the tunnel's +-tens-of-ms "
                    "run-to-run jitter (the r3 devbench numbers for "
                    "sub-ms ops were below it and useless)")
    ap.add_argument("--ops", nargs="*", default=None,
                    help="subset of op names (default: all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401  (x64 on)
    from conicip_tpu.ops.blocked64 import blocked_cholesky, blocked_tri_inv

    def slope_feedback(op_on_v, v0, r1=args.r1, r2=args.r2):
        """Output-feedback chain: rep k+1's input depends on rep k's
        output — no folding/hoisting possible. Two passes: a cheap pilot
        estimates the per-rep cost, then rep counts are raised until the
        long chain carries ~target-s seconds of op work (sub-ms ops at a
        handful of reps sit below the tunnel jitter and produce garbage,
        including negative slopes)."""

        def chain(reps):
            @jax.jit
            def run(v):
                def body(i, v):
                    y = op_on_v(v)
                    out = y / (jnp.linalg.norm(y) + 1.0) + v * 1e-6
                    return out.astype(v.dtype)

                return jax.lax.fori_loop(0, reps, body, v)

            return run

        def timed(f, warm=True):
            np.asarray(f(v0))
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(f(v0))
                best = min(best, time.perf_counter() - t0)
            return best

        pilot = (timed(chain(r2)) - timed(chain(r1))) / (r2 - r1)
        est = max(pilot, 1e-5)  # negative/zero pilot -> assume cheap
        if est * (r2 - r1) >= 0.5 * args.target_s:
            return pilot
        r2b = min(int(args.target_s / est), 5000)
        r1b = max(r2b // 4, 1)
        return (timed(chain(r2b)) - timed(chain(r1b))) / (r2b - r1b)

    rows = []
    for n in args.sizes:
        rng = np.random.default_rng(0)
        B = rng.standard_normal((n, n)).astype(np.float32)
        M0 = jnp.asarray(B @ B.T / n + n * np.eye(n, dtype=np.float32))
        I = jnp.eye(n, dtype=jnp.float32)
        v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        L0 = jax.block_until_ready(jnp.linalg.cholesky(M0))

        def chol_xla(v):
            Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
            return jnp.linalg.cholesky(Ms)[:, 0]

        def chol_blocked(v):
            Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
            return blocked_cholesky(Ms, r=256)[:, 0]

        def tri_xla(v):
            L = L0 + jnp.diag(jnp.abs(v) * 1e-30)
            return solve_triangular(L, I, lower=True)[:, 0]

        def tri_blocked(v):
            L = L0 + jnp.diag(jnp.abs(v) * 1e-30)
            return blocked_tri_inv(L, r=256)[:, 0]

        ops = {
            "chol_xla_f32": chol_xla,
            "chol_blocked_f32": chol_blocked,
            "tri_inv_xla_f32": tri_xla,
            "tri_inv_blocked_f32": tri_blocked,
        }

        # Pallas kernel (TPU only, MXU-aligned sizes within VMEM bound)
        try:
            from conicip_tpu.ops.pallas_cholesky import (
                _MAX_VMEM_N, cholesky_f32, pallas_cholesky_available)

            if (n % 128 == 0 and n <= _MAX_VMEM_N
                    and pallas_cholesky_available(n, jnp.float32)):
                def chol_pallas(v):
                    Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
                    return cholesky_f32(Ms)[:, 0]

                ops["chol_pallas_f32"] = chol_pallas
        except Exception as e:  # noqa: BLE001
            print(f"# pallas unavailable at n={n}: {e}", file=sys.stderr)

        row = {"n": n, "backend": jax.default_backend()}
        for name, op in ops.items():
            if args.ops and name not in args.ops:
                continue
            try:
                t = slope_feedback(op, v0)
                row[name + "_ms"] = round(t * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                row[name + "_ms"] = f"ERROR {type(e).__name__}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"chol_sweep_{jax.default_backend()}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

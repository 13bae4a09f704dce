#!/usr/bin/env python
"""Feedback-chained sweep of f32 Cholesky / triangular-inverse cost vs n.

Round-4 measurement-discipline finding, part 2: output-feedback chaining
alone is NOT enough. A probe that slices the factor (``cholesky(Ms)[:, 0]``)
lets XLA push the slice through the blocked factorization and dead-code
most of the panels — chol_sweep's original rows (0.218 ms at n=1024) and
roofline_verify's chol row measured DIFFERENT programs (roofline's
composite, which consumes the whole factor, reproducibly costs ~80 ms at
n=1024 across tunnel windows). This sweep therefore times every op in two
consumption modes:

  - ``slice``: y = op(..)[:, 0]  (the old probe — kept to expose the DCE)
  - ``full`` : y = op(..) @ w    (every entry of the result feeds y)

The ``full`` rows are the real cost curve; production dispatch decisions
(ops/cholesky.py) key off them.

Usage: python tools/chol_sweep.py [--sizes 256 512 ...] [--ops chol_xla_full]
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

    _HI = jax.lax.Precision.HIGHEST

    def slope_feedback(op_on_v, v0, r1=args.r1, r2=args.r2):
        """Output-feedback chain: rep k+1's input depends on rep k's
        output — no folding/hoisting possible (given the op consumes all
        its inputs and y consumes all the op's output). Two passes: a
        cheap pilot estimates the per-rep cost, then rep counts are
        raised until the long chain carries ~target-s seconds of op work
        (sub-ms ops at a handful of reps sit below the tunnel jitter and
        produce garbage, including negative slopes)."""

        def chain(reps):
            @jax.jit
            def run(v):
                def body(i, v):
                    y = op_on_v(v)
                    out = y / (jnp.linalg.norm(y) + 1.0) + v * 1e-6
                    return out.astype(v.dtype)

                return jax.lax.fori_loop(0, reps, body, v)

            return run

        def timed(f):
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
        w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        L0 = jax.block_until_ready(jnp.linalg.cholesky(M0))

        def perturbed(v):
            # vector-dependent diagonal: cannot fold, cannot hoist
            return M0 + jnp.diag(jnp.abs(v) * 1e-30)

        def perturbedL(v):
            return L0 + jnp.diag(jnp.abs(v) * 1e-30)

        ops = {
            # -- full consumption: the REAL cost rows --
            "chol_xla_full": lambda v: jnp.matmul(
                jnp.linalg.cholesky(perturbed(v)), w, precision=_HI),
            "chol_blocked_full": lambda v: jnp.matmul(
                blocked_cholesky(perturbed(v), r=256), w, precision=_HI),
            "tri_inv_xla_full": lambda v: jnp.matmul(
                solve_triangular(perturbedL(v), I, lower=True), w,
                precision=_HI),
            "tri_inv_blocked_full": lambda v: jnp.matmul(
                blocked_tri_inv(perturbedL(v), r=256), w, precision=_HI),
            # -- slice consumption: kept to expose/monitor the slice-DCE --
            "chol_xla_slice": lambda v: jnp.linalg.cholesky(
                perturbed(v))[:, 0],
            "tri_inv_xla_slice": lambda v: solve_triangular(
                perturbedL(v), I, lower=True)[:, 0],
        }

        # Pallas kernel (TPU only, MXU-aligned sizes within VMEM bound);
        # opaque custom call — the slice cannot reach inside, but time the
        # full-consumption form anyway for apples-to-apples.
        try:
            from conicip_tpu.ops.pallas_cholesky import (
                _MAX_VMEM_N, cholesky_f32, pallas_cholesky_available)

            if (n % 128 == 0 and n <= _MAX_VMEM_N
                    and pallas_cholesky_available(n, jnp.float32)):
                ops["chol_pallas_full"] = lambda v: jnp.matmul(
                    cholesky_f32(perturbed(v)), w, precision=_HI)
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

#!/usr/bin/env python
"""One-session A/B of the 69 ms cholesky anomaly — RESOLVED (r5).

Root cause (found by this tool's first run, 2026-08-20): the "slow"
probe ops all built their A matrix as
``rng.standard_normal(...).astype(np.float32) / np.sqrt(m)`` — and under
NumPy 2 scalar promotion ``np.sqrt(m)`` is a STRONG float64 scalar, so
the array silently promoted to f64; with x64 enabled the whole op then
ran as an EMULATED-f64 program. The 68.9 ms marginal is exactly the
known emulated-f64 chol(1024) cost (devbench: 69 ms), and the slow
variants' optimized HLO (6.2 MB, 157 while ops, TwoSum/compensated-add
patterns) is the double-double lowering. No value dependence, no session
dependence, no compiler pathology; production code casts explicitly and
was never affected (densekkt end-to-end: 0.826 ms/iter at n=1024).

The constructions below now cast AFTER the division; re-running shows
every variant at the f32 cost (~0.2-0.5 ms/rep) with compact HLO. Kept
as the regression probe for accidental-f64 measurement bugs.

Usage: python tools/anomaly_ab.py [--n 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--reps", type=int, nargs="*", default=[3, 9, 27])
    ap.add_argument("--hlo", action="store_true", default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401  (x64 on)

    _HI = jax.lax.Precision.HIGHEST
    n = args.n
    rng = np.random.default_rng(0)

    # ── repcurve's exact constructions ──
    B = rng.standard_normal((n, n)).astype(np.float32)
    M0 = jnp.asarray(B @ B.T / n + n * np.eye(n, dtype=np.float32))
    I = jnp.eye(n, dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    m2 = 2 * n
    A_ = jnp.asarray(
        (rng.standard_normal((m2, n)) / np.sqrt(m2)).astype(np.float32))
    Qd = jnp.asarray((1.0 + rng.random(n)).astype(np.float32))
    dinv = jnp.asarray((0.5 + rng.random(m2)).astype(np.float32))
    Atil0 = A_ * dinv[:, None]
    M0_dev = jnp.matmul(Atil0.T, Atil0, precision=_HI) + jnp.diag(Qd)
    M0_folded = jnp.asarray(
        np.asarray(M0_dev) + n * np.eye(n, dtype=np.float32))

    # same structure as crossplain, fresh values in op_chol's style
    B2 = rng.standard_normal((n, n)).astype(np.float32)
    M0_alt = jnp.asarray(B2 @ B2.T / n + n * np.eye(n, dtype=np.float32))

    ridge = np.float32(30.0 * np.finfo(np.float32).eps)

    def op_chol(v):  # repcurve op_chol (historically FAST, 0.22 ms)
        Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_crossplain(v):  # repcurve crossplain (historically SLOW, 69 ms)
        Ms = M0_folded + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_chol_altvals(v):  # chol structure, fresh values
        Ms = M0_alt + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_gramfed(v):  # kkt_bisect upto_chol (historically SLOW, 71.5 ms)
        Atil = A_ * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI) + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_cold_producer(v):  # kkt_bisect cold (historically FAST, 0.356)
        Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
        L = jnp.linalg.cholesky(Ms)
        Linv = solve_triangular(L, I, lower=True)
        return jnp.matmul(Linv, w, precision=_HI)

    def op_cheap_computed(v):  # computed-but-tiny producer
        Ms = M0 + v[:, None] * v[None, :] * 1e-30
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_equil_only(v):  # equilibration producer, no gram
        M = M0_folded + jnp.diag(jnp.abs(v) * 1e-30)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    OPS = {
        "chol_repcurve": op_chol,
        "crossplain_repcurve": op_crossplain,
        "chol_altvals": op_chol_altvals,
        "gramfed_bisect": op_gramfed,
        "cold_producer_bisect": op_cold_producer,
        "cheap_computed": op_cheap_computed,
        "equil_only": op_equil_only,
    }

    def chain(op, reps):
        @jax.jit
        def run(v):
            def body(i, v):
                y = op(v)
                return (y / (jnp.linalg.norm(y) + 1.0)
                        + v * 1e-6).astype(v.dtype)

            return jax.lax.fori_loop(0, reps, body, v)

        return run

    def timed(f):
        np.asarray(f(v0))  # compile + warm
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(f(v0))
            best = min(best, time.perf_counter() - t0)
        return best

    # Interleave: for each rep count, loop over ALL ops before moving on,
    # so a session-state drift would hit every op equally.
    T = {name: {} for name in OPS}
    for reps in args.reps:
        for name, op in OPS.items():
            T[name][reps] = timed(chain(op, reps))
            print(f"reps={reps:3d} {name:22s} T={T[name][reps]:.4f}s",
                  flush=True)

    rows = {}
    r1, r2 = args.reps[0], args.reps[-1]
    for name in OPS:
        marg = (T[name][r2] - T[name][r1]) / (r2 - r1) * 1e3
        rows[name] = {"marginal_ms_per_rep": round(marg, 3),
                      **{f"T_{r}": round(T[name][r], 4) for r in args.reps}}
        print(f"{name:22s} marginal {marg:9.3f} ms/rep", flush=True)

    out = {"n": n, "backend": jax.default_backend(), "ops": rows}

    if args.hlo:
        hlodir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks", "hlo_anomaly")
        os.makedirs(hlodir, exist_ok=True)
        for name, op in OPS.items():
            try:
                txt = chain(op, 27).lower(v0).compile().as_text()
                info = {
                    "chol_mentions": len(
                        re.findall(r"cholesky|Cholesky|potrf", txt)),
                    "while_ops": len(re.findall(r"^\s*%?while", txt, re.M)),
                    "fusions": txt.count(" fusion("),
                    "bytes": len(txt),
                }
                rows[name]["hlo"] = info
                with open(os.path.join(hlodir, f"{name}.txt"), "w") as f:
                    f.write(txt)
                print(f"hlo {name}: {info}", flush=True)
            except Exception as e:  # noqa: BLE001
                rows[name]["hlo"] = f"ERROR {type(e).__name__}: {e}"

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"anomaly_ab_{jax.default_backend()}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Rep-count curve for one feedback-chained op + optimized-HLO structure.

The f32 chol(1024) contradiction: the SAME op measures ~0.22 ms/rep in
long chains (chol_sweep: adaptive rep counts 1250/5000) and ~69 ms/rep in
short chains (roofline_verify / artifact_cross: fixed 5/20, pilot 3/9) —
reproducibly, across tunnel-weather windows, in BOTH consumption modes.
If T(reps) is non-linear the differenced "slope" is an artifact of the
rep-count pair, and one regime's number is fiction. This probe times one
op at a geometric ladder of rep counts and prints the marginal cost
between consecutive rungs, then dumps the optimized HLO for a short and a
long chain and reports whether the while loop was UNROLLED (the leading
suspect: an unrolled body is a different program for XLA's scheduler
than a rolled while body).

Usage: python tools/repcurve.py [--n 1024] [--reps 3 9 27 81 243 729 2187]
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
    ap.add_argument("--reps", type=int, nargs="*",
                    default=[3, 9, 27, 81, 243, 729, 2187])
    ap.add_argument("--op", choices=["chol", "tri", "gemm", "cross",
                                     "crosshost", "crossplain"],
                    default="chol")
    ap.add_argument("--hlo", action="store_true",
                    help="also dump optimized-HLO structure for a short "
                    "and a long chain")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401  (x64 on)

    _HI = jax.lax.Precision.HIGHEST
    n = args.n
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, n)).astype(np.float32)
    M0 = jnp.asarray(B @ B.T / n + n * np.eye(n, dtype=np.float32))
    I = jnp.eye(n, dtype=jnp.float32)
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    L0 = jax.block_until_ready(jnp.linalg.cholesky(M0))

    def op_chol(v):
        Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_tri(v):
        L = L0 + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(solve_triangular(L, I, lower=True), w,
                          precision=_HI)

    def op_gemm(v):
        Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(jnp.matmul(Ms, M0, precision=_HI), w,
                          precision=_HI)

    # Historical A/B of the 69 ms chol anomaly — RESOLVED (r5,
    # tools/anomaly_ab.py): the cross ops' A matrix silently promoted to
    # f64 (`.astype(np.float32) / np.sqrt(m2)` — NumPy-2 strong scalar),
    # so the "slow" variants were emulated-f64 programs. Fixed below;
    # all variants now measure the f32 cost.
    m2 = 2 * n
    A_ = jnp.asarray(
        (rng.standard_normal((m2, n)) / np.sqrt(m2)).astype(np.float32))
    Qd = jnp.asarray((1.0 + rng.random(n)).astype(np.float32))
    dinv = jnp.asarray((0.5 + rng.random(m2)).astype(np.float32))
    Atil0 = A_ * dinv[:, None]
    M0_dev = jnp.matmul(Atil0.T, Atil0, precision=_HI) + jnp.diag(Qd)
    M0_host = jnp.asarray(np.asarray(M0_dev))

    def op_cross(v):
        Ms = M0_dev + jnp.diag(jnp.abs(v) * 1e-30) + n * I
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def op_crosshost(v):
        Ms = M0_host + jnp.diag(jnp.abs(v) * 1e-30) + n * I
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    M0_folded = jnp.asarray(
        np.asarray(M0_dev) + n * np.eye(n, dtype=np.float32))

    def op_crossplain(v):
        Ms = M0_folded + jnp.diag(jnp.abs(v) * 1e-30)
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    op = {"chol": op_chol, "tri": op_tri, "gemm": op_gemm,
          "cross": op_cross, "crosshost": op_crosshost,
          "crossplain": op_crossplain}[args.op]

    def chain(reps):
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

    rows = []
    prev = None
    for reps in args.reps:
        T = timed(chain(reps))
        row = {"reps": reps, "T_s": round(T, 4)}
        if prev is not None:
            r0, T0 = prev
            row["marginal_ms_per_rep"] = round(
                (T - T0) / (reps - r0) * 1e3, 4)
        row["avg_ms_per_rep"] = round(T / reps * 1e3, 4)
        rows.append(row)
        prev = (reps, T)
        print(json.dumps(row), flush=True)

    out = {"n": n, "op": args.op, "backend": jax.default_backend(),
           "curve": rows}

    if args.hlo:
        for tag, reps in (("short", 20), ("long", 2000)):
            try:
                txt = chain(reps).lower(v0).compile().as_text()
                n_chol = len(re.findall(r"cholesky|Cholesky|potrf", txt))
                n_while = len(re.findall(r"^\s*%?while", txt, re.M))
                n_fusion = txt.count(" fusion(")
                out[f"hlo_{tag}"] = {
                    "reps": reps, "chol_mentions": n_chol,
                    "while_ops": n_while, "fusions": n_fusion,
                    "bytes": len(txt),
                }
                print(json.dumps({tag: out[f"hlo_{tag}"]}), flush=True)
                with open(f"/tmp/hlo_{args.op}_{tag}.txt", "w") as f:
                    f.write(txt)
            except Exception as e:  # noqa: BLE001
                out[f"hlo_{tag}"] = f"ERROR {type(e).__name__}: {e}"

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"repcurve_{args.op}_{jax.default_backend()}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Bisect the composite dense-KKT iteration cost on TPU.

HISTORICAL NOTE (r5): the ~81 ms composite / ~71 ms gram+equil+chol rows
this tool previously reported were an accidental-f64 measurement — the A
matrix promoted to f64 via `.astype(np.float32) / np.sqrt(m)` (NumPy-2
strong scalar), making the probe an emulated-f64 program (see
tools/anomaly_ab.py). Fixed; the composite now measures ~3 ms at n=1024,
consistent with its parts and with production (densekkt_n_probe).

Usage: python tools/kkt_bisect.py [--n 1024]
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
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--target-s", type=float, default=2.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401  (x64 on)

    _HI = jax.lax.Precision.HIGHEST
    n = args.n
    m = 2 * n
    rng = np.random.default_rng(0)
    A = jnp.asarray(
        (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32))
    Qd = jnp.asarray((1.0 + rng.random(n)).astype(np.float32))
    dinv = jnp.asarray((0.5 + rng.random(m)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    I = jnp.eye(n, dtype=jnp.float32)
    ridge = np.float32(30.0 * np.finfo(np.float32).eps)

    def slope_feedback(op_on_v, r1=3, r2=9):
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
        est = max(pilot, 1e-5)
        if est * (r2 - r1) >= 0.5 * args.target_s:
            return pilot
        r2b = min(int(args.target_s / est), 5000)
        r1b = max(r2b // 4, 1)
        return (timed(chain(r2b)) - timed(chain(r1b))) / (r2b - r1b)

    # stages of the production per-iteration op (kkt/schur.py _factors)
    # Every prefix is consumed via `@ w` (a dense matvec touching EVERY
    # element) — a `[:, 0]` slice would let XLA push the slice through
    # the blocked factorization and dead-code the remaining panels,
    # mismeasuring exactly the stage this tool exists to isolate.
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def upto_gram(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI)
        return jnp.matmul(M, w, precision=_HI)

    def upto_equil(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI) + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        return jnp.matmul(Ms, w, precision=_HI)

    def upto_chol(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI) + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        L = jnp.linalg.cholesky(Ms)
        return jnp.matmul(L, w, precision=_HI)

    def upto_inv(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI) + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        L = jnp.linalg.cholesky(Ms)
        Linv = solve_triangular(L, I, lower=True)
        return jnp.matmul(Linv, w, precision=_HI)

    def full(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI) + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        L = jnp.linalg.cholesky(Ms)
        Linv = solve_triangular(L, I, lower=True)
        t = jnp.matmul(Linv, dscale * v, precision=_HI)
        return dscale * jnp.matmul(Linv.T, t, precision=_HI)

    # variant: chol fed by a FRESH matrix (no upstream matmul producer)
    M0 = jax.block_until_ready(
        jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)))
    M0 = jax.block_until_ready(
        jnp.matmul(M0, M0.T, precision=_HI) / n + n * I)

    def chol_cold_producer(v):
        Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30)
        L = jnp.linalg.cholesky(Ms)
        Linv = solve_triangular(L, I, lower=True)
        return jnp.matmul(Linv, w, precision=_HI)

    rows = {}
    for name, op in [
        ("gram", upto_gram),
        ("gram+equil", upto_equil),
        ("gram+equil+chol", upto_chol),
        ("gram+equil+chol+inv", upto_inv),
        ("full_composite", full),
        ("chol+inv_cold_producer", chol_cold_producer),
    ]:
        t = slope_feedback(op)
        rows[name] = round(t * 1e3, 3)
        print(f"{name:30s} {t*1e3:9.3f} ms", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"kkt_bisect_{jax.default_backend()}_n{n}.json")
    with open(out, "w") as f:
        json.dump({"n": n, "stages_ms": rows}, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Crossed experiment: op-structure x rep-policy, to isolate why
roofline_verify measures chol(1024) at ~69 ms while chol_sweep (and
production end-to-end rates) measure ~0.22 ms.

Grid: {roofline's chol_only, chol_sweep's chol op, roofline composite}
    x {fixed r=5/20 (roofline policy), adaptive ~2 s chains (sweep policy)}

If the fixed-rep rows are inflated for every op, the artifact is the rep
policy (per-dispatch cost that scales with trip count on the tunnel, or
short-chain jitter); if roofline's op is slow under both policies, the
program structure differs in some way XLA treats differently.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401

    _HI = jax.lax.Precision.HIGHEST
    n = 1024
    m = 2 * n
    rng = np.random.default_rng(0)
    A = jnp.asarray((rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32))
    Qd = jnp.asarray((1.0 + rng.random(n)).astype(np.float32))
    dinv = jnp.asarray((0.5 + rng.random(m)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    I = jnp.eye(n, dtype=jnp.float32)
    ridge = np.float32(30.0 * np.finfo(np.float32).eps)

    Atil0 = jax.block_until_ready(A * dinv[:, None])
    M0 = jax.block_until_ready(
        jnp.matmul(Atil0.T, Atil0, precision=_HI) + jnp.diag(Qd))
    L0 = jax.block_until_ready(
        jnp.linalg.cholesky(M0 + n * jnp.eye(n, dtype=jnp.float32)))
    w = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def kkt_iter(v):
        Atil = A * dinv[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI)
        M = M + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        L = jnp.linalg.cholesky(Ms)
        Linv = solve_triangular(L, I, lower=True)
        t = jnp.matmul(Linv, dscale * v, precision=_HI)
        return dscale * jnp.matmul(Linv.T, t, precision=_HI)

    def kkt_iter_vardep(v):
        # same composite but the Gram/chol inputs DEPEND on v (as in
        # production, where the scaling changes every iteration)
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI)
        M = M + jnp.diag(Qd)
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
        Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
        L = jnp.linalg.cholesky(Ms)
        Linv = solve_triangular(L, I, lower=True)
        t = jnp.matmul(Linv, dscale * v, precision=_HI)
        return dscale * jnp.matmul(Linv.T, t, precision=_HI)

    def chol_roofline(v):
        Ms = M0 + (n + v[0] * 1e-30) * I
        return jnp.linalg.cholesky(Ms)[:, 0]

    def chol_sweepstyle(v):
        Ms = M0 + jnp.diag(jnp.abs(v) * 1e-30) + n * I
        return jnp.matmul(jnp.linalg.cholesky(Ms), w, precision=_HI)

    def tri_roofline(v):
        L = L0 + jnp.diag(v * 1e-30)
        return solve_triangular(L, I, lower=True)[:, 0]

    def chain(op, reps):
        @jax.jit
        def run(v):
            def body(i, v):
                y = op(v)
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

    def fixed_policy(op, r1=5, r2=20):
        t1, t2 = timed(chain(op, r1)), timed(chain(op, r2))
        return (t2 - t1) / (r2 - r1), (r1, r2, t1, t2)

    def adaptive_policy(op, target_s=2.0):
        t1, t2 = timed(chain(op, 3)), timed(chain(op, 9))
        pilot = (t2 - t1) / 6
        est = max(pilot, 1e-5)
        if est * 6 >= 0.5 * target_s:
            return pilot, (3, 9, t1, t2)
        r2b = min(int(target_s / est), 5000)
        r1b = max(r2b // 4, 1)
        t1, t2 = timed(chain(op, r1b)), timed(chain(op, r2b))
        return (t2 - t1) / (r2b - r1b), (r1b, r2b, t1, t2)

    ops = {
        "chol_roofline": chol_roofline,
        "chol_sweepstyle": chol_sweepstyle,
        "tri_roofline": tri_roofline,
        "composite_invariant": kkt_iter,
        "composite_vardep": kkt_iter_vardep,
    }
    rows = []
    for name, op in ops.items():
        for pol, f in (("fixed", fixed_policy), ("adaptive", adaptive_policy)):
            try:
                slope, (r1, r2, t1, t2) = f(op)
                row = {"op": name, "policy": pol,
                       "ms_per_rep": round(slope * 1e3, 3),
                       "r1": r1, "r2": r2,
                       "T_r1_s": round(t1, 3), "T_r2_s": round(t2, 3)}
            except Exception as e:  # noqa: BLE001
                row = {"op": name, "policy": pol,
                       "error": f"{type(e).__name__}: {e}"}
            rows.append(row)
            print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "artifact_cross.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

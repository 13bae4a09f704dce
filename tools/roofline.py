#!/usr/bin/env python
"""Roofline measurement for the per-iteration KKT factor+solve.

BASELINE.md target: "KKT factorize+solve at >=60% of per-chip FLOPs
roofline". This tool measures, on the real chip with the slope method
(reps chained inside one jit, cost = slope between two rep counts — the
~30 ms tunnel round trip cancels; see tools/devbench.py):

1. the f32 HIGHEST-precision GEMM rate (the achievable matmul ceiling
   under the solver's precision policy — every scaling/KKT matmul carries
   HIGHEST, docs/tpu_performance.md),
2. XLA's f32 Cholesky and triangular-inverse rates in isolation,
3. the COMPOSITE production per-iteration KKT op — NT-scaled row apply,
   Gram assembly, Jacobi equilibration, Cholesky, explicit L⁻¹, and one
   2-GEMV back-solve: the exact primitive sequence of
   conicip_tpu/kkt/schur.py:_factors + _make_solve on the dominant
   (p = 0, R-cone) path, FLOP-counted with the standard formulas
   (GEMM 2mnk; chol n³/3; triangular inverse n³/3).

Reported rooflines:
- ``pct_bf16_peak``: vs the v5e public MXU peak (197 TFLOP/s bf16) — the
  hardware roofline, which an f32-HIGHEST (6-pass bf16) matmul cannot
  reach by construction;
- ``pct_f32hi_ceiling``: vs the MEASURED f32-HIGHEST GEMM rate at the
  same n — the speed-of-light for this op mix at the precision the
  solver's accuracy contract requires (the honest roofline for the
  BASELINE target).

Writes benchmarks/roofline_tpu_<backend>.json.

Reference anchor: the reference spends ~72% of its time inside this same
refactorization (reference benchmark/report.md:92), making it the op whose
device efficiency decides end-to-end standing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # public v5e peak, TFLOP/s (bf16 MXU)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1024, 2048, 4096])
    ap.add_argument("--r1", type=int, default=10)
    ap.add_argument("--r2", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401  (x64 on)

    _HI = jax.lax.Precision.HIGHEST

    def slope(op, x0, *rest, r1=args.r1, r2=args.r2):
        def chain(reps):
            @jax.jit
            def run(x, *rs):
                def body(i, acc):
                    # 1e-30*acc, not 0*acc: a zero coefficient folds, the
                    # op becomes loop-invariant, and LICM hoists it — see
                    # tools/devbench.py note / tools/roofline_verify.py
                    # sum EVERY output element: a sliced feedback lets
                    # XLA dead-code unobserved panels of blocked
                    # factorizations (see tools/devbench.py note)
                    y = op(x * (1.0 + 1e-30 * acc), *rs)
                    s = jnp.float32(0)
                    for leaf in jax.tree_util.tree_leaves(y):
                        s = s + jnp.sum(leaf.astype(jnp.float32))
                    return s * 1e-30 + acc

                return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

            return run

        cK, c2K = chain(r1), chain(r2)

        def timed(f):
            np.asarray(f(x0, *rest))  # compile + warm
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(f(x0, *rest))
                best = min(best, time.perf_counter() - t0)
            return best

        return (timed(c2K) - timed(cK)) / (r2 - r1)

    rows = []
    for n in args.sizes:
        m = 2 * n
        rng = np.random.default_rng(0)
        A = jnp.asarray(
            (rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32))
        Qd = jnp.asarray((1.0 + rng.random(n)).astype(np.float32))
        dinv = jnp.asarray(
            (0.5 + rng.random(m)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        I = jnp.eye(n, dtype=jnp.float32)
        ridge = np.float32(30.0 * np.finfo(np.float32).eps)

        # 1. f32-HIGHEST GEMM ceiling (same shape as the Gram assembly)
        t_gemm = slope(
            lambda A: jnp.matmul(A.T, A, precision=_HI), A)
        f_gemm = 2.0 * m * n * n
        rate_gemm = f_gemm / t_gemm

        # 2. isolated chol / triangular inverse
        B = rng.standard_normal((n, n)).astype(np.float32)
        M0 = jnp.asarray(B @ B.T / n + n * np.eye(n, dtype=np.float32))
        t_chol = slope(jnp.linalg.cholesky, M0)
        rate_chol = (n**3 / 3.0) / t_chol
        L0 = jax.block_until_ready(jnp.linalg.cholesky(M0))
        t_inv = slope(
            lambda L: solve_triangular(L, I, lower=True), L0)
        rate_inv = (n**3 / 3.0) / t_inv

        # 3. composite production per-iteration KKT op (schur.py:_factors
        #    p=0 path + one _make_solve application)
        def kkt_iter(A, Qd, dinv, v):
            Atil = A * dinv[:, None]  # R-cone NT apply (diagonal F⁻ᵀ)
            M = jnp.matmul(Atil.T, Atil, precision=_HI)
            M = M + jnp.diag(Qd)
            dscale = jax.lax.rsqrt(
                jnp.maximum(jnp.diagonal(M), jnp.finfo(jnp.float32).tiny))
            Ms = M * dscale[:, None] * dscale[None, :] + ridge * I
            L = jnp.linalg.cholesky(Ms)
            Linv = solve_triangular(L, I, lower=True)
            t = jnp.matmul(Linv, dscale * v, precision=_HI)
            return dscale * jnp.matmul(Linv.T, t, precision=_HI)

        t_kkt = slope(kkt_iter, A, Qd, dinv, v)
        f_kkt = m * n + 2.0 * m * n * n + n**3 / 3.0 + n**3 / 3.0 + 4.0 * n * n
        rate_kkt = f_kkt / t_kkt

        row = {
            "n": n,
            "m": m,
            "gemm_f32hi_tflops": round(rate_gemm / 1e12, 2),
            "chol_tflops": round(rate_chol / 1e12, 2),
            "tri_inv_tflops": round(rate_inv / 1e12, 2),
            "kkt_iter_ms": round(t_kkt * 1e3, 3),
            "kkt_iter_tflops": round(rate_kkt / 1e12, 2),
            "pct_bf16_peak": round(100.0 * rate_kkt / V5E_BF16_PEAK, 1),
            "pct_f32hi_ceiling": round(100.0 * rate_kkt / rate_gemm, 1),
            "backend": jax.default_backend(),
        }
        rows.append(row)
        print(json.dumps(row))

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"roofline_tpu_{jax.default_backend()}.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

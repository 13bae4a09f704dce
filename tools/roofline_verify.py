#!/usr/bin/env python
"""Verify the roofline composite measurement with a device trace.

tools/roofline.py reported the composite KKT iteration at 81 ms (n=1024)
while its constituent ops sum to ~3 ms on the same chip (devbench). Per
the project rule ("verify with a jax.profiler.trace device timeline
before believing it"), this script:

1. re-times the composite with an output-feedback chain (the next rep's
   input genuinely depends on the previous rep's output, so no part of
   the body can be hoisted or folded away),
2. times each constituent op the same way,
3. optionally dumps a profiler trace for the composite.

Usage: python tools/roofline_verify.py [--n 1024] [--trace /tmp/kkttrace]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--r1", type=int, default=5)
    ap.add_argument("--r2", type=int, default=20)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401

    _HI = jax.lax.Precision.HIGHEST
    n = args.n
    m = 2 * n
    rng = np.random.default_rng(0)
    A = jnp.asarray((rng.standard_normal((m, n)) / np.sqrt(m)).astype(np.float32))
    Qd = jnp.asarray((1.0 + rng.random(n)).astype(np.float32))
    dinv = jnp.asarray((0.5 + rng.random(m)).astype(np.float32))
    v0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    I = jnp.eye(n, dtype=jnp.float32)
    ridge = np.float32(30.0 * np.finfo(np.float32).eps)

    def kkt_iter(A, Qd, dinv, v):
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

    def slope_feedback(op_on_v, r1=args.r1, r2=args.r2):
        """Chain via output feedback on the vector operand: v_{k+1} is a
        normalized function of op(v_k) — no folding possible."""

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

        return (timed(chain(r2)) - timed(chain(r1))) / (r2 - r1)

    # composite, output-feedback chained
    t_comp = slope_feedback(lambda v: kkt_iter(A, Qd, dinv, v))
    print(f"composite (feedback chain): {t_comp*1e3:.3f} ms/iter")

    # pieces, same feedback trick where possible
    Atil0 = jax.block_until_ready(A * dinv[:, None])
    M0 = jax.block_until_ready(
        jnp.matmul(Atil0.T, Atil0, precision=_HI) + jnp.diag(Qd))
    L0 = jax.block_until_ready(
        jnp.linalg.cholesky(M0 + n * jnp.eye(n, dtype=jnp.float32)))

    def gram_only(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil, precision=_HI)
        return M[:, 0]

    t_gram = slope_feedback(gram_only)
    print(f"scaled Gram (HIGHEST):      {t_gram*1e3:.3f} ms")

    def gram_default(v):
        Atil = A * (dinv + 1e-30 * v[0])[:, None]
        M = jnp.matmul(Atil.T, Atil)
        return M[:, 0]

    t_gram_d = slope_feedback(gram_default)
    print(f"scaled Gram (DEFAULT):      {t_gram_d*1e3:.3f} ms")

    def chol_only(v):
        Ms = M0 + (n + v[0] * 1e-30) * I
        return jnp.linalg.cholesky(Ms)[:, 0]

    t_chol = slope_feedback(chol_only)
    print(f"cholesky:                   {t_chol*1e3:.3f} ms")

    def inv_only(v):
        L = L0 + jnp.diag(v * 1e-30)
        return solve_triangular(L, I, lower=True)[:, 0]

    t_inv = slope_feedback(inv_only)
    print(f"tri inverse (mat RHS):      {t_inv*1e3:.3f} ms")

    f_kkt = m * n + 2.0 * m * n * n + n**3 / 3.0 + n**3 / 3.0 + 4.0 * n * n
    print(f"composite rate: {f_kkt/t_comp/1e12:.2f} TF/s; "
          f"sum of parts {1e3*(t_gram+t_chol+t_inv):.3f} ms")

    # precision-mode GEMM sweep: is HIGHEST lowered to the (slow, ~1 TF/s
    # f32) VPU path instead of multi-pass MXU? If HIGH (bf16x3) runs at
    # MXU rate, the Gram/KKT matmuls should carry HIGH + refinement
    # instead of HIGHEST.
    for prec, tag in ((None, "DEFAULT"), (jax.lax.Precision.HIGH, "HIGH"),
                      (_HI, "HIGHEST")):
        def gemm(v, prec=prec):
            Atil = A * (dinv + 1e-30 * v[0])[:, None]
            M = (jnp.matmul(Atil.T, Atil, precision=prec) if prec
                 else jnp.matmul(Atil.T, Atil))
            return M[:, 0]

        t = slope_feedback(gemm)
        print(f"gemm {tag:8s}: {t*1e3:8.3f} ms  "
              f"{2.0*m*n*n/t/1e12:7.2f} TF/s")

    # and the same three for an f32x3-style manual split: hi = bf16(A),
    # lo = A - hi; A'A = hi'hi + hi'lo + lo'hi (drops lo'lo ~ 2^-16 rel)
    def gemm_split(v):
        At = A * (dinv + 1e-30 * v[0])[:, None]
        hi = At.astype(jnp.bfloat16).astype(jnp.float32)
        lo = At - hi
        M = (jnp.matmul(hi.T, hi) + jnp.matmul(hi.T, lo)
             + jnp.matmul(lo.T, hi))
        return M[:, 0]

    t = slope_feedback(gemm_split)
    print(f"gemm bf16x3-manual: {t*1e3:8.3f} ms  "
          f"{2.0*m*n*n/t/1e12:7.2f} TF/s")
    err = jnp.max(jnp.abs(
        gemm_split(v0) - jnp.matmul((A * dinv[:, None]).T,
                                    (A * dinv[:, None]),
                                    precision=_HI)[:, 0]))
    rel = float(err) / float(jnp.max(jnp.abs(
        jnp.matmul((A * dinv[:, None]).T, (A * dinv[:, None]),
                   precision=_HI))))
    print(f"bf16x3-manual max rel err vs HIGHEST: {rel:.2e}")

    if args.trace:
        f = jax.jit(kkt_iter)
        np.asarray(f(A, Qd, dinv, v0))  # warm
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                np.asarray(f(A, Qd, dinv, v0))
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()

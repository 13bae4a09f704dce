#!/usr/bin/env python
"""Device-honest microbenchmarks.

The axon tunnel adds a fixed ~30 ms round trip to every synchronous jit
execution (dispatch + sync), and ~100 ms per MB of device→host transfer,
so naive timing measures the tunnel, not the chip. Here every op is run R
times inside one jit via ``lax.fori_loop`` with a data-dependence chain,
returning one scalar, and the per-op cost is the SLOPE between two rep
counts — the fixed round trip cancels.

Usage: python tools/devbench.py [--n 1024] [--r1 50] [--r2 400]
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
    ap.add_argument("--r1", type=int, default=50)
    ap.add_argument("--r2", type=int, default=400)
    args = ap.parse_args()
    n, R1, R2 = args.n, args.r1, args.r2

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401
    from conicip_tpu.ops.pallas_cholesky import (
        _cholesky_pallas,
        pallas_cholesky_available,
    )

    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, n)).astype(np.float32)
    M32 = jnp.asarray(B @ B.T / n + n * np.eye(n, dtype=np.float32))
    M64 = M32.astype(jnp.float64)
    v32 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    v64 = v32.astype(jnp.float64)

    def total(op, reps, x0, *rest):
        @jax.jit
        def chain(x, *rs):
            def body(i, acc):
                # 1e-30*acc (NOT 0*acc): a zero coefficient constant-folds,
                # the op input becomes loop-invariant, and XLA's LICM can
                # hoist the whole op out of the loop — the round-3 numbers
                # for f32 chol/tri-solve were exactly that fiction
                # (0.21 ms "measured" vs ~real cost; tools/chol_sweep.py,
                # tools/roofline_verify.py output-feedback re-measurement).
                # The feedback must consume EVERY output element: summing
                # only a slice (the old `leaf[..., :1]`) lets XLA push the
                # slice through blocked factorizations and dead-code the
                # remaining panels (measurement-discipline finding #2).
                y = op(x * (1.0 + 1e-30 * acc), *rs)
                s = jnp.float32(0)
                for leaf in jax.tree_util.tree_leaves(y):
                    s = s + jnp.sum(leaf.astype(jnp.float32))
                return s * 1e-30 + acc

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        r = chain(x0, *rest)
        np.asarray(r)  # compile + warm
        best = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(chain(x0, *rest))
            best = min(best, time.perf_counter() - t0)
        return best

    def devtime(name, op, x0, *rest, r1=R1, r2=R2):
        t1 = total(op, r1, x0, *rest)
        t2 = total(op, r2, x0, *rest)
        per = (t2 - t1) / (r2 - r1) * 1e3
        print(f"{name:<42s} {per:9.4f} ms/op   (totals {t1*1e3:7.1f} / {t2*1e3:7.1f} ms)")
        return per

    L32 = jax.block_until_ready(jnp.linalg.cholesky(M32))
    I32 = jnp.eye(n, dtype=jnp.float32)

    print(f"# n={n} slope reps {R1}->{R2} backend={jax.default_backend()}")
    mm = devtime("matmul f32 (n,n)@(n,n)", lambda a: a @ a * (1.0 / n), M32)
    peak = 2 * n**3 / (mm / 1e3) / 1e12 if mm > 0 else float("inf")
    print(f"    -> {peak:.1f} TF/s effective")
    devtime("matmul f64 (n,n)@(n,n)", lambda a: a @ a * (1.0 / n), M64)
    devtime("gemv f32", lambda a, v: a @ v * (1.0 / n), M32, v32, r2=args.r2 * 4)
    devtime("gemv f64", lambda a, v: a @ v * (1.0 / n), M64, v64, r2=args.r2 * 4)
    devtime("chol f32 (XLA)", jnp.linalg.cholesky, M32, r1=10, r2=60)
    devtime("chol f64 (XLA monolithic)", jnp.linalg.cholesky, M64,
            r1=2, r2=6)
    from conicip_tpu.ops.blocked64 import blocked_cholesky, blocked_tri_inv

    devtime("chol f64 (blocked GEMM)", blocked_cholesky, M64, r1=5, r2=25)
    L64 = jax.block_until_ready(blocked_cholesky(M64))
    devtime("tri_inv f64 (blocked GEMM)", blocked_tri_inv, L64,
            r1=5, r2=25)
    devtime(
        "matmul f64 HIGHEST",
        lambda a: jnp.matmul(a, a, precision=jax.lax.Precision.HIGHEST)
        * (1.0 / n),
        M64,
        r1=10, r2=60,
    )
    if pallas_cholesky_available(n, jnp.float32):
        devtime("chol f32 (pallas)", _cholesky_pallas, M32, r1=10, r2=60)
    devtime(
        "tri_solve vec f32",
        lambda L, v: solve_triangular(L, v, lower=True),
        L32,
        v32,
        r1=10,
        r2=60,
    )
    devtime(
        "tri_solve mat(I) f32",
        lambda L, Im: solve_triangular(L, Im, lower=True),
        L32,
        I32,
        r1=10,
        r2=60,
    )


if __name__ == "__main__":
    main()

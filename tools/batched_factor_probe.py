#!/usr/bin/env python
"""Feedback-chained cost probe at the BATCHED SDP tier's exact shapes.

The batched small-SDP family runs at 18.5 iters/s on chip (54 ms per
vmapped B=64 iteration, benchmarks/batched_r4_batched_small_sdp.json)
while the same family solo runs ~1 ms/iter. The suspects are the
full-precision (f64) small-matrix decompositions the final rescue tier
runs under vmap — XLA's emulated-f64 eigh/cholesky/solve_triangular
serialize on v5e. This probe times each candidate at the tier's real
shapes, (B,1,10,10) f64, against the GEMM-dominant refined alternatives
(ops/smalleig.py), using output-feedback chains with full consumption
(tools/chol_sweep.py discipline: every output element feeds the chain).

Usage: python tools/batched_factor_probe.py [--batch 64] [--d 10]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--d", type=int, default=10)
    ap.add_argument("--target-s", type=float, default=2.0)
    ap.add_argument("--ops", nargs="*", default=None)
    ap.add_argument("--kkt-n", type=int, default=0,
                    help="also time batched f32 chol/tri-inv/gemm at "
                    "(batch, n, n) — the batched KKT-factor regime")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    import conicip_tpu  # noqa: F401  (x64 on)
    from conicip_tpu.ops import smalleig as se

    _HI = jax.lax.Precision.HIGHEST
    B, d = args.batch, args.d
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, 1, d, d))
    M = M @ np.swapaxes(M, -1, -2) / d + 2.0 * np.eye(d)
    M0 = jnp.asarray(M)  # f64 SPD batch
    L0 = jax.block_until_ready(jnp.linalg.cholesky(M0))
    w = jnp.asarray(rng.standard_normal(d))
    v0 = jnp.asarray(rng.standard_normal(d))
    eyeb = jnp.broadcast_to(jnp.eye(d), (B, 1, d, d))

    def perturbed(v):
        return M0 + 1e-30 * jnp.abs(v)[None, None, None, :] * jnp.eye(d)

    def perturbedL(v):
        return L0 + 1e-30 * jnp.abs(v)[None, None, None, :] * jnp.eye(d)

    def consume(Y):
        # full consumption: every element of every output feeds the chain
        if isinstance(Y, tuple):
            wv, U = Y
            return jnp.matmul(U, wv[..., None], precision=_HI)[..., 0].sum(
                axis=(0, 1))
        return jnp.matmul(Y, w, precision=_HI).sum(axis=(0, 1))

    def slope_feedback(op_on_v, v0, r1=3, r2=9):
        def chain(reps):
            @jax.jit
            def run(v):
                def body(i, v):
                    y = consume(op_on_v(v))
                    return (y / (jnp.linalg.norm(y) + 1.0)
                            + v * 1e-6).astype(v.dtype)

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

    def ref_eigh_refined(v):
        return se.eigh_refined(perturbed(v))

    def nt_like_f64(v):
        # the full-precision nt_scaling S-block: chol + congruence + eigh
        # + tri-solve (cones/scaling.py:138-166)
        Z = perturbed(v)
        S = M0 + 1e-30 * jnp.abs(v)[None, None, :, None] * jnp.eye(d)
        Lz = jnp.linalg.cholesky(Z)
        LzT = jnp.swapaxes(Lz, -1, -2)
        T = jnp.matmul(jnp.matmul(LzT, S, precision=_HI), Lz, precision=_HI)
        lam2, U = jnp.linalg.eigh(0.5 * (T + jnp.swapaxes(T, -1, -2)))
        X = solve_triangular(LzT, U, lower=False)
        return X * jnp.sqrt(jnp.sqrt(jnp.maximum(lam2, 1e-300)))[..., None, :]

    def nt_like_refined(v):
        # the same block on the refinedEig route (what the batched tiers
        # now run): unrolled chol + refined eigh + unrolled tri-solve
        Z = perturbed(v)
        S = M0 + 1e-30 * jnp.abs(v)[None, None, :, None] * jnp.eye(d)
        Lz = se.cholesky_unrolled(Z)
        LzT = jnp.swapaxes(Lz, -1, -2)
        T = jnp.matmul(jnp.matmul(LzT, S, precision=_HI), Lz, precision=_HI)
        lam2, U = se.eigh_refined(0.5 * (T + jnp.swapaxes(T, -1, -2)))
        X = se.solve_tri_unrolled(LzT, U, lower=False)
        return X * jnp.sqrt(jnp.sqrt(jnp.maximum(lam2, 1e-300)))[..., None, :]

    ops = {
        "eigh_f64": lambda v: jnp.linalg.eigh(perturbed(v)),
        "eigh_f32": lambda v: jnp.linalg.eigh(
            perturbed(v).astype(jnp.float32)),
        "eigh_refined": ref_eigh_refined,
        "chol_f64": lambda v: jnp.linalg.cholesky(perturbed(v)),
        "chol_f32": lambda v: jnp.linalg.cholesky(
            perturbed(v).astype(jnp.float32)),
        "chol_unrolled": lambda v: se.cholesky_unrolled(perturbed(v)),
        "tri_solve_f64": lambda v: solve_triangular(
            perturbedL(v), eyeb, lower=True),
        "tri_solve_refined": lambda v: se.solve_tri_refined(
            perturbedL(v), eyeb, lower=True),
        "tri_solve_unrolled": lambda v: se.solve_tri_unrolled(
            perturbedL(v), eyeb, lower=True),
        "gemm_f64": lambda v: jnp.matmul(perturbed(v), M0, precision=_HI),
        "nt_like_f64": nt_like_f64,
        "nt_like_refined": nt_like_refined,
    }

    if args.kkt_n:
        # second regime: the batched f32 KKT factorization at the
        # batched_mixed_rq_eq reduced-solve shape — is XLA's BATCHED f32
        # cholesky/tri-solve MXU-parallel over the batch, or serialized
        # per instance (the 18.5 ms/iter suspect)?
        nk = args.kkt_n
        Mk = rng.standard_normal((B, nk, nk)).astype(np.float32)
        Mk = Mk @ np.swapaxes(Mk, -1, -2) / nk + nk * np.eye(
            nk, dtype=np.float32)
        Mk0 = jnp.asarray(Mk)
        Lk0 = jax.block_until_ready(jnp.linalg.cholesky(Mk0))
        eyek = jnp.broadcast_to(jnp.eye(nk, dtype=jnp.float32), (B, nk, nk))
        wk = jnp.asarray(rng.standard_normal(nk).astype(np.float32))

        def consume_kkt(Y):
            return jnp.matmul(Y, wk, precision=_HI).sum(axis=0)

        def pert_kkt(v):
            return Mk0 + 1e-30 * jnp.abs(v)[None, None, :] * jnp.eye(
                nk, dtype=jnp.float32)

        def pert_kktL(v):
            return Lk0 + 1e-30 * jnp.abs(v)[None, None, :] * jnp.eye(
                nk, dtype=jnp.float32)

        kkt_ops = {
            f"kkt{nk}_chol_f32": lambda v: jnp.linalg.cholesky(pert_kkt(v)),
            f"kkt{nk}_tri_inv_f32": lambda v: solve_triangular(
                pert_kktL(v), eyek, lower=True),
            f"kkt{nk}_gemm_f32": lambda v: jnp.matmul(
                pert_kkt(v), Mk0, precision=_HI),
        }
        v0k = jnp.asarray(rng.standard_normal(nk).astype(np.float32))
        globals_consume = consume_kkt  # noqa: F841

        def slope_kkt(op_on_v):
            def chain(reps):
                @jax.jit
                def run(v):
                    def body(i, v):
                        y = consume_kkt(op_on_v(v))
                        return (y / (jnp.linalg.norm(y) + 1.0)
                                + v * 1e-6).astype(v.dtype)

                    return jax.lax.fori_loop(0, reps, body, v)

                return run

            def timed(f):
                np.asarray(f(v0k))
                best = np.inf
                for _ in range(2):
                    t0 = time.perf_counter()
                    np.asarray(f(v0k))
                    best = min(best, time.perf_counter() - t0)
                return best

            pilot = (timed(chain(3)) - timed(chain(1))) / 2
            est = max(pilot, 1e-5)
            if est * 2 >= 0.5 * args.target_s:
                return pilot
            r2b = min(int(args.target_s / est), 2000)
            r1b = max(r2b // 4, 1)
            return (timed(chain(r2b)) - timed(chain(r1b))) / (r2b - r1b)

        ops_kkt_items = kkt_ops.items()
    else:
        ops_kkt_items = ()

    row = {"batch": B, "d": d, "backend": jax.default_backend()}
    for name, op in ops.items():
        if args.ops and name not in args.ops:
            continue
        try:
            t = slope_feedback(op, v0)
            row[name + "_ms"] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            row[name + "_ms"] = f"ERROR {type(e).__name__}: {e}"
        print(json.dumps({k: row[k] for k in row}), flush=True)
    for name, op in ops_kkt_items:
        if args.ops and name not in args.ops:
            continue
        try:
            t = slope_kkt(op)
            row[name + "_ms"] = round(t * 1e3, 3)
        except Exception as e:  # noqa: BLE001
            row[name + "_ms"] = f"ERROR {type(e).__name__}: {e}"
        print(json.dumps({k: row[k] for k in row}), flush=True)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"batched_factor_probe_{jax.default_backend()}.json")
    with open(out, "w") as f:
        json.dump(row, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

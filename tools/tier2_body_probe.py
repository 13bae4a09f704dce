#!/usr/bin/env python
"""Time the batched-SDP tier2 body stages at PRODUCTION dtypes, in-loop.

The refined f64-KKT batched solve costs ~170 ms per vmapped iteration at
B=64 (sdp_stage_split), while the historical per-stage trace summed to
~15 ms — and the device timeline (trace_rank + HLO crosswalk) points at
(a) two in-program f32 d=10 eigh sites lowered with T(1,128) tiling
(~32-48 ms each vs 0.87 ms standalone) and (b) the blocked64 cond_once
fallbacks possibly firing every trip (serialized monolithic f64 ops).
This probe times each stage with the production closures and dtypes,
in output-feedback fori_loop chains, to rank the real costs.

Usage: python tools/tier2_body_probe.py [--batch 64]
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
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--kappa", type=float, default=1e8,
                    help="condition number of the synthetic KKT block")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401
    from conicip_tpu.cones import algebra as alg
    from conicip_tpu.cones import scaling as sc
    from conicip_tpu.cones.spec import ConeSpec, tri_dim
    from conicip_tpu.models.generators import _vecm_np

    _HI = jax.lax.Precision.HIGHEST
    B, k = args.batch, args.k
    n = tri_dim(k)
    spec = ConeSpec([("S", n)])
    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    results = {"batch": B, "k": k, "backend": backend,
               "kappa": args.kappa}

    # mid-to-late-solve iterates: moderately ill-conditioned (z, s)
    def interior(count, spread):
        A_ = rng.standard_normal((count, k, k))
        Q_, _ = np.linalg.qr(A_)
        lam = np.exp(rng.uniform(np.log(1.0 / spread), 0.0, (count, k)))
        M = np.einsum("bij,bj,bkj->bik", Q_, lam, Q_)
        M = 0.5 * (M + np.swapaxes(M, -1, -2))
        return _vecm_np(M)

    zv = jnp.asarray(interior(B, 1e4))
    zs = jnp.asarray(interior(B, 1e4))
    dv = jnp.asarray(0.01 * rng.standard_normal((B, n)))

    def slope(op, v0, r1=2, r2=8, target_s=2.0):
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
            np.asarray(f(v0))
            best = np.inf
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(f(v0))
                best = min(best, time.perf_counter() - t0)
            return best

        pilot = (timed(chain(r2)) - timed(chain(r1))) / (r2 - r1)
        est = max(pilot, 1e-5)
        if est * (r2 - r1) >= 0.3 * target_s:
            return pilot
        r2b = min(int(target_s / est), 2000)
        r1b = max(r2b // 4, 1)
        return (timed(chain(r2b)) - timed(chain(r1b))) / (r2b - r1b)

    def vperturb(v):
        return zv + 1e-30 * v[None, :]

    def mk(name, fn, vmapped=True):
        vf = jax.vmap(fn) if vmapped else fn

        def op(v):
            out = vf(vperturb(v))
            leaves = jax.tree_util.tree_leaves(out)
            acc = 0.0
            for x in leaves:
                acc = acc + jnp.sum(x.astype(jnp.float64) * 1e-10)
            return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

        t = slope(op, jnp.asarray(rng.standard_normal(n)))
        results[name + "_ms"] = round(t * 1e3, 3)
        print(json.dumps({name + "_ms": results[name + "_ms"]}), flush=True)

    zs0 = zs

    # 1. refined NT scaling (the production tier2 scaling path)
    mk("nt_scaling_refined",
       lambda zvi, i=None: sc.nt_scaling(spec, zvi, zs0[0],
                                         eig_dtype="refined"))

    # 2. maxstep_multi in the lambda frame with free eigs (production)
    def _steps(zvi):
        F = sc.nt_scaling(spec, zvi, zs0[0], eig_dtype="refined")
        eigs = tuple((sd.lam, None) for sd in F.sdp)
        return alg.maxstep_multi(spec, zvi, (dv[0], -dv[0]), "refined",
                                 eigs)

    mk("ntscaling_plus_maxstep_multi", _steps)

    # 3. stock f32 eigh at the two call shapes, for reference
    from conicip_tpu.cones.symm import mat

    mk("eigh_f32_B64_d10",
       lambda zvi: jnp.linalg.eigh(mat(zvi).astype(jnp.float32)))

    def _eigh128(v):
        X = mat(jax.vmap(vperturb)(
            jnp.broadcast_to(v, (2 * B, n)) * 1.0)[:, 0]
            if False else vperturb(v))
        X2 = jnp.concatenate([X, X + 1e-6], axis=0).astype(jnp.float32)
        return jnp.linalg.eigvalsh(X2)

    results_key = "eigvalsh_f32_B128_d10"

    def op128(v):
        X = mat(vperturb(v)).astype(jnp.float32)
        X2 = jnp.concatenate([X, X + 1e-6], axis=0)
        w = jnp.linalg.eigvalsh(X2)
        acc = jnp.sum(w.astype(jnp.float64) * 1e-10)
        return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

    t = slope(op128, jnp.asarray(rng.standard_normal(n)))
    results[results_key + "_ms"] = round(t * 1e3, 3)
    print(json.dumps({results_key + "_ms": results[results_key + "_ms"]}),
          flush=True)

    # 4. the f64 KKT factorization path at the Schur shape (B, n, n):
    # well-conditioned vs kappa-conditioned (does the cond_once fallback
    # fire and what does it cost?)
    from conicip_tpu.ops.blocked64 import _base_chol, _newton_tri_inv

    def spd(count, d, kappa):
        A_ = rng.standard_normal((count, d, d))
        Q_, _ = np.linalg.qr(A_)
        lam = np.exp(rng.uniform(np.log(1.0 / kappa), 0.0, (count, d)))
        M = np.einsum("bij,bj,bkj->bik", Q_, lam, Q_)
        M = 0.5 * (M + np.swapaxes(M, -1, -2))
        # unit diagonal (equilibrated form)
        dsc = 1.0 / np.sqrt(np.maximum(np.diagonal(M, axis1=-2, axis2=-1),
                                       1e-300))
        return M * dsc[:, :, None] * dsc[:, None, :]

    M_well = jnp.asarray(spd(B, n, 1e2))
    M_ill = jnp.asarray(spd(B, n, args.kappa))

    for tag, Mb in (("well1e2", M_well), ("ill", M_ill)):
        def op_chol(v, Mb=Mb):
            Ms = Mb + 1e-30 * jnp.abs(v)[None, :, None] * jnp.eye(n)
            L = jax.vmap(_base_chol)(Ms)
            acc = jnp.sum(L * 1e-10)
            return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

        t = slope(op_chol, jnp.asarray(rng.standard_normal(n)))
        results[f"base_chol_f64_{tag}_ms"] = round(t * 1e3, 3)
        print(json.dumps({f"base_chol_f64_{tag}_ms":
                          results[f"base_chol_f64_{tag}_ms"]}), flush=True)

        def op_tri(v, Mb=Mb):
            Ms = Mb + 1e-30 * jnp.abs(v)[None, :, None] * jnp.eye(n)
            L = jax.vmap(_base_chol)(Ms)
            W = jax.vmap(_newton_tri_inv)(L)
            acc = jnp.sum(W * 1e-10)
            return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

        t = slope(op_tri, jnp.asarray(rng.standard_normal(n)))
        results[f"base_chol_plus_triinv_f64_{tag}_ms"] = round(t * 1e3, 3)
        print(json.dumps({f"base_chol_plus_triinv_f64_{tag}_ms":
                          results[f"base_chol_plus_triinv_f64_{tag}_ms"]}),
              flush=True)

    # monolithic f64 ops at the same shape, for comparison
    def op_mono(v):
        Ms = M_well + 1e-30 * jnp.abs(v)[None, :, None] * jnp.eye(n)
        L = jnp.linalg.cholesky(Ms)
        acc = jnp.sum(L * 1e-10)
        return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

    t = slope(op_mono, jnp.asarray(rng.standard_normal(n)))
    results["monolithic_chol_f64_ms"] = round(t * 1e3, 3)
    print(json.dumps({"monolithic_chol_f64_ms":
                      results["monolithic_chol_f64_ms"]}), flush=True)

    # 5. f64 stacked residual products at the family shape
    Qf = jnp.asarray(np.broadcast_to(np.eye(n), (B, n, n)).copy())

    def op_prod(v):
        y = vperturb(v)
        out = jnp.einsum("bij,bj->bi", Qf, y, precision=_HI)
        acc = jnp.sum(out * 1e-10)
        return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

    t = slope(op_prod, jnp.asarray(rng.standard_normal(n)))
    results["f64_batched_matvec_ms"] = round(t * 1e3, 3)
    print(json.dumps({"f64_batched_matvec_ms":
                      results["f64_batched_matvec_ms"]}), flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", f"tier2_body_{backend}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Device-profile ONE batched-SDP IPM iteration and rank op costs.

The batched small-SDP family is stuck at ~6 solves/s (0.01x ref) even
after the refinedEig fix removed the serialized emulated-f64
decompositions — so the dominator is something else. This tool builds the
production fast-tier body (vmapped nt_scaling + maxstep + KKT + step at
B=64, k=10) WITHOUT the while loop, runs it under jax.profiler.trace, and
also times sub-stages with output-feedback chains so the cost breakdown
is explicit.

Usage: python tools/batched_iter_trace.py [--batch 64] [--trace DIR]
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
    ap.add_argument("--trace", default=None)
    ap.add_argument("--target-s", type=float, default=2.0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401
    from conicip_tpu.cones import algebra as alg
    from conicip_tpu.cones import scaling as sc
    from conicip_tpu.cones.spec import ConeSpec, tri_dim
    from conicip_tpu.models import batched_small_sdp

    B, k = args.batch, args.k
    n = tri_dim(k)
    spec = ConeSpec([("S", n)])
    rng = np.random.default_rng(0)

    # strictly interior (z, s) pairs shaped like mid-solve iterates
    def interior_vec(count):
        A_ = rng.standard_normal((count, k, k))
        M = A_ @ np.swapaxes(A_, -1, -2) / k + np.eye(k)
        from conicip_tpu.models.generators import _vecm_np

        return _vecm_np(M)

    zv = jnp.asarray(interior_vec(B))
    zs = jnp.asarray(interior_vec(B))
    dv = jnp.asarray(0.01 * rng.standard_normal((B, n)))

    def slope(op, v0, r1=2, r2=6):
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
        if est * (r2 - r1) >= 0.5 * args.target_s:
            return pilot
        r2b = min(int(args.target_s / est), 3000)
        r1b = max(r2b // 4, 1)
        return (timed(chain(r2b)) - timed(chain(r1b))) / (r2b - r1b)

    def vperturb(v):
        return zv + 1e-30 * v[None, :]

    results = {"batch": B, "k": k, "backend": jax.default_backend()}

    # stage ops, each vmapped over the batch exactly like ipm_solve
    def mk(name, fn):
        vf = jax.vmap(fn)

        def op(v):
            out = vf(vperturb(v))
            leaves = jax.tree_util.tree_leaves(out)
            acc = 0.0
            for x in leaves:
                acc = acc + jnp.sum(x * 1e-10)
            return jnp.broadcast_to(acc, (n,)) * 1e-6 + v * 0.5

        t = slope(op, jnp.asarray(rng.standard_normal(n)))
        results[name + "_ms"] = round(t * 1e3, 3)
        print(json.dumps({name + "_ms": results[name + "_ms"]}), flush=True)

    zs0 = zs[0] * 0 + zs  # closure-captured batch

    mk("nt_scaling_f32",
       lambda zvi: sc.nt_scaling(spec, zvi, zs0[0], eig_dtype=jnp.float32))
    mk("nt_scaling_refined",
       lambda zvi: sc.nt_scaling(spec, zvi, zs0[0], eig_dtype="refined"))
    mk("nt_scaling_f64",
       lambda zvi: sc.nt_scaling(spec, zvi, zs0[0]))
    mk("nt_plus_inv_adjoint",
       lambda zvi: sc.nt_inv_adjoint(
           spec, sc.nt_scaling(spec, zvi, zs0[0], eig_dtype=jnp.float32)))
    mk("maxstep_f32",
       lambda zvi: alg.maxstep(spec, zvi, dv[0], eig_dtype=jnp.float32))
    mk("maxstep_refined",
       lambda zvi: alg.maxstep(spec, zvi, dv[0], eig_dtype="refined"))
    mk("cone_prod", lambda zvi: alg.cone_prod(spec, zvi, zs0[0]))
    mk("cone_div_lyap", lambda zvi: alg.cone_div(spec, zvi, zs0[0]))

    # packed-triangle conversions: the vmapped body runs many mat()/vecm()
    # roundtrips whose constant-index gathers/scatters may dominate on TPU
    # (the StableHLO census shows ~850 scatter ops in one fast-tier body)
    from conicip_tpu.cones.symm import mat, vecm

    mk("mat_vecm_roundtrip", lambda zvi: vecm(mat(zvi)))
    mk("mat_only", lambda zvi: mat(zvi))

    # stock eigh floor at the exact batched cone shapes
    mk("eigh_stock_f32_conegrp",
       lambda zvi: jnp.linalg.eigh(mat(zvi).astype(jnp.float32)))

    # shared-eigh call sites (r5): one sdp_eighs + maxstep_multi pair
    # replaces 2 maxstep calls (4 eighs); compare against maxstep_f32 x2
    def _ms_multi(zvi):
        eigs = alg.sdp_eighs(spec, zvi, jnp.float32)
        return alg.maxstep_multi(spec, zvi, (dv[0], -dv[0]),
                                 jnp.float32, eigs)

    mk("maxstep_multi_shared_f32", _ms_multi)

    # the full production fast-tier iteration via a 2-iteration
    # while-loop delta is measured by bench_batched; here trace the body
    if args.trace:
        Q, c, A, b, cones = batched_small_sdp(B, k=k)
        from conicip_tpu.parallel.batch import make_batched_solver
        from conicip_tpu.solver import _default_kktsolver
        from conicip_tpu.solver.ipm import IPMOptions

        opts = IPMOptions(optTol=1e-6, maxIters=3, mixedResiduals=True,
                          fastEig=True, refinedEig=True)
        solver = make_batched_solver(ConeSpec(tuple(cones)),
                                     _default_kktsolver(jnp.float32), opts)
        Qd, cd, Ad, bd = map(jnp.asarray, (Q, c, A, b))
        Gd = jnp.zeros((B, 0, n))
        dd = jnp.zeros((B, 0))
        st = solver(Qd, cd, Ad, bd, Gd, dd)
        np.asarray(st.y)  # compile+warm
        with jax.profiler.trace(args.trace):
            st = solver(Qd, cd, Ad, bd, Gd, dd)
            np.asarray(st.y)
        print(f"# trace written to {args.trace}", file=sys.stderr)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        f"batched_iter_trace_{jax.default_backend()}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

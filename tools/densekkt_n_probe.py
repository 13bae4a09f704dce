#!/usr/bin/env python
"""Production-path chained dense-KKT probe at parameterized n.

Settles the n≥1024 dense-factorization question with END-TO-END solves:
tools/roofline_verify.py's composite measured ~80 ms at n=1024 while
tools/repcurve.py measures the same chol/tri ops at ~0.22/0.14 ms in
equivalent feedback chains (linear in rep count, identical HLO). Rather
than argue about synthetic ops, this times the PRODUCTION dense-Schur
solver (f32 factors, mixed residuals, corrector auto) on dense box QPs at
a given n, chained K vs 2K inside one jit, and reports ms per IP
iteration. If the 80 ms composite were real, ms/iter at n=1024 would be
≥80; the r3 record for n=500 (1.37 ms/iter) scales as ~n³ to ~11 ms if
XLA's factorization is healthy.

Usage: python tools/densekkt_n_probe.py [--n 1024] [--K 4]
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
    ap.add_argument("--K", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.solver import _default_kktsolver
    from conicip_tpu.solver.ipm import IPMOptions, ipm_solve
    from conicip_tpu.solver.state import Status

    _HI = jax.lax.Precision.HIGHEST
    n, K = args.n, args.K
    spec = ConeSpec([("R", 2 * n)])
    opts = IPMOptions(optTol=1e-6, mixedResiduals=True,
                      centralityCorrectors=1)
    kkt = _default_kktsolver(jnp.float32)  # dense MXU Schur path

    rng = np.random.default_rng(0)
    G = jnp.zeros((0, n))
    d = jnp.zeros((0,))
    # dense SPD Qs generated on device (tunnel transfer discipline)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def make_Q(key):
        M = jax.random.normal(key, (2 * K, n, n), jnp.float32)
        Gm = jnp.einsum("bij,bik->bjk", M, M, precision=_HI) / n
        Gm = 0.5 * (Gm + jnp.swapaxes(Gm, -1, -2))
        return Gm.astype(jnp.float64) + jnp.eye(n, dtype=jnp.float64)

    Qs = make_Q(key)
    cs = jax.device_put(jnp.asarray(rng.standard_normal((2 * K, n))))

    def make_solve_all(count):
        @jax.jit
        def solve_all(Qs, cs):
            # A = [I; -I], b = -1 built ON DEVICE: as closure constants
            # they would be embedded in the HLO and at n=4096 the 268 MB
            # f64 A overflows the tunnel's compile-request limit (HTTP
            # 413, observed r5).
            I = jnp.eye(n, dtype=jnp.float64)
            A = jnp.concatenate([I, -I], axis=0)
            b = -jnp.ones(2 * n, dtype=jnp.float64)

            def body(i, acc):
                iters, resid, nbad = acc
                st = ipm_solve(Qs[i], cs[i], A, b, G, d, spec, kkt, opts)
                r = jnp.maximum(st.prFeas,
                                jnp.maximum(st.duFeas, st.muFeas))
                return (iters + st.Iter,
                        jnp.maximum(resid, r),
                        nbad + jnp.where(st.status == Status.OPTIMAL, 0, 1))

            return jax.lax.fori_loop(
                0, count, body,
                (jnp.int32(0), jnp.float64(0.0), jnp.int32(0)))

        return solve_all

    def sync(out):
        return tuple(np.asarray(x) for x in out)

    def best_of(f, reps):
        out = sync(f())
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = sync(f())
            best = min(best, time.perf_counter() - t0)
        return best, out

    sK = make_solve_all(K)
    s2K = make_solve_all(2 * K)
    tK, (itK, resK, badK) = best_of(lambda: sK(Qs, cs), args.reps)
    t2K, (it2K, res2K, bad2K) = best_of(lambda: s2K(Qs, cs), args.reps)
    elapsed = t2K - tK
    iters = int(it2K) - int(itK)
    row = {
        "n": n, "K": f"{K}->{2*K}", "backend": jax.default_backend(),
        "iters_marginal": iters,
        "ms_per_iter": round(elapsed / max(iters, 1) * 1e3, 3),
        "s_per_solve": round(elapsed / K, 4),
        "max_resid": float(res2K),
        "tol_ok": int(bad2K) == 0 and float(res2K) < 1e-6,
    }
    print(json.dumps(row))
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks",
        f"densekkt_n{n}_{jax.default_backend()}.json")
    with open(out, "w") as f:
        json.dump(row, f, indent=2)
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

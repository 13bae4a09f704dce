#!/usr/bin/env python
"""Headline benchmark: n=1000 box QP, IP iterations per second on one chip.

BASELINE.json metric: "KKT factorize+solve ms/iter and IP iterations/s at
n=1000 QP; residual tolerance hit". Reference best (pivot/2x2 sparse-LU on
Apple-Silicon CPU): 7.4 ms / 7 iters ~= 1.06 ms per IP iteration ~= ~950
iterations/s (BASELINE.md).

Measurement notes for the tunneled axon backend: jax.block_until_ready does
not reliably wait, and every synchronous dispatch pays a ~30 ms tunnel
round trip plus a measured ~70 ms fixed dispatch overhead — so solves are
chained *inside one jit* with lax.fori_loop, and the reported rate is the
K-vs-2K chain DIFFERENCE, which cancels every fixed cost and leaves the
pure per-solve device rate (what a local TPU host sustains in steady
state). Every solve is a full cold-start interior-point run on distinct
problem data; residuals are verified against 1e-6.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--all-backends", action="store_true",
        help="also time the dense MXU Schur path (doubles the one-time "
        "compile, ~2-4 min each through the tunnel); default times only "
        "the production backend (auto-selected: diagonal-Schur here)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401  (enables x64)
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.solver import _default_kktsolver
    from conicip_tpu.solver.ipm import IPMOptions, ipm_solve
    from conicip_tpu.solver.state import Status

    n = 1000
    K = 64  # marginal rate measured by differencing K- and 2K-solve chains
    spec = ConeSpec([("R", 2 * n)])
    opts = IPMOptions(optTol=1e-6, mixedResiduals=True)
    # Two backends, mirroring the reference's own benchmark where the
    # headline 950 iters/s comes from its structure-exploiting sparse-LU
    # backend on this same box QP: the dense MXU Schur path (general) and
    # kktsolver_diag (separable bound constraints -> diagonal Schur matrix,
    # the TPU-native analogue of what sparse LU exploits).
    import functools

    from conicip_tpu.kkt import kktsolver_diag

    backends = {
        "diag": functools.partial(kktsolver_diag, factor_dtype=jnp.float32),
    }
    if args.all_backends:
        backends["schur_dense"] = _default_kktsolver(jnp.float32)

    rng = np.random.default_rng(0)
    A = jax.device_put(jnp.asarray(np.vstack([np.eye(n), -np.eye(n)])))
    b = jax.device_put(jnp.asarray(-np.ones(2 * n)))
    G = jnp.zeros((0, n))
    d = jnp.zeros((0,))
    # ship only the diagonals (~2 MB) and build the dense Qs on device —
    # staging 128 dense (1000,1000) f64 matrices through the tunnel costs
    # ~1 GB of transfer for data that is all zeros off-diagonal
    qdiags = jax.device_put(jnp.asarray(1.0 + rng.random((2 * K, n))))
    Qs = jax.jit(jax.vmap(jnp.diag))(qdiags)
    cs = jax.device_put(jnp.asarray(rng.standard_normal((2 * K, n))))

    def make_solve_all(kkt, count):
        @jax.jit
        def solve_all(Qs, cs):
            def body(i, acc):
                iters, resid, nopt = acc
                st = ipm_solve(Qs[i], cs[i], A, b, G, d, spec, kkt, opts)
                r = jnp.maximum(st.prFeas, jnp.maximum(st.duFeas, st.muFeas))
                return (
                    iters + st.Iter,
                    jnp.maximum(resid, r),
                    nopt + jnp.where(st.status == Status.OPTIMAL, 0, 1),
                )

            return jax.lax.fori_loop(
                0, count, body, (jnp.int32(0), jnp.float64(0.0), jnp.int32(0))
            )

        return solve_all

    def sync(out):
        return tuple(np.asarray(x) for x in out)

    def best_of(f, reps=3):
        out = sync(f())  # warm-up / compile
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = sync(f())
            best = min(best, time.perf_counter() - t0)
        return best, out

    results = {}
    for bname, kkt in backends.items():
        # Marginal-rate measurement: time a K-solve chain and a 2K-solve
        # chain and difference them. This cancels EVERY fixed cost — the
        # ~30 ms tunnel round trip AND the ~70 ms fixed dispatch overhead
        # measured on this backend — leaving the pure per-solve device
        # rate, exactly what a local TPU host sustains in steady state.
        solve_K = make_solve_all(kkt, K)
        solve_2K = make_solve_all(kkt, 2 * K)
        tK, (itK, resK, badK) = best_of(lambda: solve_K(Qs, cs))
        t2K, (it2K, res2K, bad2K) = best_of(lambda: solve_2K(Qs, cs))
        elapsed = t2K - tK
        iters = int(it2K) - int(itK)
        tol_ok = int(bad2K) == 0 and float(res2K) < 1e-6
        method = "chain-differenced: fixed dispatch+tunnel costs cancel"
        if elapsed <= 0 or iters <= 0:  # tunnel-weather fallback
            elapsed, iters = max(t2K, 1e-9), int(it2K)
            method = ("FALLBACK raw 2K-chain timing, fixed costs NOT "
                      "subtracted (differencing came out non-positive — "
                      "rate understated)")
        results[bname] = (iters / elapsed, tol_ok)
        print(
            f"# backend={jax.default_backend()} kkt={bname} K={K}->2K "
            f"n={n} iters_marginal={iters} max_resid={float(res2K):.2e} "
            f"tol_ok={tol_ok} ms/iter={elapsed/iters*1e3:.3f} ({method})",
            file=sys.stderr,
        )

    baseline_iters_per_s = 950.0  # BASELINE.md derived headline
    iters_per_s, tol_ok = max(results.values())
    value = iters_per_s if tol_ok else 0.0
    print(
        json.dumps(
            {
                "metric": "ip_iterations_per_s_n1000_boxqp",
                "value": round(value, 1),
                "unit": "iters/s",
                "vs_baseline": round(value / baseline_iters_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

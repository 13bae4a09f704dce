#!/usr/bin/env python
"""Headline benchmark: n=1000 box QP, IP iterations per second on one chip.

BASELINE.json metric: "KKT factorize+solve ms/iter and IP iterations/s at
n=1000 QP; residual tolerance hit". Reference best (pivot/2x2 sparse-LU on
Apple-Silicon CPU): 7.4 ms / 7 iters ~= 1.06 ms per IP iteration ~= ~950
iterations/s (BASELINE.md).

Measurement notes for the tunneled axon backend: jax.block_until_ready does
not reliably wait, and every synchronous dispatch+sync pays a ~30 ms tunnel
round trip — so K solves are chained *inside one jit* with lax.fori_loop
(one dispatch, one device->host sync of small arrays), and the single
round-trip cost is measured on a trivial op and subtracted. Every solve is
a full cold-start interior-point run; residuals are verified against 1e-6.

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
    K = 64
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
    Qs = jax.device_put(
        jnp.asarray(np.stack([np.diag(1.0 + rng.random(n)) for _ in range(K)]))
    )
    cs = jax.device_put(jnp.asarray(rng.standard_normal((K, n))))

    def make_solve_all(kkt):
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
                0, K, body, (jnp.int32(0), jnp.float64(0.0), jnp.int32(0))
            )

        return solve_all

    def sync(out):
        return tuple(np.asarray(x) for x in out)

    # single dispatch+sync round-trip baseline (tunnel latency)
    probe = jax.jit(lambda x: x + 1)
    np.asarray(probe(jnp.float32(0)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(probe(jnp.float32(0)))
        rts.append(time.perf_counter() - t0)
    rt = float(np.median(rts))

    results = {}
    for bname, kkt in backends.items():
        solve_all = make_solve_all(kkt)
        iters, resid, nbad = sync(solve_all(Qs, cs))  # warm-up / compile
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            iters, resid, nbad = sync(solve_all(Qs, cs))
            best = min(best, time.perf_counter() - t0)
        elapsed = max(best - rt, 1e-9)
        total_iters = int(iters)
        tol_ok = int(nbad) == 0 and float(resid) < 1e-6
        results[bname] = (total_iters / elapsed, tol_ok)
        print(
            f"# backend={jax.default_backend()} kkt={bname} K={K} n={n} "
            f"total_iters={total_iters} max_resid={float(resid):.2e} "
            f"tol_ok={tol_ok} ms/iter={elapsed/total_iters*1e3:.3f} "
            f"(roundtrip {rt*1e3:.1f} ms subtracted)",
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

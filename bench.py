#!/usr/bin/env python
"""Headline benchmark: n=1000 box QP, IP iterations per second on one chip.

BASELINE.json metric: "KKT factorize+solve ms/iter and IP iterations/s at
n=1000 QP; residual tolerance hit". Reference best (pivot/2x2 sparse-LU on
Apple-Silicon CPU): 7.4 ms / 7 iters ≈ 1.06 ms per IP iteration ≈ ~950
iterations/s (BASELINE.md). We time K distinct device-resident solves
(inputs pre-transferred to HBM, mirroring the reference's in-RAM data) with
f32 factorization + f64 iterative refinement, and verify every solve hits
the 1e-6 residual tolerance.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401  (enables x64)
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.solver import _default_kktsolver, _solve_jit
    from conicip_tpu.solver.ipm import IPMOptions
    from conicip_tpu.solver.state import Status

    n = 1000
    K = 16
    spec = ConeSpec([("R", 2 * n)])
    opts = IPMOptions(optTol=1e-6, mixedResiduals=True)
    kkt = _default_kktsolver(jnp.float32)

    rng = np.random.default_rng(0)
    A = jax.device_put(jnp.asarray(np.vstack([np.eye(n), -np.eye(n)])))
    b = jax.device_put(jnp.asarray(-np.ones(2 * n)))
    G = jax.device_put(jnp.zeros((0, n)))
    d = jax.device_put(jnp.zeros((0,)))
    probs = []
    for _ in range(K):
        Q = jax.device_put(jnp.asarray(np.diag(1.0 + rng.random(n))))
        c = jax.device_put(jnp.asarray(rng.standard_normal(n)))
        probs.append((Q, c))

    def solve(Q, c):
        return _solve_jit(Q, c, A, b, G, d, spec=spec, kktsolver=kkt, opts=opts)

    # compile + warm up
    jax.block_until_ready(solve(*probs[0]))

    # NOTE: on the tunneled axon backend, jax.block_until_ready does NOT
    # reliably wait for execution — the only trustworthy sync is a
    # device→host read. Time sequential solves, syncing one scalar each
    # (the transfer is ~30ms of tunnel latency; subtracted below via the
    # measured per-sync overhead on an empty op).
    sync_probe = jax.jit(lambda x: x + 1)
    np.asarray(sync_probe(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(8):
        np.asarray(sync_probe(jnp.float32(0)))
    sync_ms = (time.perf_counter() - t0) / 8

    outs = []
    t0 = time.perf_counter()
    for Q, c in probs:
        o = solve(Q, c)
        np.asarray(o.Iter)  # scalar sync
        outs.append(o)
    t1 = time.perf_counter()
    t1 -= K * sync_ms  # remove tunnel round-trip latency, not device time

    iters = [int(o.Iter) for o in outs]
    statuses = [int(o.status) for o in outs]
    resid = max(
        float(jnp.maximum(o.prFeas, jnp.maximum(o.duFeas, o.muFeas))) for o in outs
    )
    tol_ok = all(s == Status.OPTIMAL for s in statuses) and resid < 1e-6

    total_iters = sum(iters)
    elapsed = t1 - t0
    iters_per_s = total_iters / elapsed
    ms_per_iter = elapsed / total_iters * 1e3

    print(
        f"# backend={jax.default_backend()} K={K} n={n} iters={iters} "
        f"max_resid={resid:.2e} tol_ok={tol_ok} ms/iter={ms_per_iter:.3f}",
        file=sys.stderr,
    )

    baseline_iters_per_s = 950.0  # BASELINE.md derived headline
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

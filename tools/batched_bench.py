#!/usr/bin/env python
"""Batched small-problem throughput — the TPU answer to tiny SDP/mix solves.

The per-solve latency of tiny problems (small_sdp n=55, mixed_rqs n=86) is
serial-eigh/chol bound on an accelerator and favors the reference's local
CPU (docs/comparison.md). The production TPU story for these shapes is
BATCHED throughput: the mask-based IPM core is vmap-safe, so B independent
instances run as one vmapped while_loop — every per-iteration eigh/chol/
assembly becomes one batched MXU/VPU kernel over B instances.

Measurement (same tunnel-proof discipline as bench.py): solve a B-instance
batch and a 2B-instance batch inside one jit each, reduce to scalars on
device, and difference the two times — every fixed cost (the ~30 ms tunnel
round trip, the ~70 ms dispatch overhead) cancels, leaving the marginal
device time of B extra instances. Solves run in full f64 (at these sizes
the f64 factorization is microseconds; it is also the configuration whose
batch converges 100% without any backstop).

Reference sequential rates (BASELINE.md, best backend, Apple-Silicon CPU):
small_sdp 1.4 ms/solve (714 solves/s), mixed_rqs 4.5 ms/solve
(222 solves/s, its only non-failing backend).

Usage: python tools/batched_bench.py [--batch 256] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


REF_S_PER_SOLVE = {
    # BASELINE.md / profile_output.txt:36-38, 54-56 (best backend)
    "batched_small_sdp": 0.0014,
    "batched_mixed_rqs": 0.0045,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import conicip_tpu  # noqa: F401  (enables x64)
    from conicip_tpu.cones.spec import ConeSpec
    from conicip_tpu.models import batched_mixed_rqs, batched_small_sdp
    from conicip_tpu.solver import _default_kktsolver
    from conicip_tpu.solver.ipm import IPMOptions, ipm_solve
    from conicip_tpu.solver.state import Status

    B = args.batch
    opts = IPMOptions(optTol=1e-6)
    kkt = _default_kktsolver(None)  # full f64 (see module docstring)

    print(f"# backend={jax.default_backend()} B={B} (differenced vs 2B) "
          f"full-f64 batched solves", file=sys.stderr)

    results = []
    for name, gen in (
        ("batched_small_sdp", batched_small_sdp),
        ("batched_mixed_rqs", batched_mixed_rqs),
    ):
        # 2B distinct instances; only c varies per instance — Q = A = I and
        # b are shared, so ship c alone (~350 KB) and build the shared
        # operands on device inside the jit.
        Q, c, A, b, cone_dims = gen(2 * B)
        n = c.shape[-1]
        spec = ConeSpec(cone_dims)
        b0 = jnp.asarray(b[0])
        cs_all = jax.device_put(jnp.asarray(c))
        Gz = jnp.zeros((0, n))
        dz = jnp.zeros((0,))

        def make_run(count, spec=spec, b0=b0, n=n):
            @jax.jit
            def run(cs):
                I = jnp.eye(n, dtype=cs.dtype)

                def one(cvec):
                    return ipm_solve(I, cvec, I, b0, Gz, dz, spec, kkt, opts)

                st = jax.vmap(one)(cs[:count])
                resid = jnp.maximum(
                    st.prFeas, jnp.maximum(st.duFeas, st.muFeas)
                )
                return (
                    jnp.sum(st.Iter),
                    jnp.max(resid),
                    jnp.sum(st.status == Status.OPTIMAL),
                )

            return run

        def best_of(f, x, reps):
            out = tuple(np.asarray(v) for v in f(x))  # compile + warm
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                out = tuple(np.asarray(v) for v in f(x))
                best = min(best, time.perf_counter() - t0)
            return best, out

        run_B = make_run(B)
        run_2B = make_run(2 * B)
        tB, (itB, resB, noptB) = best_of(run_B, cs_all, args.reps)
        t2B, (it2B, res2B, nopt2B) = best_of(run_2B, cs_all, args.reps)

        marginal = t2B - tB
        method = "chain-differenced (B vs 2B): fixed costs cancel"
        if marginal <= 0:  # tunnel-weather fallback
            marginal = max(t2B / 2, 1e-9)
            method = ("FALLBACK raw 2B/2 timing, fixed costs NOT "
                      "subtracted — throughput understated")
        solves_per_s = B / marginal
        ref = REF_S_PER_SOLVE[name]
        row = dict(
            problem=name, batch=B,
            s_per_solve=round(marginal / B, 8),
            solves_per_s=round(solves_per_s, 1),
            iters_per_solve=round((int(it2B) - int(itB)) / B, 2),
            n_optimal=f"{int(nopt2B)}/{2 * B}",
            max_resid=float(res2B),
            ref_s_per_solve=ref,
            vs_reference=round(solves_per_s * ref, 1),
            method=method,
        )
        results.append(row)
        print(f"{name:20s} {row['solves_per_s']:>9.1f} solves/s "
              f"({row['s_per_solve']*1e3:.3f} ms/solve)  "
              f"{row['vs_reference']:.1f}x reference  "
              f"optimal={row['n_optimal']}  max_resid={row['max_resid']:.2e}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
        print(f"report written to {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()

"""Batched problem solving — data parallelism over problem instances.

The reference solves one problem per call (ConicIP.jl:468); batching is the
TPU framework's first free parallelism axis (SURVEY.md §2.3): the IPM core is
mask-based and therefore ``vmap``-safe — converged instances freeze their
iterates while the loop keeps stepping the rest — so a stack of problems is
one ``vmap`` + one jit, and sharding the batch axis over a device mesh makes
it multi-chip/multi-host data parallelism with zero cross-instance
communication.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cones.spec import ConeSpec
from ..solver.ipm import IPMOptions, ipm_solve
from ..solver.state import STATUS_NAMES, SolState

__all__ = [
    "solve_batch",
    "BatchSolution",
    "make_batched_solver",
    "make_batched_warm_solver",
]


@dataclass
class BatchSolution:
    """Stacked solutions with numpy storage."""

    y: np.ndarray
    w: np.ndarray
    v: np.ndarray
    status: np.ndarray  # int codes
    Iter: np.ndarray
    Mu: np.ndarray
    prFeas: np.ndarray
    duFeas: np.ndarray
    muFeas: np.ndarray
    pobj: np.ndarray
    dobj: np.ndarray

    @property
    def statuses(self) -> List[str]:
        return [STATUS_NAMES[int(s)] for s in self.status]

    @classmethod
    def from_state(cls, st: SolState) -> "BatchSolution":
        return cls(**{k: np.asarray(getattr(st, k)) for k in cls.__dataclass_fields__
                      if k != "statuses"})


@functools.lru_cache(maxsize=None)
def make_batched_solver(spec: ConeSpec, kktsolver, opts: IPMOptions,
                        batch_G: bool = True):
    """jitted vmapped solver for a fixed (spec, kktsolver, opts)."""
    g_axis = 0 if batch_G else None

    def core(Q, c, A, b, G, d):
        return ipm_solve(Q, c, A, b, G, d, spec, kktsolver, opts)

    return jax.jit(jax.vmap(core, in_axes=(0, 0, 0, 0, g_axis, g_axis)))


@functools.lru_cache(maxsize=None)
def make_batched_warm_solver(spec: ConeSpec, kktsolver, opts: IPMOptions,
                             batch_G: bool = True):
    """jitted vmapped warm-started solver (warm iterate batched on axis 0)."""
    g_axis = 0 if batch_G else None

    def core(Q, c, A, b, G, d, warm):
        return ipm_solve(Q, c, A, b, G, d, spec, kktsolver, opts, warm=warm)

    return jax.jit(
        jax.vmap(core, in_axes=(0, 0, 0, 0, g_axis, g_axis, 0))
    )


def solve_batch(
    Q,
    c,
    A,
    b,
    cone_dims: Sequence[Tuple[str, int]],
    G=None,
    d=None,
    *,
    mesh: Optional[Mesh] = None,
    batch_axis: str = "batch",
    kktsolver=None,
    factor_dtype="auto",
    dtype=None,
    warm_start=None,
    backstop: bool = True,
    **options,
) -> BatchSolution:
    """Solve a stack of independent conic QPs (leading batch axis on
    Q, c, A, b and optionally G, d).

    With ``mesh``, the batch axis is sharded over ``mesh[batch_axis]`` —
    per-problem work stays local to one device; XLA inserts no collectives.

    ``warm_start`` seeds every instance from a previous
    :class:`BatchSolution` (or a ``(y, w, v)`` tuple of stacked arrays) —
    the production pattern for periodic re-solves of drifting problem
    batches. Instances with non-finite warm data are scrubbed to a neutral
    start (the iterate is shifted strictly into the cone either way).

    ``backstop=False`` disables the per-instance full-precision re-solve
    of stalled f32 instances (used by the checkpoint loop, where an
    intermediate chunk's "Abandoned" just means "budget not yet spent").
    """
    dtype = dtype or jnp.float64
    from ..solver import resolve_factor_dtype

    factor_dtype = resolve_factor_dtype(factor_dtype)
    Q_in, A_in = Q, A  # host-side originals for the pattern check below
    Q = jnp.asarray(Q, dtype)
    c = jnp.asarray(c, dtype)
    A = jnp.asarray(A, dtype)
    b = jnp.asarray(b, dtype)
    batch = c.shape[0]
    n = c.shape[-1]
    if G is None:
        G = jnp.zeros((batch, 0, n), dtype)
        d = jnp.zeros((batch, 0), dtype)
    else:
        G = jnp.asarray(G, dtype)
        d = jnp.asarray(d, dtype)
        if G.ndim == 2:  # shared equality system
            G = jnp.broadcast_to(G, (batch,) + G.shape)
            d = jnp.broadcast_to(d, (batch,) + d.shape)

    spec = ConeSpec(cone_dims)
    if kktsolver is None:
        # auto structure exploitation (same policy as conic_ip), but the
        # separability pattern must hold for EVERY instance in the batch.
        # The check runs on the caller's original (usually host) arrays —
        # checking the device copies would pull Q and A back through the
        # tunnel at ~100 ms/MB.
        from ..kkt.diag import equality_mode, separable_batch
        from ..solver import _default_kktsolver, _diag_kktsolver

        if separable_batch(Q_in, A_in, G, spec):
            mode = equality_mode(Q_in, G)
            kktsolver = _diag_kktsolver(
                factor_dtype, "woodbury" if mode in (None, "none") else mode
            )
        else:
            kktsolver = _default_kktsolver(factor_dtype)
    if "mixedResiduals" not in options:
        # same production policy as conic_ip: f32 factors + f64 iterates
        # run the per-iteration residual mat-vecs in f32 with certified
        # f64 re-evaluation near tolerance decisions
        options = {
            **options,
            "mixedResiduals": factor_dtype == jnp.float32
            and dtype == jnp.float64,
        }
    opts = IPMOptions(**options)
    if opts.verbose:
        raise ValueError("verbose output is not supported in batched mode")

    warm = None
    if warm_start is not None:
        from ..solver.state import Vec4

        ws = warm_start
        wy = np.asarray(ws.y if hasattr(ws, "y") else ws[0], float)
        wv = np.asarray(ws.v if hasattr(ws, "v") else ws[2], float)
        ww = ws.w if hasattr(ws, "w") else ws[1]
        p = G.shape[1]
        ww = np.zeros((batch, p)) if ww is None else np.asarray(ww, float)
        if wy.shape != (batch, n) or wv.shape != A.shape[:2] or ww.shape != (batch, p):
            raise ValueError("warm_start dimensions do not match the batch")
        ok = (
            np.all(np.isfinite(wy), axis=1)
            & np.all(np.isfinite(ww), axis=1)
            & np.all(np.isfinite(wv), axis=1)
        )[:, None]
        wy = jnp.asarray(np.where(ok, wy, 0.0), dtype)
        ww = jnp.asarray(np.where(ok, ww, 0.0), dtype)
        wv = jnp.asarray(np.where(ok, wv, 1.0), dtype)
        ws_slack = jnp.einsum("bij,bj->bi", A, wy,
                              precision=jax.lax.Precision.HIGHEST) - b
        warm = Vec4(wy, ww, wv, ws_slack)

    solver = (
        make_batched_warm_solver(spec, kktsolver, opts)
        if warm is not None
        else make_batched_solver(spec, kktsolver, opts)
    )

    if mesh is not None:
        shard = NamedSharding(mesh, P(batch_axis))
        put = lambda x: jax.device_put(x, shard)  # noqa: E731
        Q, c, A, b, G, d = map(put, (Q, c, A, b, G, d))
        if warm is not None:
            warm = Vec4(*(jax.device_put(x, shard) for x in
                          (warm.y, warm.w, warm.v, warm.s)))

    if warm is not None:
        st = jax.block_until_ready(solver(Q, c, A, b, G, d, warm))
    else:
        st = jax.block_until_ready(solver(Q, c, A, b, G, d))
    out = BatchSolution.from_state(st)

    # Batched robustness backstop (same ladder as conic_ip): instances whose
    # f32 tier ended without a definitive status are re-solved AS A BATCH —
    # first f64-assembled/f32-factored (rescues assembly-cancellation stalls
    # at ~1/50 the full-f64 cost), then full f64 — warm-started from their
    # best iterates. Every Abandoned/Error instance escalates regardless of
    # its residual: infeasible/unbounded instances end with LARGE residuals
    # and only the full-precision tiers can sharpen their certificates
    # (the Miles-2 hazard; see conic_ip._stalled).
    if factor_dtype == jnp.float32 and backstop:
        from ..solver import Status, _default_kktsolver
        from ..solver.state import Vec4

        stalled = np.nonzero(
            np.isin(out.status, (Status.ABANDONED, Status.ERROR))
        )[0]
        ladder = [
            (_default_kktsolver(jnp.float32, jnp.float64), True),
            (_default_kktsolver(None), False),
        ]
        if stalled.size:
            # np.asarray of device arrays is read-only — make fields writable
            for field in BatchSolution.__dataclass_fields__:
                setattr(out, field, np.array(getattr(out, field)))
        for kkt_next, mixed_next in ladder:
            if not stalled.size:
                break
            idx = jnp.asarray(stalled)
            Qs, cs, As, bs, Gs, ds = (X[idx] for X in (Q, c, A, b, G, d))
            yb = np.array(out.y[stalled])
            wb = np.array(out.w[stalled])
            vb = np.array(out.v[stalled])
            ok = (
                np.all(np.isfinite(yb), axis=1)
                & np.all(np.isfinite(wb), axis=1)
                & np.all(np.isfinite(vb), axis=1)
            )[:, None]
            # non-finite best iterates restart from a neutral point (the
            # solver shifts it strictly into the cone either way)
            yj = jnp.asarray(np.where(ok, yb, 0.0), dtype)
            wj = jnp.asarray(np.where(ok, wb, 0.0), dtype)
            vj = jnp.asarray(np.where(ok, vb, 1.0), dtype)
            sj = jnp.einsum("bij,bj->bi", As, yj,
                            precision=jax.lax.Precision.HIGHEST) - bs
            opts_next = IPMOptions(**{**options, "mixedResiduals": mixed_next})
            solver_next = make_batched_warm_solver(spec, kkt_next, opts_next)
            sti = jax.block_until_ready(
                solver_next(Qs, cs, As, bs, Gs, ds, Vec4(yj, wj, vj, sj))
            )
            cand = BatchSolution.from_state(sti)
            cand_res = np.maximum(cand.prFeas,
                                  np.maximum(cand.duFeas, cand.muFeas))
            out_res = np.maximum(out.prFeas, np.maximum(out.duFeas,
                                                        out.muFeas))[stalled]
            # accept a tier's answer if it reached a definitive status or
            # at least improved the residual (same policy as conic_ip)
            accept = (
                ~np.isin(cand.status, (Status.ABANDONED, Status.ERROR))
                | (cand_res <= out_res)
            )
            take = stalled[accept]
            sub = np.nonzero(accept)[0]
            for field in BatchSolution.__dataclass_fields__:
                getattr(out, field)[take] = np.asarray(
                    getattr(cand, field))[sub]
            # out.status now holds accepted tiers' statuses; rejected
            # instances keep their old (still stalled) status
            stalled = stalled[
                np.isin(out.status[stalled],
                        (Status.ABANDONED, Status.ERROR))
            ]
    return out

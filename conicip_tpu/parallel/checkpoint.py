"""Checkpoint / resume for long batched solves.

The reference has no checkpointing — its solves are seconds long
(SURVEY.md §5: "no checkpoint, no elastic anything"). At TPU scale the
interesting workload is a huge sharded batch of instances, where losing a
preemptible slice mid-run should not mean re-paying every IP iteration.
This module adds the missing subsystem the TPU-native way:

- the batch is solved in *chunks* of ``chunk_iters`` interior-point
  iterations (one jitted ``vmap`` solve per chunk, warm-started from the
  previous chunk's iterates — the same warm path ``solve_batch`` exposes);
- after each chunk the full iterate state (y, w, v and per-instance
  bookkeeping) is written atomically to an ``.npz`` snapshot;
- ``solve_batch_resumable`` with the same ``store`` path picks up from the
  snapshot: already-finished instances are frozen (mask-based, exactly like
  converged instances inside the while_loop), unfinished ones continue from
  their saved iterates.

The snapshot also records a digest of the problem data, so resuming
against different data fails loudly instead of silently mixing batches.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import numpy as np

from ..solver.state import Status
from .batch import BatchSolution, solve_batch

__all__ = ["solve_batch_resumable", "load_snapshot", "SnapshotInfo"]

_FIELDS = ("y", "w", "v", "status", "Iter", "Mu", "prFeas", "duFeas",
           "muFeas", "pobj", "dobj")


@dataclass
class SnapshotInfo:
    """Metadata of an on-disk snapshot."""

    iters_done: int
    n_finished: int
    batch: int

    @property
    def done(self) -> bool:
        return self.n_finished == self.batch


def _digest(*arrays, cone_dims=None) -> str:
    h = hashlib.sha256()
    h.update(repr(list(cone_dims or [])).encode())
    for a in arrays:
        a = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()


def _save(path: str, state: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **state)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic on POSIX — a crash never corrupts


def load_snapshot(store: str) -> Optional[SnapshotInfo]:
    """Peek at a snapshot without solving."""
    if not os.path.exists(store):
        return None
    z = np.load(store)
    running = int((z["status"] == Status.RUNNING).sum())
    return SnapshotInfo(
        iters_done=int(z["iters_done"]),
        n_finished=int(z["status"].shape[0] - running),
        batch=int(z["status"].shape[0]),
    )


def solve_batch_resumable(
    Q,
    c,
    A,
    b,
    cone_dims: Sequence[Tuple[str, int]],
    G=None,
    d=None,
    *,
    store: str,
    chunk_iters: int = 10,
    maxIters: int = 100,
    **options,
) -> BatchSolution:
    """Batched solve with durable progress: state is snapshotted to
    ``store`` (an ``.npz`` path, written atomically) every ``chunk_iters``
    interior-point iterations, and an interrupted run re-invoked with the
    same arguments resumes from the snapshot instead of restarting.

    Accepts everything :func:`solve_batch` does (mesh sharding,
    ``factor_dtype``, ...). Semantics note: a chunk boundary warm-restarts
    the Mehrotra iteration (fresh initial scaling), so iterate trajectories
    differ slightly from an uninterrupted ``solve_batch`` — statuses and
    residual tolerances do not.
    """
    Qn, cn = np.asarray(Q), np.asarray(c)
    An, bn = np.asarray(A), np.asarray(b)
    batch = cn.shape[0]
    extra = [np.asarray(x) for x in (G, d) if x is not None]
    fingerprint = _digest(Qn, cn, An, bn, *extra, cone_dims=cone_dims)

    # ── resume state ─────────────────────────────────────────────
    iters_done = 0
    frozen: Optional[dict] = None  # fields of finished instances
    warm = None
    active = np.ones(batch, dtype=bool)
    if os.path.exists(store):
        z = np.load(store)
        if str(z["fingerprint"]) != fingerprint:
            raise ValueError(
                f"snapshot {store!r} was written for different problem data"
            )
        iters_done = int(z["iters_done"])
        frozen = {k: np.array(z[k]) for k in _FIELDS}
        active = np.array(z["status"]) == Status.RUNNING
        warm = (np.array(z["warm_y"]), np.array(z["warm_w"]),
                np.array(z["warm_v"]))

    if frozen is None:
        frozen = {}

    out: Optional[BatchSolution] = None
    while iters_done < maxIters and active.any():
        # constant chunk size: a remainder-sized final chunk would be a
        # fresh (spec, kktsolver, opts) key and cost a full recompile
        # (30-90 s through the tunnel) — the global budget is enforced by
        # the freeze logic below, overshooting by at most chunk_iters-1.
        step = chunk_iters
        final = iters_done + step >= maxIters
        bs = solve_batch(
            Q, c, A, b, cone_dims, G, d,
            maxIters=step, warm_start=warm, backstop=final, **options,
        )
        iters_done += step

        # Freeze instances that reached a definitive status; Abandoned
        # within a chunk just means "not converged yet" unless the
        # iteration budget is exhausted.
        bs_status = np.array(bs.status)
        definitive = ~np.isin(bs_status, (Status.ABANDONED, Status.RUNNING))
        newly_done = active & (definitive | (iters_done >= maxIters))
        for k in _FIELDS:
            arr = np.array(getattr(bs, k))
            if k == "Iter":  # cumulative across chunks
                arr = (iters_done - step + arr).astype(np.int32)
            if k not in frozen:
                frozen[k] = arr.copy()
            frozen[k][newly_done] = arr[newly_done]
        active = active & ~newly_done
        # mark still-active rows RUNNING in the snapshot so resume sees them
        snap_status = np.array(frozen["status"])
        snap_status[active] = Status.RUNNING
        frozen["status"] = snap_status

        warm = (np.array(bs.y), np.array(bs.w), np.array(bs.v))
        _save(store, dict(
            fingerprint=fingerprint, iters_done=iters_done,
            warm_y=warm[0], warm_w=warm[1], warm_v=warm[2],
            **frozen,
        ))
        out = bs

    # assemble the final BatchSolution from frozen fields
    fin = {k: np.array(v) for k, v in frozen.items()}
    # anything still RUNNING after maxIters is Abandoned (reference
    # ConicIP.jl:936 semantics)
    fin["status"] = np.where(
        fin["status"] == Status.RUNNING, Status.ABANDONED, fin["status"]
    ).astype(np.int32)
    _save(store, dict(
        fingerprint=fingerprint, iters_done=iters_done,
        warm_y=np.array(out.y if out is not None else fin["y"]),
        warm_w=np.array(out.w if out is not None else fin["w"]),
        warm_v=np.array(out.v if out is not None else fin["v"]),
        **fin,
    ))
    return BatchSolution(**fin)

"""Batched tournament-Jacobi symmetric eigensolver for SMALL matrices.

Why not ``jnp.linalg.eigh``: on v5e, XLA lowers eigh through a serial
Jacobi expansion that pads the (tiny) matrix toward the 128-lane tile and
iterates data-dependently — measured tens of milliseconds for a
(64, 1, 10, 10) batch, and the batched-SDP IPM iteration runs several
eigh calls (NT scaling, max-step ×2, Lyapunov), which made the batched
small-SDP family ~50× slower per iteration than its FLOPs justify.

This solver is shaped for that exact regime (d ≲ 32, any batch):

- **round-robin tournament pairing**: each round rotates ⌈d/2⌉ DISJOINT
  pivot pairs simultaneously, so one round = one (d, d) rotation matrix;
  a sweep of d-1 rounds touches every off-diagonal pair once.
- every step is a batched (…, d, d) matmul or an elementwise mask — no
  gather/scatter, no dynamic control flow, fixed trip count (`sweeps`
  static), so the whole thing fuses into the surrounding jit and vmaps
  freely.
- rotations are computed in the INPUT dtype; quadratic off-diagonal decay
  reaches f32 machine accuracy in ~6 sweeps at d=10 (tests force ~1e-6
  relative on 6-decade spectra).

The classic reference for parallel orderings is Brent & Luk (1985); the
construction here (permute pairs adjacent → build a block-diag 2×2
rotation with elementwise masks → conjugate) is chosen so XLA sees only
MXU-friendly ops. Replaces eigh as the f32 seed/fast-phase decomposition
in the batched S-cone path (cones/algebra.py _eigh_d); reference
semantics anchor: eigenvalue use sites ConicIP.jl:196-210, 272-303.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["eigh_jacobi", "jacobi_rounds"]

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def jacobi_rounds(d: int):
    """Round-robin tournament schedule: list of permutations (numpy int
    arrays of length dp = d rounded up to even) bringing each round's
    disjoint pairs into adjacent (2i, 2i+1) positions. Player dp-1 is a
    phantom when d is odd (its pair is masked out by the caller)."""
    dp = d + (d % 2)
    # circle method: fix player 0, rotate the rest
    others = list(range(1, dp))
    rounds = []
    for _ in range(dp - 1):
        order = [0] + others
        # pairs: (order[0], order[-1]), (order[1], order[-2]), ...
        perm = []
        for i in range(dp // 2):
            perm.append(order[i])
            perm.append(order[dp - 1 - i])
        rounds.append(np.asarray(perm, np.int32))
        others = [others[-1]] + others[:-1]
    return rounds


def _round_rotation(B: jnp.ndarray, d: int, dp: int):
    """Given the permuted matrix B (pairs adjacent), build the block-diag
    2×2 rotation G zeroing every B[2i, 2i+1]. Elementwise only."""
    dt = B.dtype
    app = B[..., 0::2, 0::2]  # (…, dp/2, dp/2); diag = a_pp
    aqq = B[..., 1::2, 1::2]
    apq = B[..., 0::2, 1::2]
    a = jnp.diagonal(app, axis1=-2, axis2=-1)
    b = jnp.diagonal(aqq, axis1=-2, axis2=-1)
    ab = jnp.diagonal(apq, axis1=-2, axis2=-1)  # (…, dp/2)
    # stable Jacobi rotation: t = sign(θ)/(|θ| + sqrt(θ²+1)), θ = (b−a)/2ab
    small = jnp.abs(ab) <= jnp.asarray(10.0, dt) * jnp.finfo(dt).tiny
    ab_safe = jnp.where(small, 1.0, ab)
    theta = (b - a) / (2.0 * ab_safe)
    t = jnp.sign(theta) / (jnp.abs(theta)
                           + jnp.sqrt(theta * theta + 1.0))
    t = jnp.where(small, 0.0, t)
    c = jax.lax.rsqrt(t * t + 1.0)
    s = t * c
    # expand to (…, dp): even slots carry c, pairs share c/s
    c2 = jnp.repeat(c, 2, axis=-1)
    s2 = jnp.repeat(s, 2, axis=-1)
    ii = jnp.arange(dp)
    blk = ii // 2
    same_blk = blk[:, None] == blk[None, :]
    up = same_blk & (ii[None, :] == ii[:, None] + 1)   # (p, q) slot
    lo = same_blk & (ii[None, :] == ii[:, None] - 1)   # (q, p) slot
    eye = jnp.eye(dp, dtype=dt)
    G = (eye * c2[..., None, :]
         + jnp.where(up, 1.0, 0.0) * s2[..., None, :]
         - jnp.where(lo, 1.0, 0.0) * s2[..., :, None])
    return G


def eigh_jacobi(T: jnp.ndarray, sweeps: int = 8):
    """Batched symmetric eigendecomposition of (…, d, d) via fixed-sweep
    tournament Jacobi. Returns (w ascending, V) with ``T ≈ V diag(w) Vᵀ``.

    Accuracy: off-diagonal mass contracts quadratically; ``sweeps=8``
    reaches input-dtype machine accuracy for d ≤ 16 on ≤6-decade spectra
    (see tests/test_jacobi.py). Cost: (d-1)·sweeps rounds × 3 batched
    (d, d) matmuls — everything on the MXU, nothing padded to 128.
    """
    d = T.shape[-1]
    dt = T.dtype
    if d == 1:
        return T[..., 0], jnp.ones_like(T)
    dp = d + (d % 2)
    if dp != d:  # phantom row/col: decoupled identity block
        pad = [(0, 0)] * (T.ndim - 2) + [(0, 1), (0, 1)]
        A = jnp.pad(T, pad)
        A = A.at[..., d, d].set(1.0)
    else:
        A = T
    V = jnp.broadcast_to(jnp.eye(dp, dtype=dt), A.shape)
    rounds = jacobi_rounds(d)
    # static permutation matrices (host-built constants)
    Ps = [jnp.asarray(np.eye(dp, dtype=np.float64)[p].astype(T.dtype))
          for p in rounds]
    for _ in range(sweeps):
        for P in Ps:
            # B = P A Pᵀ brings this round's pairs adjacent
            B = jnp.matmul(jnp.matmul(P, A, precision=_HI),
                           P.T, precision=_HI)
            G = _round_rotation(B, d, dp)
            # A ← Pᵀ (Gᵀ B G) P ; V ← V Pᵀ G P  (accumulate in one go)
            GB = jnp.matmul(jnp.swapaxes(G, -1, -2), B, precision=_HI)
            B = jnp.matmul(GB, G, precision=_HI)
            B = 0.5 * (B + jnp.swapaxes(B, -1, -2))
            A = jnp.matmul(jnp.matmul(P.T, B, precision=_HI), P,
                           precision=_HI)
            PGP = jnp.matmul(jnp.matmul(P.T, G, precision=_HI), P,
                             precision=_HI)
            V = jnp.matmul(V, PGP, precision=_HI)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    if dp != d:
        w = w[..., :d]
        V = V[..., :d, :d]
    # sort ascending (eigh convention) via a one-hot permutation matmul —
    # no dynamic gathers on the TPU hot path (CLAUDE.md cone-dispatch rule)
    order = jnp.argsort(w, axis=-1)  # (…, d) tiny static-size sort
    onehot = (order[..., None, :] == jnp.arange(d)[:, None]).astype(dt)
    # onehot[…, i, j] = 1 iff order[j] == i  → column j of V·onehot is
    # eigenvector order[j]
    w = jnp.einsum("...ij,...i->...j", onehot, w)
    V = jnp.matmul(V, onehot, precision=_HI)
    return w, V

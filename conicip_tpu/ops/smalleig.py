"""Fast small-matrix symmetric factorizations for the TPU SDP path.

Measured on the v5e (batched (6,7,7) / (1,30,30), tunnel-free timing):

==============  =========  =========  ==========================
op              f64        f32        f64 accuracy
==============  =========  =========  ==========================
eigh            0.2-1.7ms  0.03-0.1   ~5e-7 — f32-level anyway
cholesky        0.3-1.9ms  ~free      exact
solve_triang.   0.3-0.5ms  ~free      exact
matmul HIGHEST  0.02-0.04  —          exact
==============  =========  =========  ==========================

The f64 `eigh` is 7-17x slower than f32 while computing at f32 accuracy
internally, and f64 cholesky/triangular solves are 10-100x slower than
f32. Since exact f64 *matmuls* are nearly free at these sizes, the right
TPU design is: factorize in f32, then restore accuracy with one exact-f64
refinement sweep:

- ``eigh_refined``: f32 eigh + Löwdin re-orthonormalization
  ``U ← U(3I − UᵀU)/2`` + Rayleigh-quotient eigenvalues
  ``w = diag(UᵀTU)`` — eigenvalues converge quadratically, so the f32
  direction error (~1e-7) yields ~1e-14 eigenvalue error. Eigenvector
  *directions* keep the f32-level error of the stock f64 eigh (which is
  internally f32) — no regression, strictly better eigenvalues, 7-17x
  faster.
- ``cholesky_small``: f32 Cholesky cast back — downstream formulas use
  the factor *consistently*, so an approximate-but-consistent L is a
  ~1e-7 relative perturbation of the matrix, same as the existing floor.
- ``solve_tri_refined``: f32 triangular solve + one exact-f64 residual
  correction step (two ~free f32 solves + one exact matmul).

On CPU (and for f32 inputs) everything falls through to the stock
routines.

STATUS: NOT wired into the solver — a measured dead end for the current
workloads (docs/tpu_performance.md §4): each refined factorization needs
~15 small f64 matmuls whose ~25-40 µs fixed per-op latency exceeds the
stock f64 eigh it replaces at congruence sizes (small_sdp regressed
24→48 ms/solve on-chip), and the f32-consistent Cholesky perturbed the
NT scaling enough to tip marginal R+Q+S instances into the escalation
ladder. Kept, with unit tests, as a building block: it wins when the
matrices are large enough for latency to amortize (d ≳ 100) or when many
factorizations batch into one op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

__all__ = ["eigh_refined", "eigvalsh_refined", "cholesky_small",
           "solve_tri_refined", "cholesky_unrolled", "solve_tri_unrolled"]

_HI = jax.lax.Precision.HIGHEST

# XLA's TPU eigh pads small matrices toward the 128-lane tile and runs
# serial sweeps — a ~0.9 ms floor per batched call at the S-cone shapes
# regardless of batch FLOPs. A tournament-Jacobi replacement (pure
# batched matmuls + masks) was built and measured in round 4: it TIES
# stock eigh at the target shape (0.895 vs 0.869 ms, B=64 d=10 f32 on
# v5e; benchmarks/batched_iter_trace_tpu.json) because its ~200
# sequential tiny ops pay the same per-op dispatch floor — so it was
# removed (r5). The effective fix is architectural: share and stack the
# per-iteration eigh calls (cones/algebra.sdp_eighs, maxstep_multi).


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _fast(T) -> bool:
    return T.dtype == jnp.float64 and _on_tpu()


def eigh_refined(T, sweeps: int = 3):
    """Batched symmetric eigendecomposition (eigenvalues near-ascending).

    Each sweep: Löwdin re-orthonormalization, then the first-order
    perturbation rotation ``U ← U(I + V)`` with ``V_ij = E_ij/(w_j − w_i)``
    where ``E`` is the off-diagonal of the exactly-computed ``UᵀTU`` —
    this is what recovers SMALL eigenvalues of wide-spectrum matrices
    (the late-IPM regime spans ~12 decades), which a Rayleigh quotient
    alone cannot: the f32 eigenvectors carry ~eps32·‖T‖/gap directional
    contamination. Near-degenerate pairs (|gap| ≲ |E_ij|) keep V = 0 —
    mixing within a cluster is benign for every consumer here. Off-diag
    residual contracts quadratically; measured (CPU-forced path): spectra
    up to 6 decades reach ~1e-11 relative in 2 sweeps, 8 decades ~7e-7 in
    3. Beyond ~10 decades neither this nor the STOCK TPU f64 eigh
    resolves the small eigenvalues (stock was measured at rel err ~1e2 on
    a 12-decade spectrum) — the IPM's escalation ladder owns that regime.
    """
    if not _fast(T):
        return jnp.linalg.eigh(T)
    _, U32 = jnp.linalg.eigh(T.astype(jnp.float32))
    U = U32.astype(T.dtype)
    eye = jnp.eye(T.shape[-1], dtype=T.dtype)
    w = None
    for _ in range(sweeps):
        Ut = jnp.swapaxes(U, -1, -2)
        S = _mm(Ut, U)
        U = _mm(U, 1.5 * eye - 0.5 * S)  # first-order Löwdin
        D = _mm(_mm(jnp.swapaxes(U, -1, -2), T), U)
        D = 0.5 * (D + jnp.swapaxes(D, -1, -2))
        w = jnp.diagonal(D, axis1=-2, axis2=-1)
        E = D - w[..., None, :] * eye
        gap = w[..., None, :] - w[..., :, None]  # gap[i, j] = w_j - w_i
        ok = jnp.abs(gap) > 4.0 * jnp.abs(E)
        V = jnp.where(ok, E / jnp.where(ok, gap, 1.0), 0.0)
        U = U + _mm(U, V)
    # final exact eigenvalues on the refined basis
    D = _mm(_mm(jnp.swapaxes(U, -1, -2), T), U)
    w = jnp.diagonal(D, axis1=-2, axis2=-1)
    return w, U


def eigvalsh_refined(T):
    return eigh_refined(T)[0]


def cholesky_small(T):
    """Batched Cholesky; f32-computed (consistent factor) on TPU f64."""
    if not _fast(T):
        return jnp.linalg.cholesky(T)
    return jnp.linalg.cholesky(T.astype(jnp.float32)).astype(T.dtype)


def cholesky_unrolled(A, max_unroll: int = 48):
    """Batched EXACT-f64 Cholesky of small (..., d, d) SPD matrices via a
    statically unrolled right-looking column sweep.

    Why this exists: XLA's monolithic emulated-f64 ``cholesky`` on v5e
    serializes its double-double recurrence (~65 µs/column) and, vmapped
    over a batch, dominates the batched SDP rescue tier. Here every step
    is one batched elementwise op over the whole batch — d sequential
    steps of ~free work — and the result is bit-level f64 (unlike
    :func:`cholesky_small`'s f32-consistent factor, whose NT perturbation
    was measured to tip marginal instances into the escalation ladder).
    Falls through to the stock op off-TPU, for f32 inputs, or for d
    beyond ``max_unroll`` (compile-size guard).
    """
    d = A.shape[-1]
    if not _fast(A) or d > max_unroll:
        return jnp.linalg.cholesky(A)
    idx = jnp.arange(d)
    L = jnp.zeros_like(A)
    M = A
    for j in range(d):
        col = M[..., :, j]  # (..., d) static slice
        piv = jnp.sqrt(col[..., j])
        l = jnp.where(idx >= j, col / piv[..., None], 0.0)
        L = L.at[..., :, j].set(l)
        M = M - l[..., :, None] * l[..., None, :]
    return L


def solve_tri_unrolled(L, B, *, lower: bool, max_unroll: int = 48):
    """Batched EXACT-f64 triangular solve ``L X = B`` by statically
    unrolled substitution (same rationale as :func:`cholesky_unrolled`;
    one batched row update per step, no serialized emulated-f64 solve).
    ``B`` is (..., d, r)."""
    d = L.shape[-1]
    if not _fast(B) or d > max_unroll:
        return solve_triangular(L, B, lower=lower)
    order = range(d) if lower else range(d - 1, -1, -1)
    X = jnp.zeros_like(B)
    R = B
    for j in order:
        xj = R[..., j, :] / L[..., j, j, None]
        X = X.at[..., j, :].set(xj)
        R = R - L[..., :, j, None] * xj[..., None, :]
    return X


def solve_tri_refined(L, B, *, lower: bool):
    """Batched triangular solve with one exact-f64 refinement step."""
    if not _fast(B):
        return solve_triangular(L, B, lower=lower)
    f32 = jnp.float32
    L32 = L.astype(f32)
    X = solve_triangular(L32, B.astype(f32), lower=lower).astype(B.dtype)
    R = B - _mm(L.astype(B.dtype), X)
    X = X + solve_triangular(L32, R.astype(f32), lower=lower).astype(B.dtype)
    return X

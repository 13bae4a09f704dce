"""Blocked emulated-f64 Cholesky and triangular inverse for TPU.

XLA's monolithic f64 ``cholesky`` on v5e runs its emulated-double scalar
recurrences serially: measured 69 ms at n=1024 (tools/devbench.py), while
the emulated-f64 GEMM it could be built from runs at 2.3 TF/s (0.93 ms for
the same n). These kernels restructure the O(n³) work so ~all FLOPs land
in f64 GEMMs (which XLA lowers to multi-pass MXU passes), leaving only
r×r base cases on the slow path:

``blocked_cholesky(M, r)``   right-looking panel Cholesky:
    for each r-wide panel: base-case chol of the r×r diagonal block,
    L21 = M21 · L11⁻ᵀ via a GEMM against the (Newton-refined) explicit
    panel inverse, trailing update M22 −= L21·L21ᵀ as one GEMM.
``blocked_tri_inv(L, r)``    W = L⁻¹ by block forward substitution:
    W_jj = L_jj⁻¹ (Newton-refined), W_ij = −W_ii·(L_i,: · W_:,j) — all
    GEMMs below the diagonal blocks.

The r×r diagonal inverses avoid the (equally pathological) f64
``solve_triangular`` by Newton–Schulz from the f32 triangular inverse:
X ← X(2I − L X) doubles the correct digits per step; with
e₀ = eps_f32·κ(L_jj) ≲ 1e-2 for the equilibrated KKT systems this path
serves (κ(M) ≲ 1e10 ⇒ κ(L) ≲ 1e5), 3 steps reach f64 round-off. A final
residual-norm guard falls back to XLA's exact-but-slow path only if the
Newton iteration failed to converge (e.g. a pathological unequilibrated
block), so correctness never depends on the conditioning assumption.

This is the production factorization for every full-precision tier: the
last-mile ``mode="slow"`` branch, the f64 escalation ladder, and
``factor_dtype=float64`` runs (kkt/schur.py routes through
ops/cholesky.cholesky). Semantics anchor: the dense Cholesky the reference
gets from LAPACK ``potrf`` (ConicIP.jl:202-203; kktsolvers.jl:275-310).

CPU note: XLA:CPU has native f64 — these kernels are still correct there
(tests run them on CPU) but ``ops/cholesky.cholesky`` only dispatches to
them on TPU-like backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from .control import cond_once

__all__ = ["blocked_cholesky", "blocked_tri_inv"]

_HI = jax.lax.Precision.HIGHEST


def _base_chol(Ajj: jnp.ndarray, steps: int = 3) -> jnp.ndarray:
    """f64 Cholesky of an r×r SPD block WITHOUT XLA's serialized f64 op.

    XLA's monolithic emulated-f64 cholesky costs ~65 µs PER COLUMN on v5e
    (n=1024 → 67 ms; an r=128 base case still pays 128 columns), so a
    blocked scheme that calls it per panel saves almost nothing — measured
    58 ms vs 67 ms. Instead: factor the block in f32 (0.02 ms) and refine
    the FACTOR in f64 GEMMs (µs each at 2.3 TF/s):

        E  = A − L₀L₀ᵀ            (f64 residual)
        S  = W₀ E W₀ᵀ             (W₀ = L₀⁻¹, Newton-refined from f32)
        L₁ = L₀ + L₀·(tril(S,−1) + diag(S)/2)

    which squares the error per step: e₀ = eps_f32·κ(A) → e₀^(2^k). Three
    steps reach f64 round-off for κ(A) ≲ 1e5 — the equilibrated diagonal
    blocks this serves (unit diagonal; global stiff directions of the KKT
    matrix span blocks and land in the GEMM trailing updates, not inside
    one r×r block). A residual guard falls back to the exact serialized
    op for the rare block that violates the conditioning assumption, so
    correctness never depends on it.
    """
    r = Ajj.shape[0]
    L = jnp.linalg.cholesky(Ajj.astype(jnp.float32)).astype(Ajj.dtype)
    W = _newton_tri_inv_seeded(L)
    scale = jnp.max(jnp.abs(Ajj)) + jnp.finfo(Ajj.dtype).tiny
    for _ in range(steps):
        E = Ajj - jnp.matmul(L, L.T, precision=_HI)
        S = jnp.matmul(jnp.matmul(W, E, precision=_HI), W.T, precision=_HI)
        Phi = jnp.tril(S, -1) + jnp.diag(0.5 * jnp.diagonal(S))
        L = L + jnp.matmul(L, Phi, precision=_HI)
        # W tracks L⁻¹ first-order: W ← W − Φ·W (enough — W only
        # preconditions the next correction)
        W = W - jnp.matmul(Phi, W, precision=_HI)
    resid = jnp.max(jnp.abs(Ajj - jnp.matmul(L, L.T, precision=_HI)))
    ok = jnp.isfinite(resid) & (
        resid < 1e3 * jnp.finfo(Ajj.dtype).eps * r * scale
    )
    # cond_once, not lax.cond: under vmap (the batched f64 rescue tier)
    # a cond becomes a select and the serialized monolithic f64 cholesky
    # would run for EVERY block of EVERY instance — the exact cost this
    # kernel exists to avoid. cond_once pays it only when some instance's
    # block actually failed to refine.
    return cond_once(~ok, lambda: jnp.linalg.cholesky(Ajj), L)


def _newton_tri_inv_seeded(Ljj: jnp.ndarray, steps: int = 3) -> jnp.ndarray:
    """Newton–Schulz triangular inverse WITHOUT the exactness guard (used
    inside _base_chol where the result only preconditions a guarded
    refinement)."""
    r = Ljj.shape[0]
    I = jnp.eye(r, dtype=Ljj.dtype)
    X = solve_triangular(
        Ljj.astype(jnp.float32), jnp.eye(r, dtype=jnp.float32), lower=True
    ).astype(Ljj.dtype)
    for _ in range(steps):
        X = X + jnp.matmul(
            X, I - jnp.matmul(Ljj, X, precision=_HI), precision=_HI
        )
        X = jnp.tril(X)
    return X


def _newton_tri_inv(Ljj: jnp.ndarray, steps: int = 3) -> jnp.ndarray:
    """Explicit inverse of a lower-triangular f64 block via Newton–Schulz
    seeded from the f32 inverse (module docstring). Falls back to the
    exact (slow) f64 triangular solve when the seed was too far off."""
    r = Ljj.shape[0]
    I = jnp.eye(r, dtype=Ljj.dtype)
    X = solve_triangular(
        Ljj.astype(jnp.float32), jnp.eye(r, dtype=jnp.float32), lower=True
    ).astype(Ljj.dtype)
    for _ in range(steps):
        X = X + jnp.matmul(
            X, I - jnp.matmul(Ljj, X, precision=_HI), precision=_HI
        )
        # keep the exact triangular structure (rounding can leak tiny
        # upper-triangle noise through the GEMMs)
        X = jnp.tril(X)
    resid = jnp.max(jnp.abs(jnp.matmul(Ljj, X, precision=_HI) - I))
    # Acceptance tracks the ATTAINABLE accuracy: the converged Newton
    # residual is ~eps·r·‖L‖∞‖X‖∞ (the GEMM rounding bound — ‖L‖‖X‖ ≈
    # κ(L)), and the exact solve_triangular fallback reaches the same
    # eps·κ forward error, so a κ-blind absolute threshold only causes
    # spurious fallbacks for well-refined ill-conditioned blocks
    # (run-to-run perf jitter). Failure to converge shows up orders of
    # magnitude above this bound (Newton squares the error per step).
    eps = jnp.finfo(Ljj.dtype).eps
    nL = jnp.max(jnp.sum(jnp.abs(Ljj), axis=1))
    nX = jnp.max(jnp.sum(jnp.abs(X), axis=1))
    tol = 30.0 * eps * r * jnp.maximum(1.0, nL * nX)
    ok = jnp.isfinite(resid) & (resid < tol)
    # cond_once: see _base_chol — a vmapped lax.cond would run the
    # serialized exact solve for every instance unconditionally.
    return cond_once(
        ~ok, lambda: solve_triangular(Ljj, I, lower=True), X
    )


@functools.partial(jax.jit, static_argnames=("r",))
def blocked_cholesky(M: jnp.ndarray, r: int = 128) -> jnp.ndarray:
    """Lower Cholesky factor of SPD ``M`` with GEMM-dominant blocking.

    Static-shape panel loop (Python unroll — n/r iterations, each with
    static slices; n is a trace-time constant throughout the solver).
    Matches ``jnp.linalg.cholesky`` to ~eps·κ rounding. NaN-safe: a
    non-SPD input yields NaNs in the corresponding base-case factor
    exactly like the XLA op, which the callers' escalating-ridge retries
    (kkt/schur.py) rely on.
    """
    n = M.shape[0]
    if n <= r:
        return _base_chol(M)
    dt = M.dtype
    nb = -(-n // r)
    n_pad = nb * r
    if n_pad != n:
        # identity-pad: chol([[M,0],[0,I]]) = [[L,0],[0,I]]
        Mp = jnp.zeros((n_pad, n_pad), dt)
        Mp = Mp.at[:n, :n].set(M)
        Mp = Mp.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        M = Mp
    L = jnp.zeros((n_pad, n_pad), dt)
    A = M
    for j in range(nb):
        lo = j * r
        Ajj = A[lo:lo + r, lo:lo + r]
        Ljj = _base_chol(Ajj)
        L = L.at[lo:lo + r, lo:lo + r].set(Ljj)
        if j + 1 < nb:
            Winv = _newton_tri_inv(Ljj)  # L11⁻¹, r×r
            A21 = A[lo + r:, lo:lo + r]
            L21 = jnp.matmul(A21, Winv.T, precision=_HI)
            L = L.at[lo + r:, lo:lo + r].set(L21)
            # trailing update — the GEMM that carries ~all the FLOPs
            A22 = A[lo + r:, lo + r:] - jnp.matmul(
                L21, L21.T, precision=_HI
            )
            A = A.at[lo + r:, lo + r:].set(A22)
    return L[:n, :n]


@functools.partial(jax.jit, static_argnames=("r",))
def blocked_tri_inv(L: jnp.ndarray, r: int = 128) -> jnp.ndarray:
    """Explicit inverse of lower-triangular ``L`` (W = L⁻¹), GEMM-dominant.

    Block forward substitution on block columns: with W_jj = L_jj⁻¹,
    W[i,j] = −W_ii · Σ_{j≤k<i} L[i,k]·W[k,j]. Computed per block-ROW so
    each row's update is ONE GEMM over the already-finished rows.
    """
    n = L.shape[0]
    if n <= r:
        return _newton_tri_inv(L)
    dt = L.dtype
    nb = -(-n // r)
    n_pad = nb * r
    if n_pad != n:
        Lp = jnp.zeros((n_pad, n_pad), dt)
        Lp = Lp.at[:n, :n].set(L)
        Lp = Lp.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        L = Lp
    W = jnp.zeros((n_pad, n_pad), dt)
    for i in range(nb):
        lo = i * r
        Wii = _newton_tri_inv(L[lo:lo + r, lo:lo + r])
        if i:
            # row update: W[i, :lo] = −W_ii · L[i-row, :lo] @ W[:lo, :lo]
            S = jnp.matmul(L[lo:lo + r, :lo], W[:lo, :lo], precision=_HI)
            W = W.at[lo:lo + r, :lo].set(
                -jnp.matmul(Wii, S, precision=_HI)
            )
        W = W.at[lo:lo + r, lo:lo + r].set(Wii)
    return W[:n, :n]

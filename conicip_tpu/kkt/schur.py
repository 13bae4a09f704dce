"""Dense Schur-complement KKT solver — the TPU-native default.

The reference's fastest backend eliminates the cone block and sparse-LU
factors the saddle system ``[[Q + Aᵀ(FᵀF)⁻¹A, Gᵀ], [G, 0]]``
(kktsolver_2x2, kktsolvers.jl:281-310). TPUs want dense tiles, so here the
Schur matrix is assembled as ``M = Q + Atilᵀ Atil`` with ``Atil = F⁻ᵀA``
applied *structurally* (row scalings + batched rank-1 / congruence updates —
one big MXU matmul, never materializing FᵀF, fixing the reference's worst
allocation pathology, report.md:148-151), and the saddle system is solved by
a second Schur complement on G:

    M = L Lᵀ  (blocked Cholesky — Pallas kernel on TPU)
    S = G M⁻¹ Gᵀ = (L⁻¹Gᵀ)ᵀ(L⁻¹Gᵀ),   S = Ls Lsᵀ

``factor_dtype=float32`` runs both factorizations on the MXU in f32; the
IPM's iterative-refinement loop restores full accuracy.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..cones import scaling as sc
from ..cones.spec import ConeSpec
from ..ops.cholesky import cho_solve, cholesky
from .pivot import pivot

__all__ = ["kktsolver_2x2", "kktsolver_schur"]


def kktsolver_2x2(Q, A, G, spec: ConeSpec, *, factor_dtype=None):
    """Dense-Cholesky 2x2 solver for ``[[M, Gᵀ], [G, 0]]`` with
    ``M = Q + Aᵀ(FᵀF)⁻¹A``.

    With equalities present, ``M`` alone can be singular (e.g. Q = 0 and
    fewer cone rows than variables — the reference's sparse saddle LU
    tolerates this, a plain Schur-on-M does not). We factor the *augmented*
    matrix ``M̃ = M + γ GᵀG`` instead, which is SPD exactly when
    ``[Q; A; G]`` has full column rank — the condition the preprocessor
    guarantees (preprocessor.jl:31-38). The saddle solution is recovered
    exactly (no regularization error):

        M̃ a + Gᵀ b = r₁ + γ Gᵀ r₂,   G a = r₂
        →  a = t − E b̂,  S̃ b̂ = G t − r₂
        with t = M̃⁻¹(r₁ + γ Gᵀ r₂),  E = M̃⁻¹Gᵀ,  S̃ = G E  (SPD).

    γ balances the two terms' scales for conditioning.
    """
    n = Q.shape[0]
    p = G.shape[0]

    def solve2x2gen(F, FinvT):
        Atil = sc.apply_mat(spec, FinvT, A)  # F⁻ᵀ A, structure-exploiting
        M = Q + Atil.T @ Atil
        if p:
            gamma = (jnp.trace(M) / n) / (
                jnp.sum(G * G) / p + jnp.finfo(M.dtype).tiny
            )
            gamma = jnp.where(jnp.isfinite(gamma) & (gamma > 0), gamma, 1.0)
            Maug = M + gamma * (G.T @ G)
        else:
            gamma = None
            Maug = M
        L = cholesky(Maug, factor_dtype)
        if p:
            E = _tri_solve(L, G.T)  # L⁻¹ Gᵀ  (n, p) in factor dtype
            S = E.T @ E  # G M̃⁻¹ Gᵀ  (SPD)
            Ls = jnp.linalg.cholesky(S)

        def solve2x2(by, bw):
            if p:
                t = cho_solve(L, by + gamma * (G.T @ bw))
                rhs = (G @ t - bw).astype(Ls.dtype)
                b2 = solve_triangular(Ls, rhs, lower=True)
                b2 = solve_triangular(Ls, b2, lower=True, trans="T")
                b2 = b2.astype(t.dtype)
                a = t - cho_solve(L, G.T @ b2)
                return a, b2
            return cho_solve(L, by), by[:0]

        return solve2x2

    return solve2x2gen


def _tri_solve(L, B):
    return solve_triangular(L, B.astype(L.dtype), lower=True)


def kktsolver_schur(Q, A, G, spec: ConeSpec, *, factor_dtype=None):
    """Default KKT solver: :func:`pivot` around :func:`kktsolver_2x2`."""
    inner = functools.partial(kktsolver_2x2, factor_dtype=factor_dtype)
    return pivot(inner)(Q, A, G, spec)

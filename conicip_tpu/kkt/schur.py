"""Dense Schur-complement KKT solver — the TPU-native default.

The reference's fastest backend eliminates the cone block and sparse-LU
factors the saddle system ``[[Q + Aᵀ(FᵀF)⁻¹A, Gᵀ], [G, 0]]``
(kktsolver_2x2, kktsolvers.jl:281-310). TPUs want dense tiles, so here the
Schur matrix is assembled as ``M = Q + Atilᵀ Atil`` with ``Atil = F⁻ᵀA``
applied *structurally* (row scalings + batched rank-1 / congruence updates —
one big MXU matmul, never materializing FᵀF, fixing the reference's worst
allocation pathology, report.md:148-151), and the saddle system is solved by
a second Schur complement on G:

    M = L Lᵀ  (blocked Cholesky)
    S = G M⁻¹ Gᵀ = (L⁻¹Gᵀ)ᵀ(L⁻¹Gᵀ),   S = Ls Lsᵀ

Mixed-precision design (``factor_dtype=float32``): the whole inner solve
path — casts, assembly, factorization, AND every per-RHS application — runs
in f32; the IPM's iterative-refinement loop against higher-precision
residuals restores accuracy. Per-RHS triangular back-solves are replaced by
GEMVs against an explicitly formed ``L⁻¹`` computed once per iteration:
on TPU a vector triangular solve is a latency-bound ~0.12 ms sequential op
while a (n,n) GEMV is ~7 us of MXU/VPU work, and the predictor + corrector
+ refinement steps perform 3-6 back-solves per factorization, so trading
one matrix triangular solve (L⁻¹, blocked and matmul-rich in XLA) for
GEMV-only solves is a large win. The explicit inverse's extra rounding is
bounded by κ(L)·eps_f32 per apply — exactly what refinement corrects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..cones import scaling as sc
from ..cones.spec import ConeSpec
from ..ops.cholesky import cholesky
from .pivot import pivot

__all__ = ["kktsolver_2x2", "kktsolver_schur"]

_HI = jax.lax.Precision.HIGHEST


def kktsolver_2x2(Q, A, G, spec: ConeSpec, *, factor_dtype=None,
                  assemble_dtype=None):
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
    wd = Q.dtype  # working dtype of the IPM vectors
    fd = wd if factor_dtype is None else factor_dtype
    # Assembly precision can exceed factorization precision: SOC scalings
    # span ~16 decades near convergence and the Gram assembly cancels
    # catastrophically in f32 — assembling in f64 (emulated, ~1-3 ms) and
    # factoring the equilibrated result in f32 was measured to rescue a
    # class of stalls at ~50x less cost than a full-f64 solve.
    ad = fd if assemble_dtype is None else assemble_dtype
    Qf = Q.astype(ad)
    Af = A.astype(ad)
    Gf = G.astype(fd)
    GfT = Gf.T
    If = jnp.eye(n, dtype=fd)

    # Late IPM iterations drive κ(M) toward 1/μ ≈ 1e10+, beyond what a raw
    # f32 Cholesky survives. Symmetric Jacobi equilibration (unit diagonal)
    # plus a tiny relative ridge keeps the factorization finite; the exact
    # perturbation is corrected by the IPM's refinement loop.
    ridge = 30.0 * jnp.finfo(fd).eps

    def _equilibrated_inv(Msym, k):
        # equilibrate in assembly precision, then cast to factor precision
        dscale = jax.lax.rsqrt(
            jnp.maximum(jnp.diagonal(Msym), jnp.finfo(Msym.dtype).tiny)
        )
        Ms = (Msym * dscale[:, None] * dscale[None, :]).astype(fd)
        dscale = dscale.astype(fd)
        Ik = jnp.eye(k, dtype=fd)
        L = cholesky(Ms + ridge * Ik)
        # Escalating-ridge retries: SOC rank-1 scaling terms span ~16
        # decades near convergence and their f32 assembly rounding can
        # leave Ms indefinite beyond the base ridge — a NaN factor would
        # otherwise poison the step. Refinement absorbs the extra ridge.
        for boost in (1e3, 1e6):
            L = jax.lax.cond(
                jnp.all(jnp.isfinite(L)),
                lambda L=L: L,
                lambda boost=boost: cholesky(Ms + (boost * ridge) * Ik),
            )
        # One-time explicit triangular inverse: every subsequent back-solve
        # becomes two GEMVs (see module docstring for the cost model).
        Linv = solve_triangular(L, jnp.eye(k, dtype=fd), lower=True)

        def inv_apply(x):
            # M⁻¹ x = D L⁻ᵀ L⁻¹ D x with D the equilibration scale
            t = jnp.matmul(Linv, dscale * x, precision=_HI)
            return dscale * jnp.matmul(Linv.T, t, precision=_HI)

        return inv_apply, Linv, dscale

    def solve2x2gen(F, FinvT):
        Ff = sc.cast(FinvT, ad)
        Atil = sc.apply_mat(spec, Ff, Af)  # F⁻ᵀ A, structure-exploiting
        M = Qf + jnp.matmul(Atil.T, Atil, precision=_HI)
        if p:
            gamma = (jnp.trace(M) / n) / (
                (jnp.sum(Gf * Gf) / p).astype(ad) + jnp.finfo(ad).tiny
            )
            gamma = jnp.where(jnp.isfinite(gamma) & (gamma > 0), gamma, 1.0)
            Maug = M + gamma * jnp.matmul(GfT, Gf, precision=_HI).astype(ad)
        else:
            gamma = None
            Maug = M
        minv, Linv, dscale = _equilibrated_inv(Maug, n)

        if p:
            # S = G M̃⁻¹ Gᵀ = Ê Êᵀ with Ê = G D L⁻ᵀ in equilibrated space
            E = jnp.matmul(Linv, dscale[:, None] * GfT, precision=_HI)
            S = jnp.matmul(E.T, E, precision=_HI)  # SPD
            sinv, _, _ = _equilibrated_inv(S, p)

        gamma_f = gamma.astype(fd) if p else None

        def solve2x2(by, bw):
            by = by.astype(fd)
            bw = bw.astype(fd)
            if p:
                t = minv(by + gamma_f * jnp.matmul(GfT, bw, precision=_HI))
                b2 = sinv(jnp.matmul(Gf, t, precision=_HI) - bw)
                a = t - minv(jnp.matmul(GfT, b2, precision=_HI))
                return a.astype(wd), b2.astype(wd)
            return minv(by).astype(wd), by[:0].astype(wd)

        return solve2x2

    return solve2x2gen


def kktsolver_schur(Q, A, G, spec: ConeSpec, *, factor_dtype=None,
                    assemble_dtype=None):
    """Default KKT solver: :func:`pivot` around :func:`kktsolver_2x2`."""
    inner = functools.partial(kktsolver_2x2, factor_dtype=factor_dtype,
                              assemble_dtype=assemble_dtype)
    return pivot(inner, factor_dtype=factor_dtype)(Q, A, G, spec)

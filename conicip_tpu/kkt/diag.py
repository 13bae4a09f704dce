"""Structure-exploiting KKT solver for separable (bound-style) constraints.

The reference's fastest backend on its own headline problem is the sparse
LU (``kktsolver_2x2`` + UMFPACK, kktsolvers.jl:281-310), whose speed on box
QPs comes from the Schur matrix ``M = Q + Aᵀ(FᵀF)⁻¹A`` being effectively
diagonal. Sparse LU has no TPU analogue — but the *structure* does: when

- every cone is ``R`` (so ``(FᵀF)⁻¹`` is diagonal),
- every row of A has at most ONE nonzero (bound constraints ±s·yᵏ ≥ b),
- Q is diagonal,

then ``M`` is diagonal and the whole per-iteration factorization collapses
to one segment-sum plus elementwise math. The TPU-native segment-sum is a
matmul against a 0/1 incidence matrix built once per solve (the MXU does
scatter-adds better than scatter does): ``diag(M) = diag(Q) + P @ (d ⊙ a²)``
with ``P[k, i] = 1`` iff row i of A touches column k.

Equalities are handled by the same exact augmented-Schur recovery as the
dense path, with ``S = G diag(M̃)⁻¹ Gᵀ`` a (p, p) Cholesky.

Applicability is NOT verified inside the (traced) solver — call
:func:`separable` on the concrete problem data first, as ``conic_ip`` users
choose backends explicitly (mirroring the reference, where picking
``kktsolver_sparse`` for the wrong problem is likewise on the caller).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..cones.spec import ConeSpec
from ..ops.cholesky import cholesky
from .pivot import pivot

__all__ = ["kktsolver_diag", "separable", "separable_batch"]

_HI = jax.lax.Precision.HIGHEST


def separable(Q, A, G, spec: ConeSpec) -> bool:
    """Host-side applicability check (one-time, numpy, concrete data).

    Call it on the caller's HOST arrays: running it on device arrays pays
    a full device→host transfer of Q and A (~100 ms/MB on the tunnel).
    """
    if spec.soc_groups or spec.sdp_groups:
        return False
    Qh = np.asarray(Q.toarray() if hasattr(Q, "toarray") else Q)
    if Qh.ndim != 2 or np.count_nonzero(Qh - np.diag(np.diagonal(Qh))):
        return False
    Ah = np.asarray(A.toarray() if hasattr(A, "toarray") else A)
    return bool(np.all(np.count_nonzero(Ah, axis=1) <= 1))


def separable_batch(Q, A, spec: ConeSpec) -> bool:
    """Batched variant of :func:`separable`: the pattern must hold for
    EVERY instance (leading batch axis on Q and A). Same host-array
    caveat."""
    if spec.soc_groups or spec.sdp_groups:
        return False
    Qh = np.asarray(Q)
    n = Qh.shape[-1]
    offdiag = ~np.eye(n, dtype=bool)
    if Qh.ndim != 3 or np.count_nonzero(Qh[:, offdiag]):
        return False
    Ah = np.asarray(A)
    return bool(np.all(np.count_nonzero(Ah, axis=2) <= 1))


def kktsolver_2x2_diag(Q, A, G, spec: ConeSpec, *, factor_dtype=None):
    """2x2 solver with a diagonal Schur matrix (module docstring)."""
    n = Q.shape[0]
    p = G.shape[0]
    wd = Q.dtype
    fd = wd if factor_dtype is None else factor_dtype

    # Traceable pattern extraction (runs once at setup, hoisted out of the
    # iterate loop): column index + coefficient of each row's single nonzero.
    absA = jnp.abs(A)
    cols = jnp.argmax(absA, axis=1)
    coef = jnp.take_along_axis(A, cols[:, None], axis=1)[:, 0].astype(fd)
    P = (
        jax.nn.one_hot(cols, n, dtype=fd).T
        * (coef != 0).astype(fd)[None, :]
    )  # (n, m) incidence
    asq = coef * coef
    qdiag = jnp.diagonal(Q).astype(fd)
    Gf = G.astype(fd)
    GfT = Gf.T

    def solve2x2gen(F, FinvT):
        # (FᵀF)⁻¹ diagonal for R cones: F = diag(r_d) ⇒ rinv = r_d⁻²
        rinv = (1.0 / (F.r_d * F.r_d)).astype(fd)
        mdiag = qdiag + jnp.matmul(P, rinv * asq, precision=_HI)
        if p:
            gamma = (jnp.sum(mdiag) / n) / (
                jnp.sum(Gf * Gf) / p + jnp.finfo(fd).tiny
            )
            gamma = jnp.where(jnp.isfinite(gamma) & (gamma > 0), gamma, 1.0)
            mdiag_aug = mdiag + gamma * jnp.sum(Gf * Gf, axis=0)
            minv_d = 1.0 / mdiag_aug
            E = Gf * minv_d[None, :]  # G M̃⁻¹  (p, n)
            S = jnp.matmul(E, GfT, precision=_HI)
            Ls = cholesky(
                S
                + (30 * jnp.finfo(fd).eps * jnp.trace(S) / p)
                * jnp.eye(p, dtype=fd)
            )
            Lsinv = jax.scipy.linalg.solve_triangular(
                Ls, jnp.eye(p, dtype=fd), lower=True
            )
        else:
            minv_d = 1.0 / mdiag

        def solve2x2(by, bw):
            by = by.astype(fd)
            bw = bw.astype(fd)
            if p:
                t = minv_d * (by + gamma * jnp.matmul(GfT, bw, precision=_HI))
                rhs = jnp.matmul(Gf, t, precision=_HI) - bw
                b2 = jnp.matmul(
                    Lsinv.T,
                    jnp.matmul(Lsinv, rhs, precision=_HI),
                    precision=_HI,
                )
                a = t - minv_d * jnp.matmul(GfT, b2, precision=_HI)
                return a.astype(wd), b2.astype(wd)
            return (minv_d * by).astype(wd), by[:0].astype(wd)

        return solve2x2

    return solve2x2gen


def kktsolver_diag(Q, A, G, spec: ConeSpec, *, factor_dtype=None):
    """3x3 KKT solver exploiting separable structure. Verify applicability
    with :func:`separable` on concrete data before selecting it."""
    if spec.soc_groups or spec.sdp_groups:
        raise ValueError("kktsolver_diag supports R cones only")
    inner = functools.partial(kktsolver_2x2_diag, factor_dtype=factor_dtype)
    return pivot(inner, factor_dtype=factor_dtype)(Q, A, G, spec)

"""Mehrotra predictor-corrector interior-point core.

TPU-native re-implementation of the reference's ``conicIP`` iterate loop
(ConicIP.jl:364-939): the whole solve is one ``lax.while_loop`` under jit —
static shapes, no data-dependent Python control flow, every per-iteration
quantity a fused XLA computation. Termination/status logic is mask-based
(a scalar status code in the carry), which makes the solver ``jax.vmap``-safe
for batched problem instances: converged instances freeze their iterates
while the rest keep stepping.

Semantics preserved exactly (same initial point, residual normalizations,
CVXOPT+ECOS infeasibility certificates, best-iterate tracking, iterative
refinement, fraction-to-boundary step) so the reference's test suite carries
over; see inline citations.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..cones import algebra as ca
from ..cones import scaling as sc
from ..cones.spec import ConeSpec
from .state import SolState, Status, Vec4

__all__ = ["IPMOptions", "ipm_solve"]


@dataclass(frozen=True)
class IPMOptions:
    """Solver options (kwarg-compatible with the reference, ConicIP.jl:498-510)."""

    optTol: float = 1e-6
    DTB: float = 0.01  # fraction-to-boundary
    verbose: bool = False
    maxRefinementSteps: int = 3
    maxIters: int = 100
    # accepted-but-unused in the reference too (ConicIP.jl:505 — grep shows
    # it is never read); kept for API parity
    cache_nestodd: bool = False
    infeasTol: Optional[float] = None
    refinementThreshold: Optional[float] = None

    @property
    def infeas_tol(self) -> float:
        return self.optTol if self.infeasTol is None else self.infeasTol

    @property
    def refinement_threshold(self) -> float:
        return (
            self.optTol / 1e7
            if self.refinementThreshold is None
            else self.refinementThreshold
        )


def _normsafe(x):
    return jnp.linalg.norm(x) if x.shape[0] else jnp.asarray(0.0, x.dtype)


def ipm_solve(
    Q: jnp.ndarray,
    c: jnp.ndarray,
    A: jnp.ndarray,
    b: jnp.ndarray,
    G: jnp.ndarray,
    d: jnp.ndarray,
    spec: ConeSpec,
    kktsolver: Callable,
    opts: IPMOptions,
) -> SolState:
    n = c.shape[0]
    m = A.shape[0]
    p = G.shape[0]
    dtype = c.dtype

    # Sanity checks — static shapes, so these are Python-time errors
    # (reference ConicIP.jl:537-541 raises error()).
    if Q.shape != (n, n):
        raise ValueError("Q is not square / inconsistent with objective")
    if b.shape != (m,):
        raise ValueError("Inconsistency in inequalities")
    if A.shape != (m, n):
        raise ValueError("Inconsistency in inequalities/objective")
    if d.shape != (p,):
        raise ValueError("Inconsistency in equalities")
    if G.shape != (p, n):
        raise ValueError("Inconsistency in equalities/objective")
    if spec.m != m:
        raise ValueError("cone dimensions do not sum to size(A, 1)")

    e = jnp.asarray(spec.identity, dtype)
    conedim = spec.conedim
    normc = jnp.linalg.norm(c)
    normb = _normsafe(b)
    normd = jnp.asarray(-jnp.inf, dtype) if p == 0 else jnp.linalg.norm(d)

    # LEVEL-1 plugin callback: one-time setup (runs at trace time, outside
    # the iterate loop — QR of Gᵀ etc. happen once, ConicIP.jl:667).
    solve3x3gen = kktsolver(Q, A, G, spec)

    def make_solve4(lam, F, FinvT, solve3x3):
        """4x4 → 3x3 reduction (solve4x4gen, ConicIP.jl:669-694)."""

        def solve4(r: Vec4) -> Vec4:
            t1 = sc.apply_adjoint(spec, F, ca.cone_div(spec, r.s, lam))
            dy, dw, dv = solve3x3(r.y, r.w, r.v + t1)
            ds = t1 - sc.apply_adjoint(spec, F, sc.apply(spec, F, dv))
            return Vec4(dy, dw, dv, ds)

        return solve4

    # ── Initial point (ConicIP.jl:700-713): one KKT solve at F = I, then
    #    shift v, s strictly inside the cone.
    Fi = sc.nt_identity(spec, dtype)
    solve3_init = solve3x3gen(Fi, Fi)
    z0 = make_solve4(e, Fi, Fi, solve3_init)(Vec4(c, d, b, jnp.zeros(m, dtype)))
    a_v = ca.maxstep_to_cone(spec, z0.v)
    a_s = ca.maxstep_to_cone(spec, z0.s)
    z0 = Vec4(z0.y, z0.w, z0.v - a_v * e, z0.s - a_s * e)

    nan = jnp.asarray(jnp.nan, dtype)
    inf = jnp.asarray(jnp.inf, dtype)

    sol0 = SolState(
        y=z0.y,
        w=z0.w,
        v=z0.v,
        status=jnp.asarray(Status.RUNNING, jnp.int32),
        Iter=jnp.asarray(0, jnp.int32),
        Mu=jnp.asarray(0.0, dtype),
        prFeas=inf,
        duFeas=inf,
        muFeas=inf,
        pobj=inf,
        dobj=-inf,
    )

    def fts(x1, a1, y1, x2, a2, y2):
        # (x1 - a1*y1)ᵀ(x2 - a2*y2) without forming the differences
        # (reference ``fts``, ConicIP.jl:162-163)
        return (
            jnp.dot(x1, x2)
            - a2 * jnp.dot(x1, y2)
            - a1 * jnp.dot(y1, x2)
            + a1 * a2 * jnp.dot(y1, y2)
        )

    def body(carry):
        z, sol, optBest, k, rnorm_prev, rstep_prev = carry

        F = sc.nt_scaling(spec, z.v, z.s)
        FinvT = sc.nt_inv_adjoint(spec, F)
        lam = sc.apply(spec, F, z.v)  # scaled point: = F⁻ᵀ z.s too

        # residuals of the nonlinear KKT system (ConicIP.jl:746-757)
        rleft_s = ca.cone_prod(spec, lam, lam)
        rleft = Vec4(
            Q @ z.y + G.T @ z.w - A.T @ z.v,
            G @ z.y,
            A @ z.y - z.s,
            rleft_s,
        )
        r0 = Vec4(rleft.y - c, rleft.w - d, rleft.v - b, rleft.s)

        mubar = jnp.dot(z.v, z.s)
        mu = mubar / conedim

        cty = jnp.dot(c, z.y)
        rDu = jnp.linalg.norm(r0.y) / (1.0 + normc)
        rPr = _normsafe(r0.v) / (1.0 + normb)
        rCp = _normsafe(r0.s) / (1.0 + jnp.abs(cty))
        rmax = jnp.maximum(rDu, jnp.maximum(rPr, rCp))

        # best-iterate tracking (ConicIP.jl:768-773)
        improved = rmax < optBest
        optBest = jnp.where(improved, rmax, optBest)

        def upd(new, old):
            return jnp.where(improved, new, old)

        pobj = 0.5 * jnp.dot(z.y, Q @ z.y) - cty
        dobj = pobj + jnp.dot(z.w, r0.w) + jnp.dot(z.v, r0.v) - jnp.dot(z.v, z.s)
        sol = SolState(
            y=upd(z.y, sol.y),
            w=upd(z.w, sol.w),
            v=upd(z.v, sol.v),
            status=sol.status,
            Iter=jnp.where(improved, k, sol.Iter),
            Mu=upd(mu, sol.Mu),
            prFeas=upd(rPr, sol.prFeas),
            duFeas=upd(rDu, sol.duFeas),
            muFeas=upd(rCp, sol.muFeas),
            pobj=pobj,  # always updated (reference quirk, ConicIP.jl:778-779)
            dobj=dobj,
        )

        # ── Convergence and certificates (ConicIP.jl:786-867)
        status = jnp.where(rmax < opts.optTol, Status.OPTIMAL, Status.RUNNING)

        p_infeas = nan
        d_infeas = nan
        if not (p == 0 and m == 0):
            # Primal infeasibility (Farkas certificate, CVXOPT+ECOS scalings)
            dw_bv = jnp.dot(d, z.w) - jnp.dot(b, z.v)
            p_unscaled = jnp.linalg.norm(G.T @ z.w - A.T @ z.v)
            p_cvx = jnp.where(
                dw_bv < 0, p_unscaled / (_normsafe(z.y) + _normsafe(z.v)), nan
            )
            p_ecos = jnp.where(
                dw_bv < 0, p_unscaled / (jnp.maximum(1.0, normc) * jnp.abs(dw_bv)), nan
            )
            p_infeas = jnp.maximum(p_cvx, p_ecos)
            infeas = p_infeas < opts.infeas_tol

            # Dual infeasibility / unboundedness (ConicIP.jl:820-850)
            d1 = jnp.linalg.norm(A @ z.y - z.s) if m else -inf
            d2 = jnp.linalg.norm(G @ z.y) if p else -inf
            d3 = jnp.where(
                jnp.all(jnp.isfinite(z.y)), jnp.linalg.norm(Q @ z.y), nan
            )
            d_cvx = jnp.where(
                cty > 0,
                jnp.maximum(
                    d1 / jnp.maximum(1.0, normb),
                    jnp.maximum(d2 / jnp.maximum(1.0, normd), d3 / jnp.maximum(1.0, normc)),
                )
                / jnp.abs(cty),
                nan,
            )
            d_ecos = jnp.where(
                cty > 0,
                jnp.maximum(d1, jnp.maximum(d2, d3)) / jnp.linalg.norm(z.y),
                nan,
            )
            d_infeas = jnp.abs(jnp.maximum(d_cvx, d_ecos))
            unbnd = d_infeas < opts.infeas_tol

            status = jnp.where(infeas, Status.INFEASIBLE, status)
            status = jnp.where(unbnd, Status.UNBOUNDED, status)

            # certificate normalizations overwrite the solution fields
            # (ConicIP.jl:816, :848)
            sol = replace(
                sol,
                y=jnp.where(infeas, nan, jnp.where(unbnd, z.y / jnp.abs(cty), sol.y)),
                w=jnp.where(infeas, z.w / -dw_bv, jnp.where(unbnd, nan, sol.w)),
                v=jnp.where(infeas, z.v / -dw_bv, jnp.where(unbnd, nan, sol.v)),
            )

        # divergence of unknown cause (ConicIP.jl:870-873)
        bad = ~(
            jnp.isfinite(mu) & jnp.isfinite(rDu) & jnp.isfinite(rPr) & jnp.isfinite(rCp)
        )
        status = jnp.where((status == Status.RUNNING) & bad, Status.ERROR, status)
        status = status.astype(jnp.int32)

        if opts.verbose:
            jax.debug.callback(
                _print_row,
                k,
                rDu,
                rPr,
                rCp,
                pobj,
                dobj,
                p_infeas,
                d_infeas,
                rstep_prev,
                rnorm_prev,
                ordered=True,
            )

        # ── Predictor / corrector / refinement / step — only while running.
        def take_step(z):
            # LEVEL-2 plugin callback: per-iteration numeric refactorization
            solve3x3 = solve3x3gen(F, FinvT)
            solve4 = make_solve4(lam, F, FinvT, solve3x3)

            # Predictor (ConicIP.jl:879-887)
            d_aff = solve4(r0)
            a_aff = jnp.minimum(
                jnp.minimum(ca.maxstep(spec, z.v, d_aff.v), 1.0),
                jnp.minimum(ca.maxstep(spec, z.s, d_aff.s), 1.0),
            )
            rho = fts(z.v, a_aff, d_aff.v, z.s, a_aff, d_aff.s) / mubar
            sigma = jnp.clip(rho, 0.0, 1.0) ** 3

            # Corrector (ConicIP.jl:893-901)
            FiTds = sc.apply(spec, FinvT, d_aff.s)
            Fdv = sc.apply(spec, F, d_aff.v)
            lc = -(ca.cone_prod(spec, FiTds, Fdv)) + sigma * mu * e
            r = Vec4(r0.y, r0.w, r0.v, rleft.s - lc)

            # Newton step + iterative refinement (ConicIP.jl:907-921).
            # On TPU this loop doubles as the mixed-precision recovery
            # mechanism when the factorization ran in f32.
            def K4(dz):
                return Vec4(
                    Q @ dz.y + G.T @ dz.w - A.T @ dz.v,
                    G @ dz.y,
                    A @ dz.y - dz.s,
                    ca.cone_prod(spec, lam, sc.apply(spec, F, dz.v))
                    + ca.cone_prod(spec, lam, sc.apply(spec, FinvT, dz.s)),
                )

            def resid(dz):
                rIr = r - K4(dz)
                return rIr, rIr.norm() / (n + 2 * m)

            dz = solve4(r)
            rIr, rnorm = resid(dz)

            def ref_cond(st):
                _, _, rn, j = st
                return (j < opts.maxRefinementSteps) & (
                    rn >= opts.refinement_threshold
                )

            def ref_body(st):
                dz, rIr, _, j = st
                dz = dz + solve4(rIr)
                rIr, rn = resid(dz)
                return dz, rIr, rn, j + 1

            dz, rIr, rnorm, rstep = jax.lax.while_loop(
                ref_cond, ref_body, (dz, rIr, rnorm, jnp.asarray(0, jnp.int32))
            )

            # Step with fraction-to-boundary (ConicIP.jl:927-932)
            inv_dtb = 1.0 / (1.0 - opts.DTB)
            alpha = jnp.minimum(
                jnp.minimum(ca.maxstep(spec, z.v, dz.v * inv_dtb), 1.0),
                jnp.minimum(ca.maxstep(spec, z.s, dz.s * inv_dtb), 1.0),
            )
            return z - dz.scale(alpha), rnorm, rstep + jnp.asarray(1, jnp.int32)

        z_new, rnorm, rstep = jax.lax.cond(
            status == Status.RUNNING,
            take_step,
            lambda z: (z, jnp.asarray(0.0, dtype), jnp.asarray(0, jnp.int32)),
            z,
        )

        sol = replace(sol, status=status)
        return z_new, sol, optBest, k + 1, rnorm, rstep

    def cond(carry):
        _, sol, _, k, _, _ = carry
        return (sol.status == Status.RUNNING) & (k <= opts.maxIters)

    if opts.verbose:
        jax.debug.callback(_print_banner, ordered=True)

    carry0 = (
        z0,
        sol0,
        inf,
        jnp.asarray(1, jnp.int32),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0, jnp.int32),
    )
    _, sol, _, _, _, _ = jax.lax.while_loop(cond, body, carry0)

    # loop exhausted without a status → Abandoned (ConicIP.jl:936)
    sol = replace(
        sol,
        status=jnp.where(
            sol.status == Status.RUNNING, Status.ABANDONED, sol.status
        ).astype(jnp.int32),
    )
    return sol


# ──────────────────────────────────────────────────────────────
#  Verbose output (host callbacks)
# ──────────────────────────────────────────────────────────────


def _print_banner():
    print("\n > CONICIP-TPU INTERIOR POINT SOLVER v0.1\n")
    print(
        "            Optimality                      Objective              "
        "Infeasibility       "
    )
    print()
    print(
        "\x1b[1m   Iter   │  prFeas    duFeas    muFeas   │  pobj      dobj      "
        "│  icertp    icertd   │  refine \x1b[0m"
    )


def _print_row(k, rDu, rPr, rCp, pobj, dobj, p_inf, d_inf, rstep, rnorm):
    hot = float(rnorm) > 0.001
    pre = "\x1b[1m\x1b[31m" if hot else ""
    post = "\x1b[0m" if hot else ""
    print(
        f"{pre} {int(k):6d}  │  {float(rDu):<8.1e}  {float(rPr):<8.1e}  "
        f"{float(rCp):<8.1e} │  {float(pobj):< 8.1e}  {float(dobj):< 8.1e}  │  "
        f"{float(p_inf):<8.1e}  {float(d_inf):<8.1e} │  {int(rstep)}{post}"
    )

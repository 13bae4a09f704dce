"""Adapter from 2x2 KKT solvers to the 3x3 interface.

Mirrors the reference's ``pivot``/``pivotgen`` (kktsolvers.jl:316-349) with
one deliberate fix: the reference applies ``F⁻ᵀF⁻ᵀ`` where the correct
operator is ``(FᵀF)⁻¹ = F⁻¹F⁻ᵀ`` — identical for the symmetric R/Q scalings
but wrong for SDP congruences (the documented cause of its pivot-solver
``PosDefException`` failure on mixed R+Q+S problems, benchmark/report.md:72).
We apply the correct ``F⁻¹F⁻ᵀ`` so the pivoted path works on all cones.
"""

from __future__ import annotations

from ..cones import scaling as sc
from ..cones.spec import ConeSpec

__all__ = ["pivot"]


def pivot(kktsolver_2x2):
    """Wrap a 2x2 solver factory into a 3x3 one.

    The inner solver handles the Schur system::

        ┌                   ┐ ┌   ┐   ┌   ┐
        │ Q + Aᵀ(FᵀF)⁻¹A  Gᵀ │ │ a │ = │ y │
        │ G                 │ │ b │   │ w │
        └                   ┘ └   ┘   └   ┘
    """

    def kktsolver(Q, A, G, spec: ConeSpec):
        solve2x2gen = kktsolver_2x2(Q, A, G, spec)

        def solve3x3gen(F, FinvT):
            solve2x2 = solve2x2gen(F, FinvT)

            def w2inv(x):
                # (FᵀF)⁻¹ x = F⁻¹ (F⁻ᵀ x)
                return sc.apply_adjoint(spec, FinvT, sc.apply(spec, FinvT, x))

            def solve3x3(y, w, v):
                t1 = w2inv(v)
                dy, dw = solve2x2(y + A.T @ t1, w)
                dv = t1 - w2inv(A @ dy)  # = (FᵀF)⁻¹ (v - A dy)
                return dy, dw, dv

            return solve3x3

        return solve3x3gen

    return kktsolver

"""Intra-problem (tensor) parallelism: distributed Schur assembly.

For one large problem, the per-iteration Schur matrix

    M = Q + Σ_k Atil_kᵀ Atil_k,     Atil = F⁻ᵀ A

is a sum over constraint-row blocks — the natural sharding axis
(SURVEY.md §2.3): rows of A (and the cone scaling) are partitioned over
devices, each device computes its partial ``Atil_kᵀ Atil_k`` on its MXU, and
one ``psum`` over ICI reduces the partials. The factorization and triangular
solves then run replicated (O(n³) but identical on every device — cheap to
keep replicated until n is large enough to justify a distributed Cholesky).

Residual norms and the step-length min reduce the same way (one scalar psum
per iteration), so communication per iteration is one n×n matrix + a few
scalars — light relative to the O(mn²) assembly FLOPs.

Current scope: R-cone specs (row-separable scaling). SOC/SDP groups need
group-aligned sharding — planned follow-up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..cones.spec import ConeSpec

_HI = jax.lax.Precision.HIGHEST
from ..kkt.pivot import pivot
from ..ops.cholesky import cho_solve, cholesky

__all__ = ["kktsolver_schur_tp", "distributed_normal_matrix"]


def distributed_normal_matrix(Q, A, dinv, mesh: Mesh, axis: str):
    """Compute ``Q + (diag(dinv) A)ᵀ (diag(dinv) A)`` with rows of A sharded
    over ``mesh[axis]`` and a single psum reduction."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None), P(axis, None), P(axis)),
        out_specs=P(None, None),
    )
    def _assemble(Qr, A_blk, dinv_blk):
        Atil = A_blk * dinv_blk[:, None]
        # out_specs is replicated, so Q (already replicated) is added once
        # on every device to the identical psum result.
        return Qr + jax.lax.psum(jnp.matmul(Atil.T, Atil, precision=_HI), axis)

    return _assemble(Q, A, dinv)


def kktsolver_schur_tp(mesh: Mesh, axis: str = "tp", factor_dtype=None):
    """Row-sharded variant of :func:`~conicip_tpu.kkt.kktsolver_schur`.

    Returns a KKT solver (same 3-level protocol) whose Schur assembly runs
    under ``shard_map`` with the constraint rows of A partitioned over
    ``mesh[axis]``. R-cone specs only (diagonal NT scaling is row-separable).
    """

    def kktsolver(Q, A, G, spec: ConeSpec):
        if spec.soc_groups or spec.sdp_groups:
            raise NotImplementedError(
                "kktsolver_schur_tp currently supports R-cone specs only"
            )
        ntp = mesh.shape[axis]
        if A.shape[0] % ntp:
            raise ValueError(
                f"m={A.shape[0]} must be divisible by mesh axis {axis}={ntp}"
            )

        def kkt2x2(Q, A, G, spec):
            p = G.shape[0]

            def solve2x2gen(F, FinvT):
                dinv = FinvT.r_d  # diagonal F⁻ᵀ for pure R cones

                @functools.partial(
                    shard_map,
                    mesh=mesh,
                    in_specs=(P(axis, None), P(axis)),
                    out_specs=P(None, None),
                )
                def assemble(A_blk, dinv_blk):
                    Atil = A_blk * dinv_blk[:, None]
                    return jax.lax.psum(jnp.matmul(Atil.T, Atil, precision=_HI), axis)

                M = Q + assemble(A, dinv)
                L = cholesky(M, factor_dtype)
                if p:
                    from jax.scipy.linalg import solve_triangular

                    E = solve_triangular(L, G.T.astype(L.dtype), lower=True)
                    S = jnp.matmul(E.T, E, precision=_HI)
                    Ls = jnp.linalg.cholesky(S)

                def solve2x2(by, bw):
                    t = cho_solve(L, by)
                    if p:
                        from jax.scipy.linalg import solve_triangular

                        rhs = (jnp.matmul(G, t, precision=_HI) - bw).astype(Ls.dtype)
                        b2 = solve_triangular(Ls, rhs, lower=True)
                        b2 = solve_triangular(Ls, b2, lower=True, trans="T")
                        b2 = b2.astype(t.dtype)
                        return t - cho_solve(L, jnp.matmul(G.T, b2, precision=_HI)), b2
                    return t, by[:0]

                return solve2x2

            return solve2x2gen

        return pivot(kkt2x2)(Q, A, G, spec)

    return kktsolver

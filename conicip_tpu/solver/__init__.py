"""User-facing solver API."""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cones.spec import ConeSpec
from .ipm import IPMOptions, ipm_solve
from .state import Solution, SolState, Status, Vec4

__all__ = ["conic_ip", "Solution", "SolState", "Status", "IPMOptions", "Vec4", "ipm_solve"]


def _densify(X, dtype):
    if X is None:
        return None
    if hasattr(X, "toarray"):  # scipy.sparse
        X = X.toarray()
    return jnp.asarray(np.asarray(X), dtype)


@functools.partial(jax.jit, static_argnames=("spec", "kktsolver", "opts"))
def _solve_jit(Q, c, A, b, G, d, *, spec, kktsolver, opts):
    return ipm_solve(Q, c, A, b, G, d, spec, kktsolver, opts)


@functools.lru_cache(maxsize=None)
def _default_kktsolver(factor_dtype):
    from ..kkt import kktsolver_schur

    if factor_dtype is None:
        return kktsolver_schur
    return functools.partial(kktsolver_schur, factor_dtype=factor_dtype)


def conic_ip(
    Q,
    c,
    A,
    b,
    cone_dims: Sequence[Tuple[str, int]],
    G=None,
    d=None,
    *,
    kktsolver=None,
    optTol: float = 1e-6,
    DTB: float = 0.01,
    verbose: bool = False,
    maxRefinementSteps: int = 3,
    maxIters: int = 100,
    cache_nestodd: bool = False,
    infeasTol: Optional[float] = None,
    refinementThreshold: Optional[float] = None,
    factor_dtype=None,
    dtype=None,
    mixedResiduals: Optional[bool] = None,
) -> Solution:
    """Interior point solver for

    .. code-block:: text

        minimize    ½ yᵀQy − cᵀy        (note the MINUS sign on cᵀy)
        subject to  Ay ≥_K b,  K given by cone_dims, e.g. [("R",2),("Q",4)]
                    Gy = d

    Signature- and semantics-compatible with the reference ``conicIP``
    (ConicIP.jl:400-510). ``kktsolver`` is the 3-level plugin callback
    (see :mod:`conicip_tpu.kkt`); ``factor_dtype=jnp.float32`` runs the
    per-iteration factorizations in f32 on the MXU with iterative refinement
    recovering f64 accuracy.
    """
    dtype = dtype or jnp.float64
    c = _densify(c, dtype)
    n = c.shape[0]
    Q = _densify(Q, dtype)
    A = _densify(A, dtype)
    b = _densify(b, dtype)
    G = _densify(G, dtype) if G is not None else jnp.zeros((0, n), dtype)
    d = _densify(d, dtype) if d is not None else jnp.zeros((0,), dtype)

    spec = ConeSpec(cone_dims)
    if kktsolver is None:
        kktsolver = _default_kktsolver(factor_dtype)
    if mixedResiduals is None:
        # With an f32 factorization and f64 iterates, residual mat-vecs are
        # the only remaining emulated-f64 cost on TPU — run them in f32 and
        # recertify in f64 near tolerances (see solver/ipm.py docstring).
        mixedResiduals = factor_dtype == jnp.float32 and dtype == jnp.float64
    opts = IPMOptions(
        optTol=optTol,
        DTB=DTB,
        verbose=verbose,
        maxRefinementSteps=maxRefinementSteps,
        maxIters=maxIters,
        cache_nestodd=cache_nestodd,
        infeasTol=infeasTol,
        refinementThreshold=refinementThreshold,
        mixedResiduals=mixedResiduals,
    )
    st = _solve_jit(Q, c, A, b, G, d, spec=spec, kktsolver=kktsolver, opts=opts)
    st = jax.block_until_ready(st)
    sol = Solution.from_state(st)
    if verbose:
        _exit_banner(sol.status)
    return sol


def _exit_banner(status: str) -> None:
    msgs = {
        "Infeasible": "\n > EXIT -- Certificate of Infeasibility Found!\n",
        "Unbounded": "\n > EXIT -- Certificate of Dual Infeasibility Found!\n",
        "Optimal": "\n > EXIT -- Below Tolerance!\n",
        "Error": "\n > EXIT -- Error!\n",
        "Abandoned": "\n > EXIT -- Maximum iterations reached.\n",
    }
    print(msgs.get(status, ""))

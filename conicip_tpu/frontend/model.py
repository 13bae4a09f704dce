"""Modeling-language frontend — the MOI/JuMP-wrapper analogue.

Python re-design of the reference's MathOptInterface optimizer
(MOI_wrapper.jl:1-398) with identical constraint-translation sign
conventions. Constraints are affine functions ``f(x) = M x + q`` paired with
a set; the translation into the internal form

    minimize  ½ yᵀQy − cᵀy   s.t.  Ay ≥_K b,  Gy = d

follows MOI_wrapper.jl:185-258 line for line:

=====================  =====================================================
set                    internal rows
=====================  =====================================================
Zeros                  G ← M,   d ← −q
Nonnegatives           A ← M,   b ← −q,        cone ("R", dim)
Nonpositives           A ← −M,  b ← q,         cone ("R", dim)
SecondOrderCone        A ← M,   b ← −q,        cone ("Q", dim)
PSDTriangle            A ← M,   b ← −q,        cone ("S", dim)
EqualTo(v)             G ← M,   d ← v − q
GreaterThan(l)         A ← M,   b ← l − q,     cone ("R", 1)
LessThan(u)            A ← −M,  b ← q − u,     cone ("R", 1)
=====================  =====================================================

Objective sense handling (MOI_wrapper.jl:151-174): the solver minimizes
``−cᵀy``, so MIN sense passes ``c_int = −c_obj`` and MAX passes
``c_int = +c_obj`` (objective value negated back on read-out). Linear
objectives only, like the reference wrapper (README.md:70).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..preprocess import preprocess_conic_ip
from ..solver.state import Solution
from . import sets as S

__all__ = ["Optimizer", "TerminationStatus"]


class TerminationStatus:
    OPTIMIZE_NOT_CALLED = "OPTIMIZE_NOT_CALLED"
    OPTIMAL = "OPTIMAL"
    INFEASIBLE = "INFEASIBLE"
    DUAL_INFEASIBLE = "DUAL_INFEASIBLE"
    ITERATION_LIMIT = "ITERATION_LIMIT"
    OTHER_ERROR = "OTHER_ERROR"


_STATUS_MAP = {
    "Optimal": TerminationStatus.OPTIMAL,
    "Infeasible": TerminationStatus.INFEASIBLE,
    "Unbounded": TerminationStatus.DUAL_INFEASIBLE,
    "Abandoned": TerminationStatus.ITERATION_LIMIT,
}


@dataclass
class _VectorConstraint:
    M: np.ndarray  # (dim, n_at_add) coefficient matrix
    q: np.ndarray  # (dim,) constants
    set: object
    ci: int


class Optimizer:
    """Build-and-solve model object (reference ``Optimizer``,
    MOI_wrapper.jl:19-40).

    >>> model = Optimizer(optTol=1e-6)
    >>> x = model.add_variables(2)
    >>> model.set_objective("min", {x[0]: 1.0, x[1]: 1.0})
    >>> model.add_constraint(np.ones((1, 2)), np.zeros(1), GreaterThan(1.0))
    >>> model.optimize()
    """

    def __init__(self, *, verbose: bool = False, optTol: float = 1e-6,
                 maxIters: int = 100, **solver_options):
        self.verbose = verbose
        self.optTol = optTol
        self.maxIters = maxIters
        self.solver_options = solver_options
        self._n = 0
        self._sense = "min"
        self._obj: Dict[int, float] = {}
        self._obj_constant = 0.0
        self._constraints: List[_VectorConstraint] = []
        self._next_ci = 0
        self.sol: Optional[Solution] = None
        # ci → ("eq"|"ineq", row range) for dual recovery
        self._ci_rows: Dict[int, Tuple[str, slice]] = {}

    # ── model building ───────────────────────────────────────────
    def add_variables(self, k: int) -> List[int]:
        idx = list(range(self._n, self._n + k))
        self._n += k
        return idx

    def add_variable(self) -> int:
        return self.add_variables(1)[0]

    def set_objective(self, sense: str, terms, constant: float = 0.0,
                      quadratic=None) -> None:
        """``terms`` is a dict {variable index: coefficient} or a dense
        coefficient vector over all variables.

        ``quadratic`` adds a ½ xᵀPx term: a dict {(i, j): coefficient}
        (symmetrized) or a dense (n, n) matrix. P must be positive
        semidefinite for ``min`` and negative semidefinite for ``max``
        (convexity). This EXTENDS the reference wrapper, which supports
        linear objectives only (MOI_wrapper.jl:59-64, README.md:70).
        """
        if sense not in ("min", "max"):
            raise ValueError("sense must be 'min' or 'max'")
        self._sense = sense
        if isinstance(terms, dict):
            self._obj = dict(terms)
        else:
            arr = np.asarray(terms, dtype=float)
            self._obj = {i: float(v) for i, v in enumerate(arr) if v != 0.0}
        self._obj_constant = float(constant)
        self._obj_quad = None
        if quadratic is not None:
            if isinstance(quadratic, dict):
                P = np.zeros((self._n, self._n))
                for (i, j), v in quadratic.items():
                    P[i, j] += 0.5 * v
                    P[j, i] += 0.5 * v
            else:
                P = np.asarray(quadratic, dtype=float)
                P = 0.5 * (P + P.T)
            self._obj_quad = P

    def add_constraint(self, M, q, cset) -> int:
        """Constrain the affine function ``M x + q`` to lie in ``cset``.

        Scalar sets accept 1-D ``M`` of length n (one row).
        ``variables_in(vars, cset)`` is sugar for M = selection rows.
        """
        M = np.atleast_2d(np.asarray(M, dtype=float))
        q = np.atleast_1d(np.asarray(q, dtype=float))
        _supported = (S.Zeros, S.Nonnegatives, S.Nonpositives, S.SecondOrderCone,
                      S.PSDTriangle, S.EqualTo, S.GreaterThan, S.LessThan)
        if not isinstance(cset, _supported):
            raise TypeError(
                f"unsupported constraint set {cset!r}; expected one of "
                + ", ".join(t.__name__ for t in _supported)
            )
        if isinstance(cset, (S.EqualTo, S.GreaterThan, S.LessThan)):
            if M.shape[0] != 1 or q.shape != (1,):
                raise ValueError("scalar set needs a single affine row")
        else:
            if M.shape[0] != cset.dim or q.shape != (cset.dim,):
                raise ValueError(
                    f"affine function has {M.shape[0]} rows, set has dim {cset.dim}"
                )
        ci = self._next_ci
        self._next_ci += 1
        self._constraints.append(_VectorConstraint(M=M, q=q, set=cset, ci=ci))
        return ci

    def variables_in(self, variables: List[int], cset) -> int:
        """Constrain a vector of variables to a set (MOI VectorOfVariables)."""
        M = np.zeros((len(variables), self._n))
        for i, vi in enumerate(variables):
            M[i, vi] = 1.0
        return self.add_constraint(M, np.zeros(len(variables)), cset)

    # ── solve ────────────────────────────────────────────────────
    def optimize(self) -> Solution:
        n = self._n
        c_obj = np.zeros(n)
        for i, v in self._obj.items():
            c_obj[i] += v
        # solver minimizes ½yᵀQy − cᵀy (MOI_wrapper.jl:170-173); for a
        # quadratic user objective ½xᵀPx + cᵀx the mapping is Q = ±P with
        # the same sign flip as the linear part
        c_int = c_obj if self._sense == "max" else -c_obj
        Q = np.zeros((n, n))
        quad = getattr(self, "_obj_quad", None)
        if quad is not None:
            P = np.zeros((n, n))
            P[: quad.shape[0], : quad.shape[1]] = quad
            Q = -P if self._sense == "max" else P

        G_rows, d_vals = [], []
        A_rows, b_vals = [], []
        cone_dims: List[Tuple[str, int]] = []
        eq_row = ineq_row = 0
        self._ci_rows.clear()

        for con in self._constraints:
            M = np.zeros((con.M.shape[0], n))
            M[:, : con.M.shape[1]] = con.M
            q = con.q
            st = con.set
            if isinstance(st, S.Zeros):
                G_rows.append(M)
                d_vals.append(-q)
                self._ci_rows[con.ci] = ("eq", slice(eq_row, eq_row + st.dim))
                eq_row += st.dim
            elif isinstance(st, S.Nonnegatives):
                A_rows.append(M)
                b_vals.append(-q)
                cone_dims.append(("R", st.dim))
                self._ci_rows[con.ci] = ("ineq", slice(ineq_row, ineq_row + st.dim))
                ineq_row += st.dim
            elif isinstance(st, S.Nonpositives):
                A_rows.append(-M)
                b_vals.append(q)
                cone_dims.append(("R", st.dim))
                self._ci_rows[con.ci] = ("ineq", slice(ineq_row, ineq_row + st.dim))
                ineq_row += st.dim
            elif isinstance(st, S.SecondOrderCone):
                A_rows.append(M)
                b_vals.append(-q)
                cone_dims.append(("Q", st.dim))
                self._ci_rows[con.ci] = ("ineq", slice(ineq_row, ineq_row + st.dim))
                ineq_row += st.dim
            elif isinstance(st, S.PSDTriangle):
                A_rows.append(M)
                b_vals.append(-q)
                cone_dims.append(("S", st.dim))
                self._ci_rows[con.ci] = ("ineq", slice(ineq_row, ineq_row + st.dim))
                ineq_row += st.dim
            elif isinstance(st, S.EqualTo):
                G_rows.append(M)
                d_vals.append(np.array([st.value]) - q)
                self._ci_rows[con.ci] = ("eq", slice(eq_row, eq_row + 1))
                eq_row += 1
            elif isinstance(st, S.GreaterThan):
                A_rows.append(M)
                b_vals.append(np.array([st.lower]) - q)
                cone_dims.append(("R", 1))
                self._ci_rows[con.ci] = ("ineq", slice(ineq_row, ineq_row + 1))
                ineq_row += 1
            elif isinstance(st, S.LessThan):
                A_rows.append(-M)
                b_vals.append(q - np.array([st.upper]))
                cone_dims.append(("R", 1))
                self._ci_rows[con.ci] = ("ineq", slice(ineq_row, ineq_row + 1))
                ineq_row += 1
            else:
                raise TypeError(f"unsupported set {st!r}")

        G = np.vstack(G_rows) if G_rows else np.zeros((0, n))
        d = np.concatenate(d_vals) if d_vals else np.zeros(0)
        A = np.vstack(A_rows) if A_rows else np.zeros((0, n))
        b = np.concatenate(b_vals) if b_vals else np.zeros(0)

        self.sol = preprocess_conic_ip(
            Q, c_int, A, b, cone_dims, G, d,
            verbose=self.verbose, optTol=self.optTol, maxIters=self.maxIters,
            **self.solver_options,
        )
        return self.sol

    # ── result getters (MOI_wrapper.jl:291-398) ──────────────────
    def termination_status(self) -> str:
        if self.sol is None:
            return TerminationStatus.OPTIMIZE_NOT_CALLED
        return _STATUS_MAP.get(self.sol.status, TerminationStatus.OTHER_ERROR)

    def objective_value(self) -> float:
        self._check_result()
        val = self.sol.pobj
        if self._sense == "max":
            val = -val
        return val + self._obj_constant

    def variable_primal(self, vi) -> float:
        self._check_result()
        if isinstance(vi, (list, tuple, np.ndarray)):
            return np.asarray([self.sol.y[int(i)] for i in vi])
        return float(self.sol.y[int(vi)])

    def constraint_dual(self, ci: int) -> np.ndarray:
        self._check_result()
        kind, rows = self._ci_rows[ci]
        vec = self.sol.w if kind == "eq" else self.sol.v
        return np.asarray(vec[rows])

    def _check_result(self):
        if self.sol is None:
            raise RuntimeError("optimize() has not been called")

"""CVXPY bridge class tests — run only when cvxpy is installed.

cvxpy is not baked into this image; these validate the custom-solver class
(interface-compatible with cvxpy >= 1.3) wherever cvxpy is available. The
underlying data path is covered cvxpy-free in test_conic_form.py.
"""

import numpy as np
import pytest

cp = pytest.importorskip("cvxpy")

def _solver():
    from conicip_tpu.frontend.cvxpy_solver import ConicIPSolver

    return ConicIPSolver(optTol=1e-7)


def test_cvxpy_lp():
    x = cp.Variable(2)
    prob = cp.Problem(cp.Minimize(x[0] + 2 * x[1]),
                      [x[0] + x[1] == 1, x >= 0])
    prob.solve(solver=_solver())
    assert prob.status == cp.OPTIMAL
    assert abs(prob.value - 1.0) < 1e-5
    assert np.allclose(x.value, [1.0, 0.0], atol=1e-5)


def test_cvxpy_socp():
    x = cp.Variable(3)
    c = np.array([1.0, -2.0, 0.5])
    prob = cp.Problem(cp.Minimize(c @ x), [cp.norm(x, 2) <= 1])
    prob.solve(solver=_solver())
    assert prob.status == cp.OPTIMAL
    assert abs(prob.value + np.linalg.norm(c)) < 1e-5


def test_cvxpy_sdp():
    k = 3
    rng = np.random.default_rng(7)
    C = rng.standard_normal((k, k))
    C = 0.5 * (C + C.T)
    X = cp.Variable((k, k), symmetric=True)
    prob = cp.Problem(cp.Minimize(cp.trace(C @ X)),
                      [X >> 0, cp.trace(X) == 1])
    prob.solve(solver=_solver())
    assert prob.status == cp.OPTIMAL
    assert abs(prob.value - np.linalg.eigvalsh(C)[0]) < 1e-4


def test_cvxpy_infeasible():
    x = cp.Variable(1)
    prob = cp.Problem(cp.Minimize(x[0]), [x >= 1, x <= 0])
    prob.solve(solver=_solver())
    assert prob.status == cp.INFEASIBLE

"""Standard conic form entry point + CVXPY bridge.

The standard-form tests build (c, A, b, dims) exactly as CVXPY's
ConeMatrixStuffing/SCS path would (b − Ax ∈ K, scaled-lower-tri PSD) and
check analytic answers, duals, and statuses. The cvxpy-class tests run only
when cvxpy is installed (it is not baked into this image) — the bridge class
itself is interface-compatible with cvxpy ≥ 1.3 custom solvers.
"""

import numpy as np
import pytest

from conicip_tpu.frontend import ConeDims, solve_conic_form

TOL = 1e-6


def test_lp_with_equalities():
    # min x0 + 2 x1  s.t.  x0 + x1 = 1,  x >= 0   → x = (1, 0), obj = 1
    c = np.array([1.0, 2.0])
    # rows: 1 zero row (x0 + x1 - 1 ∈ {0} ⇒ b - Ax with A = [1,1], b = 1)
    #       2 nonneg rows (x ∈ R²₊ ⇒ b - Ax = x with A = -I, b = 0)
    A = np.array([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    b = np.array([1.0, 0.0, 0.0])
    res = solve_conic_form(c, A, b, ConeDims(zero=1, nonneg=2))
    assert res.status == "Optimal"
    assert np.allclose(res.x, [1.0, 0.0], atol=1e-5)
    assert abs(res.obj - 1.0) < 1e-5
    # standard-form dual feasibility: A'y + c = 0, cone duals >= 0
    assert np.linalg.norm(A.T @ res.y + c) < 1e-4
    assert res.y[1:].min() > -1e-6
    # slack consistency
    assert np.allclose(res.s, b - A @ res.x, atol=1e-9)
    assert abs(res.s[0]) < 1e-5  # zero-cone row


def test_socp_norm_constraint():
    # min  c'x  s.t. ||x||_2 <= 1   → x = -c/||c||, obj = -||c||
    rng = np.random.default_rng(3)
    n = 5
    c = rng.standard_normal(n)
    # SOC row block: s = b - Ax ∈ SOC(n+1) with s = (1, x)
    A = np.zeros((n + 1, n))
    A[1:, :] = -np.eye(n)
    b = np.zeros(n + 1)
    b[0] = 1.0
    res = solve_conic_form(c, A, b, ConeDims(soc=(n + 1,)))
    assert res.status == "Optimal"
    nrm = np.linalg.norm(c)
    assert np.allclose(res.x, -c / nrm, atol=1e-5)
    assert abs(res.obj + nrm) < 1e-5


def test_sdp_scaled_lower_triangle_convention():
    # min tr(C X)  s.t.  X ⪰ 0, tr(X) = 1  → obj = λ_min(C)
    # variables: scaled-lower-tri vectorization x of X (the CVXPY/SCS
    # convention: column-major lower triangle, off-diag ×√2).
    rng = np.random.default_rng(5)
    k = 4
    Csym = rng.standard_normal((k, k))
    Csym = 0.5 * (Csym + Csym.T)

    def svec(M):
        out = []
        for j in range(k):
            for i in range(j, k):
                out.append(M[i, j] * (1.0 if i == j else np.sqrt(2.0)))
        return np.array(out)

    t = k * (k + 1) // 2
    c = svec(Csym)          # tr(CX) = svec(C)'svec(X)
    diag_idx = []
    pos = 0
    for j in range(k):
        diag_idx.append(pos)
        pos += k - j
    # rows: 1 zero row  tr(X) = 1;  t psd rows  s = x ∈ PSD-tri
    A = np.zeros((1 + t, t))
    A[0, diag_idx] = 1.0
    A[1:, :] = -np.eye(t)
    b = np.zeros(1 + t)
    b[0] = 1.0
    res = solve_conic_form(c, A, b, ConeDims(zero=1, psd=(k,)))
    assert res.status == "Optimal"
    lam_min = np.linalg.eigvalsh(Csym)[0]
    assert abs(res.obj - lam_min) < 1e-4
    # recover X from scaled lower tri and check it is the right projector
    X = np.zeros((k, k))
    pos = 0
    for j in range(k):
        for i in range(j, k):
            v = res.x[pos] / (1.0 if i == j else np.sqrt(2.0))
            X[i, j] = X[j, i] = v
            pos += 1
    assert abs(np.trace(X) - 1.0) < 1e-5
    assert np.linalg.eigvalsh(X)[0] > -1e-5


def test_quadratic_objective_P():
    # min ½x'Px + c'x  s.t. x >= 0 with P = I, c = (-1, 1) → x = (1, 0)
    P = np.eye(2)
    c = np.array([-1.0, 1.0])
    A = -np.eye(2)
    b = np.zeros(2)
    res = solve_conic_form(c, A, b, ConeDims(nonneg=2), P=P)
    assert res.status == "Optimal"
    assert np.allclose(res.x, [1.0, 0.0], atol=1e-5)
    assert abs(res.obj - (-0.5)) < 1e-5


def test_infeasible_and_dims_aliases():
    # x >= 1 and x <= 0 is infeasible; also exercise the SCS-style dict keys
    c = np.array([1.0])
    A = np.array([[-1.0], [1.0]])
    b = np.array([-1.0, 0.0])  # s1 = x - 1 >= 0, s2 = -x >= 0
    res = solve_conic_form(c, A, b, {"l": 2})
    assert res.status == "Infeasible"
    assert np.all(np.isnan(res.x))


def test_mixed_soc_nonneg_rows_order():
    # min -x0 s.t. x0 <= 3 (nonneg row), ||(x0, x1)|| <= 5 (soc)
    c = np.array([-1.0, 0.0])
    A = np.array([
        [1.0, 0.0],       # s = 3 - x0 >= 0
        [0.0, 0.0],       # s0 = 5
        [-1.0, 0.0],      # s1 = x0
        [0.0, -1.0],      # s2 = x1
    ])
    b = np.array([3.0, 5.0, 0.0, 0.0])
    res = solve_conic_form(c, A, b, ConeDims(nonneg=1, soc=(3,)))
    assert res.status == "Optimal"
    assert abs(res.x[0] - 3.0) < 1e-5


def test_exp_cone_rejected():
    class FakeDims:
        zero, nonneg, soc, psd = 0, 1, (), ()
        exp = 2
        p3d = ()

    with pytest.raises(ValueError, match="exponential"):
        solve_conic_form(np.zeros(1), np.zeros((1, 1)), np.zeros(1),
                         FakeDims())

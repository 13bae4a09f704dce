"""Modeling frontend tests — mirror the reference's MOI wrapper tests
(test/runtests.jl:681-778)."""

import numpy as np
import pytest

from conicip_tpu.frontend import (
    EqualTo,
    GreaterThan,
    LessThan,
    Optimizer,
    SecondOrderCone,
    TerminationStatus,
)


def test_simple_lp():
    # min x₁ + x₂ s.t. x₁ + x₂ ≥ 1, x ≥ 0 (test/runtests.jl:684-715)
    model = Optimizer(optTol=1e-6)
    x = model.add_variables(2)
    model.set_objective("min", {x[0]: 1.0, x[1]: 1.0})
    model.add_constraint(np.ones((1, 2)), np.zeros(1), GreaterThan(1.0))
    model.add_constraint(np.eye(2)[0:1], np.zeros(1), GreaterThan(0.0))
    model.add_constraint(np.eye(2)[1:2], np.zeros(1), GreaterThan(0.0))
    model.optimize()

    assert model.termination_status() == TerminationStatus.OPTIMAL
    assert model.objective_value() == pytest.approx(1.0, abs=1e-4)
    assert model.variable_primal(x[0]) == pytest.approx(0.5, abs=1e-2)
    assert model.variable_primal(x[1]) == pytest.approx(0.5, abs=1e-2)


def test_soc_via_frontend():
    # min x₃ s.t. x₁ = 1, x₂ = 1, ‖(x₁,x₂)‖ ≤ x₃ (test/runtests.jl:717-744)
    model = Optimizer(optTol=1e-6)
    x = model.add_variables(3)
    model.set_objective("min", {x[2]: 1.0})
    e = np.eye(3)
    model.add_constraint(e[0:1], np.zeros(1), EqualTo(1.0))
    model.add_constraint(e[1:2], np.zeros(1), EqualTo(1.0))
    model.variables_in([x[2], x[0], x[1]], SecondOrderCone(3))
    model.optimize()

    assert model.termination_status() == TerminationStatus.OPTIMAL
    assert model.variable_primal(x[2]) == pytest.approx(np.sqrt(2), abs=1e-4)
    assert model.objective_value() == pytest.approx(np.sqrt(2), abs=1e-4)


def test_max_sense():
    # max x₁ + 2x₂ s.t. x₁ + x₂ ≤ 1, x ≥ 0 (test/runtests.jl:746-777)
    model = Optimizer(optTol=1e-6)
    x = model.add_variables(2)
    model.set_objective("max", {x[0]: 1.0, x[1]: 2.0})
    model.add_constraint(np.ones((1, 2)), np.zeros(1), LessThan(1.0))
    model.add_constraint(np.eye(2)[0:1], np.zeros(1), GreaterThan(0.0))
    model.add_constraint(np.eye(2)[1:2], np.zeros(1), GreaterThan(0.0))
    model.optimize()

    assert model.termination_status() == TerminationStatus.OPTIMAL
    assert model.objective_value() == pytest.approx(2.0, abs=1e-4)
    assert model.variable_primal(x[0]) == pytest.approx(0.0, abs=1e-2)
    assert model.variable_primal(x[1]) == pytest.approx(1.0, abs=1e-2)


def test_objective_constant_and_duals():
    model = Optimizer(optTol=1e-7)
    x = model.add_variables(2)
    model.set_objective("min", {x[0]: 1.0, x[1]: 1.0}, constant=5.0)
    ci = model.add_constraint(np.ones((1, 2)), np.zeros(1), GreaterThan(1.0))
    model.add_constraint(np.eye(2)[0:1], np.zeros(1), GreaterThan(0.0))
    model.add_constraint(np.eye(2)[1:2], np.zeros(1), GreaterThan(0.0))
    model.optimize()
    assert model.objective_value() == pytest.approx(6.0, abs=1e-4)
    # dual of the binding x₁+x₂ ≥ 1 constraint is 1 (the objective gradient)
    assert model.constraint_dual(ci)[0] == pytest.approx(1.0, abs=1e-3)


def test_status_before_optimize():
    model = Optimizer()
    assert model.termination_status() == TerminationStatus.OPTIMIZE_NOT_CALLED
    with pytest.raises(RuntimeError):
        model.objective_value()


def test_quadratic_objective_min():
    """Quadratic objectives EXTEND the reference wrapper (linear-only,
    MOI_wrapper.jl:59-64): min 1/2 x'Px + c'x."""
    from conicip_tpu.frontend import GreaterThan, Nonnegatives, Optimizer

    m = Optimizer(optTol=1e-8)
    x = m.add_variables(2)
    m.set_objective("min", {x[0]: -1.0, x[1]: -2.0},
                    quadratic={(0, 0): 1.0, (1, 1): 1.0})
    m.variables_in(x, Nonnegatives(2))
    m.add_constraint(np.ones((1, 2)), np.zeros(1), GreaterThan(1.0))
    m.optimize()
    assert m.termination_status() == "OPTIMAL"
    assert np.allclose(m.variable_primal(x), [1.0, 2.0], atol=1e-5)
    assert abs(m.objective_value() - (-2.5)) < 1e-6


def test_quadratic_objective_max():
    from conicip_tpu.frontend import GreaterThan, Optimizer

    m = Optimizer(optTol=1e-8)
    y = m.add_variable()
    m.set_objective("max", {y: 1.0}, quadratic={(0, 0): -1.0})
    m.add_constraint(np.ones((1, 1)), np.zeros(1), GreaterThan(0.0))
    m.optimize()
    assert m.termination_status() == "OPTIMAL"
    assert abs(m.variable_primal(y) - 1.0) < 1e-5
    assert abs(m.objective_value() - 0.5) < 1e-6


def test_psd_triangle_projection():
    # PSD projection through the frontend: min ½‖x − m‖² s.t. mat(x) ⪰ 0,
    # where m = vecm(M) for a symmetric indefinite M. The optimum is the
    # eigenvalue-clipped projection of M (reference PSD semantics,
    # test/runtests.jl:527-552, via the wrapper's PSDTriangle translation,
    # MOI_wrapper.jl:220-225). Variables use the internal vecm (√2 off-
    # diagonal) convention, matching the reference wrapper's pass-through.
    from conicip_tpu import mat, vecm
    from conicip_tpu.frontend import PSDTriangle
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    k = 4
    B = rng.standard_normal((k, k))
    M = 0.5 * (B + B.T)
    m = np.asarray(vecm(jnp.asarray(M)))
    dim = k * (k + 1) // 2

    model = Optimizer(optTol=1e-7)
    x = model.add_variables(dim)
    # ½xᵀx − mᵀx  (constant ½‖m‖² dropped)
    model.set_objective("min", {i: -m[i] for i in range(dim)},
                        quadratic=np.eye(dim))
    ci = model.variables_in(x, PSDTriangle(k))
    model.optimize()
    assert model.termination_status() == TerminationStatus.OPTIMAL

    w, V = np.linalg.eigh(M)
    X_star = (V * np.clip(w, 0.0, None)) @ V.T
    X_got = np.asarray(mat(jnp.asarray(model.variable_primal(x))))
    np.testing.assert_allclose(X_got, X_star, atol=1e-5)
    # dual of the PSD constraint is the negative-part certificate:
    # v = vecm(X* − M) up to sign/scaling; at minimum it must be PSD
    v = model.constraint_dual(ci)
    Vd = np.asarray(mat(jnp.asarray(np.asarray(v))))
    assert np.linalg.eigvalsh(Vd).min() > -1e-5

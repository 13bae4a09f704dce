"""Public warm-start API (EXTENDS the reference, which always cold-starts
— ConicIP.jl:700-713). Production motivation: sequences of nearby solves
(rebalancing, MPC) should not pay the full cold iteration count."""

import jax.numpy as jnp
import numpy as np
import pytest

import conicip_tpu as ct


@pytest.fixture
def box_qp():
    rng = np.random.default_rng(7)
    n = 60
    B = rng.standard_normal((n, n))
    Q = B.T @ B / n + np.eye(n)
    c = rng.standard_normal(n)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = -np.ones(2 * n)
    return Q, c, A, b, [("R", 2 * n)]


def test_warm_start_cuts_iterations(box_qp):
    Q, c, A, b, cones = box_qp
    cold = ct.conic_ip(Q, c, A, b, cones)
    assert cold.status == "Optimal"

    c2 = c * 1.01  # a nearby problem
    cold2 = ct.conic_ip(Q, c2, A, b, cones)
    warm2 = ct.conic_ip(Q, c2, A, b, cones, warm_start=cold)
    assert warm2.status == "Optimal"
    assert max(warm2.prFeas, warm2.duFeas, warm2.muFeas) < 1e-6
    assert warm2.Iter < cold2.Iter
    np.testing.assert_allclose(warm2.y, cold2.y, atol=1e-4)


def test_warm_start_tuple_and_f32(box_qp):
    Q, c, A, b, cones = box_qp
    cold = ct.conic_ip(Q, c, A, b, cones, factor_dtype=jnp.float32)
    warm = ct.conic_ip(
        Q, c * 0.99, A, b, cones, factor_dtype=jnp.float32,
        warm_start=(cold.y, None, cold.v),
    )
    assert warm.status == "Optimal"
    assert max(warm.prFeas, warm.duFeas, warm.muFeas) < 1e-6


def test_warm_start_with_equalities():
    # simplex projection (equalities take the null-space elimination path
    # under f32 factors); warm restart must survive the reduced-space map
    rng = np.random.default_rng(3)
    n = 40
    a = rng.standard_normal(n)
    Q = np.eye(n)
    c = a  # projects a onto the simplex (min ½‖y−a‖²)
    A = np.eye(n)
    b = np.zeros(n)
    G = np.ones((1, n))
    d = np.ones(1)
    cones = [("R", n)]
    cold = ct.conic_ip(Q, c, A, b, cones, G, d, factor_dtype=jnp.float32)
    assert cold.status == "Optimal"
    warm = ct.conic_ip(
        Q, c * 1.02, A, b, cones, G, d, factor_dtype=jnp.float32,
        warm_start=cold,
    )
    assert warm.status == "Optimal"
    assert max(warm.prFeas, warm.duFeas, warm.muFeas) < 1e-6


def test_warm_start_bad_dims_raises(box_qp):
    Q, c, A, b, cones = box_qp
    with pytest.raises(ValueError):
        ct.conic_ip(Q, c, A, b, cones, warm_start=(c[:-1], None, b))


def test_warm_start_nonfinite_falls_back(box_qp):
    Q, c, A, b, cones = box_qp
    y = np.full_like(c, np.nan)
    sol = ct.conic_ip(Q, c, A, b, cones, warm_start=(y, None, np.ones(len(b))))
    assert sol.status == "Optimal"  # silently cold-started

"""Null-space equality elimination (conicip_tpu/reduce.py) and the
full-precision fallback for stalled f32 solves.

Reference semantics anchors: preprocess_conicIP's inconsistent-equality
short circuit (preprocessor.jl:61-64) and the equality-handling tests of
the reference suite (test/runtests.jl:328-439).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import conicip_tpu as ct
from conicip_tpu.reduce import eliminate_equalities

OPT = 1e-6


@pytest.fixture
def eq_problem(rng):
    n = 60
    B = rng.standard_normal((n, n))
    Q = B.T @ B + np.eye(n)
    c = rng.standard_normal(n)
    G = rng.standard_normal((5, n))
    d = G @ np.abs(rng.standard_normal(n))
    return Q, c, np.eye(n), np.zeros(n), G, d


def test_reduction_identities(eq_problem):
    Q, c, A, b, G, d = eq_problem
    red = eliminate_equalities(Q, c, A, b, G, d)
    assert red.consistent
    # G Z = 0 and G y0 = d
    assert np.linalg.norm(G @ red.Z) < 1e-10
    assert np.linalg.norm(G @ red.y0 - d) < 1e-8 * (1 + np.linalg.norm(d))
    # orthonormal basis
    assert np.allclose(red.Z.T @ red.Z, np.eye(red.Z.shape[1]), atol=1e-12)


def test_eliminated_matches_direct(eq_problem):
    Q, c, A, b, G, d = eq_problem
    direct = ct.conic_ip(Q, c, A, b, [("R", 60)], G, d, optTol=1e-8)
    elim = ct.conic_ip(
        Q, c, A, b, [("R", 60)], G, d, optTol=1e-8, eliminateEqualities=True
    )
    assert direct.status == elim.status == "Optimal"
    assert np.linalg.norm(direct.y - elim.y) < 1e-4
    assert np.linalg.norm(direct.w - elim.w) < 1e-3
    # equality feasibility is exact by construction
    assert np.linalg.norm(G @ elim.y - d) < 1e-12 * (1 + np.linalg.norm(d))
    # recovered duals satisfy stationarity
    rDu = np.linalg.norm(Q @ elim.y + G.T @ elim.w - A.T @ elim.v - c)
    assert rDu < 1e-5 * (1 + np.linalg.norm(c))


def test_f32_equalities_converge(eq_problem):
    """Dense Q + equalities stalls the pure-f32 double-Schur path near
    convergence; elimination + the full-precision backstop must deliver
    Optimal at tolerance anyway."""
    Q, c, A, b, G, d = eq_problem
    sol = ct.conic_ip(Q, c, A, b, [("R", 60)], G, d, factor_dtype=jnp.float32)
    assert sol.status == "Optimal"
    assert max(sol.prFeas, sol.duFeas, sol.muFeas) < OPT
    assert np.linalg.norm(G @ sol.y - d) < 1e-10


def test_rank_deficient_G(eq_problem):
    Q, c, A, b, G, d = eq_problem
    G3 = np.vstack([G, G[0:1]])
    d3 = np.concatenate([d, d[0:1]])
    sol = ct.conic_ip(
        Q, c, A, b, [("R", 60)], G3, d3, factor_dtype=jnp.float32
    )
    assert sol.status == "Optimal"
    assert np.linalg.norm(G3 @ sol.y - d3) < 1e-8


def test_inconsistent_equalities_infeasible(eq_problem):
    Q, c, A, b, G, d = eq_problem
    G2 = np.vstack([G[0], G[0]])
    d2 = np.array([1.0, 2.0])
    sol = ct.conic_ip(
        Q, c, A, b, [("R", 60)], G2, d2, factor_dtype=jnp.float32
    )
    assert sol.status == "Infeasible"
    assert np.all(np.isnan(sol.y))


def test_unbounded_with_equalities():
    # internal objective is -c'y: minimize -y1 with y1 >= 0 free above,
    # equality pins y2 = 0 -> unbounded ray along +e1
    Q = np.zeros((2, 2))
    c = np.array([1.0, 0.0])
    A = np.eye(2)[0:1]
    b = np.zeros(1)
    G = np.array([[0.0, 1.0]])
    d = np.zeros(1)
    sol = ct.conic_ip(Q, c, A, b, [("R", 1)], G, d, factor_dtype=jnp.float32)
    assert sol.status == "Unbounded"
    # ray satisfies G y = 0
    assert abs(sol.y[1]) < 1e-8


def test_soc_cones_through_elimination(rng):
    n = 20
    B = rng.standard_normal((n, n))
    Q = B.T @ B / n + np.eye(n)
    c = rng.standard_normal(n)
    # R block + one SOC, plus equalities
    A = np.vstack([np.eye(n), rng.standard_normal((5, n))])
    b = np.concatenate([-np.ones(n), -10 * np.ones(5)])
    b[n] = -20.0  # SOC head row bound
    G = rng.standard_normal((3, n))
    d = G @ rng.standard_normal(n) * 0.1
    cones = [("R", n), ("Q", 5)]
    ref = ct.conic_ip(Q, c, A, b, cones, G, d)
    sol = ct.conic_ip(Q, c, A, b, cones, G, d, eliminateEqualities=True)
    assert ref.status == sol.status == "Optimal"
    assert np.linalg.norm(ref.y - sol.y) < 1e-3

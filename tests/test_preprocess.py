"""Preprocessor tests (test/runtests.jl:358-439, 653-675)."""

import numpy as np
import pytest

import conicip_tpu as ct
from conicip_tpu.preprocess import imcols, preprocess_conic_ip

OPT_TOL = 1e-7
TOL = 1e-3


def test_imcols_full_rank(rng):
    A = rng.standard_normal((5, 10))
    b = rng.standard_normal(5)
    R, consistent = imcols(A, b)
    assert len(R) == np.linalg.matrix_rank(A)
    assert consistent


def test_imcols_redundant(rng):
    A = rng.standard_normal((5, 10))
    b = rng.standard_normal(5)
    A2 = np.vstack([A, A[0:1] + A[1:2]])
    b2 = np.concatenate([b, b[0:1] + b[1:2]])
    R2, consistent2 = imcols(A2, b2)
    assert len(R2) == np.linalg.matrix_rank(A2)
    assert consistent2


def test_imcols_inconsistent(rng):
    A = rng.standard_normal((5, 10))
    b = rng.standard_normal(5)
    A3 = np.vstack([A, A[0:1]])
    b3 = np.concatenate([b, b[0:1] + 100])
    _, consistent3 = imcols(A3, b3)
    assert not consistent3


def test_imcols_empty():
    R, consistent = imcols(np.zeros((0, 5)), np.zeros(0))
    assert len(R) == 0 and consistent


def test_preprocess_redundant_primal(rng):
    # duplicated equality rows must be dropped and give the same answer as
    # the equivalent folded-inequality formulation (test/runtests.jl:358-390)
    n = 10
    h = rng.standard_normal(n)
    H = np.outer(h, h) + 1e-6 * np.eye(n)
    c = np.arange(1.0, n + 1)
    A = np.eye(n)
    b = np.zeros(n)
    G1 = rng.random((6, n))
    G = np.vstack([G1, G1])
    d = np.zeros(12)

    s1 = preprocess_conic_ip(H, H @ c, A, b, [("R", n)], G, d,
                             verbose=True, optTol=OPT_TOL)
    assert s1.status == "Optimal"
    assert s1.w.shape == (12,)

    A2 = np.vstack([A, G1, -G1])
    b2 = np.concatenate([b, np.zeros(12)])
    s2 = preprocess_conic_ip(H, H @ c, A2, b2, [("R", n + 12)], G1, np.zeros(6),
                             optTol=OPT_TOL)
    np.testing.assert_allclose(s1.y, s2.y, atol=TOL)


def test_preprocess_rank_deficient_dual(rng):
    # LP with duplicated variables: [A A] x = bounds, Q = 0 → the dual
    # system is rank deficient; regularization must fix it
    # (test/runtests.jl:392-412). Answer: y = 0.
    n = 10
    Q = np.zeros((2 * n, 2 * n))
    c = -np.ones(2 * n)
    A = np.hstack([np.eye(n), np.eye(n)])
    b = np.zeros(n)

    sol = preprocess_conic_ip(Q, c, A, b, [("R", n)], verbose=True,
                              optTol=OPT_TOL)
    assert np.linalg.norm(sol.y) < TOL


def test_preprocess_inconsistent_equalities(rng):
    # y₁ = 1 and y₁ = -1 → Infeasible straight from the preprocessor
    # (test/runtests.jl:414-439)
    n = 10
    h = rng.standard_normal(n)
    H = np.outer(h, h)
    c = np.arange(1.0, n + 1)
    G = np.zeros((2, n))
    G[:, 0] = 1.0
    d = np.array([1.0, -1.0])

    sol = preprocess_conic_ip(H, H @ c, np.eye(n), np.zeros(n), [("R", n)],
                              G, d, optTol=OPT_TOL)
    assert sol.status == "Infeasible"
    assert np.all(np.isnan(sol.y))


def test_preprocess_soc_passthrough(rng):
    # preprocess on an already-clean SOC problem must not change the answer
    n = 4
    Q = np.eye(n)
    c_obj = -np.ones(n)
    A = np.vstack([np.zeros((1, n)), np.eye(n)[:3], np.eye(n)])
    b = np.concatenate([[-1.0], np.zeros(3), np.zeros(n)])
    sol = preprocess_conic_ip(Q, c_obj, A, b, [("Q", 4), ("R", n)],
                              verbose=True, optTol=1e-6)
    assert sol.status == "Optimal"
    assert np.linalg.norm(sol.y) < TOL

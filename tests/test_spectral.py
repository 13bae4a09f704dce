"""Spectral KKT solver for PSD-projection structure (kkt/spectral.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from conicip_tpu.cones import algebra as alg
from conicip_tpu.cones import scaling as sc
from conicip_tpu.cones.spec import ConeSpec, tri_dim
from conicip_tpu.kkt.spectral import (kktsolver_spectral,
                                      spectral_applicable,
                                      spectral_kktsolver)
from conicip_tpu.models.generators import _vecm_np, batched_small_sdp
from conicip_tpu.parallel.batch import solve_batch
from conicip_tpu.solver import _default_kktsolver


def _interior(rng, k):
    M = rng.standard_normal((k, k))
    M = M @ M.T / k + np.eye(k)
    return _vecm_np(M[None])[0]


def test_spectral_applicable(rng):
    k = 4
    n = tri_dim(k)
    spec = ConeSpec([("S", n)])
    I = np.eye(n)
    assert spectral_applicable(2.5 * I, I, None, spec)
    assert spectral_applicable(
        np.broadcast_to(I, (3, n, n)), np.broadcast_to(I, (3, n, n)),
        None, spec)
    # non-identity A
    A2 = I.copy()
    A2[0, 1] = 0.5
    assert not spectral_applicable(I, A2, None, spec)
    # non-scalar Q
    Q2 = I.copy()
    Q2[0, 0] = 3.0
    assert not spectral_applicable(Q2, I, None, spec)
    # equalities present
    assert not spectral_applicable(I, I, np.ones((1, n)), spec)
    # mixed cones DO qualify (generalized backend, r5)
    assert spectral_applicable(
        np.eye(n + 2), np.eye(n + 2), None,
        ConeSpec([("R", 2), ("S", n)]))
    # ... but SOC cones need q > 0
    assert not spectral_applicable(
        np.zeros((n + 3, n + 3)), np.eye(n + 3), None,
        ConeSpec([("Q", 3), ("S", n)]))


@pytest.mark.parametrize("q", [0.0, 1.0, 2.5])
def test_spectral_solve_satisfies_kkt_equations(rng, q):
    # against the defining 3x3 contract: q a - c = x, a + FᵀF c = z
    k = 5
    n = tri_dim(k)
    spec = ConeSpec([("S", n)])
    z_v = jnp.asarray(_interior(rng, k))
    z_s = jnp.asarray(_interior(rng, k))
    F = sc.nt_scaling(spec, z_v, z_s)
    FinvT = sc.nt_inv_adjoint(spec, F)
    Q = q * jnp.eye(n)
    A = jnp.eye(n)
    G = jnp.zeros((0, n))
    gen = kktsolver_spectral(Q, A, G, spec)
    solve = gen(F, FinvT)
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    a, b, c = solve(x, jnp.zeros(0), z)
    assert b.shape == (0,)
    np.testing.assert_allclose(q * a - c, x, atol=1e-9)
    FtFc = sc.apply_adjoint(spec, F, sc.apply(spec, F, c))
    np.testing.assert_allclose(a + FtFc, z, atol=1e-8)


@pytest.mark.parametrize("q", [0.7, 1.0])
def test_spectral_mixed_cones_satisfies_kkt_equations(rng, q):
    # generalized backend: R + Q + S mix with A = I, Q = qI
    n_r, n_q, k = 6, 5, 4
    n = n_r + n_q + tri_dim(k)
    spec = ConeSpec([("R", n_r), ("Q", n_q), ("S", tri_dim(k))])
    # strictly interior z, s for every cone block
    def interior():
        v = np.empty(n)
        v[:n_r] = 0.5 + rng.random(n_r)
        tail = 0.3 * rng.standard_normal(n_q - 1)
        v[n_r] = np.linalg.norm(tail) + 0.5 + rng.random()
        v[n_r + 1:n_r + n_q] = tail
        v[n_r + n_q:] = _interior(rng, k)
        return jnp.asarray(v)

    F = sc.nt_scaling(spec, interior(), interior())
    FinvT = sc.nt_inv_adjoint(spec, F)
    Q = q * jnp.eye(n)
    A = jnp.eye(n)
    G = jnp.zeros((0, n))
    gen = kktsolver_spectral(Q, A, G, spec)
    solve = gen(F, FinvT)
    x = jnp.asarray(rng.standard_normal(n))
    z = jnp.asarray(rng.standard_normal(n))
    a, b, c = solve(x, jnp.zeros(0), z)
    np.testing.assert_allclose(q * a - c, x, atol=1e-9)
    FtFc = sc.apply_adjoint(spec, F, sc.apply(spec, F, c))
    np.testing.assert_allclose(a + FtFc, z, atol=1e-8)


def test_solve_batch_mixed_rqs_autoselects_spectral_and_matches_dense():
    from conicip_tpu.models.generators import batched_mixed_rqs

    Q, c, A, b, cones = batched_mixed_rqs(batch=3)
    got = solve_batch(Q, c, A, b, cones)  # auto: generalized spectral
    ref = solve_batch(Q, c, A, b, cones,
                      kktsolver=_default_kktsolver(None),
                      mixedResiduals=False)
    assert got.statuses == ["Optimal"] * 3
    assert ref.statuses == ["Optimal"] * 3
    np.testing.assert_allclose(got.y, ref.y, atol=1e-5)
    resid = np.maximum(got.prFeas, np.maximum(got.duFeas, got.muFeas))
    assert float(np.max(resid)) < 1e-6


def test_solve_batch_autoselects_spectral_and_matches_dense():
    Q, c, A, b, cones = batched_small_sdp(batch=4, k=4)
    got = solve_batch(Q, c, A, b, cones)  # auto: spectral backend
    ref = solve_batch(Q, c, A, b, cones,
                      kktsolver=_default_kktsolver(None),
                      mixedResiduals=False)
    assert got.statuses == ["Optimal"] * 4
    assert ref.statuses == ["Optimal"] * 4
    np.testing.assert_allclose(got.y, ref.y, atol=1e-5)
    resid = np.maximum(got.prFeas, np.maximum(got.duFeas, got.muFeas))
    assert float(np.max(resid)) < 1e-6


def test_spectral_explicit_kktsolver_single_solve():
    # usable as an explicit kktsolver for conic_ip too
    from conicip_tpu import conic_ip

    rng = np.random.default_rng(3)
    k = 4
    n = tri_dim(k)
    C = rng.standard_normal((k, k))
    C = (C + C.T) / np.sqrt(2 * k)
    cvec = _vecm_np(C[None])[0]
    sol = conic_ip(np.eye(n), cvec, np.eye(n), np.zeros(n),
                   [("S", n)], kktsolver=spectral_kktsolver())
    assert sol.status == "Optimal"
    # PSD projection: eigenvalue clipping of C
    w, V = np.linalg.eigh(C)
    proj = V @ np.diag(np.maximum(w, 0.0)) @ V.T
    got = np.asarray(sol.y)
    np.testing.assert_allclose(got, _vecm_np(proj[None])[0], atol=1e-5)

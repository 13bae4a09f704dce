"""Diag+low-rank Schur KKT solver (kkt/lowrank.py) — the lift analogue."""

import numpy as np
import pytest

import jax.numpy as jnp

from conicip_tpu.cones import scaling as sc
from conicip_tpu.cones.spec import ConeSpec
from conicip_tpu.kkt.lowrank import (lowrank_applicable, lowrank_kktsolver)
from conicip_tpu.models.generators import batched_mixed_rq_eq
from conicip_tpu.solver import _default_kktsolver, conic_ip


def _family(n=20, n_q=7, p=3, seed=0):
    Q, c, A, b, cones, G, d = batched_mixed_rq_eq(
        2, n=n, seed=seed, n_q=n_q, p=p)
    return Q[0], c[0], A[0], b[0], cones, G, d[0]


def test_lowrank_applicable():
    Q, c, A, b, cones, G, d = _family()
    spec = ConeSpec(cones)
    assert lowrank_applicable(Q, A, G, spec)
    assert lowrank_applicable(Q, A, None, spec)
    # non-identity R rows
    A2 = np.array(A)
    A2[0, 1] = 0.5
    assert not lowrank_applicable(Q, A2, G, spec)
    # non-diagonal Q
    Q2 = np.array(Q)
    Q2[0, 1] = 0.1
    assert not lowrank_applicable(Q2, A, G, spec)
    # SDP spec
    assert not lowrank_applicable(
        np.eye(8), np.eye(8), None, ConeSpec([("R", 2), ("S", 6)]))


@pytest.mark.parametrize("with_g", [True, False])
def test_lowrank_solve_satisfies_kkt_equations(rng, with_g):
    n, n_q, p = 20, 7, 3
    Q, c, A, b, cones, G, d = _family(n, n_q, p)
    if not with_g:
        G = np.zeros((0, n))
    spec = ConeSpec(cones)
    m = A.shape[0]
    # strictly interior z, s
    def interior():
        v = np.empty(m)
        v[:n] = 0.5 + rng.random(n)
        tail = 0.3 * rng.standard_normal(n_q - 1)
        v[n] = np.linalg.norm(tail) + 0.5 + rng.random()
        v[n + 1:] = tail
        return jnp.asarray(v)

    F = sc.nt_scaling(spec, interior(), interior())
    FinvT = sc.nt_inv_adjoint(spec, F)
    Qj, Aj, Gj = jnp.asarray(Q), jnp.asarray(A), jnp.asarray(G)
    gen = lowrank_kktsolver()(Qj, Aj, Gj, spec)
    solve = gen(F, FinvT)
    x = jnp.asarray(rng.standard_normal(n))
    y = jnp.asarray(rng.standard_normal(G.shape[0]))
    z = jnp.asarray(rng.standard_normal(m))
    a, bb, cc = solve(x, y, z)
    # 3x3 contract: Qa + Gᵀb − Aᵀc = x ; Ga = y ; Aa + FᵀFc = z
    np.testing.assert_allclose(
        Qj @ a + Gj.T @ bb - Aj.T @ cc, x, atol=1e-8)
    if G.shape[0]:
        np.testing.assert_allclose(Gj @ a, y, atol=1e-8)
    FtFc = sc.apply_adjoint(spec, F, sc.apply(spec, F, cc))
    np.testing.assert_allclose(Aj @ a + FtFc, z, atol=1e-7)


def test_solve_batch_direct_lowrank_matches_eliminated():
    # production auto path: lowrank-applicable direct form skips the
    # null-space elimination and finishes through the lowrank f64 tier
    import jax.numpy as jnp

    from conicip_tpu.parallel.batch import solve_batch

    Q, c, A, b, cones, G, d = batched_mixed_rq_eq(3, n=24, n_q=9, p=4)
    got = solve_batch(Q, c, A, b, cones, G, d,
                      factor_dtype=jnp.float32)
    ref = solve_batch(Q, c, A, b, cones, G, d,
                      factor_dtype=jnp.float32, eliminate_equalities=True)
    assert got.statuses == ["Optimal"] * 3
    assert ref.statuses == ["Optimal"] * 3
    # two valid near-optimal points: y agrees to the residual level
    # (~1e-7 ⇒ ~1e-4 in y), objectives tightly
    np.testing.assert_allclose(got.y, ref.y, atol=5e-4)
    np.testing.assert_allclose(got.pobj, ref.pobj, rtol=1e-6, atol=1e-6)
    resid = np.maximum(got.prFeas, np.maximum(got.duFeas, got.muFeas))
    assert float(np.max(resid)) < 1e-6


def test_lowrank_end_to_end_matches_dense():
    Q, c, A, b, cones, G, d = _family(n=24, n_q=9, p=4, seed=1)
    got = conic_ip(Q, c, A, b, cones, G, d,
                   kktsolver=lowrank_kktsolver(), factor_dtype=None)
    ref = conic_ip(Q, c, A, b, cones, G, d,
                   kktsolver=_default_kktsolver(None),
                   factor_dtype=None)
    assert got.status == "Optimal"
    assert ref.status == "Optimal"
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(ref.y),
                               atol=1e-5)

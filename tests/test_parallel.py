"""Batched + sharded solving on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from conicip_tpu.models import batched_box_qp
from conicip_tpu.parallel import (
    distributed_normal_matrix,
    kktsolver_schur_tp,
    make_mesh,
    solve_batch,
)
import conicip_tpu as ct


def test_solve_batch_plain():
    Q, c, A, b, cones = batched_box_qp(batch=8, n=20)
    bs = solve_batch(Q, c, A, b, cones, optTol=1e-7)
    assert bs.statuses == ["Optimal"] * 8
    # every instance matches its individual solve
    for i in range(8):
        sol = ct.conic_ip(Q[i], c[i], A[i], b[i], cones, optTol=1e-7)
        np.testing.assert_allclose(bs.y[i], sol.y, atol=1e-5)


def test_solve_batch_sharded():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh((8,), ("batch",))
    Q, c, A, b, cones = batched_box_qp(batch=16, n=16)
    bs = solve_batch(Q, c, A, b, cones, mesh=mesh, optTol=1e-6)
    assert bs.statuses == ["Optimal"] * 16


def test_solve_batch_mixed_statuses():
    # one infeasible instance inside an otherwise-optimal batch must not
    # poison the others (SURVEY.md §7 hard part 6)
    n = 10
    rng = np.random.default_rng(1)
    Q = np.stack([np.eye(n)] * 4)
    c = rng.standard_normal((4, n))
    A0 = np.vstack([np.eye(n), -np.eye(n)])
    A = np.stack([A0] * 4)
    b = np.stack([-np.ones(2 * n)] * 4)
    b[2] = np.ones(2 * n)  # y ≥ 1 and −y ≥ 1 → infeasible
    bs = solve_batch(Q, c, A, b, [("R", 2 * n)], optTol=1e-7)
    st = bs.statuses
    assert st[2] == "Infeasible"
    assert st[0] == st[1] == st[3] == "Optimal"
    assert np.all(np.isfinite(bs.y[[0, 1, 3]]))


def test_solve_batch_f32_backstop_escalates_infeasible():
    # An f32-tier instance that ends Abandoned with a LARGE residual (the
    # signature of infeasibility, not of a near-solution stall) must still
    # escalate through the backstop ladder and come back certified
    # Infeasible (advisor round-1 medium finding).
    import jax.numpy as jnp

    n = 10
    rng = np.random.default_rng(3)
    Q = np.stack([np.eye(n)] * 4)
    c = rng.standard_normal((4, n))
    A0 = np.vstack([np.eye(n), -np.eye(n)])
    A = np.stack([A0] * 4)
    b = np.stack([-np.ones(2 * n)] * 4)
    b[1] = np.ones(2 * n)  # y ≥ 1 and −y ≥ 1 → infeasible
    bs = solve_batch(Q, c, A, b, [("R", 2 * n)],
                     factor_dtype=jnp.float32, mixedResiduals=True,
                     optTol=1e-7)
    st = bs.statuses
    assert st[1] == "Infeasible"
    assert st[0] == st[2] == st[3] == "Optimal"
    assert np.maximum(bs.prFeas, np.maximum(bs.duFeas, bs.muFeas))[
        [0, 2, 3]].max() < 1e-7


def test_distributed_normal_matrix():
    mesh = make_mesh((8,), ("tp",))
    rng = np.random.default_rng(0)
    n, m = 12, 32
    Q = np.eye(n)
    A = rng.standard_normal((m, n))
    dinv = rng.uniform(0.5, 2.0, m)
    M = distributed_normal_matrix(Q, A, dinv, mesh, "tp")
    At = A * dinv[:, None]
    np.testing.assert_allclose(np.asarray(M), Q + At.T @ At, atol=1e-10)


def test_kktsolver_schur_tp_full_solve():
    # full IPM solve with the row-sharded Schur assembly must agree with the
    # single-device solver
    mesh = make_mesh((8,), ("tp",))
    n = 16
    rng = np.random.default_rng(0)
    B = rng.standard_normal((n, n))
    Q = B.T @ B / n + np.eye(n)
    c = rng.standard_normal(n)
    A = np.vstack([np.eye(n), -np.eye(n)])
    b = -np.ones(2 * n)

    sol_tp = ct.conic_ip(Q, c, A, b, [("R", 2 * n)],
                         kktsolver=kktsolver_schur_tp(mesh, "tp"), optTol=1e-7)
    sol = ct.conic_ip(Q, c, A, b, [("R", 2 * n)], optTol=1e-7)
    assert sol_tp.status == "Optimal"
    np.testing.assert_allclose(sol_tp.y, sol.y, atol=1e-6)


def test_kktsolver_schur_tp_rejects_unsupported():
    mesh = make_mesh((8,), ("tp",))
    kkt = kktsolver_schur_tp(mesh, "tp")
    with pytest.raises(ValueError):
        # m=10 not divisible by 8
        ct.conic_ip(np.eye(5), np.ones(5), np.vstack([np.eye(5), np.eye(5)]),
                    np.zeros(10), [("R", 10)], kktsolver=kkt)


def test_solve_batch_warm_start():
    Q, c, A, b, cones = batched_box_qp(batch=8, n=20)
    cold = solve_batch(Q, c, A, b, cones, optTol=1e-7)
    assert cold.statuses == ["Optimal"] * 8

    c2 = np.asarray(c) * 1.01
    cold2 = solve_batch(Q, c2, A, b, cones, optTol=1e-7)
    warm2 = solve_batch(Q, c2, A, b, cones, optTol=1e-7, warm_start=cold)
    assert warm2.statuses == ["Optimal"] * 8
    assert warm2.Iter.mean() < cold2.Iter.mean()
    # both are tol-accurate solutions; iterates agree to ~sqrt(tol) near
    # weakly-active bounds
    np.testing.assert_allclose(warm2.y, cold2.y, atol=2e-3)
    assert np.maximum(warm2.prFeas,
                      np.maximum(warm2.duFeas, warm2.muFeas)).max() < 1e-7


def test_solve_batch_warm_start_scrubs_nonfinite():
    Q, c, A, b, cones = batched_box_qp(batch=4, n=12)
    cold = solve_batch(Q, c, A, b, cones, optTol=1e-7)
    y = np.array(cold.y)
    y[2] = np.nan  # one corrupted instance must not poison the batch
    warm = solve_batch(Q, c, A, b, cones, optTol=1e-7,
                       warm_start=(y, np.array(cold.w), np.array(cold.v)))
    assert warm.statuses == ["Optimal"] * 4


def test_solve_batch_warm_start_sharded():
    mesh = make_mesh((8,), ("batch",))
    Q, c, A, b, cones = batched_box_qp(batch=16, n=16)
    cold = solve_batch(Q, c, A, b, cones, mesh=mesh, optTol=1e-7)
    warm = solve_batch(Q, c, A, b, cones, mesh=mesh, optTol=1e-7,
                       warm_start=cold)
    assert warm.statuses == ["Optimal"] * 16
    assert warm.Iter.max() <= cold.Iter.max()


def test_solve_batch_warm_start_bad_dims():
    Q, c, A, b, cones = batched_box_qp(batch=4, n=12)
    cold = solve_batch(Q, c, A, b, cones)
    with pytest.raises(ValueError):
        solve_batch(Q, c, A, b, cones,
                    warm_start=(np.array(cold.y)[:, :-1], None,
                                np.array(cold.v)))

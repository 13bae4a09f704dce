"""Blocked emulated-f64 Cholesky / triangular inverse (ops/blocked64.py).

These kernels exist for the TPU (where XLA's monolithic f64 cholesky
serializes, tools/devbench.py); correctness is backend-independent and is
checked here on CPU against the native ops, including the padding path,
ill-conditioned inputs at the KKT systems' κ scale, and NaN propagation
for the ridge-retry ladder (kkt/schur.py)."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from conicip_tpu.ops.blocked64 import blocked_cholesky, blocked_tri_inv


def _spd(n, rng, cond=1e4):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0, -np.log10(cond), n)
    return (Q * lam) @ Q.T


@pytest.mark.parametrize("n", [96, 300, 512])
def test_blocked_cholesky_matches_xla(rng, n):
    M = jnp.asarray(_spd(n, rng))
    L = blocked_cholesky(M, r=128)
    Lref = jnp.linalg.cholesky(M)
    assert np.allclose(np.asarray(L), np.asarray(Lref), atol=1e-12)
    # and it IS a factor of M
    assert np.allclose(np.asarray(L @ L.T), np.asarray(M),
                       rtol=0, atol=1e-12)


def test_blocked_cholesky_ill_conditioned(rng):
    # κ ~ 1e10 — the equilibrated KKT Schur matrix near μ → 0, the exact
    # regime the full-precision last-mile branch serves
    n = 384
    M = jnp.asarray(_spd(n, rng, cond=1e10))
    L = np.asarray(blocked_cholesky(M, r=128))
    resid = np.max(np.abs(L @ L.T - np.asarray(M)))
    assert np.isfinite(L).all()
    assert resid < 1e-11


@pytest.mark.parametrize("n", [64, 257, 512])
def test_blocked_tri_inv_matches_solve(rng, n):
    M = jnp.asarray(_spd(n, rng))
    L = jnp.linalg.cholesky(M)
    W = blocked_tri_inv(L, r=128)
    Wref = solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
    assert np.allclose(np.asarray(W), np.asarray(Wref), atol=1e-10)
    assert np.allclose(np.asarray(W @ L), np.eye(n), atol=1e-10)


def test_blocked_tri_inv_ill_conditioned(rng):
    n = 384
    M = jnp.asarray(_spd(n, rng, cond=1e10))  # κ(L) ~ 1e5
    L = jnp.linalg.cholesky(M)
    W = np.asarray(blocked_tri_inv(L, r=128))
    # W L = I to ~eps·κ(L)
    assert np.max(np.abs(W @ np.asarray(L) - np.eye(n))) < 1e-9


def test_blocked_cholesky_nan_on_indefinite(rng):
    # non-SPD input must yield NaNs like the XLA op — the escalating
    # ridge retries in kkt/schur.py key off isfinite
    n = 300
    M = jnp.asarray(_spd(n, rng))
    M = M - 10.0 * jnp.eye(n, dtype=M.dtype)
    L = np.asarray(blocked_cholesky(M, r=128))
    assert not np.isfinite(L).all()

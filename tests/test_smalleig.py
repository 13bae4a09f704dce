"""Refined small-matrix factorizations (ops/smalleig.py) — the TPU SDP
fast path (f32 factorize + exact-f64 refinement), forced on under CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

import conicip_tpu.ops.smalleig as se


@pytest.fixture(autouse=True)
def force_fast_path(monkeypatch):
    monkeypatch.setattr(se, "_on_tpu", lambda: True)


@pytest.fixture
def spd(rng):
    B = rng.standard_normal((5, 9, 9))
    return jnp.asarray(B @ np.swapaxes(B, 1, 2) + 0.3 * np.eye(9))


def test_eigh_refined_accuracy(spd):
    w, U = se.eigh_refined(spd)
    w, U = np.asarray(w), np.asarray(U)
    T = np.asarray(spd)
    # orthonormality restored far beyond f32 by the Löwdin sweep
    for k in range(T.shape[0]):
        assert np.abs(U[k].T @ U[k] - np.eye(9)).max() < 1e-9
        # Rayleigh eigenvalues match numpy's to f64-quality
        w_np = np.linalg.eigvalsh(T[k])
        np.testing.assert_allclose(np.sort(w[k]), w_np, rtol=1e-9)


def test_eigh_refined_wide_scale(rng):
    # 8-decade spectrum: the refinement sweeps must recover small
    # eigenvalues the f32 start computes as garbage (beyond ~10 decades
    # even the stock TPU f64 eigh cannot — measured, see module doc)
    d = 8
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = 10.0 ** np.linspace(-4, 4, d)
    T = jnp.asarray((Q * lam) @ Q.T)[None]
    w, U = se.eigh_refined(T)
    w = np.sort(np.asarray(w)[0])
    np.testing.assert_allclose(w, np.sort(lam), rtol=1e-5)
    # and the f32 start alone is nowhere near (sanity of the claim)
    w32 = np.sort(np.linalg.eigvalsh(np.asarray(T[0], np.float32)))
    assert (np.abs(w32 - np.sort(lam)) / np.sort(lam)).max() > 1e-2


def test_cholesky_small_consistent(spd):
    L = np.asarray(se.cholesky_small(spd))
    T = np.asarray(spd)
    for k in range(T.shape[0]):
        assert np.all(np.isfinite(L[k]))
        # f32-consistent factor: LLᵀ reproduces T to f32 accuracy
        assert np.abs(L[k] @ L[k].T - T[k]).max() / np.abs(T[k]).max() < 1e-5


def test_solve_tri_refined(spd):
    T = np.asarray(spd)
    L = np.linalg.cholesky(T)
    rng2 = np.random.default_rng(0)
    B = rng2.standard_normal(T.shape)
    X = np.asarray(se.solve_tri_refined(jnp.asarray(L), jnp.asarray(B),
                                        lower=True))
    for k in range(T.shape[0]):
        # one exact-f64 refinement step: residual far below plain f32
        assert np.abs(L[k] @ X[k] - B[k]).max() < 1e-10


def test_fallback_identity_off_tpu(monkeypatch, spd):
    monkeypatch.setattr(se, "_on_tpu", lambda: False)
    w, U = se.eigh_refined(spd)
    w2, U2 = jnp.linalg.eigh(spd)
    np.testing.assert_array_equal(np.asarray(w), np.asarray(w2))


def test_cholesky_unrolled_exact(spd):
    # bit-level f64: the unrolled column sweep must match numpy's f64
    # factor to f64 roundoff (NOT the f32-consistent cholesky_small)
    L = np.asarray(se.cholesky_unrolled(spd))
    T = np.asarray(spd)
    for k in range(T.shape[0]):
        L_np = np.linalg.cholesky(T[k])
        np.testing.assert_allclose(L, np.asarray(
            [np.linalg.cholesky(Tk) for Tk in T]), rtol=1e-13, atol=1e-13)
        assert np.abs(L[k] @ L[k].T - T[k]).max() < 1e-12 * np.abs(T[k]).max()
        assert np.allclose(L_np, L[k], rtol=1e-12)


def test_cholesky_unrolled_wide_spectrum(rng):
    # late-IPM regime: NT scalings with ~10-decade spread must factor
    # to full f64 accuracy (this is what cholesky_small could not do)
    d = 8
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = 10.0 ** np.linspace(-6, 4, d)
    T = jnp.asarray((Q * lam) @ Q.T)[None]
    L = np.asarray(se.cholesky_unrolled(T))[0]
    T0 = np.asarray(T[0])
    assert np.abs(L @ L.T - T0).max() < 1e-12 * np.abs(T0).max()


def test_solve_tri_unrolled_exact(spd):
    T = np.asarray(spd)
    L = np.linalg.cholesky(T)
    rng2 = np.random.default_rng(1)
    B = rng2.standard_normal(T.shape)
    for lower in (True, False):
        A = L if lower else np.swapaxes(L, 1, 2)
        X = np.asarray(se.solve_tri_unrolled(
            jnp.asarray(A), jnp.asarray(B), lower=lower))
        ref = np.asarray([np.linalg.solve(A[k], B[k])
                          for k in range(T.shape[0])])
        np.testing.assert_allclose(X, ref, rtol=1e-11, atol=1e-11)


def test_unrolled_max_unroll_fallback(spd):
    # beyond the compile-size guard the stock ops take over (identical
    # results since both are exact f64 here on CPU)
    L_guard = np.asarray(se.cholesky_unrolled(spd, max_unroll=4))
    np.testing.assert_array_equal(
        L_guard, np.asarray(jnp.linalg.cholesky(spd)))

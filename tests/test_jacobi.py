"""Tournament-Jacobi batched small-matrix eigensolver (ops/jacobi.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conicip_tpu.ops.jacobi import eigh_jacobi, jacobi_rounds


@pytest.mark.parametrize("d", [2, 3, 7, 10, 16])
def test_rounds_cover_all_pairs(d):
    dp = d + (d % 2)
    seen = set()
    for perm in jacobi_rounds(d):
        pairs = {(min(perm[2 * i], perm[2 * i + 1]),
                  max(perm[2 * i], perm[2 * i + 1]))
                 for i in range(dp // 2)}
        assert len(pairs) == dp // 2  # disjoint
        seen |= pairs
    real = {(i, j) for i in range(d) for j in range(i + 1, d)}
    assert real <= seen  # every off-diagonal pair is rotated each sweep


@pytest.mark.parametrize("d", [1, 2, 3, 5, 10, 13])
def test_eigh_jacobi_matches_numpy(rng, d):
    A = rng.standard_normal((6, d, d))
    T = jnp.asarray(A + np.swapaxes(A, -1, -2))
    w, V = eigh_jacobi(T)
    w, V = np.asarray(w), np.asarray(V)
    Tn = np.asarray(T)
    for b in range(6):
        w_np = np.linalg.eigvalsh(Tn[b])
        np.testing.assert_allclose(w[b], w_np, rtol=1e-10, atol=1e-10)
        # V diagonalizes T and is orthonormal
        assert np.abs(V[b].T @ V[b] - np.eye(d)).max() < 1e-11
        assert np.abs(V[b] @ np.diag(w[b]) @ V[b].T - Tn[b]).max() < 1e-10


def test_eigh_jacobi_wide_spectrum(rng):
    d = 10
    Q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lam = 10.0 ** np.linspace(-3, 3, d)  # 6 decades
    T = jnp.asarray((Q * lam) @ Q.T)[None]
    w, _ = eigh_jacobi(T)
    np.testing.assert_allclose(np.asarray(w)[0], np.sort(lam), rtol=1e-9)


def test_eigh_jacobi_f32(rng):
    d = 10
    A = rng.standard_normal((4, d, d)).astype(np.float32)
    T = jnp.asarray(A + np.swapaxes(A, -1, -2))
    assert T.dtype == jnp.float32
    w, V = eigh_jacobi(T)
    assert w.dtype == jnp.float32
    for b in range(4):
        w_np = np.linalg.eigvalsh(np.asarray(T[b], np.float64))
        np.testing.assert_allclose(np.asarray(w[b]), w_np,
                                   rtol=2e-5, atol=2e-5)


def test_eigh_jacobi_vmap_jit(rng):
    d = 7
    A = rng.standard_normal((5, 3, d, d))
    T = jnp.asarray(A + np.swapaxes(A, -1, -2))
    w1, V1 = jax.jit(eigh_jacobi)(T)
    w2, V2 = jax.vmap(eigh_jacobi)(T)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(V1), np.asarray(V2), atol=1e-12)


def test_eigh_jacobi_degenerate(rng):
    # repeated eigenvalues: rotations must not blow up (t -> 0 guard)
    d = 6
    T = jnp.asarray(np.broadcast_to(2.0 * np.eye(d), (3, d, d)).copy())
    w, V = eigh_jacobi(T)
    np.testing.assert_allclose(np.asarray(w), 2.0, atol=1e-14)
    for b in range(3):
        assert np.abs(np.asarray(V[b]).T @ np.asarray(V[b])
                      - np.eye(d)).max() < 1e-12

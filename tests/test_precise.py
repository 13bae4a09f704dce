"""Ozaki-sliced precise mat-vec (conicip_tpu/ops/precise.py).

The module certifies interior-point residuals on hardware without f64
support, so its accuracy contract — error bounded relative to the operand
SCALE (rowmax(A)·max|x|), not the result — is what these tests pin down.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conicip_tpu.ops.precise import NBITS, NSLICES, PreciseMatvec

SCALE_TOL = 1e-10  # guaranteed ~2^-42 plus f64 combination rounding


def _err(A, x):
    @jax.jit
    def go(Aj, xj):
        return PreciseMatvec(Aj)(xj)

    y = np.asarray(go(jnp.asarray(A), jnp.asarray(x)))
    ref = A @ x
    scale = np.max(np.abs(A), axis=1) * max(np.max(np.abs(x)), 1e-300)
    scale = np.maximum(scale, 1e-300)
    return np.max(np.abs(y - ref) / scale)


def test_accuracy_plain(rng):
    A = rng.standard_normal((300, 200))
    x = rng.standard_normal(200)
    assert _err(A, x) < SCALE_TOL


def test_accuracy_wild_scales(rng):
    A = rng.standard_normal((200, 300)) * np.exp(8 * rng.standard_normal((200, 300)))
    x = rng.standard_normal(300) * np.exp(8 * rng.standard_normal(300))
    assert _err(A, x) < SCALE_TOL


def test_accuracy_chunked(rng):
    # c > 2048 exercises the cross-chunk f64 accumulation
    A = rng.standard_normal((64, 3000))
    x = rng.standard_normal(3000)
    assert _err(A, x) < SCALE_TOL


def test_cancellation(rng):
    # residual-style input: A @ x nearly cancels; absolute accuracy must
    # hold even though the result is ~1e-9 of the operand scale
    n = 400
    A = rng.standard_normal((n, n))
    xstar = rng.standard_normal(n)
    bvec = A @ xstar
    Ah = np.hstack([A, -bvec[:, None]])  # A x* - b == 0 exactly in f64
    xh = np.concatenate([xstar, [1.0]])
    y = np.asarray(jax.jit(lambda Aj, xj: PreciseMatvec(Aj)(xj))(
        jnp.asarray(Ah), jnp.asarray(xh)))
    # true residual is ~1e-13 (f64 rounding of bvec); precise product must
    # resolve it to the same order, not f32's ~1e-5
    assert np.max(np.abs(y)) < 1e-9


def test_zero_and_empty(rng):
    A = rng.standard_normal((5, 4))
    out = np.asarray(jax.jit(lambda Aj: PreciseMatvec(Aj)(jnp.zeros(4)))(
        jnp.asarray(A)))
    assert np.all(out == 0)
    out = np.asarray(
        jax.jit(lambda: PreciseMatvec(jnp.zeros((3, 0)))(jnp.zeros(0)))()
    )
    assert out.shape == (3,) and np.all(out == 0)


def test_zero_rows(rng):
    A = rng.standard_normal((6, 8))
    A[2] = 0.0
    x = rng.standard_normal(8)
    assert _err(A, x) < SCALE_TOL


def test_slice_counts():
    # the exactness argument needs |m| <= 2^(NBITS-1)+1 and chunk sums
    # below 2^24 — pin the constants the proof depends on
    assert NBITS == 7 and NSLICES >= 6


def test_vmap_batched(rng):
    As = rng.standard_normal((4, 50, 60))
    xs = rng.standard_normal((4, 60))

    @jax.jit
    @jax.vmap
    def go(Aj, xj):
        return PreciseMatvec(Aj)(xj)

    y = np.asarray(go(jnp.asarray(As), jnp.asarray(xs)))
    ref = np.einsum("bij,bj->bi", As, xs)
    assert np.max(np.abs(y - ref)) < 1e-9

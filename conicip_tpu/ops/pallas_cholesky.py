"""Blocked right-looking Cholesky as a Pallas TPU kernel (float32).

Replaces LAPACK ``potrf`` (the reference's per-iteration workhorse inside the
KKT refactorization, kktsolvers.jl / report.md:92) with an on-chip kernel:
the matrix lives in VMEM, panels of size B are factored with a small
column-loop on the VPU, and each trailing update ``A₂₂ -= L₂₁ L₂₁ᵀ`` is one
MXU matmul. For sizes that don't fit VMEM or off-TPU backends we fall back to
XLA's native cholesky.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["cholesky_f32"]

_BLOCK = 128
# Whole-matrix-in-VMEM strategy: n x n f32 plus scratch must fit in ~16 MB.
_MAX_VMEM_N = 1536


def _cholesky_kernel(a_ref, out_ref, n_blocks: int):
    import jax.experimental.pallas as pl  # noqa: F401  (kept local: TPU-only)

    B = _BLOCK

    def panel_factor(Ablk):
        """Unblocked Cholesky of a B x B tile via column sweeps on the VPU."""

        def col_body(j, A):
            # A[j, j] -> sqrt; column j below diag /= sqrt; trailing update.
            col = A[:, j]
            diag = jnp.sqrt(A[j, j])
            rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
            colj = jnp.where(rows > j, col / diag, 0.0)
            colj = colj.at[j].set(diag)
            A = A.at[:, j].set(colj)
            # rank-1 trailing update on the subdiagonal block
            mask = (rows[:, None] > j) & (rows[None, :] > j)
            upd = colj[:, None] * colj[None, :]
            A = A - jnp.where(mask, upd, 0.0)
            return A

        return jax.lax.fori_loop(0, B, col_body, Ablk)

    out_ref[:] = a_ref[:]

    def step(k, _):
        import jax.experimental.pallas as pl

        kB = k * B
        Akk = out_ref[pl.ds(kB, B), pl.ds(kB, B)]
        Lkk = panel_factor(Akk)
        out_ref[pl.ds(kB, B), pl.ds(kB, B)] = Lkk

        # L21 = A21 * Lkk^{-T}: solve via explicit small triangular inverse.
        # Invert the B x B lower-triangular Lkk with a column loop.
        def inv_body(j, Minv):
            ej = jnp.zeros((B,), jnp.float32).at[j].set(1.0)

            def fwd(i, x):
                rows = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
                xi = (ej[i] - jnp.sum(Lkk[i, :] * jnp.where(rows < i, x, 0.0))) / Lkk[i, i]
                return x.at[i].set(xi)

            col = jax.lax.fori_loop(0, B, fwd, jnp.zeros((B,), jnp.float32))
            return Minv.at[:, j].set(col)

        Linv = jax.lax.fori_loop(0, B, inv_body, jnp.zeros((B, B), jnp.float32))

        rem_blocks = n_blocks - k - 1

        def trailing(i, _):
            import jax.experimental.pallas as pl

            rB = kB + B + i * B
            A21 = out_ref[pl.ds(rB, B), pl.ds(kB, B)]
            L21 = jnp.dot(A21, Linv.T, preferred_element_type=jnp.float32)
            out_ref[pl.ds(rB, B), pl.ds(kB, B)] = L21

            def inner(jj, _):
                cB = kB + B + jj * B
                A2 = out_ref[pl.ds(rB, B), pl.ds(cB, B)]
                Lc = out_ref[pl.ds(cB, B), pl.ds(kB, B)]
                out_ref[pl.ds(rB, B), pl.ds(cB, B)] = A2 - jnp.dot(
                    L21, Lc.T, preferred_element_type=jnp.float32
                )
                return 0

            # only columns <= current row block (lower triangle)
            jax.lax.fori_loop(0, i + 1, inner, 0)
            return 0

        jax.lax.fori_loop(0, rem_blocks, trailing, 0)
        return 0

    jax.lax.fori_loop(0, n_blocks, step, 0)

    # zero out the strict upper triangle
    rows = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = jnp.where(rows >= cols, out_ref[:], 0.0)


@functools.partial(jax.jit, static_argnums=())
def _cholesky_pallas(M: jnp.ndarray) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = M.shape[0]
    n_blocks = n // _BLOCK
    kernel = functools.partial(_cholesky_kernel, n_blocks=n_blocks)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(M)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def cholesky_f32(M: jnp.ndarray) -> jnp.ndarray:
    n = M.shape[0]
    if _on_tpu() and n % _BLOCK == 0 and n <= _MAX_VMEM_N:
        return _cholesky_pallas(M)
    return jnp.linalg.cholesky(M)

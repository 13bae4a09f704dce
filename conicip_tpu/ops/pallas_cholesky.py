"""Blocked Cholesky as a Pallas TPU kernel (float32).

Replaces LAPACK ``potrf`` — the reference's per-iteration KKT workhorse
(~72% of its profile, benchmark/report.md:92) — with a VMEM-resident kernel:

- the whole SPD matrix lives in VMEM (n ≤ ~1400 f32),
- each 128-wide panel is factored by a column sweep carried as a value,
- the panel's sub-diagonal block solve is a 128-step forward substitution
  done *full-height* (one (n,128)×(128,) contraction per step),
- the trailing update ``A₂₂ -= L₂₁L₂₁ᵀ`` is ONE full-size MXU matmul with
  row masking (trades ≤2x FLOPs for zero data movement and no dynamic
  shapes — on the MXU this is cheaper than orchestrating block tiles).

TPU lowering constraints shaped this kernel (learned the hard way):
- dynamic lane-dimension offsets must be 128-aligned → all per-column /
  per-row access is done via ONE-HOT contractions and masks, never
  ``x[:, j]`` with a traced j,
- panel window offsets carry a ``pl.multiple_of(·, 128)`` hint,
- everything stays int32/float32 — int64→f32 casts (from x64 mode
  leaking in) send Mosaic's convert-lowering into infinite recursion.

Off-TPU, for unaligned sizes, or for matrices too big for VMEM we fall back
to XLA's native cholesky.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["cholesky_f32", "pallas_cholesky_available"]

_BLOCK = 128
# n*n*4B*2 buffers + scratch must fit VMEM; v5e enforces a 16.0MB scoped
# limit and n=1408 was measured to OOM it (19.95M requested), so cap at 1280.
_MAX_VMEM_N = 1280


def _kernel(a_ref, out_ref, *, n: int, n_blocks: int, unroll: int = 1):
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    B = _BLOCK
    # Mosaic layout rules dislike (1,B)/(B,) intermediates, so everything
    # below is strictly 2D: one-hot "columns" are masked (B,B)/(n,B)
    # matrices and outer products are MXU matmuls.
    rows_n2 = jax.lax.broadcasted_iota(jnp.int32, (n, B), 0)  # (n,B)
    ir = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    icn = jax.lax.broadcasted_iota(jnp.int32, (n, B), 1)

    out_ref[...] = a_ref[...]

    def step(k, _):
        kB = pl.multiple_of(k * B, B)
        D = out_ref[pl.ds(kB, B), pl.ds(kB, B)]  # (B,B) diagonal block

        # ── 1. unblocked Cholesky of D, masked-column sweep ──
        def col(j, A):
            # static (Python-int) bounds enable unroll; under x64 the
            # induction variable is then int64 — cast to int32 at entry
            # (Mosaic's int64 lowering is the known hazard, module doc)
            j = jax.lax.convert_element_type(j, jnp.int32)
            colmask = (ic == j).astype(f32)  # (B,B), col j ones
            diagj = ((ir == j) & (ic == j)).astype(f32)
            ajj = jnp.sum(A * diagj)
            sq = jnp.sqrt(ajj)
            below = (ir > j).astype(f32)
            # CJ: zero except column j = the new Cholesky column c_j
            CJ = A * colmask * (1.0 / sq) * below + sq * diagj
            outer = jnp.dot(CJ, CJ.T, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)  # c_j c_jᵀ
            A = A - outer * (below * (ic > j).astype(f32))
            return A * (1.0 - colmask) + CJ

        Lkk = jax.lax.fori_loop(0, B, col, D, unroll=unroll)

        # ── 2. full-height panel solve X = C · Lkk⁻ᵀ (forward subst).
        #       Column j update: x_j = (C_j − X_{<j} Lkk[j,<j]ᵀ)/Lkk[j,j],
        #       expressed as one (n,B)x(B,B) MXU matmul against a matrix
        #       whose only nonzero column j is (e_j − masked Lkk row j).
        C = out_ref[:, pl.ds(kB, B)]  # (n, B)

        def sub(j, X):
            j = jax.lax.convert_element_type(j, jnp.int32)
            colmaskB = (ic == j).astype(f32)
            colmaskN = (icn == j).astype(f32)
            diagj = ((ir == j) & (ic == j)).astype(f32)
            ljj = jnp.sum(Lkk * diagj)
            # column j of W = e_j − Lkk[j,:i<j]ᵀ   (as a (B,B) matrix)
            W = diagj - (Lkk.T * colmaskB) * (ir < j).astype(f32)
            Xupd = jnp.dot(X, W, preferred_element_type=f32,
                           precision=jax.lax.Precision.HIGHEST)  # col j = C_j − Σ
            return X * (1.0 - colmaskN) + Xupd * (1.0 / ljj) * colmaskN

        X = jax.lax.fori_loop(0, B, sub, C, unroll=unroll)
        X = X * (rows_n2 >= kB).astype(f32)
        out_ref[:, pl.ds(kB, B)] = X

        # ── 3. trailing update: one masked MXU matmul (touches only
        #       rows/cols ≥ kB+B by construction) ──
        Xlow = X * (rows_n2 >= kB + B).astype(f32)
        out_ref[...] = out_ref[...] - jnp.dot(
            Xlow, Xlow.T, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.int32(0)

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_blocks), step, jnp.int32(0),
                      unroll=False)

    # zero the strict upper triangle
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[...] = out_ref[...] * (r >= c).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("unroll",))
def _cholesky_pallas(M: jnp.ndarray, unroll: int = 8) -> jnp.ndarray:
    # unroll=8 amortizes Mosaic's per-step loop overhead (~1 µs) across
    # the 2n sequential column steps without blowing up compile time.
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = M.shape[0]
    kernel = functools.partial(_kernel, n=n, n_blocks=n // _BLOCK,
                               unroll=unroll)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=int(n**3 / 3 + 2 * n * n * _BLOCK * (n // _BLOCK)),
            bytes_accessed=int(2 * n * n * 4),
            transcendentals=n,
        ),
    )(M)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def pallas_cholesky_available(n: int, dtype) -> bool:
    return (
        _on_tpu()
        and dtype == jnp.float32
        and n % _BLOCK == 0
        and _BLOCK <= n <= _MAX_VMEM_N
    )


def cholesky_f32(M: jnp.ndarray) -> jnp.ndarray:
    n = M.shape[0]
    if M.ndim == 2 and pallas_cholesky_available(n, M.dtype):
        return _cholesky_pallas(M)
    return jnp.linalg.cholesky(M)

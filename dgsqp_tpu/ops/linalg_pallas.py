"""Pallas TPU kernels for batched small-matrix factorizations (batch-in-lanes layout).

The QP kernel's hot linear algebra is thousands of INDEPENDENT small (n ~ 100) Cholesky
factorizations and triangular solves per SQP round.  XLA's batched ``cholesky`` /
``triangular_solve`` on TPU run each factorization as a long chain of tiny sequential ops
(~5 ms for [256, 100, 100] f32 — latency-bound, <1% of VPU peak).  These kernels transpose
the problem: the BATCH dimension is laid out over the 128 vector lanes, so every scalar
step of the textbook blocked algorithm becomes one wide VPU instruction processing 128
games at once.  The matrix recursion is fully unrolled over static 8-wide column blocks
(sublane-aligned), giving ~n^3/24 vector instructions per 128-game tile instead of n^3/3
scalar-latency steps per game.

Replaces (TPU-native) the factorization work the reference delegates to OSQP's internal
LDL' and LAPACK (``/root/reference/DGSQP/solvers/DGSQP.py:232-266`` QP backends,
``ALGAMES.py:583`` lapacklu).  CPU fallback uses stock jnp — these kernels are TPU-only.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_BLK = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chol_kernel_body(a_ref, nb: int, n_pad: int):
    """In-place blocked right-looking Cholesky on an (n_pad, n_pad, LANES) ref."""
    for kb in range(nb):
        k0 = kb * _BLK
        rem = n_pad - k0 - _BLK
        # --- factor the 8x8 diagonal block (scalar algorithm on 128-wide vectors)
        for j in range(_BLK):
            inv = jax.lax.rsqrt(a_ref[k0 + j, k0 + j, :])
            a_ref[k0 + j, k0 + j, :] = a_ref[k0 + j, k0 + j, :] * inv
            if j < _BLK - 1:
                col = a_ref[k0 + j + 1:k0 + _BLK, k0 + j, :] * inv[None, :]
                a_ref[k0 + j + 1:k0 + _BLK, k0 + j, :] = col
                a_ref[k0 + j + 1:k0 + _BLK, k0 + j + 1:k0 + _BLK, :] = (
                    a_ref[k0 + j + 1:k0 + _BLK, k0 + j + 1:k0 + _BLK, :]
                    - col[:, None, :] * col[None, :, :])
        if rem == 0:
            continue
        # --- panel solve: P <- P L11^{-T}, column by column (forward substitution)
        for j in range(_BLK):
            acc = a_ref[k0 + _BLK:, k0 + j, :]
            for r in range(j):
                acc = acc - a_ref[k0 + _BLK:, k0 + r, :] * a_ref[k0 + j, k0 + r, :][None, :]
            inv = pl.reciprocal(a_ref[k0 + j, k0 + j, :], approx=False)
            a_ref[k0 + _BLK:, k0 + j, :] = acc * inv[None, :]
        # --- trailing update: A22 <- A22 - P P^T (rank-8, batched elementwise)
        for r in range(_BLK):
            colr = a_ref[k0 + _BLK:, k0 + r, :]
            a_ref[k0 + _BLK:, k0 + _BLK:, :] = (
                a_ref[k0 + _BLK:, k0 + _BLK:, :]
                - colr[:, None, :] * colr[None, :, :])


def _make_chol_call(n_pad: int, dtype):
    nb = n_pad // _BLK

    # The (n_pad, n_pad, 128) tile is ~5.5 MB; auto-pipelined in+out blocks would
    # double-buffer to >21 MB of VMEM.  Instead the arrays stay in HBM and each grid
    # step DMAs its tile through ONE VMEM scratch, factorizes in place, and DMAs back.
    def kernel(a_hbm, out_hbm, scratch, sem_in, sem_out):
        b = pl.program_id(0)
        dma_in = pltpu.make_async_copy(
            a_hbm.at[:, :, pl.ds(b * _LANES, _LANES)], scratch, sem_in)
        dma_in.start()
        dma_in.wait()
        _chol_kernel_body(scratch, nb, n_pad)
        dma_out = pltpu.make_async_copy(
            scratch, out_hbm.at[:, :, pl.ds(b * _LANES, _LANES)], sem_out)
        dma_out.start()
        dma_out.wait()

    def call(a_t):  # (n_pad, n_pad, B_pad)
        B_pad = a_t.shape[-1]
        grid = (B_pad // _LANES,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct(a_t.shape, dtype),
            scratch_shapes=[pltpu.VMEM((n_pad, n_pad, _LANES), dtype),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
        )(a_t)

    return call


@partial(jax.jit, static_argnames=())
def chol_batch(A):
    """Batched Cholesky: A (B, n, n) SPD -> lower L with A = L L'.

    Lanes-batched Pallas kernel on TPU; identical semantics to
    ``jnp.linalg.cholesky`` (upper triangle of the result is zero).
    """
    B, n, _ = A.shape
    dtype = A.dtype
    n_pad = _round_up(n, _BLK)
    B_pad = _round_up(max(B, 1), _LANES)
    a_t = jnp.transpose(A, (1, 2, 0))                      # (n, n, B)
    a_t = jnp.pad(a_t, ((0, n_pad - n), (0, n_pad - n), (0, B_pad - B)))
    # identity diagonal on padded rows/cols keeps rsqrt well-defined
    if n_pad > n:
        pad_idx = jnp.arange(n, n_pad)
        a_t = a_t.at[pad_idx, pad_idx, :].set(1.0)
    L_t = _make_chol_call(n_pad, dtype)(a_t)
    L = jnp.transpose(L_t[:n, :n, :B], (2, 0, 1))
    return jnp.tril(L)


def _tri_solve_kernel_body(l_ref, x_ref, nb: int, n_pad: int, lower: bool):
    """In-place substitution on x_ref (n_pad, k, LANES) with l_ref (n_pad, n_pad, LANES).

    lower=True solves L y = b (forward); lower=False solves L' x = y (backward,
    reading the lower-triangular factor transposed).
    """
    blocks = range(nb) if lower else range(nb - 1, -1, -1)
    for kb in blocks:
        k0 = kb * _BLK
        # solve the 8x8 diagonal block
        js = range(_BLK) if lower else range(_BLK - 1, -1, -1)
        for j in js:
            acc = x_ref[k0 + j, :, :]
            if lower:
                for r in range(j):
                    acc = acc - l_ref[k0 + j, k0 + r, :][None, :] * x_ref[k0 + r, :, :]
            else:
                for r in range(j + 1, _BLK):
                    acc = acc - l_ref[k0 + r, k0 + j, :][None, :] * x_ref[k0 + r, :, :]
            inv = pl.reciprocal(l_ref[k0 + j, k0 + j, :], approx=False)
            x_ref[k0 + j, :, :] = acc * inv[None, :]
        # propagate into the remaining rows
        if lower and k0 + _BLK < n_pad:
            for r in range(_BLK):
                x_ref[k0 + _BLK:, :, :] = (
                    x_ref[k0 + _BLK:, :, :]
                    - l_ref[k0 + _BLK:, k0 + r, :][:, None, :] * x_ref[k0 + r, :, :][None, :, :])
        if (not lower) and k0 > 0:
            for r in range(_BLK):
                x_ref[:k0, :, :] = (
                    x_ref[:k0, :, :]
                    - l_ref[k0 + r, :k0, :][:, None, :]
                    * x_ref[k0 + r, :, :][None, :, :])


def _make_cho_solve_call(n_pad: int, k: int, dtype):
    nb = n_pad // _BLK

    # Manual DMA through single VMEM scratches (see _make_chol_call): the L tile alone is
    # ~5.5 MB and auto-pipelined double buffering would overflow VMEM for multi-rhs solves.
    def kernel(l_hbm, b_hbm, out_hbm, l_s, x_s, sem_l, sem_b, sem_out):
        bidx = pl.program_id(0)
        dma_l = pltpu.make_async_copy(
            l_hbm.at[:, :, pl.ds(bidx * _LANES, _LANES)], l_s, sem_l)
        dma_b = pltpu.make_async_copy(
            b_hbm.at[:, :, pl.ds(bidx * _LANES, _LANES)], x_s, sem_b)
        dma_l.start()
        dma_b.start()
        dma_l.wait()
        dma_b.wait()
        _tri_solve_kernel_body(l_s, x_s, nb, n_pad, lower=True)
        _tri_solve_kernel_body(l_s, x_s, nb, n_pad, lower=False)
        dma_out = pltpu.make_async_copy(
            x_s, out_hbm.at[:, :, pl.ds(bidx * _LANES, _LANES)], sem_out)
        dma_out.start()
        dma_out.wait()

    def call(l_t, b_t):
        B_pad = l_t.shape[-1]
        grid = (B_pad // _LANES,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((n_pad, k, B_pad), dtype),
            scratch_shapes=[pltpu.VMEM((n_pad, n_pad, _LANES), dtype),
                            pltpu.VMEM((n_pad, k, _LANES), dtype),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(()),
                            pltpu.SemaphoreType.DMA(())],
        )(l_t, b_t)

    return call


@jax.jit
def cho_solve_batch(L, b):
    """Batched A x = b with A = L L': L (B, n, n) lower, b (B, n) or (B, n, k)."""
    squeeze = b.ndim == 2
    if squeeze:
        b = b[..., None]
    B, n, k = b.shape
    dtype = b.dtype
    n_pad = _round_up(n, _BLK)
    B_pad = _round_up(max(B, 1), _LANES)
    l_t = jnp.transpose(L, (1, 2, 0))
    l_t = jnp.pad(l_t, ((0, n_pad - n), (0, n_pad - n), (0, B_pad - B)))
    if n_pad > n:
        pad_idx = jnp.arange(n, n_pad)
        l_t = l_t.at[pad_idx, pad_idx, :].set(1.0)
    b_t = jnp.transpose(b, (1, 2, 0))
    b_t = jnp.pad(b_t, ((0, n_pad - n), (0, 0), (0, B_pad - B)))
    x_t = _make_cho_solve_call(n_pad, k, dtype)(l_t, b_t)
    x = jnp.transpose(x_t[:n, :, :B], (2, 0, 1))
    return x[..., 0] if squeeze else x


def use_pallas() -> bool:
    """Kernels apply on TPU backends only (CPU tests use the stock jnp path)."""
    try:
        return jax.default_backend() not in ('cpu',)
    except Exception:
        return False

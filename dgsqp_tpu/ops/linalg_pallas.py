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
    """In-place blocked right-looking Cholesky on an (n_pad, n_pad, LANES) ref.

    Every block is pulled into registers ONCE, fully updated there, and written back
    ONCE — the rank-8 panel/trailing updates are value-space loops, not repeated
    read-modify-writes through the VMEM ref (which Mosaic materializes as full block
    loads/stores per pass).
    """
    for kb in range(nb):
        k0 = kb * _BLK
        # --- factor the 8x8 diagonal block (scalar algorithm on 128-wide vectors);
        # everything is 8-row 2D/3D tiles so the register footprint stays bounded
        # (whole-panel values at n~100 would need >1000 vregs and crash Mosaic)
        lcols = []
        for j in range(_BLK):
            col = a_ref[k0:k0 + _BLK, k0 + j, :]
            for r in range(j):
                col = col - lcols[r] * lcols[r][j:j + 1, :]
            inv = jax.lax.rsqrt(col[j:j + 1, :])
            # zero above the diagonal, scale at/below it
            mask = (jax.lax.broadcasted_iota(jnp.int32, (_BLK, 1), 0) >= j)
            col = jnp.where(mask, col * inv, 0.0)
            lcols.append(col)
            a_ref[k0:k0 + _BLK, k0 + j, :] = col
        # --- panel solve in 8-row strips: each strip loads its 8 columns, substitutes,
        # and stores back (value footprint: 8 x (8, LANES))
        for tb in range(kb + 1, nb):
            t0 = tb * _BLK
            scols = []
            for j in range(_BLK):
                acc = a_ref[t0:t0 + _BLK, k0 + j, :]
                for r in range(j):
                    acc = acc - scols[r] * lcols[r][j:j + 1, :]
                inv = pl.reciprocal(lcols[j][j:j + 1, :], approx=False)
                scols.append(acc * inv)
                a_ref[t0:t0 + _BLK, k0 + j, :] = scols[j]
        # --- trailing update: per 8x8 block (lower triangle only),
        # A[t, c] -= sum_r P[t, r] P[c, r]
        for tb in range(kb + 1, nb):
            t0 = tb * _BLK
            ptcols = [a_ref[t0:t0 + _BLK, k0 + r, :] for r in range(_BLK)]
            for cb in range(kb + 1, tb + 1):
                c0 = cb * _BLK
                blk = a_ref[t0:t0 + _BLK, c0:c0 + _BLK, :]
                if cb == tb:
                    pccols = ptcols
                else:
                    pccols = [a_ref[c0:c0 + _BLK, k0 + r, :] for r in range(_BLK)]
                for r in range(_BLK):
                    blk = blk - ptcols[r][:, None, :] * pccols[r][None, :, :]
                a_ref[t0:t0 + _BLK, c0:c0 + _BLK, :] = blk


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
    reading the lower-triangular factor transposed).  The RHS lives entirely in
    registers as per-block values; each L block is loaded exactly once.
    """
    # register-resident RHS: one (_BLK, k, LANES) value per 8-row block; L is read as 2D
    # column slices (static slicing only — no gathers on 3D values)
    xb = [x_ref[i * _BLK:(i + 1) * _BLK, :, :] for i in range(nb)]
    blocks = range(nb) if lower else range(nb - 1, -1, -1)
    for kb in blocks:
        k0 = kb * _BLK
        lcols = [l_ref[k0:k0 + _BLK, k0 + r, :] for r in range(_BLK)]  # (_BLK, LANES)
        rows = [xb[kb][j:j + 1, :, :] for j in range(_BLK)]            # (1, k, LANES)
        # NOTE: slice+newaxis on 2D values miscompiles in Mosaic (gather shape
        # mismatch); reshape after slicing instead.
        el = lambda v2d, i: jnp.reshape(v2d[i:i + 1, :], (1, 1, _LANES))
        js = range(_BLK) if lower else range(_BLK - 1, -1, -1)
        for j in js:
            acc = rows[j]
            if lower:
                for r in range(j):
                    acc = acc - el(lcols[r], j) * rows[r]
            else:
                for r in range(j + 1, _BLK):
                    acc = acc - el(lcols[j], r) * rows[r]
            inv = pl.reciprocal(el(lcols[j], j), approx=False)
            rows[j] = acc * inv
        xb[kb] = jnp.concatenate(rows, axis=0)
        # propagate into the not-yet-solved blocks (one L column slice per (r, block))
        targets = range(kb + 1, nb) if lower else range(kb)
        for tb in targets:
            t0 = tb * _BLK
            acc = xb[tb]
            for r in range(_BLK):
                lc = (l_ref[t0:t0 + _BLK, k0 + r, :] if lower
                      else l_ref[k0 + r, t0:t0 + _BLK, :])             # (_BLK, LANES)
                acc = acc - lc[:, None, :] * rows[r]
            xb[tb] = acc
    for i in range(nb):
        x_ref[i * _BLK:(i + 1) * _BLK, :, :] = xb[i]


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


# VMEM scratch budget per grid step (v5e VMEM is ~16 MB/core; leave headroom for
# Mosaic's own staging).  The L tile costs n_pad^2 * LANES * itemsize; the RHS tile
# n_pad * k * LANES * itemsize.  Problems whose L tile alone exceeds the budget fall
# back to stock XLA (first hit: the approximate-game QP, n = 150, k = 96 -> 19.3 MB).
_VMEM_BUDGET = 13 * 1024 * 1024


def _scratch_bytes(n_pad: int, k: int, dtype) -> int:
    it = jnp.dtype(dtype).itemsize
    return (n_pad * n_pad + n_pad * k) * _LANES * it


@jax.jit
def cho_solve_batch(L, b):
    """Batched A x = b with A = L L': L (B, n, n) lower, b (B, n) or (B, n, k).

    Multi-RHS solves are chunked along k so the (L tile + RHS tile) VMEM scratch
    stays under ``_VMEM_BUDGET``; L is DMA'd once per chunk (still far cheaper than
    the stock XLA path at these shapes).
    """
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
    it = jnp.dtype(dtype).itemsize
    k_fit = (_VMEM_BUDGET // (_LANES * it) - n_pad * n_pad) // n_pad
    k_max = max(_BLK, (int(k_fit) // _BLK) * _BLK)
    if k <= k_max:
        x_t = _make_cho_solve_call(n_pad, k, dtype)(l_t, b_t)
    else:
        parts = [_make_cho_solve_call(n_pad, min(k_max, k - s), dtype)(
                     l_t, b_t[:, s:s + k_max, :])
                 for s in range(0, k, k_max)]
        x_t = jnp.concatenate(parts, axis=1)
    x = jnp.transpose(x_t[:n, :, :B], (2, 0, 1))
    return x[..., 0] if squeeze else x


def use_pallas() -> bool:
    """Kernels apply on TPU backends only (CPU tests use the stock jnp path).

    'axon' is the TPU-tunnel PJRT plugin (canonicalizes to tpu lowering rules);
    any other backend — cpu, gpu/cuda/rocm — must take the stock jnp path, since
    the pltpu primitives here cannot lower there.
    """
    try:
        return jax.default_backend() in ('tpu', 'axon')
    except Exception:
        return False


# ----------------------------------------------------------------- custom_vmap wrappers
# Per-instance linear algebra that callers write ONCE and vmap: single instances use
# stock XLA; under vmap on TPU the whole batch is dispatched to the lanes-batched
# kernels (measured 20-30x on cholesky, 3x on cho_solve vs XLA's batched ops at
# [256..1024, 100, 100] f32).

@jax.custom_batching.custom_vmap
def cholesky(A):
    """Lower Cholesky of one SPD matrix; batch-dispatches to :func:`chol_batch`."""
    return jnp.linalg.cholesky(A)


@cholesky.def_vmap
def _cholesky_vmap(axis_size, in_batched, A):
    (a_b,) = in_batched
    if a_b and use_pallas() and A.ndim == 3 and \
            _scratch_bytes(_round_up(A.shape[-1], _BLK), 0, A.dtype) <= _VMEM_BUDGET:
        return chol_batch(A), True
    return jnp.linalg.cholesky(A), a_b


@jax.custom_batching.custom_vmap
def cho_solve(L, b):
    """Solve (L L') x = b for one instance; batch-dispatches to :func:`cho_solve_batch`."""
    return jax.scipy.linalg.cho_solve((L, True), b)


@cho_solve.def_vmap
def _cho_solve_vmap(axis_size, in_batched, L, b):
    l_b, b_b = in_batched
    if l_b and b_b and use_pallas() and L.ndim == 3 and b.ndim in (2, 3) and \
            _scratch_bytes(_round_up(L.shape[-1], _BLK), _BLK, L.dtype) <= _VMEM_BUDGET:
        return cho_solve_batch(L, b), True
    if not l_b:
        L = jnp.broadcast_to(L, (axis_size,) + L.shape)
    if not b_b:
        b = jnp.broadcast_to(b, (axis_size,) + b.shape)
    if use_pallas() and L.ndim == 3 and b.ndim in (2, 3):
        return cho_solve_batch(L, b), True
    return jax.scipy.linalg.cho_solve((L, True), b), True

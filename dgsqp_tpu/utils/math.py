"""Small numeric helpers shared across the framework (all jit/vmap-safe)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_abs(x, eps: float = 1e-3):
    """Smooth positive approximation of ``|x|`` (reference ``dynamics_models.py:221-226``)."""
    return jnp.sqrt(x * x + eps * eps)


def hard_abs(x):
    """Exact ``|x|`` (reference ``ca_abs``, ``dynamics_models.py:228-234``)."""
    return jnp.abs(x)


def smooth_sign(x, eps: float = 1e-3):
    """Smooth approximation of ``sign(x)`` (reference ``dynamics_models.py:236-238``)."""
    return x / smooth_abs(x, eps)


def wrap_angle(theta):
    """Wrap an angle to (-pi, pi].  Vectorized equivalent of the reference's scalar helper
    (``tracks/radius_arclength_track.py:809-817``)."""
    return jnp.where(theta < -jnp.pi, theta + 2 * jnp.pi,
                     jnp.where(theta > jnp.pi, theta - 2 * jnp.pi, theta))


def nearest_pd(A, min_eig: float = 1e-10):
    """Project a square matrix onto the PSD cone by eigenvalue clipping.

    Mirrors the reference's ``_nearestPD`` convexification (``solvers/DGSQP.py:1290-1296``):
    symmetrize, eigendecompose, clip negative eigenvalues to ``min_eig``, re-symmetrize.
    Batched cleanly under ``vmap`` (``jnp.linalg.eigh`` batches on TPU).
    """
    B = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    s, U = jnp.linalg.eigh(B)
    s = jnp.where(s < 0, min_eig, s)
    C = (U * s[..., None, :]) @ jnp.swapaxes(U, -1, -2)
    return 0.5 * (C + jnp.swapaxes(C, -1, -2))


def regularized_convexification(A, reg: float, min_eig: float = 1e-10,
                                method: str = 'eigh', ns_iters: int = 14,
                                ns_safety: float = 1e-3, ns_equilibrate: bool = False):
    """``nearest_pd(A) + reg*I`` — the exact Hessian treatment the reference's QP subproblem
    applies before each solve (``solvers/DGSQP.py:232-239``).

    ``method='ns'`` uses the Newton-Schulz projection (:func:`nearest_pd_ns`) instead of
    ``eigh`` — matmul-only, so it runs on the MXU instead of the latency-bound batched
    QR-algorithm eigendecomposition.
    """
    n = A.shape[-1]
    if method == 'none':
        # indefinite path: symmetrize + regularize only, NO PSD projection — the QP
        # subproblem keeps the exact (possibly indefinite) game Hessian, the analog of
        # the reference handing the QP to IPOPT/CPLEX OptimalityTarget=2
        # (``DGSQP.py:204-228``); requires the indefinite QP kernel.
        Q = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    else:
        Q = nearest_pd_ns(A, iters=ns_iters, safety=ns_safety,
                          equilibrate=ns_equilibrate) if method == 'ns' \
            else nearest_pd(A, min_eig)
    if reg > 0:
        Q = Q + reg * jnp.eye(n, dtype=A.dtype)
    return Q


def nearest_pd_ns(A, iters: int = 14, safety: float = 1e-3, equilibrate: bool = False):
    """PSD projection via a Newton-Schulz matrix sign/sqrt iteration — matmul only.

    For symmetric B, ``clip(eigvals, 0)`` equals ``(B + |B|)/2`` with ``|B| = sqrtm(B^2)``.
    The coupled Newton-Schulz iteration computes ``|B|`` with ~2 matmuls per step, which
    batches onto the MXU, unlike ``jnp.linalg.eigh`` whose QR algorithm is a long chain of
    small sequential ops on TPU.  Accuracy is ~1e-3 relative in f32, so a small diagonal
    safety shift keeps the result factorizable; this is an approximation knob for the hot
    path, not a semantic replacement for the reference's exact eigenvalue clipping.

    ``equilibrate`` applies a symmetric Jacobi scaling ``B' = D B D`` (D from the
    diagonal / row maxima) before the sign iteration and undoes it after.  Congruence
    preserves the PSD cone, so the result is still a valid convexification, but the
    scaled spectrum is O(1) per channel: without it, a Hessian with mixed cost scales
    (the MPCC game carries q_l=1e3 quadratics next to O(1) input costs) has its small
    eigenvalues crushed to ~1e-3 of the Frobenius norm, below what the polynomial
    iteration resolves, and the safety shift turns into an O(1) phantom regularizer
    (measured: the approximate game needed 42-126 SQP iterations vs 12-15 with eigh;
    with equilibration NS matches eigh).
    """
    n = A.shape[-1]
    B = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    eye = jnp.eye(n, dtype=A.dtype)
    if equilibrate:
        diag = jnp.abs(jnp.diagonal(B, axis1=-2, axis2=-1))
        rowmax = jnp.max(jnp.abs(B), axis=-1)
        # rows with a negligible diagonal but live off-diagonals (pure bilinear
        # game-coupling terms) fall back to the row-inf norm
        d = jnp.sqrt(jnp.maximum(jnp.maximum(diag, 1e-2 * rowmax), 1e-8))
        dinv = 1.0 / d
        B = B * dinv[..., :, None] * dinv[..., None, :]
    # scale so eigenvalues lie in [-1, 1] (Frobenius bound)
    nrm = jnp.sqrt(jnp.sum(B * B, axis=(-2, -1), keepdims=True)) + 1e-30
    Y = B / nrm

    # Newton-Schulz for the matrix sign function: S_{k+1} = 1.5 S_k - 0.5 S_k^3
    S = Y
    for _ in range(iters):
        S = 1.5 * S - 0.5 * (S @ S) @ S
    # |Y| = sign(Y) @ Y for symmetric Y (sign shares eigenvectors)
    absY = S @ Y
    P = 0.5 * (Y + absY) * nrm
    P = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    # The sign-iteration error leaves residual negative eigenvalues of order
    # ~safety * ||A||_F (measured ~2e-4 relative on chicane game Hessians); the shift must
    # dominate them or downstream Cholesky factorizations break.
    shift = safety * jnp.sqrt(jnp.sum(P * P, axis=(-2, -1), keepdims=True))
    P = P + shift * eye
    if equilibrate:
        P = P * d[..., :, None] * d[..., None, :]
    return P

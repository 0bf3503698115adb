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


def regularized_convexification(A, reg: float, min_eig: float = 1e-10):
    """``nearest_pd(A) + reg*I`` — the exact Hessian treatment the reference's QP subproblem
    applies before each solve (``solvers/DGSQP.py:232-239``)."""
    n = A.shape[-1]
    Q = nearest_pd(A, min_eig)
    if reg > 0:
        Q = Q + reg * jnp.eye(n, dtype=A.dtype)
    return Q

"""Stage-structured OCP-QP solver: interior point with Riccati (block-banded) KKT solves.

The structured alternative to the dense kernels in :mod:`dgsqp_tpu.solvers.qp` — the role
HPIPM plays for the reference's LTV-MPC (``/root/reference/DGSQP/solvers/CA_LTV_MPC.py:563-634``
builds dim/A/B/stage-cost arrays for HPIPM's block-banded solver).  Solves

    min  sum_k 1/2 [x_k; v_k]' [[Qx_k, S_k'], [S_k, Rv_k]] [x_k; v_k] + qx_k'x_k + rv_k'v_k
    s.t. x_{k+1} = A_k x_k + B_k v_k + g_k,      k = 0..N-1        (x_0 given)
         D_k x_k + E_k v_k <= b_k,               k = 0..N          (E_N ignored)

with a primal-dual interior point whose Newton systems are eliminated by a BACKWARD
RICCATI RECURSION (one ``lax.scan``) instead of a dense factorization: per IPM iteration
O(N (nx+nv)^3) work and O(N) memory, versus O((N nz)^3) for the dense eq-QP.  The barrier
terms of the stage-local inequalities only thicken the per-stage cost blocks, so the
block-tridiagonal structure is exact, not approximate.

Everything is fixed-shape and vmap/jit-friendly (batched Monte-Carlo MPC fits the same
execution model as the game solvers).  TPU notes: the per-stage factorizations are small
dense Cholesky factorizations batched over the scan; under vmap the batch dimension is the
wide axis exactly as in the dense kernels.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class OCPQPSolution(NamedTuple):
    x: jnp.ndarray        # (N+1, nx) states
    v: jnp.ndarray        # (N, nv) inputs
    lam: jnp.ndarray      # (N+1, mi) inequality duals >= 0
    ok: jnp.ndarray
    iters: jnp.ndarray
    res: jnp.ndarray


def _lqr_solve(A, B, g, Qx, S, Rv, qx, rv, x0):
    """Equality-constrained LQR via backward Riccati scan + forward rollout.

    Shapes: A (N,nx,nx), B (N,nx,nv), g (N,nx), Qx (N+1,nx,nx), S (N,nv,nx),
    Rv (N,nv,nv), qx (N+1,nx), rv (N,nv).  Returns (x (N+1,nx), v (N,nv)).
    """
    nx = A.shape[-1]

    def backward(carry, blk):
        P, p = carry
        A_k, B_k, g_k, Qx_k, S_k, Rv_k, qx_k, rv_k = blk
        PA = P @ A_k
        PB = P @ B_k
        H_vv = Rv_k + B_k.T @ PB
        H_vx = S_k + B_k.T @ PA
        h_v = rv_k + B_k.T @ (P @ g_k + p)
        L = jnp.linalg.cholesky(H_vv)
        K = -jax.scipy.linalg.cho_solve((L, True), H_vx)     # v = K x + kff
        kff = -jax.scipy.linalg.cho_solve((L, True), h_v)
        P_new = Qx_k + A_k.T @ PA + H_vx.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qx_k + A_k.T @ (P @ g_k + p) + H_vx.T @ kff
        return (P_new, p_new), (K, kff)

    init = (Qx[-1], qx[-1])
    blks = (A, B, g, Qx[:-1], S, Rv, qx[:-1], rv)
    # scan runs k = N-1 .. 0 (reverse)
    _, (Ks, kffs) = jax.lax.scan(backward, init, blks, reverse=True)

    def forward(x, blk):
        A_k, B_k, g_k, K_k, kff_k = blk
        v_k = K_k @ x + kff_k
        x_n = A_k @ x + B_k @ v_k + g_k
        return x_n, (x_n, v_k)

    _, (xs, vs) = jax.lax.scan(forward, x0, (A, B, g, Ks, kffs))
    x_all = jnp.concatenate([x0[None], xs], axis=0)
    return x_all, vs


@partial(jax.jit, static_argnames=('max_iters',))
def solve_ocp_qp(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0,
                 tol: float = 1e-8, max_iters: int = 30) -> OCPQPSolution:
    """Primal-dual IPM over the stage-local inequalities with Riccati Newton solves.

    ``D (N+1, mi, nx)``, ``E (N+1, mi, nv)`` (row N's E is ignored — terminal stage has no
    input), ``b (N+1, mi)``.  Vacuous rows can be padded with D=E=0, b>=1.
    """
    N = A.shape[0]
    nv = B.shape[-1]
    mi = b.shape[-1]
    dtype = x0.dtype
    eps_floor = 1e-14 if dtype == jnp.float64 else 1e-7

    E = E.at[N].set(0.0)

    # degenerate rows (all-zero): lift b to keep the barrier well-defined
    row_norm = jnp.maximum(jnp.abs(D).max(axis=-1), jnp.abs(E).max(axis=-1))
    degen = (row_norm <= 1e-12) & (b >= 0)
    b = jnp.where(degen, jnp.maximum(b, 1.0), b)

    def residuals(x, v, lam, t):
        # r_ineq_k = D x + E v + t - b per stage (v_N treated as zero)
        v_pad = jnp.concatenate([v, jnp.zeros((1, nv), dtype)], axis=0)
        r_p = (jnp.einsum('kij,kj->ki', D, x) + jnp.einsum('kij,kj->ki', E, v_pad)
               + t - b)
        mu = jnp.sum(t * lam) / (mi * (N + 1))
        return r_p, mu

    class St(NamedTuple):
        x: jnp.ndarray
        v: jnp.ndarray
        lam: jnp.ndarray
        t: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        res: jnp.ndarray

    def grad_lagrangian(x, v, lam):
        """Stage gradients of the Lagrangian wrt (x, v) EXCLUDING dynamics multipliers —
        used only to build the Newton right-hand side in augmented form."""
        v_pad = jnp.concatenate([v, jnp.zeros((1, nv), dtype)], axis=0)
        gx = (jnp.einsum('kij,kj->ki', Qx, x) + qx
              + jnp.einsum('kji,kj->ki', D, lam))
        gx = gx.at[:-1].add(jnp.einsum('kji,kj->ki', S, v))
        gv = (jnp.einsum('kij,kj->ki', Rv, v) + rv
              + jnp.einsum('kij,kj->ki', S, x[:-1])
              + jnp.einsum('kji,kj->ki', E[:-1], lam[:-1]))
        return gx, gv

    def body(st: St) -> St:
        x, v, lam, t = st.x, st.v, st.lam, st.t
        r_p, mu = residuals(x, v, lam, t)
        d = jnp.clip(lam / jnp.maximum(t, eps_floor), 0.0, 1e7)

        # Barrier-augmented stage blocks (stage-local inequalities only thicken the
        # per-stage cost; structure stays block-tridiagonal).  Mirrors the dense IPM's
        # K = Q + A'dA and rhs = -(r_d + A'w) (qp.py), but the Newton solve is the
        # Riccati recursion on the HOMOGENEOUS dynamics (iterates are kept
        # dynamics-consistent, so the equality residual is identically zero).
        Qx_a = Qx + jnp.einsum('kij,ki,kil->kjl', D, d, D)
        Rv_a = Rv + jnp.einsum('kij,ki,kil->kjl', E[:-1], d[:-1], E[:-1])
        S_a = S + jnp.einsum('kij,ki,kil->kjl', E[:-1], d[:-1], D[:-1])
        gx, gv = grad_lagrangian(x, v, lam)
        zerog = jnp.zeros_like(g)
        zerox0 = jnp.zeros_like(x0)

        def newton_step(r_c):
            w = d * r_p - r_c / jnp.maximum(t, eps_floor)    # (N+1, mi)
            qx_a = gx + jnp.einsum('kji,kj->ki', D, w)
            rv_a = gv + jnp.einsum('kji,kj->ki', E[:-1], w[:-1])
            dx_all, dv = _lqr_solve(A, B, zerog, Qx_a, S_a, Rv_a, qx_a, rv_a, zerox0)
            dv_pad = jnp.concatenate([dv, jnp.zeros((1, nv), dtype)], axis=0)
            dDEz = (jnp.einsum('kij,kj->ki', D, dx_all)
                    + jnp.einsum('kij,kj->ki', E, dv_pad))
            dlam = d * (dDEz + r_p) - r_c / jnp.maximum(t, eps_floor)
            dt = -(r_c + t * dlam) / jnp.maximum(lam, eps_floor)
            return dx_all, dv, dlam, dt

        def step_len(z, dz):
            neg = dz < 0
            ratios = jnp.where(neg, -z / jnp.where(neg, dz, -1.0), jnp.inf)
            return jnp.minimum(1.0, 0.99 * jnp.min(ratios))

        # predictor (affine scaling)
        r_c_aff = t * lam
        dx_a, dv_a, dlam_a, dt_a = newton_step(r_c_aff)
        a_p = step_len(t, dt_a)
        a_d = step_len(lam, dlam_a)
        mu_aff = jnp.sum((t + a_p * dt_a) * (lam + a_d * dlam_a)) / (mi * (N + 1))
        sigma = (mu_aff / (mu + 1e-300)) ** 3
        # corrector
        r_c = t * lam + dt_a * dlam_a - sigma * mu
        dx, dv, dlam, dt = newton_step(r_c)
        alpha = jnp.minimum(step_len(t, dt), step_len(lam, dlam))

        x_n = x + alpha * dx
        v_n = v + alpha * dv
        lam_n = jnp.maximum(lam + alpha * dlam, eps_floor)
        t_n = jnp.maximum(t + alpha * dt, eps_floor)

        r_p_n, mu_n = residuals(x_n, v_n, lam_n, t_n)
        scale = 1.0 + jnp.max(jnp.abs(b))
        res = jnp.maximum(jnp.max(jnp.abs(r_p_n)), mu_n)
        done = (res < tol * scale) | ~jnp.isfinite(res)
        bad = ~jnp.isfinite(jnp.max(jnp.abs(x_n)) + jnp.max(jnp.abs(v_n)))
        x_n = jnp.where(bad, x, x_n)
        v_n = jnp.where(bad, v, v_n)
        return St(x_n, v_n, lam_n, t_n, st.it + 1, done | bad, res)

    # strictly feasible-ish start: dynamics-consistent rollout from x0 with v=0
    def roll0(x, blk):
        A_k, B_k, g_k = blk
        x_n = A_k @ x + g_k
        return x_n, x_n
    _, xs0 = jax.lax.scan(roll0, x0, (A, B, g))
    x_init = jnp.concatenate([x0[None], xs0], axis=0)
    v_init = jnp.zeros((N, nv), dtype)
    r_p0, _ = residuals(x_init, v_init, jnp.ones((N + 1, mi), dtype),
                        jnp.ones((N + 1, mi), dtype))
    t_init = jnp.maximum(1.0, jnp.abs(r_p0) + 1.0)
    lam_init = jnp.ones((N + 1, mi), dtype)

    st0 = St(x_init, v_init, lam_init, t_init, jnp.asarray(0), jnp.asarray(False),
             jnp.asarray(jnp.inf, dtype))
    st = jax.lax.while_loop(lambda s: (~s.done) & (s.it < max_iters), body, st0)

    # final certification: KKT of the stage QP (stationarity via one more Riccati pass
    # is implicit; certify primal feasibility + complementarity + dynamics consistency)
    r_p, mu = residuals(st.x, st.v, st.lam, st.t)
    viol = jnp.max(jnp.maximum(r_p - st.t, 0.0) + jnp.abs(jnp.minimum(st.t, 0.0)))
    dyn = st.x[1:] - (jnp.einsum('kij,kj->ki', A, st.x[:-1])
                      + jnp.einsum('kij,kj->ki', B, st.v) + g)
    res = jnp.maximum(jnp.max(jnp.abs(dyn)), jnp.maximum(viol, mu))
    scale = 1.0 + jnp.max(jnp.abs(b))
    ok = (res < 1e4 * tol * scale) & jnp.isfinite(res)
    return OCPQPSolution(st.x, st.v, st.lam, ok, st.it, res)

"""ALGAMES baseline: augmented-Lagrangian game solver (Le Cleac'h et al.), TPU-native.

Re-implementation of the reference baseline (``/root/reference/DGSQP/solvers/ALGAMES.py:22-616``)
used for cross-solver equilibrium agreement checks.  Unlike DGSQP, the decision space is the
FULL primal-dual trajectory: states q_1..q_N, inputs u_0..u_{N-1}, and per-agent dynamics
multipliers m^i; inequality constraints are handled by an augmented-Lagrangian outer loop with
per-constraint active-set penalty masking, and each inner problem is solved by a regularized
Newton method with a backtracking line search on the residual norm.

Structure map (reference -> here):
  f_C / f_D / f_CD          -> :meth:`_constraints` / :meth:`_dyn_residual`   (ALGAMES.py:484-512)
  f_opt / f_G / f_G_reg     -> :meth:`_grad_stack` with AD                    (ALGAMES.py:530-560)
  f_H (no dynamics hessians)-> jacfwd of the Gauss-Newton-style G2            (ALGAMES.py:565-583)
  f_dy (lapacklu solve)     -> ``jnp.linalg.solve``                           (ALGAMES.py:583-588)
  inner Newton + LS         -> ``lax.while_loop``s                            (ALGAMES.py:222-305)
  outer AL + dual ascent    -> ``lax.while_loop``                             (ALGAMES.py:205-412)
"""
from __future__ import annotations

import time
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.game_problem import _call_stage, _call_term, _as_stage_list
from dgsqp_tpu.solvers.solver_types import ALGAMESParams
from dgsqp_tpu.types import VehiclePrediction, VehicleState

RUNNING, CONV_ABS, CONV_REL, DIVERGED, MAX_IT = 0, 1, 2, 3, 5
STATUS_MSG = {CONV_ABS: 'conv_abs_tol', CONV_REL: 'conv_rel_tol', DIVERGED: 'diverged',
              MAX_IT: 'max_it', RUNNING: 'running'}


class ALGAMESResult(NamedTuple):
    q: jnp.ndarray        # (N+1, n_q) incl. x0
    u: jnp.ndarray        # (N, n_u)
    lam: jnp.ndarray      # (n_c,)
    m: jnp.ndarray        # (M, N*n_q)
    status: jnp.ndarray
    iters: jnp.ndarray
    newton_solves: jnp.ndarray
    p_feas: jnp.ndarray
    comp: jnp.ndarray
    stat: jnp.ndarray


class _OuterCarry(NamedTuple):
    """Per-game state of the outer AL loop (chunkable unit)."""
    y: jnp.ndarray
    lam: jnp.ndarray
    rho_val: jnp.ndarray
    i: jnp.ndarray
    status: jnp.ndarray
    rel_its: jnp.ndarray
    newton_total: jnp.ndarray
    p_feas: jnp.ndarray
    comp: jnp.ndarray
    stat: jnp.ndarray


class ALGAMES:
    def __init__(self, joint_dynamics, costs, constraints, bounds,
                 params: ALGAMESParams = None, xy_plot=None, print_method=print,
                 dtype=None):
        params = params or ALGAMESParams()
        self.params = params
        self.joint_dynamics = joint_dynamics
        self.M = joint_dynamics.n_a
        self.N = params.N
        self.n_q = joint_dynamics.n_q
        self.n_u = joint_dynamics.n_u
        self.num_ua_d = joint_dynamics.num_ua_d
        self.u_offsets = joint_dynamics.u_offsets
        self.print_method = (lambda s: None) if print_method is None else print_method

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype

        if len(costs) != self.M:
            raise ValueError(f'{self.M} agents but {len(costs)} cost specs')
        self.costs = [_as_stage_list(c, self.N) for c in costs]
        self.constraints = _as_stage_list(constraints, self.N)

        # joint box bounds (reference ALGAMES.py:76-81)
        self.state_ub, self.input_ub = joint_dynamics.state2qu(bounds['ub'])
        self.state_lb, self.input_lb = joint_dynamics.state2qu(bounds['lb'])
        self.state_ub_idxs = np.where(self.state_ub < np.inf)[0]
        self.state_lb_idxs = np.where(self.state_lb > -np.inf)[0]
        self.input_ub_idxs = np.where(self.input_ub < np.inf)[0]
        self.input_lb_idxs = np.where(self.input_lb > -np.inf)[0]

        self._count_constraints()

        self.q_pred = np.zeros((self.N + 1, self.n_q))
        self.u_pred = np.zeros((self.N, self.n_u))
        self.q_ws = None
        self.u_ws = None
        self.u_prev = np.zeros(self.n_u)
        self.state_input_predictions = [VehiclePrediction() for _ in range(self.M)]

        self._solve_jit = jax.jit(self._solve_core)
        self._solve_batch_jit = jax.jit(jax.vmap(self._solve_core))
        self.initialized = True

    # ------------------------------------------------------------ problem pieces
    def _count_constraints(self):
        """Count rows AND build the vectorized assembly plan (stage-grouped nonlinear
        constraint evaluation + scatter destinations), mirroring GameProblem._build_plan —
        the unrolled per-stage Python loops made the XLA graph (and compile time) scale
        with the horizon."""
        N = self.N
        x_z = np.zeros(self.n_q)
        u_z = np.zeros(self.n_u)
        n_nl = np.zeros(N + 1, dtype=int)
        for k in range(N):
            if self.constraints[k] is not None:
                n_nl[k] = int(np.asarray(
                    _call_stage(self.constraints[k], x_z, u_z, u_z, None)).size)
        if self.constraints[N] is not None:
            n_nl[N] = int(np.asarray(_call_term(self.constraints[N], x_z, None)).size)

        n_iub, n_ilb = len(self.input_ub_idxs), len(self.input_lb_idxs)
        n_sub, n_slb = len(self.state_ub_idxs), len(self.state_lb_idxs)
        # row offsets per stage in ALGAMES order: [nl, iub, ilb, sub, slb] per k, then
        # terminal [nl, sub, slb]
        nl_dest = [None] * (N + 1)
        iub_dest = np.zeros((N, n_iub), dtype=int)
        ilb_dest = np.zeros((N, n_ilb), dtype=int)
        sub_dest = np.zeros((N + 1, n_sub), dtype=int)
        slb_dest = np.zeros((N + 1, n_slb), dtype=int)
        off = 0
        for k in range(N):
            nl_dest[k] = np.arange(off, off + n_nl[k]); off += n_nl[k]
            iub_dest[k] = np.arange(off, off + n_iub); off += n_iub
            ilb_dest[k] = np.arange(off, off + n_ilb); off += n_ilb
            sub_dest[k] = np.arange(off, off + n_sub); off += n_sub
            slb_dest[k] = np.arange(off, off + n_slb); off += n_slb
        nl_dest[N] = np.arange(off, off + n_nl[N]); off += n_nl[N]
        sub_dest[N] = np.arange(off, off + n_sub); off += n_sub
        slb_dest[N] = np.arange(off, off + n_slb); off += n_slb
        self.n_c = int(off)

        from dgsqp_tpu.solvers.game_problem import _group_stages
        self._nl_groups = [
            (fn, jnp.asarray(ks), np.stack([nl_dest[k] for k in ks]))
            for fn, ks in _group_stages(self.constraints[:N])]
        self._nl_term = (self.constraints[N], nl_dest[N]) if n_nl[N] else None
        self._iub_dest, self._ilb_dest = iub_dest, ilb_dest
        self._sub_dest, self._slb_dest = sub_dest, slb_dest
        self._cost_groups = [
            [(fn, jnp.asarray(ks)) for fn, ks in _group_stages(self.costs[a][:N])]
            for a in range(self.M)]

    def _costs_all(self, q_all, u_all, u_prev):
        """Per-agent horizon costs.  q_all: (N+1, n_q); u_all: (N, n_u)."""
        um_mat = jnp.concatenate([u_prev[None], u_all[:-1]], axis=0)
        J = []
        for a in range(self.M):
            sl = slice(self.u_offsets[a], self.u_offsets[a + 1])
            ua, uma = u_all[:, sl], um_mat[:, sl]
            Ja = jnp.asarray(0.0, q_all.dtype)
            for fn, ks in self._cost_groups[a]:
                vals = jax.vmap(lambda k: _call_stage(fn, q_all[k], ua[k], uma[k],
                                                      None))(ks)
                Ja = Ja + jnp.sum(vals)
            if self.costs[a][self.N] is not None:
                Ja = Ja + _call_term(self.costs[a][self.N], q_all[self.N], None)
            J.append(Ja)
        return jnp.stack(J)

    def _dyn_residual(self, q_all, u_all):
        """D_k = q_{k+1} - fd(q_k, u_k), flattened (N*n_q,)
        (reference ALGAMES.py:471-478)."""
        pred = jax.vmap(self.joint_dynamics.fd)(q_all[:-1], u_all)
        return (q_all[1:] - pred).reshape(-1)

    def _constraints(self, q_all, u_all, u_prev):
        """Joint inequality stack in ALGAMES row order (reference ALGAMES.py:484-505),
        assembled by vmapped stage groups + scatter."""
        g = jnp.zeros(self.n_c, dtype=q_all.dtype)
        um_mat = jnp.concatenate([u_prev[None], u_all[:-1]], axis=0)
        for fn, ks, dest in self._nl_groups:
            vals = jax.vmap(lambda k: jnp.atleast_1d(
                _call_stage(fn, q_all[k], u_all[k], um_mat[k], None)))(ks)
            g = g.at[jnp.asarray(dest.reshape(-1))].set(vals.reshape(-1))
        if len(self.input_ub_idxs) > 0:
            vals = u_all[:, self.input_ub_idxs] - self.input_ub[self.input_ub_idxs]
            g = g.at[jnp.asarray(self._iub_dest.reshape(-1))].set(vals.reshape(-1))
        if len(self.input_lb_idxs) > 0:
            vals = self.input_lb[self.input_lb_idxs] - u_all[:, self.input_lb_idxs]
            g = g.at[jnp.asarray(self._ilb_dest.reshape(-1))].set(vals.reshape(-1))
        if len(self.state_ub_idxs) > 0:
            vals = q_all[:, self.state_ub_idxs] - self.state_ub[self.state_ub_idxs]
            g = g.at[jnp.asarray(self._sub_dest.reshape(-1))].set(vals.reshape(-1))
        if len(self.state_lb_idxs) > 0:
            vals = self.state_lb[self.state_lb_idxs] - q_all[:, self.state_lb_idxs]
            g = g.at[jnp.asarray(self._slb_dest.reshape(-1))].set(vals.reshape(-1))
        if self._nl_term is not None:
            fn, dest = self._nl_term
            vals = jnp.atleast_1d(_call_term(fn, q_all[self.N], None))
            g = g.at[jnp.asarray(dest)].set(vals)
        return g

    # --------------------------------------------------------- stacked gradients
    def _unpack(self, y, x0):
        """y = [q_1..q_N | u_0..u_{N-1} | m^1..m^M] -> (q_all, u_all, m)."""
        N, n_q, n_u = self.N, self.n_q, self.n_u
        q = y[:N * n_q].reshape(N, n_q)
        u = y[N * n_q:N * (n_q + n_u)].reshape(N, n_u)
        m = y[N * (n_q + n_u):].reshape(self.M, N * n_q)
        q_all = jnp.concatenate([x0[None], q], axis=0)
        return q_all, u, m

    def _agent_grad_blocks(self, scalar_fn, y, x0):
        """For each agent: gradient of scalar_fn_i(y) w.r.t. [q_1..q_N, u^i], stacked.

        This is the reference's per-agent Lagrangian gradient stack
        (ALGAMES.py:530-543).
        """
        N, n_q, n_u = self.N, self.n_q, self.n_u
        blocks = []
        for a in range(self.M):
            g = jax.grad(lambda yy: scalar_fn(yy, a))(y)
            gq = g[:N * n_q]
            gu = g[N * n_q:N * (n_q + n_u)].reshape(N, n_u)
            gua = gu[:, self.u_offsets[a]:self.u_offsets[a + 1]].reshape(-1)
            blocks.append(jnp.concatenate([gq, gua]))
        return jnp.concatenate(blocks)

    def _L_full(self, y, a, x0, u_prev, lam, rho):
        """Agent-a augmented Lagrangian incl. m'D (reference ALGAMES.py:528-531)."""
        q_all, u, m = self._unpack(y, x0)
        J = self._costs_all(q_all, u, u_prev)[a]
        D = self._dyn_residual(q_all, u)
        C = self._constraints(q_all, u, u_prev)
        return J + jnp.dot(m[a], D) + jnp.dot(lam, C) + 0.5 * jnp.dot(rho * C, C)

    def _L_gn(self, y, a, x0, u_prev, lam, rho):
        """Gauss-Newton variant without m'D (drops dynamics Hessians; ALGAMES.py:562-570)."""
        q_all, u, m = self._unpack(y, x0)
        J = self._costs_all(q_all, u, u_prev)[a]
        C = self._constraints(q_all, u, u_prev)
        return J + jnp.dot(lam, C) + 0.5 * jnp.dot(rho * C, C)

    def _G(self, y, x0, u_prev, lam, rho):
        """Full residual: per-agent Lagrangian gradients + dynamics defects
        (ALGAMES.py:541-543)."""
        grads = self._agent_grad_blocks(
            lambda yy, a: self._L_full(yy, a, x0, u_prev, lam, rho), y, x0)
        q_all, u, _ = self._unpack(y, x0)
        D = self._dyn_residual(q_all, u)
        return jnp.concatenate([grads, D])

    def _G_prox(self, y, x0, u_prev, lam, rho, q_reg, u_reg, y_ref):
        """Residual with proximal regularization centered at the pre-step point
        (the reference's f_G_reg, ALGAMES.py:548-560)."""
        N, n_q, n_u = self.N, self.n_q, self.n_u
        G = self._G(y, x0, u_prev, lam, rho)
        n_prim_q = N * n_q
        # per-agent gradient blocks get prox terms on their own variables
        parts = []
        off = 0
        dq = y[:n_prim_q] - y_ref[:n_prim_q]
        du_all = (y[n_prim_q:N * (n_q + n_u)] - y_ref[n_prim_q:N * (n_q + n_u)]).reshape(N, n_u)
        for a in range(self.M):
            blk = G[off:off + n_prim_q + N * self.num_ua_d[a]]
            dua = du_all[:, self.u_offsets[a]:self.u_offsets[a + 1]].reshape(-1)
            prox = jnp.concatenate([q_reg * dq, u_reg * dua])
            parts.append(blk + prox)
            off += n_prim_q + N * self.num_ua_d[a]
        parts.append(G[off:])
        return jnp.concatenate(parts)

    def _newton_matrix(self, y, x0, u_prev, lam, rho, q_reg, u_reg):
        """Newton matrix + diag(reg) (ALGAMES.py:565-583).

        ``dynamics_hessians=False`` (default): Gauss-Newton variant — primal columns from
        G2 (per-agent gradients WITHOUT the m'D term, dropping dynamics curvature), dual
        columns from the full G.  ``dynamics_hessians=True``: exact Jacobian of G.
        """
        N, n_q, n_u = self.N, self.n_q, self.n_u
        n_prim = N * (n_q + n_u)
        n_m = self.M * N * n_q

        if self.params.dynamics_hessians:
            H = jax.jacfwd(lambda yy: self._G(yy, x0, u_prev, lam, rho))(y)
        else:
            def G2(yy):
                grads = self._agent_grad_blocks(
                    lambda y2, a: self._L_gn(y2, a, x0, u_prev, lam, rho), yy, x0)
                q_all, u, _ = self._unpack(yy, x0)
                D = self._dyn_residual(q_all, u)
                return jnp.concatenate([grads, D])

            Hfull_prim = jax.jacfwd(G2)(y)[:, :n_prim]
            # dual columns from the full G (linear in m)
            Hfull_m = jax.jacfwd(lambda yy: self._G(yy, x0, u_prev, lam, rho))(y)[:, n_prim:]
            H = jnp.concatenate([Hfull_prim, Hfull_m], axis=1)
        reg = jnp.concatenate([q_reg * jnp.ones(N * n_q, y.dtype),
                               u_reg * jnp.ones(N * n_u, y.dtype),
                               jnp.zeros(n_m, y.dtype)])
        return H + jnp.diag(reg)

    # ----------------------------------------------------------------- core loop
    def _init_outer_carry(self, q_ws, u_ws) -> '_OuterCarry':
        p = self.params
        dtype = self.dtype
        y0 = jnp.concatenate([jnp.asarray(q_ws, dtype)[1:].reshape(-1),
                              jnp.asarray(u_ws, dtype).reshape(-1),
                              jnp.zeros(self.M * self.N * self.n_q, dtype)])
        return _OuterCarry(y=y0, lam=jnp.zeros(self.n_c, dtype),
                           rho_val=jnp.asarray(p.rho, dtype), i=jnp.asarray(0),
                           status=jnp.asarray(RUNNING, jnp.int32), rel_its=jnp.asarray(0),
                           newton_total=jnp.asarray(0),
                           p_feas=jnp.asarray(jnp.inf, dtype),
                           comp=jnp.asarray(jnp.inf, dtype),
                           stat=jnp.asarray(jnp.inf, dtype))

    def _finalize_outer(self, c: '_OuterCarry', x0) -> ALGAMESResult:
        q_all, u, m = self._unpack(c.y, x0)
        return ALGAMESResult(q_all, u, c.lam, m, c.status, c.i, c.newton_total,
                             c.p_feas, c.comp, c.stat)

    def _make_outer_body(self, x0, u_prev):
        """One outer AL iteration (inner Newton loop + dual ascent) as a masked,
        fixed-signature body — the chunkable unit (reference ``ALGAMES.py:205-412``)."""
        p = self.params
        dtype = self.dtype
        N, n_q, n_u = self.N, self.n_q, self.n_u
        n_y = N * (n_q + n_u) + self.M * N * n_q
        rel_tol_req = 5

        def opt_vio_fn(y, lam, rho):
            grads = self._agent_grad_blocks(
                lambda yy, a: self._L_full(yy, a, x0, u_prev, lam, rho), y, x0)
            return jnp.max(jnp.abs(grads))

        def newton_loop(y, lam, rho_val):
            def cond(c):
                y, j, done, alpha, d = c
                return (~done) & (j < p.newton_iters)

            def body(c):
                y, j, done, alpha_prev, d_prev = c
                q_all, u, m = self._unpack(y, x0)
                C = self._constraints(q_all, u, u_prev)
                rho_bar = jnp.where((C < 0) & (lam == 0), 0.0, rho_val)

                opt_vio = opt_vio_fn(y, lam, rho_bar)
                conv_stat = opt_vio < p.opt_tol

                H = self._newton_matrix(y, x0, u_prev, lam, rho_bar,
                                        q_reg_c * (j + 1) ** 4, u_reg_c * (j + 1) ** 4)
                G = self._G(y, x0, u_prev, lam, rho_bar)
                dy = -jnp.linalg.solve(H, G)
                norm_G = jnp.sum(jnp.abs(G)) / n_y

                # backtracking line search on the proximal residual norm (ALGAMES.py:256-288)
                def ls_cond(cc):
                    k, alpha, accepted = cc
                    return (~accepted) & (k < p.line_search_iters)

                def ls_body(cc):
                    k, alpha, accepted = cc
                    y_try = y + alpha * dy
                    Gt = self._G_prox(y_try, x0, u_prev, lam, rho_bar,
                                      q_reg_c * (j + 1) ** 4, u_reg_c * (j + 1) ** 4, y)
                    ok = jnp.sum(jnp.abs(Gt)) / n_y <= (1 - alpha * p.beta) * norm_G
                    alpha_n = jnp.where(ok, alpha, alpha * p.tau)
                    return (k + 1, alpha_n, accepted | ok)

                k, alpha, ls_ok = jax.lax.while_loop(
                    ls_cond, ls_body, (jnp.asarray(0), jnp.asarray(1.0, dtype),
                                       jnp.asarray(False)))
                # the reference accepts the final trial regardless (ALGAMES.py:281)
                alpha_acc = jnp.where(ls_ok, alpha, alpha * p.tau ** 0)  # last tried alpha
                y_new = y + alpha_acc * dy

                # average step size (ALGAMES.py:290-294) over the (q, u) blocks
                d = alpha_acc * jnp.sum(jnp.abs(dy[:N * (n_q + n_u)])) / ((n_q + n_u) * N)
                conv_step = d < p.newton_step_tol

                upd = ~done & ~conv_stat
                y_out = jnp.where(upd, y_new, y)
                done_out = done | conv_stat | (upd & (conv_step | ~ls_ok))
                return (y_out, j + 1, done_out, alpha, d)

            y_f, j_f, _, _, _ = jax.lax.while_loop(
                cond, body, (y, jnp.asarray(0), jnp.asarray(False),
                             jnp.asarray(1.0, dtype), jnp.asarray(jnp.inf, dtype)))
            return y_f, j_f

        q_reg_c = p.q_reg
        u_reg_c = p.u_reg

        def outer_body(c: _OuterCarry) -> _OuterCarry:
            running = c.status == RUNNING

            y_prev = c.y
            lam_prev = c.lam
            y_new, n_newton = newton_loop(c.y, c.lam, c.rho_val)

            q_all, u, m = self._unpack(y_new, x0)
            C = self._constraints(q_all, u, u_prev)
            D = self._dyn_residual(q_all, u)
            rho_bar = jnp.where((C < 0) & (c.lam == 0), 0.0, c.rho_val)
            max_ineq = jnp.max(jnp.maximum(C, 0.0))
            max_eq = jnp.max(jnp.abs(D))
            opt_vio = opt_vio_fn(y_new, c.lam, rho_bar)
            comp = jnp.abs(jnp.dot(c.lam, C))

            converged = (max_ineq < p.ineq_tol) & (max_eq < p.eq_tol) & \
                        (comp < p.opt_tol) & (opt_vio < p.opt_tol)
            diverged = opt_vio > 1e5

            # relative-tolerance track (ALGAMES.py:354-373) on (u, lam) change
            du_small = jnp.linalg.norm(y_new[N * n_q:N * (n_q + n_u)] -
                                       y_prev[N * n_q:N * (n_q + n_u)]) < p.opt_tol / 2
            dl_small = jnp.linalg.norm(c.lam - lam_prev) < p.opt_tol / 2
            dm_small = jnp.linalg.norm(y_new[N * (n_q + n_u):] -
                                       y_prev[N * (n_q + n_u):]) < p.opt_tol / 2
            small = du_small & dl_small & dm_small
            rel_its = jnp.where(small, c.rel_its + 1, 0)
            conv_rel = (rel_its >= rel_tol_req) & (max_ineq < p.ineq_tol) & (max_eq < p.eq_tol)

            # dual ascent + penalty schedule (ALGAMES.py:392-396)
            lam_new = jnp.clip(c.lam + rho_bar * C, 0.0, p.lam_max)
            rho_new = jnp.minimum(p.rho_max, p.gamma * c.rho_val)

            i_next = c.i + jnp.where(running, 1, 0)
            new_status = jnp.where(converged, CONV_ABS,
                          jnp.where(conv_rel, CONV_REL,
                           jnp.where(diverged, DIVERGED,
                            jnp.where(i_next >= p.outer_iters, MAX_IT, RUNNING))))
            status = jnp.where(running, new_status, c.status).astype(jnp.int32)
            keep = running & ~converged & ~diverged & ~conv_rel

            return _OuterCarry(y=jnp.where(running, y_new, c.y),
                               lam=jnp.where(keep, lam_new, c.lam),
                               rho_val=jnp.where(keep, rho_new, c.rho_val),
                               i=i_next, status=status,
                               rel_its=jnp.where(running, rel_its, c.rel_its),
                               newton_total=c.newton_total + jnp.where(running, n_newton, 0),
                               p_feas=jnp.where(running, jnp.maximum(max_ineq, max_eq),
                                                c.p_feas),
                               comp=jnp.where(running, comp, c.comp),
                               stat=jnp.where(running, opt_vio, c.stat))

        return outer_body

    def _solve_core(self, q_ws, u_ws, x0, u_prev) -> ALGAMESResult:
        body = self._make_outer_body(x0, u_prev)
        init = self._init_outer_carry(q_ws, u_ws)
        c = jax.lax.while_loop(lambda cc: cc.status == RUNNING, body, init)
        return self._finalize_outer(c, x0)

    def solve_batch_chunked(self, q_ws, u_ws, x0, u_prev, chunk_iters: int = 1,
                            max_chunks=None, verbose: bool = False):
        """Batched solve as a host loop over short device programs WITH straggler
        compaction (shared driver, see :mod:`dgsqp_tpu.solvers.chunked`).

        One chunk = ``chunk_iters`` outer AL iterations (each containing its inner
        Newton while-loop).  The whole-solve single program (50 outer x 50 Newton
        iterations of dense KKT solves) is long enough to trip accelerator watchdogs;
        chunking bounds the program length the same way the DGSQP solvers do.
        """
        from dgsqp_tpu.solvers.chunked import run_chunked_compacted

        if not hasattr(self, '_chunk_fns'):
            self._chunk_fns = {}
        if chunk_iters not in self._chunk_fns:   # cache keyed on chunk_iters: the
            def chunk(c, x, u_p):                # closure bakes the loop length in
                body = self._make_outer_body(x, u_p)
                return jax.lax.fori_loop(0, chunk_iters, lambda i, cc: body(cc), c)
            self._chunk_fns[chunk_iters] = (
                jax.jit(jax.vmap(chunk)),
                jax.jit(jax.vmap(self._init_outer_carry)),
                jax.jit(jax.vmap(self._finalize_outer)))
        chunk_fn, init_fn, final_fn = self._chunk_fns[chunk_iters]

        carry = init_fn(q_ws, u_ws)
        max_chunks = max_chunks or (self.params.outer_iters // chunk_iters + 2)

        def chunk_with_args(c, x, u_p):
            return chunk_fn(c, x, u_p)

        res, history = run_chunked_compacted(
            carry, x0, u_prev, chunk_with_args,
            final_fn=lambda c, x, u_p: final_fn(c, x),
            running_status=RUNNING, max_chunks=max_chunks, verbose=verbose)
        self.last_chunk_history = history
        return res

    def solve_batch_traced(self, q_ws, u_ws, x0, u_prev, num_iters=None,
                           record_iterates: bool = False):
        """Batched solve with a per-OUTER-iteration trace — the ALGAMES analog of
        ``DGSQP.solve_batch_traced`` (the reference pickles the same quantities in its
        ``iter_data``, ``ALGAMES.py:313-345``).

        Runs the outer AL body under ``lax.scan`` for a FIXED ``num_iters`` so every
        iteration's convergence quantities are captured.  Returns ``(ALGAMESResult,
        trace)`` where ``trace`` holds (B, T)-shaped ``status, i, p_feas, comp, stat,
        newton_solves, rho, du_norm, dlam_norm`` (+ ``u, lam`` of shape (B, T, n) with
        ``record_iterates``).  Frozen games repeat their terminal row.
        """
        T = int(num_iters or self.params.outer_iters)
        N, n_q, n_u = self.N, self.n_q, self.n_u

        def one(qw, uw, x, u_p):
            body = self._make_outer_body(x, u_p)
            init = self._init_outer_carry(qw, uw)

            def step(c, _):
                c2 = body(c)
                u_c = c.y[N * n_q:N * (n_q + n_u)]
                u_n = c2.y[N * n_q:N * (n_q + n_u)]
                rec = dict(status=c2.status, i=c2.i, p_feas=c2.p_feas, comp=c2.comp,
                           stat=c2.stat, newton_solves=c2.newton_total, rho=c2.rho_val,
                           du_norm=jnp.linalg.norm(u_n - u_c),
                           dlam_norm=jnp.linalg.norm(c2.lam - c.lam))
                if record_iterates:
                    rec['u'] = u_n
                    rec['lam'] = c2.lam
                return c2, rec

            c, trace = jax.lax.scan(step, init, None, length=T)
            return self._finalize_outer(c, x), trace

        if not hasattr(self, '_traced_jit'):
            self._traced_jit = {}
        key = (T, record_iterates)
        if key not in self._traced_jit:
            self._traced_jit[key] = jax.jit(jax.vmap(one))
        return self._traced_jit[key](q_ws, u_ws, x0, u_prev)

    # ------------------------------------------------------------- host interface
    def initialize(self):
        pass

    def set_warm_start(self, q_ws, u_ws, l_ws=None, m_ws=None):
        q_ws = np.asarray(q_ws)
        u_ws = np.asarray(u_ws)
        if q_ws.shape != (self.N + 1, self.n_q):
            raise RuntimeError(f'q warm start shape {q_ws.shape} != {(self.N + 1, self.n_q)}')
        if u_ws.shape != (self.N, self.n_u):
            raise RuntimeError(f'u warm start shape {u_ws.shape} != {(self.N, self.n_u)}')
        self.q_ws = q_ws
        self.u_ws = u_ws

    def solve(self, states: List[VehicleState]):
        t0 = time.time()
        x0 = jnp.asarray(self.joint_dynamics.state2q(states), self.dtype)
        if self.q_ws is None or self.u_ws is None:
            raise RuntimeError('ALGAMES requires a (q, u) warm start')
        res = self._solve_jit(jnp.asarray(self.q_ws, self.dtype),
                              jnp.asarray(self.u_ws, self.dtype),
                              x0, jnp.asarray(self.u_prev, self.dtype))
        self.q_pred = np.asarray(res.q)
        self.u_pred = np.asarray(res.u)
        status = int(res.status)
        msg = STATUS_MSG.get(status, 'unknown')
        dur = time.time() - t0
        self.print_method(f'Solve status: {msg}')
        self.print_method(f'Solve time: {dur:.2f}')
        return dict(time=dur, num_iters=int(res.iters),
                    status=(status in (CONV_ABS, CONV_REL)),
                    cond=dict(p_feas=float(res.p_feas), comp=float(res.comp),
                              stat=float(res.stat)),
                    newton_solves=int(res.newton_solves),
                    msg=msg, u_sol=np.asarray(res.u), l_sol=np.asarray(res.lam))

    def step(self, states: List[VehicleState], env_state=None):
        info = self.solve(states)
        self.joint_dynamics.qu2state(states, None, self.u_pred[0])
        self.state_input_predictions = self.joint_dynamics.qu2prediction(
            self.state_input_predictions, self.q_pred, self.u_pred)
        for pred in self.state_input_predictions:
            pred.t = states[0].t
        self.u_prev = self.u_pred[0]
        q_last = jnp.asarray(self.q_pred[-1], self.dtype)
        u_last = jnp.asarray(self.u_pred[-1], self.dtype)
        q_next = np.asarray(self.joint_dynamics.fd(q_last, u_last))
        q_ws = np.vstack((self.q_pred[1:], q_next[None]))
        u_ws = np.vstack((self.u_pred[1:], self.u_pred[-1:]))
        self.set_warm_start(q_ws, u_ws)
        return info

    def get_prediction(self):
        return self.state_input_predictions

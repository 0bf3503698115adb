"""CA-LTV-MPC: convex-approximation linear-time-varying tracking MPC.

Re-implementation of the reference single-agent tracking controller
(``/root/reference/DGSQP/solvers/CA_LTV_MPC.py:23-1016``) used by the closed-loop race demo
to track racelines (with the game planner overriding the reference trajectory during
interactions).  Structure preserved:

  * decision vector ``D = [(q_k, u_{k-1})_{k=0..N}, (du_k)_{k=0..N-1}]`` with the input-rate
    coupling ``u_k = u_{k-1} + du_k``                     (CA_LTV_MPC.py:297-322)
  * per-iteration quadratic cost approximation and constraint linearization around the
    warm-start rollout                                     (CA_LTV_MPC.py:297-552)
  * damped SQP iterations ``D <- damping*D + (1-damping)*D_bar``  (CA_LTV_MPC.py:244-257)
  * wrapped states (np.unwrap on track progress), input-delay buffer, soft constraints via
    slack variables with quadratic + linear penalties      (CA_LTV_MPC.py:230-238,446-533)

The reference assembles this QP for three interchangeable backends (OSQP via casadi, HPIPM,
cvxpy); here there is one: the equality-constrained IPM kernel (``solve_eq_qp``), with the
linearized dynamics as equality rows.  Costs/constraints are plain jnp callables:
    costs = {'state': [fn(q[, P])]*(N+1), 'input': [fn(u[, P])]*(N+1), 'rate': [fn(du)]*N}
    constraints = {'state_input': [fn(q, u[, P]) or None]*(N+1), 'rate': [fn(du) or None]*N}
    bounds = {'qu_ub': VehicleState, 'qu_lb': ..., 'du_ub': ..., 'du_lb': ...}
"""
from __future__ import annotations

import time
from collections import deque
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.game_problem import _n_args
from dgsqp_tpu.solvers.qp import solve_eq_qp
from dgsqp_tpu.solvers.solver_types import CALTVMPCParams
from dgsqp_tpu.types import VehiclePrediction, VehicleState


def _call1(fn, x, P, k=None):
    n = _n_args(fn)
    if getattr(fn, 'stage_indexed', False):
        return fn(x, P, k)
    return fn(x, P) if n >= 2 else fn(x)


def _call2(fn, q, u, P, k=None):
    n = _n_args(fn)
    if getattr(fn, 'stage_indexed', False):
        return fn(q, u, P, k)
    return fn(q, u, P) if n >= 3 else fn(q, u)


class CA_LTV_MPC:
    def __init__(self, dynamics, costs: Dict, constraints: Dict, bounds: Dict,
                 control_params: CALTVMPCParams = None, print_method=print, dtype=None):
        params = control_params or CALTVMPCParams()
        self.params = params
        self.dynamics = dynamics
        self.dt = dynamics.dt
        self.costs = costs
        self.constraints = constraints
        self.print_method = (lambda s: None) if print_method is None else print_method
        self.N = params.N
        self.n_q = dynamics.n_q
        self.n_u = dynamics.n_u
        self.n_z = self.n_q + self.n_u
        self.damping = params.damping
        self.qp_iters = params.qp_iters

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype

        # box bounds (reference CA_LTV_MPC.py:113-123)
        self.state_ub, self.input_ub = dynamics.state2qu(bounds['qu_ub'])
        self.state_lb, self.input_lb = dynamics.state2qu(bounds['qu_lb'])
        _, self.du_ub = dynamics.state2qu(bounds['du_ub'])
        _, self.du_lb = dynamics.state2qu(bounds['du_lb'])

        self.soft_state_idxs = params.soft_state_bound_idxs
        self.soft_state_quad = np.array(params.soft_state_bound_quad) \
            if params.soft_state_bound_quad is not None else None
        self.soft_state_lin = np.array(params.soft_state_bound_lin) \
            if params.soft_state_bound_lin is not None else None

        self.wrapped_state_idxs = params.wrapped_state_idxs
        self.wrapped_state_periods = params.wrapped_state_periods

        self.delay = params.delay
        self.delay_buffer = None
        if self.delay is not None:
            self.delay_buffer = [deque([0.0] * int(round(d / self.dt)),
                                       maxlen=max(1, int(round(d / self.dt))))
                                 for d in self.delay]

        # probe constraint row counts
        self.n_c = [0] * (self.N + 1)
        cs = constraints.get('state_input', [None] * (self.N + 1))
        for k in range(self.N + 1):
            if cs[k] is not None:
                n_out = getattr(cs[k], 'n_out', None)
                if n_out is not None:
                    self.n_c[k] = int(n_out)
                else:
                    out = _call2(cs[k], np.zeros(self.n_q), np.zeros(self.n_u),
                                 np.zeros(1024), k)
                    self.n_c[k] = int(np.asarray(out).size)

        self.u_ws = np.zeros((self.N + 1, self.n_u))
        self.du_ws = np.zeros((self.N, self.n_u))
        self.u_prev = np.zeros(self.n_u)
        self.q_pred = np.zeros((self.N + 1, self.n_q))
        self.u_pred = np.zeros((self.N, self.n_u))
        self.du_pred = np.zeros((self.N, self.n_u))
        self.state_input_prediction = None
        self.t = 0.0

        self._qp_step_jit = jax.jit(self._qp_step)
        self.initialized = True

    def initialize(self):
        pass

    def set_warm_start(self, u_ws: np.ndarray, du_ws: np.ndarray,
                       state: Optional[VehicleState] = None):
        """(N+1, n_u) applied-input warm start (row 0 = previous input) + rate warm start."""
        self.u_ws = np.asarray(u_ws)
        self.du_ws = np.asarray(du_ws)
        if state is not None and self.delay_buffer is not None:
            _, u = self.dynamics.state2qu(state)
            for i in range(self.n_u):
                self.delay_buffer[i].extend([u[i]] * self.delay_buffer[i].maxlen)

    # ------------------------------------------------------------- QP assembly
    def _rollout(self, q0, U):
        def step(q, u):
            qn = self.dynamics.fd(q, u)
            return qn, qn
        _, qs = jax.lax.scan(step, q0, U)
        return jnp.concatenate([q0[None], qs], axis=0)

    def _qp_step(self, D, q0, u_prev, P=None):
        """Linearize/quadratize at D's trajectory and solve one QP (one damped iteration).

        Returns (D_bar, ok).
        """
        N, n_q, n_u, n_z = self.N, self.n_q, self.n_u, self.n_z
        dtype = self.dtype
        qu = D[:n_z * (N + 1)].reshape(N + 1, n_z)
        du = D[n_z * (N + 1):].reshape(N, n_u)
        q_ref = qu[:, :n_q]
        u_ref = qu[:, n_q:]          # u_ref[k] = u_{k-1}

        n_dec = n_z * (N + 1) + n_u * N

        # ---------------- quadratic cost  1/2 z'Hz + h'z
        H = jnp.zeros((n_dec, n_dec), dtype)
        h = jnp.zeros(n_dec, dtype)
        reg = 1e-9

        def quad(fn, x_ref, Pp, k=None):
            val_fn = lambda xx: _call1(fn, xx, Pp, k)
            M = jax.hessian(val_fn)(x_ref)
            m = jax.grad(val_fn)(x_ref)
            return M, m - M @ x_ref

        for k in range(N + 1):
            i0 = k * n_z
            if self.costs['state'][k] is not None:
                M, m = quad(self.costs['state'][k], q_ref[k], P, k)
                H = H.at[i0:i0 + n_q, i0:i0 + n_q].add(M + reg * jnp.eye(n_q, dtype=dtype))
                h = h.at[i0:i0 + n_q].add(m)
            if self.costs['input'][k] is not None:
                M, m = quad(self.costs['input'][k], u_ref[k], P, k)
                H = H.at[i0 + n_q:i0 + n_z, i0 + n_q:i0 + n_z].add(
                    M + reg * jnp.eye(n_u, dtype=dtype))
                h = h.at[i0 + n_q:i0 + n_z].add(m)
        rate_costs = self.costs.get('rate', [None] * N)
        for k in range(N):
            i0 = n_z * (N + 1) + k * n_u
            if rate_costs[k] is not None:
                M, m = quad(rate_costs[k], du[k], P, k)
                H = H.at[i0:i0 + n_u, i0:i0 + n_u].add(M + reg * jnp.eye(n_u, dtype=dtype))
                h = h.at[i0:i0 + n_u].add(m)
        H = H + 1e-10 * jnp.eye(n_dec, dtype=dtype)

        # ---------------- equality constraints E z = d
        # initial condition rows: q_0 = q0, u_{-1} = u_prev
        E_rows, d_rows = [], []
        Ei = jnp.zeros((n_z, n_dec), dtype).at[:, :n_z].set(jnp.eye(n_z, dtype=dtype))
        E_rows.append(Ei)
        d_rows.append(jnp.concatenate([q0, u_prev]))

        # dynamics rows: q_{k+1} = A_k q_k + B_k u_k + g_k,  u_k = u-part of qu_{k+1}
        for k in range(N):
            A = self.dynamics.fAd(q_ref[k], u_ref[k + 1])
            B = self.dynamics.fBd(q_ref[k], u_ref[k + 1])
            g = self.dynamics.fd(q_ref[k], u_ref[k + 1]) - A @ q_ref[k] - B @ u_ref[k + 1]
            row = jnp.zeros((n_q, n_dec), dtype)
            row = row.at[:, (k + 1) * n_z:(k + 1) * n_z + n_q].set(jnp.eye(n_q, dtype=dtype))
            row = row.at[:, k * n_z:k * n_z + n_q].add(-A)
            row = row.at[:, (k + 1) * n_z + n_q:(k + 2) * n_z].add(-B)
            E_rows.append(row)
            d_rows.append(g)

        # rate coupling rows: u_k - u_{k-1} - du_k = 0
        for k in range(N):
            row = jnp.zeros((n_u, n_dec), dtype)
            row = row.at[:, (k + 1) * n_z + n_q:(k + 2) * n_z].set(jnp.eye(n_u, dtype=dtype))
            row = row.at[:, k * n_z + n_q:(k + 1) * n_z].add(-jnp.eye(n_u, dtype=dtype))
            row = row.at[:, n_z * (N + 1) + k * n_u:n_z * (N + 1) + (k + 1) * n_u].add(
                -jnp.eye(n_u, dtype=dtype))
            E_rows.append(row)
            d_rows.append(jnp.zeros(n_u, dtype))

        E = jnp.concatenate(E_rows, axis=0)
        d = jnp.concatenate(d_rows)

        # ---------------- slack variables for soft constraints
        # layout: z_ext = [z; s_state (2 * n_soft * (N+1)); s_constr]
        soft_state = list(self.soft_state_idxs or [])
        n_ss = len(soft_state)
        n_slack_state = 2 * n_ss * (N + 1)
        soft_c = list(self.params.soft_constraint_idxs or [])
        n_sc = len(soft_c)
        n_slack_c = n_sc * (N + 1)
        n_ext = n_dec + n_slack_state + n_slack_c
        if n_ext > n_dec:
            H = jnp.zeros((n_ext, n_ext), dtype).at[:n_dec, :n_dec].set(H)
            h = jnp.zeros(n_ext, dtype).at[:n_dec].set(h)
            E = jnp.zeros((E.shape[0], n_ext), dtype).at[:, :n_dec].set(E)
            # quadratic + linear penalties (reference CA_LTV_MPC.py:446-533)
            for k in range(N + 1):
                for jj, j in enumerate(soft_state):
                    for side in range(2):
                        si = n_dec + 2 * (k * n_ss + jj) + side
                        H = H.at[si, si].add(self.soft_state_quad[jj])
                        h = h.at[si].add(self.soft_state_lin[jj])
                for jj in range(n_sc):
                    si = n_dec + n_slack_state + k * n_sc + jj
                    H = H.at[si, si].add(self.params.soft_constraint_quad[jj])
                    h = h.at[si].add(self.params.soft_constraint_lin[jj])

        def ext(row):
            if n_ext > n_dec and row.shape[-1] == n_dec:
                if row.ndim == 1:
                    return jnp.zeros(n_ext, dtype).at[:n_dec].set(row)
                return jnp.zeros((row.shape[0], n_ext), dtype).at[:, :n_dec].set(row)
            return row

        # ---------------- inequality constraints A z <= b
        A_rows, b_rows = [], []
        qu_ub = jnp.asarray(np.concatenate([self.state_ub, self.input_ub]), dtype)
        qu_lb = jnp.asarray(np.concatenate([self.state_lb, self.input_lb]), dtype)
        finite_ub = np.isfinite(np.concatenate([self.state_ub, self.input_ub]))
        finite_lb = np.isfinite(np.concatenate([self.state_lb, self.input_lb]))
        for k in range(N + 1):
            i0 = k * n_z
            for j in np.where(finite_ub)[0]:
                row = jnp.zeros(n_ext, dtype).at[i0 + j].set(1.0)
                if j in soft_state:
                    jj = soft_state.index(j)
                    row = row.at[n_dec + 2 * (k * n_ss + jj)].set(-1.0)
                A_rows.append(row)
                b_rows.append(qu_ub[j])
            for j in np.where(finite_lb)[0]:
                row = jnp.zeros(n_ext, dtype).at[i0 + j].set(-1.0)
                if j in soft_state:
                    jj = soft_state.index(j)
                    row = row.at[n_dec + 2 * (k * n_ss + jj) + 1].set(-1.0)
                A_rows.append(row)
                b_rows.append(-qu_lb[j])
        # slack non-negativity
        for si in range(n_dec, n_ext):
            A_rows.append(jnp.zeros(n_ext, dtype).at[si].set(-1.0))
            b_rows.append(jnp.asarray(0.0, dtype))
        finite_du_ub = np.isfinite(self.du_ub)
        finite_du_lb = np.isfinite(self.du_lb)
        for k in range(N):
            i0 = n_z * (N + 1) + k * n_u
            for j in np.where(finite_du_ub)[0]:
                A_rows.append(jnp.zeros(n_ext, dtype).at[i0 + j].set(1.0))
                b_rows.append(jnp.asarray(self.du_ub[j], dtype))
            for j in np.where(finite_du_lb)[0]:
                A_rows.append(jnp.zeros(n_ext, dtype).at[i0 + j].set(-1.0))
                b_rows.append(jnp.asarray(-self.du_lb[j], dtype))

        # linearized nonlinear constraints C(q_k, u_k) <= 0
        cs = self.constraints.get('state_input', [None] * (N + 1))
        for k in range(N + 1):
            if cs[k] is None:
                continue
            u_k = u_ref[k]  # constraint at stage k uses (q_k, u_{k-1}) like the cost rows
            fn = cs[k]
            val = jnp.atleast_1d(_call2(fn, q_ref[k], u_k, P, k))
            Jq = jax.jacfwd(lambda qq: jnp.atleast_1d(_call2(fn, qq, u_k, P, k)))(q_ref[k])
            Ju = jax.jacfwd(lambda uu: jnp.atleast_1d(_call2(fn, q_ref[k], uu, P, k)))(u_k)
            i0 = k * n_z
            row = jnp.zeros((val.shape[0], n_ext), dtype)
            row = row.at[:, i0:i0 + n_q].set(Jq)
            row = row.at[:, i0 + n_q:i0 + n_z].set(Ju)
            # softened rows get a -1 slack coefficient (reference CA_LTV_MPC.py:594-634)
            for jj, c_idx in enumerate(soft_c):
                if c_idx < val.shape[0]:
                    si = n_dec + n_slack_state + k * n_sc + jj
                    row = row.at[c_idx, si].set(-1.0)
            A_rows.append(row)
            b_rows.append(Jq @ q_ref[k] + Ju @ u_k - val)

        A_in = jnp.concatenate([jnp.atleast_2d(r) for r in A_rows], axis=0)
        b_in = jnp.stack([jnp.asarray(b, dtype) for b in b_rows]) \
            if all(jnp.ndim(b) == 0 for b in b_rows) else \
            jnp.concatenate([jnp.atleast_1d(b) for b in b_rows])

        sol = solve_eq_qp(H, h, A_in, b_in, E, d,
                          tol=1e-8 if dtype == jnp.float64 else 1e-6)
        return sol.x[:n_dec], sol.ok

    # ------------------------------------------------------------- host interface
    def solve(self, state: VehicleState, parameters=None):
        q0, _ = self.dynamics.state2qu(state)
        if self.delay_buffer is not None:
            delay_steps = min(len(b) for b in self.delay_buffer)
            u_delay = np.stack([np.array(list(b))[:delay_steps] for b in self.delay_buffer],
                               axis=1)
            q_bar = np.asarray(self._rollout(jnp.asarray(q0, self.dtype),
                                             jnp.asarray(u_delay, self.dtype)))
            q0 = q_bar[-1]

        q_ws = np.array(self._rollout(jnp.asarray(q0, self.dtype),
                                      jnp.asarray(self.u_ws[1:], self.dtype)))
        if self.wrapped_state_idxs is not None:
            for i, p in zip(self.wrapped_state_idxs, self.wrapped_state_periods):
                q_ws[:, i] = np.unwrap(q_ws[:, i], period=p)

        D = np.concatenate([np.hstack([q_ws, self.u_ws]).ravel(), self.du_ws.ravel()])
        success = True
        for _ in range(self.qp_iters):
            D_bar, ok = self._qp_step_jit(jnp.asarray(D, self.dtype),
                                          jnp.asarray(q0, self.dtype),
                                          jnp.asarray(self.u_prev, self.dtype),
                                          parameters)
            if not bool(ok):
                success = False
                self.print_method('Warning: LTV-MPC QP failed')
                break
            D = self.damping * D + (1 - self.damping) * np.asarray(D_bar)
            D[self.n_z * (self.N + 1) + self.n_u * self.N:] = 0.0

        if success:
            qu_sol = D[:self.n_z * (self.N + 1)].reshape(self.N + 1, self.n_z)
            self.q_pred = qu_sol[:, :self.n_q]
            self.u_pred = qu_sol[1:, self.n_q:]
            self.du_pred = D[self.n_z * (self.N + 1):].reshape(self.N, self.n_u)
        else:
            self.q_pred = q_ws
            self.u_pred = self.u_ws[1:]
            self.du_pred = self.du_ws
        return success

    def step(self, state: VehicleState, parameters=None):
        self.t = state.t
        success = self.solve(state, parameters)
        u = self.u_pred[0]
        self.dynamics.qu2state(state, None, u)
        if self.delay_buffer is not None:
            for i in range(self.n_u):
                self.delay_buffer[i].append(u[i])
        self.u_prev = u
        u_ws = np.vstack([self.u_pred, self.u_pred[-1:]])
        du_ws = np.vstack([self.du_pred[1:], self.du_pred[-1:]])
        self.set_warm_start(u_ws, du_ws)
        return dict(success=success, status=success)

    def get_prediction(self) -> VehiclePrediction:
        if self.state_input_prediction is None:
            self.state_input_prediction = VehiclePrediction()
        self.state_input_prediction.t = self.t
        self.dynamics.qu2prediction(self.state_input_prediction, self.q_pred, self.u_pred)
        return self.state_input_prediction

    def get_prediction_interpolator(self, extrapolate: bool = False):
        """Dense-time interpolator over the current prediction
        (reference ``CA_LTV_MPC.py:287-289``)."""
        return self.dynamics.qu2interpolator(self.t, self.q_pred, self.u_pred,
                                             extrapolate=extrapolate)

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


_COST_REG = 1e-9    # Levenberg term on every quadratized cost block (both backends)


def _quadratize_group(fn, refs, ks, nb, P, dtype):
    """Per-stage quadratic model of a cost callable around its reference points:
    returns (M, m) with cost ~ 1/2 x'Mx + m'x + const.  SHARED by the dense and
    riccati backends — their subproblems must stay linearization-identical."""

    def quad(x_ref, k):
        val_fn = lambda xx: _call1(fn, xx, P, k)
        M = jax.hessian(val_fn)(x_ref) + _COST_REG * jnp.eye(nb, dtype=dtype)
        m = jax.grad(val_fn)(x_ref)
        return M, m - M @ x_ref

    return jax.vmap(quad)(refs, ks)


def _linearize_group(fn, qs, us, ks, P):
    """Per-stage linearization of a nonlinear constraint callable: returns
    (vals, Jq, Ju).  SHARED by both backends."""

    def lin(qk, uk, k):
        val = jnp.atleast_1d(_call2(fn, qk, uk, P, k))
        Jq = jax.jacfwd(lambda qq: jnp.atleast_1d(_call2(fn, qq, uk, P, k)))(qk)
        Ju = jax.jacfwd(lambda uu: jnp.atleast_1d(_call2(fn, qk, uu, P, k)))(uk)
        return val, Jq, Ju

    return jax.vmap(lin)(qs, us, ks)


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

        self._build_plan()
        backend = getattr(params, 'qp_backend', 'auto')
        if backend == 'auto':
            # the stage-structured kernel is both O(N n^3) and the numerically sturdier
            # backend in float32 (the dense eq-QP's unpreconditioned Cholesky chain can
            # fail certification on TPU)
            backend = 'riccati'
        self.qp_backend = backend
        if backend == 'riccati':
            self._build_riccati_plan()
            self._qp_step_jit = jax.jit(self._qp_step_riccati)
        else:
            self._qp_step_jit = jax.jit(self._qp_step)
        self.initialized = True

    def _build_riccati_plan(self):
        """Stage-block layout for the structured backend (solvers/ocp_qp.py).

        Mapping: x~_k = (q_k, u_{k-1}) (= the dense layout's z_k), v_k = (du_k, s_k);
        dynamics x~_{k+1} = [[A_k, B_k],[0, I]] x~_k + [[B_k],[I], 0] v_k + [g_k; 0].
        Soft-constraint slacks s_k are extra stage INPUTS (zero dynamics columns, quad +
        linear penalties in the stage cost, -1 coefficients in their constraint rows and
        nonnegativity rows) — and a dummy pass-through dynamics stage N
        (x~_{N+1} = x~_N) makes stage N interior so its slacks s_N exist.  Every cost
        and constraint of the MPC is then stage-local in (x~_k, v_k) and the
        block-tridiagonal structure is exact — the same slack-augmented stage QP the
        reference hands HPIPM (``CA_LTV_MPC.py:446-533,563-634``).
        """
        N, n_q, n_u, n_z = self.N, self.n_q, self.n_u, self.n_z
        soft_state = list(self.soft_state_idxs or [])
        n_ss = len(soft_state)
        soft_c = list(self.params.soft_constraint_idxs or [])
        n_sc = len(soft_c)
        n_s = 2 * n_ss + n_sc
        nv = n_u + n_s
        self._ric_ns = n_s
        self._ric_nv = nv

        finite_ub = np.isfinite(np.concatenate([self.state_ub, self.input_ub]))
        finite_lb = np.isfinite(np.concatenate([self.state_lb, self.input_lb]))
        ub_idx = np.where(finite_ub)[0]
        lb_idx = np.where(finite_lb)[0]
        du_ub_idx = np.where(np.isfinite(self.du_ub))[0]
        du_lb_idx = np.where(np.isfinite(self.du_lb))[0]
        n_box = ub_idx.size + lb_idx.size
        n_du = du_ub_idx.size + du_lb_idx.size
        m_nl = max(self.n_c) if self.n_c else 0
        mi = n_box + n_du + n_s + max(m_nl, 1)
        self._ric_mi = mi
        qu_ub = np.concatenate([self.state_ub, self.input_ub])
        qu_lb = np.concatenate([self.state_lb, self.input_lb])

        # stages 0..N carry constraints; N+1 is the vacuous terminal of the dummy stage
        D0 = np.zeros((N + 2, mi, n_z))
        E0 = np.zeros((N + 2, mi, nv))
        b0 = np.ones((N + 2, mi))
        for k in range(N + 1):
            r = 0
            for j in ub_idx:
                D0[k, r, j], b0[k, r] = 1.0, qu_ub[j]
                if j < n_q and j in soft_state:
                    E0[k, r, n_u + 2 * soft_state.index(j)] = -1.0
                r += 1
            for j in lb_idx:
                D0[k, r, j], b0[k, r] = -1.0, -qu_lb[j]
                if j < n_q and j in soft_state:
                    E0[k, r, n_u + 2 * soft_state.index(j) + 1] = -1.0
                r += 1
            if k < N:
                for j in du_ub_idx:
                    E0[k, r, j], b0[k, r] = 1.0, self.du_ub[j]
                    r += 1
                for j in du_lb_idx:
                    E0[k, r, j], b0[k, r] = -1.0, -self.du_lb[j]
                    r += 1
            else:
                r += n_du
            for i in range(n_s):            # slack nonnegativity: -s_i <= 0
                E0[k, r, n_u + i], b0[k, r] = -1.0, 0.0
                r += 1
        # stage 0's x~ is fixed by the IC: boxing it adds nothing when feasible and
        # makes the QP infeasible when the measured state grazes a bound — vacuate.
        D0[0, :n_box] = 0.0
        E0[0, :n_box] = 0.0
        b0[0, :n_box] = 1.0
        nl_row0 = n_box + n_du + n_s      # first nonlinear row within each stage
        self._ric_nl_row0 = nl_row0

        # soft nonlinear rows: static -1 slack coefficient in the stage's nl block
        cs = self.constraints.get('state_input', [None] * (N + 1))
        for k in range(N + 1):
            for jj, c_idx in enumerate(soft_c):
                if cs[k] is not None and c_idx < self.n_c[k]:
                    E0[k, nl_row0 + c_idx, n_u + 2 * n_ss + jj] = -1.0
        self._ric_D0, self._ric_E0, self._ric_b0 = D0, E0, b0
        # per-slack quadratic / linear penalty diagonals (stage cost on s_k)
        quad = np.zeros(n_s)
        lin = np.zeros(n_s)
        for jj in range(n_ss):
            quad[2 * jj] = quad[2 * jj + 1] = self.soft_state_quad[jj]
            lin[2 * jj] = lin[2 * jj + 1] = self.soft_state_lin[jj]
        for jj in range(n_sc):
            quad[2 * n_ss + jj] = self.params.soft_constraint_quad[jj]
            lin[2 * n_ss + jj] = self.params.soft_constraint_lin[jj]
        self._ric_slack_quad, self._ric_slack_lin = quad, lin

    def _qp_step_riccati(self, D, q0, u_prev, P=None):
        """Structured counterpart of :meth:`_qp_step`: same linearization point, the QP
        solved by the Riccati OCP-QP kernel.  Returns (D_bar, ok)."""
        from dgsqp_tpu.solvers.ocp_qp import solve_ocp_qp

        N, n_q, n_u, n_z = self.N, self.n_q, self.n_u, self.n_z
        nv, n_s = self._ric_nv, self._ric_ns
        dtype = self.dtype
        qu = D[:n_z * (N + 1)].reshape(N + 1, n_z)
        du = D[n_z * (N + 1):].reshape(N, n_u)
        q_ref = qu[:, :n_q]
        u_ref = qu[:, n_q:]

        # ---- stage cost blocks from the same quad groups as the dense path.
        # Dynamics stages run 0..N (stage N = dummy pass-through for the s_N slacks);
        # x stages run 0..N+1.
        Qx = jnp.zeros((N + 2, n_z, n_z), dtype) + 1e-10 * jnp.eye(n_z, dtype=dtype)
        qx = jnp.zeros((N + 2, n_z), dtype)
        Rv = jnp.zeros((N + 1, nv, nv), dtype) + 1e-10 * jnp.eye(nv, dtype=dtype)
        rv = jnp.zeros((N + 1, nv), dtype)
        Sxv = jnp.zeros((N + 1, nv, n_z), dtype)
        # dummy stage N's du block is unconstrained and costless — pin it with a unit
        # quad so the Riccati H_vv stays well-conditioned in f32 (its optimum is 0)
        Rv = Rv.at[N, :n_u, :n_u].add(jnp.eye(n_u, dtype=dtype))
        if n_s:
            Rv = Rv.at[:, n_u:, n_u:].add(
                jnp.diag(jnp.asarray(self._ric_slack_quad, dtype)))
            rv = rv.at[:, n_u:].add(jnp.asarray(self._ric_slack_lin, dtype))
        x_refs = {'state': q_ref, 'input': u_ref,
                  'rate': jnp.concatenate([du, jnp.zeros((1, n_u), dtype)])}
        offs = {'state': 0, 'input': n_q}

        for kind, fn, ks, nb, _r, _c, _h in self._cost_groups:
            Ms, ms = _quadratize_group(fn, x_refs[kind][ks], ks, nb, P, dtype)
            if kind == 'rate':
                Rv = Rv.at[ks, :n_u, :n_u].add(Ms)
                rv = rv.at[ks, :n_u].add(ms)
            else:
                o = offs[kind]
                Qx = Qx.at[ks, o:o + nb, o:o + nb].add(Ms)
                qx = qx.at[ks, o:o + nb].add(ms)

        # ---- dynamics blocks: x~_{k+1} = [[A,B],[0,I]] x~ + [[B],[I],0] v + [g;0],
        # plus the dummy stage N: x~_{N+1} = x~_N
        A_all = jax.vmap(self.dynamics.fAd)(q_ref[:-1], u_ref[1:])
        B_all = jax.vmap(self.dynamics.fBd)(q_ref[:-1], u_ref[1:])
        fd_all = jax.vmap(self.dynamics.fd)(q_ref[:-1], u_ref[1:])
        g_all = fd_all - jnp.einsum('kij,kj->ki', A_all, q_ref[:-1]) \
            - jnp.einsum('kij,kj->ki', B_all, u_ref[1:])
        At = jnp.zeros((N + 1, n_z, n_z), dtype)
        At = At.at[:N, :n_q, :n_q].set(A_all)
        At = At.at[:N, :n_q, n_q:].set(B_all)
        At = At.at[:N, n_q:, n_q:].set(jnp.eye(n_u, dtype=dtype))
        At = At.at[N].set(jnp.eye(n_z, dtype=dtype))
        Bt = jnp.zeros((N + 1, n_z, nv), dtype)
        Bt = Bt.at[:N, :n_q, :n_u].set(B_all)
        Bt = Bt.at[:N, n_q:, :n_u].set(jnp.eye(n_u, dtype=dtype))
        gt = jnp.zeros((N + 1, n_z), dtype).at[:N, :n_q].set(g_all)

        # ---- inequalities: static boxes/du/slack template + linearized nonlinear rows
        Dm = jnp.asarray(self._ric_D0, dtype)
        Em = jnp.asarray(self._ric_E0, dtype)
        bm = jnp.asarray(self._ric_b0, dtype)
        r0 = self._ric_nl_row0
        for fn, ks, m, _rows, _rq, _cq, _ru, _cu in self._nl_groups:
            qs, us = q_ref[ks], u_ref[ks]
            vals, Jqs, Jus = _linearize_group(fn, qs, us, ks, P)
            Dm = Dm.at[ks, r0:r0 + m, :n_q].set(Jqs)
            Dm = Dm.at[ks, r0:r0 + m, n_q:].set(Jus)
            rhs = (jnp.einsum('kmj,kj->km', Jqs, qs)
                   + jnp.einsum('kmj,kj->km', Jus, us) - vals)
            bm = bm.at[ks, r0:r0 + m].set(rhs)

        x0t = jnp.concatenate([q0, u_prev])
        sol = solve_ocp_qp(At, Bt, gt, Qx, Sxv, Rv, qx, rv, Dm, Em, bm, x0t,
                           tol=1e-8 if dtype == jnp.float64 else 1e-6)
        D_bar = jnp.concatenate([sol.x[:N + 1].reshape(-1),
                                 sol.v[:N, :n_u].reshape(-1)])
        return D_bar, sol.ok

    def _build_plan(self):
        """Precompute the static QP structure (numpy, once): identity parts of the
        equality matrix, the full box/slack inequality block, scatter index maps for the
        stage-dependent pieces, and per-callable stage groups for vmapped evaluation.

        Kills the per-stage Python assembly loops (same treatment GameProblem/ALGAMES
        got): tracing cost is O(#distinct callables), compile time flat in N, and the
        trajectory-dependent values land in the static templates via single scatters.
        """
        from dgsqp_tpu.solvers.game_problem import _group_stages

        N, n_q, n_u, n_z = self.N, self.n_q, self.n_u, self.n_z
        n_dec = n_z * (N + 1) + n_u * N
        self.n_dec = n_dec

        soft_state = list(self.soft_state_idxs or [])
        n_ss = len(soft_state)
        n_slack_state = 2 * n_ss * (N + 1)
        soft_c = list(self.params.soft_constraint_idxs or [])
        n_sc = len(soft_c)
        n_slack_c = n_sc * (N + 1)
        n_ext = n_dec + n_slack_state + n_slack_c
        self.n_ext = n_ext

        # ------- static cost base: global diag reg + slack penalty diagonals
        H0 = np.zeros((n_ext, n_ext))
        H0[:n_dec, :n_dec] += 1e-10 * np.eye(n_dec)
        h0 = np.zeros(n_ext)
        for k in range(N + 1):
            for jj in range(n_ss):
                for side in range(2):
                    si = n_dec + 2 * (k * n_ss + jj) + side
                    H0[si, si] += self.soft_state_quad[jj]
                    h0[si] += self.soft_state_lin[jj]
            for jj in range(n_sc):
                si = n_dec + n_slack_state + k * n_sc + jj
                H0[si, si] += self.params.soft_constraint_quad[jj]
                h0[si] += self.params.soft_constraint_lin[jj]
        self._H0 = H0
        self._h0 = h0

        # ------- cost stage groups + scatter grids
        def block_grids(i0s, nb):
            i0s = np.asarray(i0s)
            zeros = np.zeros((1, nb, nb), int)
            r = i0s[:, None, None] + np.arange(nb)[None, :, None] + zeros
            c = i0s[:, None, None] + np.arange(nb)[None, None, :] + zeros
            h_idx = i0s[:, None] + np.arange(nb)[None, :]
            return r.ravel(), c.ravel(), h_idx.ravel()

        self._cost_groups = []
        for kind, nb, off_fn in (
                ('state', n_q, lambda ks: ks * n_z),
                ('input', n_u, lambda ks: ks * n_z + n_q),
                ('rate', n_u, lambda ks: n_z * (N + 1) + ks * n_u)):
            fns = self.costs.get(kind, [None] * (N + 1))
            for fn, ks in _group_stages(fns):
                if kind == 'rate':
                    # there are only N rate variables du_0..du_{N-1}: a stage-N rate
                    # entry (length-N+1 list) has no decision column — its scatter
                    # offset would land in the slack block and corrupt H
                    ks = ks[ks < N]
                    if ks.size == 0:
                        continue
                r, c, hi = block_grids(off_fn(ks), nb)
                self._cost_groups.append((kind, fn, jnp.asarray(ks), nb,
                                          jnp.asarray(r), jnp.asarray(c),
                                          jnp.asarray(hi)))

        # ------- static equality template + A/B scatter grids
        n_eq = n_z + N * n_q + N * n_u
        E0 = np.zeros((n_eq, n_ext))
        E0[:n_z, :n_z] = np.eye(n_z)
        ks = np.arange(N)
        for k in range(N):
            r0 = n_z + k * n_q
            E0[r0:r0 + n_q, (k + 1) * n_z:(k + 1) * n_z + n_q] = np.eye(n_q)
            r1 = n_z + N * n_q + k * n_u
            E0[r1:r1 + n_u, (k + 1) * n_z + n_q:(k + 2) * n_z] = np.eye(n_u)
            E0[r1:r1 + n_u, k * n_z + n_q:(k + 1) * n_z] = -np.eye(n_u)
            E0[r1:r1 + n_u, n_z * (N + 1) + k * n_u:n_z * (N + 1) + (k + 1) * n_u] = \
                -np.eye(n_u)
        self._E0 = E0
        rA = (n_z + ks[:, None, None] * n_q + np.arange(n_q)[None, :, None]
              + np.zeros((1, 1, n_q), int))
        cA = ks[:, None, None] * n_z + np.arange(n_q)[None, None, :] \
            + np.zeros((1, n_q, 1), int)
        rB = (n_z + ks[:, None, None] * n_q + np.arange(n_q)[None, :, None]
              + np.zeros((1, 1, n_u), int))
        cB = (ks[:, None, None] + 1) * n_z + n_q + np.arange(n_u)[None, None, :] \
            + np.zeros((1, n_q, 1), int)
        self._rA, self._cA = jnp.asarray(rA.ravel()), jnp.asarray(cA.ravel())
        self._rB, self._cB = jnp.asarray(rB.ravel()), jnp.asarray(cB.ravel())

        # ------- static inequality block: boxes, slack non-negativity, du bounds
        A_rows, b_rows = [], []
        finite_ub = np.isfinite(np.concatenate([self.state_ub, self.input_ub]))
        finite_lb = np.isfinite(np.concatenate([self.state_lb, self.input_lb]))
        qu_ub = np.concatenate([self.state_ub, self.input_ub])
        qu_lb = np.concatenate([self.state_lb, self.input_lb])
        for k in range(N + 1):
            i0 = k * n_z
            for j in np.where(finite_ub)[0]:
                row = np.zeros(n_ext)
                row[i0 + j] = 1.0
                if j in soft_state:
                    row[n_dec + 2 * (k * n_ss + soft_state.index(j))] = -1.0
                A_rows.append(row)
                b_rows.append(qu_ub[j])
            for j in np.where(finite_lb)[0]:
                row = np.zeros(n_ext)
                row[i0 + j] = -1.0
                if j in soft_state:
                    row[n_dec + 2 * (k * n_ss + soft_state.index(j)) + 1] = -1.0
                A_rows.append(row)
                b_rows.append(-qu_lb[j])
        for si in range(n_dec, n_ext):
            row = np.zeros(n_ext)
            row[si] = -1.0
            A_rows.append(row)
            b_rows.append(0.0)
        for k in range(N):
            i0 = n_z * (N + 1) + k * n_u
            for j in np.where(np.isfinite(self.du_ub))[0]:
                row = np.zeros(n_ext)
                row[i0 + j] = 1.0
                A_rows.append(row)
                b_rows.append(self.du_ub[j])
            for j in np.where(np.isfinite(self.du_lb))[0]:
                row = np.zeros(n_ext)
                row[i0 + j] = -1.0
                A_rows.append(row)
                b_rows.append(-self.du_lb[j])
        self._A_box = np.stack(A_rows) if A_rows else np.zeros((0, n_ext))
        self._b_box = np.asarray(b_rows)

        # ------- nonlinear constraint groups: static template w/ soft coeffs + grids
        cs = self.constraints.get('state_input', [None] * (N + 1))
        n_nl = int(sum(self.n_c))
        row_off = np.concatenate([[0], np.cumsum(self.n_c)]).astype(int)
        A_nl0 = np.zeros((n_nl, n_ext))
        for k in range(N + 1):
            for jj, c_idx in enumerate(soft_c):
                if cs[k] is not None and c_idx < self.n_c[k]:
                    A_nl0[row_off[k] + c_idx,
                          n_dec + n_slack_state + k * n_sc + jj] = -1.0
        self._A_nl0 = A_nl0
        self._n_nl = n_nl
        self._nl_groups = []
        for fn, ks in _group_stages(cs):
            m = self.n_c[int(ks[0])]
            rows = np.stack([row_off[k] + np.arange(m) for k in ks])      # (G, m)
            rq = np.repeat(rows[:, :, None], n_q, axis=2)
            cq = (ks[:, None, None] * n_z + np.arange(n_q)[None, None, :]
                  + np.zeros((1, m, 1), int))
            ru = np.repeat(rows[:, :, None], n_u, axis=2)
            cu = (ks[:, None, None] * n_z + n_q + np.arange(n_u)[None, None, :]
                  + np.zeros((1, m, 1), int))
            self._nl_groups.append((fn, jnp.asarray(ks), m,
                                    jnp.asarray(rows.ravel()),
                                    jnp.asarray(rq.ravel()), jnp.asarray(cq.ravel()),
                                    jnp.asarray(ru.ravel()), jnp.asarray(cu.ravel())))

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

        All stage structure was precomputed by :meth:`_build_plan`; this traces one
        vmapped evaluation per distinct callable and a handful of scatters.
        Returns (D_bar, ok).
        """
        N, n_q, n_u, n_z = self.N, self.n_q, self.n_u, self.n_z
        n_dec, n_ext = self.n_dec, self.n_ext
        dtype = self.dtype
        qu = D[:n_z * (N + 1)].reshape(N + 1, n_z)
        du = D[n_z * (N + 1):].reshape(N, n_u)
        q_ref = qu[:, :n_q]
        u_ref = qu[:, n_q:]          # u_ref[k] = u_{k-1}

        # ---------------- quadratic cost  1/2 z'Hz + h'z (stage groups + scatter)
        H = jnp.asarray(self._H0, dtype)
        h = jnp.asarray(self._h0, dtype)
        x_refs = {'state': q_ref, 'input': u_ref,
                  'rate': jnp.concatenate([du, jnp.zeros((1, n_u), dtype)])}

        for kind, fn, ks, nb, r_idx, c_idx, h_idx in self._cost_groups:
            Ms, ms = _quadratize_group(fn, x_refs[kind][ks], ks, nb, P, dtype)
            H = H.at[r_idx, c_idx].add(Ms.reshape(-1))
            h = h.at[h_idx].add(ms.reshape(-1))

        # ---------------- equality constraints E z = d (template + A/B scatter)
        A_all = jax.vmap(self.dynamics.fAd)(q_ref[:-1], u_ref[1:])
        B_all = jax.vmap(self.dynamics.fBd)(q_ref[:-1], u_ref[1:])
        fd_all = jax.vmap(self.dynamics.fd)(q_ref[:-1], u_ref[1:])
        g_all = fd_all - jnp.einsum('kij,kj->ki', A_all, q_ref[:-1]) \
            - jnp.einsum('kij,kj->ki', B_all, u_ref[1:])
        E = jnp.asarray(self._E0, dtype)
        E = E.at[self._rA, self._cA].set(-A_all.reshape(-1))
        E = E.at[self._rB, self._cB].set(-B_all.reshape(-1))
        d = jnp.concatenate([q0, u_prev, g_all.reshape(-1),
                             jnp.zeros(N * n_u, dtype)])

        # ---------------- inequalities: static box/slack/du block + linearized
        # nonlinear rows (soft coefficients live in the static template)
        A_nl = jnp.asarray(self._A_nl0, dtype)
        b_nl = jnp.zeros(self._n_nl, dtype)
        for fn, ks, m, rows, rq, cq, ru, cu in self._nl_groups:
            qs, us = q_ref[ks], u_ref[ks]   # stage k uses (q_k, u_{k-1})
            vals, Jqs, Jus = _linearize_group(fn, qs, us, ks, P)
            A_nl = A_nl.at[rq, cq].set(Jqs.reshape(-1))
            A_nl = A_nl.at[ru, cu].set(Jus.reshape(-1))
            rhs = (jnp.einsum('kmj,kj->km', Jqs, qs)
                   + jnp.einsum('kmj,kj->km', Jus, us) - vals)
            b_nl = b_nl.at[rows].set(rhs.reshape(-1))

        A_in = jnp.concatenate([jnp.asarray(self._A_box, dtype), A_nl], axis=0)
        b_in = jnp.concatenate([jnp.asarray(self._b_box, dtype), b_nl])

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

"""DGSQP: sequential quadratic programming for open-loop generalized Nash equilibria.

TPU-native re-implementation of the reference ICRA-23 algorithm
(``/root/reference/DGSQP/solvers/DGSQP.py:25-1327``).  The mathematical content — condensed
game derivatives, convexified QP subproblem, KKT-residual merit function with adaptive penalty,
Armijo and watchdog globalization, abs/rel convergence tests — matches the reference
decision-for-decision; the execution model is completely different:

  * the whole solve is ONE jit-compiled ``lax.while_loop``; no Python in the hot loop;
  * the watchdog non-monotone strategy (reference ``_watchdog_line_search_4``,
    ``DGSQP.py:1174-1288``) is flattened into a bounded mode-machine so that every iteration
    has a fixed compute signature — the shape that lets ``vmap`` run thousands of games in
    lockstep with per-game masking instead of per-game Python control flow;
  * the QP backend is the batched IPM kernel (``dgsqp_tpu/solvers/qp.py``) instead of OSQP;
  * ``_nearestPD`` eigenvalue clipping + reg*I (``DGSQP.py:232-239,1290-1296``) is the batched
    ``regularized_convexification``.

Status codes returned in ``SQPResult.status``:
    1 conv_abs_tol   2 conv_rel_tol   3 diverged   4 qp_fail   5 max_it   0 still-running
"""
from __future__ import annotations

import time
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.game_problem import GameProblem
from dgsqp_tpu.solvers.qp import solve_qp
from dgsqp_tpu.solvers.solver_types import DGSQPParams
from dgsqp_tpu.types import VehiclePrediction, VehicleState
from dgsqp_tpu.utils.math import regularized_convexification

# status codes
(RUNNING, CONV_ABS, CONV_REL, DIVERGED, QP_FAIL, MAX_IT, TIME_LIMIT,
 STALLED) = 0, 1, 2, 3, 4, 5, 6, 7
STATUS_MSG = {CONV_ABS: 'conv_abs_tol', CONV_REL: 'conv_rel_tol', DIVERGED: 'diverged',
              QP_FAIL: 'qp_fail', MAX_IT: 'max_it', RUNNING: 'running',
              TIME_LIMIT: 'time_limit', STALLED: 'stalled'}


class SQPResult(NamedTuple):
    u: jnp.ndarray
    l: jnp.ndarray
    status: jnp.ndarray      # int32 code
    iters: jnp.ndarray
    qp_solves: jnp.ndarray
    p_feas: jnp.ndarray
    comp: jnp.ndarray
    stat: jnp.ndarray


class _Carry(NamedTuple):
    u: jnp.ndarray
    l: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray
    rel_its: jnp.ndarray
    qp_solves: jnp.ndarray
    p_feas: jnp.ndarray
    comp: jnp.ndarray
    stat: jnp.ndarray
    stat_best: jnp.ndarray   # best stationarity seen (stagnation escape)
    stall: jnp.ndarray       # consecutive iterations without 1% stat improvement
    B: jnp.ndarray      # BFGS Hessian approximation (unused when exact Hessians)
    B_u: jnp.ndarray    # iterate at which B was last updated


# flat round-machine modes (see DGSQP._make_round_body)
FM_STEP, FM_AB, FM_INS2, FM_INS3, FM_FB = 0, 1, 2, 3, 4


class _FlatCarry(NamedTuple):
    """Per-game state of the flattened SQP+watchdog round machine."""
    u: jnp.ndarray          # accepted iterate
    l: jnp.ndarray
    it: jnp.ndarray
    status: jnp.ndarray
    rel_its: jnp.ndarray
    qp_solves: jnp.ndarray
    p_feas: jnp.ndarray     # convergence quantities at the current iteration's start
    comp: jnp.ndarray
    stat: jnp.ndarray
    mode: jnp.ndarray       # FM_* watchdog mode
    t: jnp.ndarray          # watchdog relaxed-step counter
    u_cur: jnp.ndarray      # current watchdog candidate
    l_cur: jnp.ndarray
    s_pred: jnp.ndarray     # predicted slack at u_cur (for the A/B merit check)
    u_prev: jnp.ndarray     # last point before the most recent relaxed full step
    l_prev: jnp.ndarray
    u_k: jnp.ndarray        # iteration-start data (for the mode-4 fallback line search)
    du_k: jnp.ndarray
    l_k: jnp.ndarray
    dl_k: jnp.ndarray
    s_k: jnp.ndarray
    ds_k: jnp.ndarray
    mu: jnp.ndarray         # iteration merit penalty
    phi_k: jnp.ndarray      # merit and directional derivative at the iteration start
    dphi_k: jnp.ndarray
    stat_best: jnp.ndarray  # best stationarity seen (stagnation escape)
    stall: jnp.ndarray      # consecutive iterations without 1% stat improvement
    qp_lam: jnp.ndarray     # previous round's QP duals/slacks (IPM warm start)
    qp_t: jnp.ndarray


def _merit_phi(l, s, q, G, g, mu, use_l1: bool):
    """Merit = 1/2 ||KKT stationarity||^2 (+ mu * l1 violation)
    (reference ``DGSQP.py:962-976``)."""
    return _merit_phi_dg(q + G.T @ l, g, l, s, mu, use_l1)


def _merit_phi_dg(d, g, l, s, mu, use_l1: bool):
    """Merit from precomputed d = q + G'l (the Jacobian-free form)."""
    stat_norm = 0.5 * (jnp.dot(d, d) + jnp.dot(l, g) ** 2)
    if use_l1:
        return stat_norm + mu * jnp.sum(g - s)
    return stat_norm


def _merit_dphi(du, l, dl, s, Q, q, G, g, mu, use_l1: bool):
    """Directional derivative of the merit along (du, dl) (reference ``DGSQP.py:964-967``)."""
    d = q + G.T @ l
    dstat = jnp.dot(d, Q @ du + G.T @ dl) + jnp.dot(l, g) * (l @ (G @ du) + jnp.dot(dl, g))
    if use_l1:
        return dstat - mu * jnp.sum(g - s)
    return dstat


def _get_mu(du, l, dl, s, Q, q, G, g, merit_function: str):
    """Adaptive merit penalty (reference ``_get_mu``, ``DGSQP.py:559-585``).

    The reference compares the violation against an exact-zero threshold; in floating point
    active constraints sit at +/- machine noise, which would produce an astronomically large
    penalty (|d| / eps) that poisons the line search.  We therefore use a dtype-aware noise
    floor below which the iterate counts as feasible (mu = 0).
    """
    if merit_function == 'stat':
        return jnp.asarray(0.0, dtype=q.dtype)
    constr_vio = jnp.sum(g - s)
    d_stat = _merit_dphi(du, l, dl, s, Q, q, G, g, 0.0, use_l1=True)
    rho = 0.5
    thresh = (1e-10 if q.dtype == jnp.float64 else 1e-5) * (1.0 + jnp.max(jnp.abs(g)))
    mu_pos = jnp.abs(d_stat) / ((1 - rho) * jnp.maximum(constr_vio, 1e-300))
    return jnp.where(constr_vio > thresh, mu_pos, 0.0)


class DGSQP:
    """Host-facing solver with the reference's interface
    (``initialize/solve/step/get_prediction``, constructor ``DGSQP.py:26-34``)."""

    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params: DGSQPParams = None, print_method=print, xy_plot=None,
                 use_mx: bool = False, dtype=None):
        params = params or DGSQPParams()
        self.params = params
        self.joint_dynamics = joint_dynamics
        self.M = joint_dynamics.n_a
        self.N = params.N
        self.print_method = (lambda s: None) if print_method is None else print_method

        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        self.dtype = dtype

        self.problem = GameProblem(joint_dynamics, costs, agent_constraints,
                                   shared_constraints, bounds, params.N, dtype=dtype)
        self.n_u = self.problem.n_u
        self.n_q = self.problem.n_q
        self.n_c = self.problem.n_c_total
        self.n_dec = self.problem.n_dec
        self.num_ua_d = self.problem.num_ua_d
        self.num_ua_el = self.problem.num_ua_el

        self.q_pred = np.zeros((self.N + 1, self.n_q))
        self.u_pred = np.zeros((self.N, self.n_u))
        self.l_pred = np.zeros(self.n_c)
        self.u_ws = np.zeros(self.N * self.n_u)
        self.l_ws = None
        self.u_prev = np.zeros(self.n_u)
        self.state_input_predictions = [VehiclePrediction() for _ in range(self.M)]

        # static input-box / state-pair structure for the QP kernel's GEMM split (opt-in)
        _split = getattr(params, 'qp_box_split', False)
        self._qp_box = self.problem.input_box_structure() if _split else None
        self._qp_pairs = self.problem.state_pair_structure() if _split else None
        if self._qp_pairs is not None and not self._qp_pairs[0]:
            self._qp_pairs = None

        self._solve_jit = jax.jit(self._solve_core)
        self._solve_batch_jit = jax.jit(jax.vmap(self._solve_core))
        self.initialized = True

    # ------------------------------------------------------------------ pieces
    def _eval_full(self, u, l, x0, up, P):
        if getattr(self.params, 'hessian_mode', 'ad') == 'dp':
            return self.problem.evaluate_dp(u, l, x0, up, P, hessian=True)
        return self.problem.evaluate(u, l, x0, up, P, hessian=True)

    def _eval_lite(self, u, l, x0, up, P):
        q, G, g, _ = self.problem.evaluate(u, l, x0, up, P, hessian=False)
        return q, G, g

    def _qp(self, Q, q, G, g, warm=None):
        method = getattr(self.params, 'conv_method', 'eigh')
        Qh = regularized_convexification(
            Q, self.params.reg, method=method,
            ns_iters=getattr(self.params, 'conv_ns_iters', 14),
            ns_safety=getattr(self.params, 'conv_ns_safety', 1e-3),
            ns_equilibrate=getattr(self.params, 'conv_ns_equil', False))
        # conv_method='none' keeps the indefinite game Hessian and routes the QP to the
        # nonconvex kernel path (the reference's IPOPT/CPLEX OptimalityTarget=2 option,
        # DGSQP.py:204-228)
        sol = solve_qp(Qh, q, G, -g, tol=self.params.qp_tol,
                       max_iters=self.params.qp_max_iters,
                       polish_iters=getattr(self.params, 'qp_polish_iters', 4),
                       warm=warm, indefinite=(method == 'none'),
                       box=getattr(self, '_qp_box', None),
                       pairs=getattr(self, '_qp_pairs', None),
                       correctors=getattr(self.params, 'qp_correctors', 0))
        # The reference takes whatever step its QP backend returns — it sets
        # error_on_fail=False and never inspects the OSQP return status, so 'qp_fail'
        # only fires on an exception (DGSQP.py:186,244-266).  Match that: reject the
        # step only when the solution is non-finite, not when the accuracy certificate
        # misses; the globalization machinery absorbs sloppy steps exactly as it does
        # for loose OSQP (eps 1e-3) solutions.
        finite = jnp.isfinite(sol.x).all() & jnp.isfinite(sol.lam).all()
        return sol.x, sol.lam, finite, sol.t

    def _line_search(self, enabled, u, du, l, dl, s, ds, Q, q, G, g, mu, x0, up, P):
        """Armijo backtracking (reference ``_line_search_3``, ``DGSQP.py:1057-1081``).

        Returns the final trial point (accepted or not, matching the reference which returns
        the last trial on line-search failure).  ``enabled=False`` games return (u, l)
        untouched; the loop is masked so batched games in different modes coexist.
        """
        p = self.params
        use_l1 = p.merit_function == 'stat_l1'
        phi0 = _merit_phi(l, s, q, G, g, mu, use_l1)
        dphi0 = _merit_dphi(du, l, dl, s, Q, q, G, g, mu, use_l1)
        return self._grid_ls(enabled, u, du, l, dl, s, ds, phi0, dphi0, mu, x0, up, P)

    def _grid_ls(self, enabled, u, du, l, dl, s, ds, phi0, dphi0, mu, x0, up, P):
        """Parallel trial grid: backtracking visits alpha = tau^j in order and takes the
        FIRST Armijo-accepted trial, so evaluating the whole geometric grid at once and
        selecting the first accepted index is decision-identical — but it is ONE fixed-cost
        vmapped merit evaluation instead of a lockstep-serial while loop whose trip count
        is the max trial count over the whole game batch.  Merit trials are Jacobian-free
        (GameProblem.merit_terms)."""
        p = self.params
        use_l1 = p.merit_function == 'stat_l1'
        W = p.line_search_iters
        alphas = jnp.asarray(p.tau, self.dtype) ** jnp.arange(W, dtype=self.dtype)

        def phi_at(alpha):
            u_try = u + alpha * du
            l_try = l + alpha * dl
            s_try = s + alpha * ds
            d_t, g_t = self.problem.merit_terms(u_try, l_try, x0, up, P)
            return _merit_phi_dg(d_t, g_t, l_try, s_try, mu, use_l1)

        phis = jax.vmap(phi_at)(alphas)
        ok = phis <= phi0 + p.beta * alphas * dphi0
        # first accepted trial; on total failure the LAST trial (reference returns the
        # final backtracked point on line-search failure, DGSQP.py:1057-1081)
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), W - 1)
        alpha_sel = alphas[idx]
        u_t = jnp.where(enabled, u + alpha_sel * du, u)
        l_t = jnp.where(enabled, l + alpha_sel * dl, l)
        phi_out = jnp.where(enabled, phis[idx], phi0)
        return u_t, l_t, phi_out

    # ------------------------------------------------------------- globalization
    def _watchdog(self, u_k, du_k, l_k, dl_k, s_k, ds_k, Q_k, q_k, G_k, g_k, mu,
                  x0, up, P):
        """Non-monotone watchdog step acceptance (reference ``_watchdog_line_search_4``,
        ``DGSQP.py:1174-1288``), flattened into a bounded mode machine.

        Modes: 0 = checking the latest relaxed full step (covers the initial full step and
        the t_hat follow-on steps), 2 = insurance QP + line search, 3 = second insurance
        round, 4 = fallback line search along the original step, 5 = done.
        """
        p = self.params
        use_l1 = p.merit_function == 'stat_l1'
        t_hat = 5
        merit_max = 1e6

        phi_k = _merit_phi(l_k, s_k, q_k, G_k, g_k, mu, use_l1)
        dphi_k = _merit_dphi(du_k, l_k, dl_k, s_k, Q_k, q_k, G_k, g_k, mu, use_l1)
        accept_ref = phi_k + p.beta * dphi_k

        # machine carry
        class C(NamedTuple):
            mode: jnp.ndarray
            t: jnp.ndarray
            u_cur: jnp.ndarray
            l_cur: jnp.ndarray
            s_pred: jnp.ndarray       # predicted slack at u_cur (for the A/B phi check)
            u_prev: jnp.ndarray       # last point before the most recent full step
            l_prev: jnp.ndarray
            u_out: jnp.ndarray
            l_out: jnp.ndarray
            qp_n: jnp.ndarray

        def cond(c: C):
            return c.mode != 5

        def body(c: C) -> C:
            mode = c.mode
            # --- one full evaluation at the current point (used by every mode except 4)
            Q_t, q_t, G_t, g_t, _ = self._eval_full(c.u_cur, c.l_cur, x0, up, P)
            phi_cur = _merit_phi(c.l_cur, c.s_pred, q_t, G_t, g_t, mu, use_l1)

            in_ab = mode == 0
            # reference priority: inside the t-loop the merit_max break precedes the
            # acceptance test (DGSQP.py:1234-1240); the initial full step (t==1) has no
            # merit_max check (DGSQP.py:1197-1203).
            over_max = in_ab & (phi_cur > merit_max) & (c.t > 1)
            accepted_ab = in_ab & (phi_cur <= accept_ref) & ~over_max
            exhausted = in_ab & (c.t >= t_hat + 1) & ~accepted_ab & ~over_max

            # --- one QP at the point the next phase needs
            # mode 0 (continuing): QP at u_cur to take the next relaxed step
            # mode 2/3: QP at u_cur for the insurance line searches
            du_t, lhat_t, qp_ok, _ = self._qp(Q_t, q_t, G_t, g_t)
            dl_t = lhat_t - c.l_cur
            s_t = jnp.minimum(0.0, g_t)
            ds_t = g_t + G_t @ du_t - s_t
            qp_used = (in_ab & ~accepted_ab & ~over_max & ~exhausted) | (mode == 2) | (mode == 3)
            qp_n = c.qp_n + jnp.where(qp_used, 1, 0)

            # --- one (masked) line search shared by modes 2, 3, 4
            ls_enabled = (mode == 2) | (mode == 3) | (mode == 4)
            is_fallback = mode == 4
            ls_u = jnp.where(is_fallback, u_k, c.u_cur)
            ls_l = jnp.where(is_fallback, l_k, c.l_cur)
            ls_du = jnp.where(is_fallback, du_k, du_t)
            ls_dl = jnp.where(is_fallback, dl_k, dl_t)
            ls_s = jnp.where(is_fallback, s_k, s_t)
            ls_ds = jnp.where(is_fallback, ds_k, ds_t)
            ls_Q = jnp.where(is_fallback, Q_k, Q_t)
            ls_q = jnp.where(is_fallback, q_k, q_t)
            ls_G = jnp.where(is_fallback, G_k, G_t)
            ls_g = jnp.where(is_fallback, g_k, g_t)
            u_ls, l_ls, phi_ls = self._line_search(
                ls_enabled & qp_ok | is_fallback, ls_u, ls_du, ls_l, ls_dl, ls_s, ls_ds,
                ls_Q, ls_q, ls_G, ls_g, mu, x0, up, P)

            # ---------------- transitions
            # mode 0 transitions
            next_mode = mode
            u_next, l_next = c.u_cur, c.l_cur
            s_next, u_pv, l_pv = c.s_pred, c.u_prev, c.l_prev
            u_out, l_out = c.u_out, c.l_out

            # accepted in A/B: done
            u_out = jnp.where(accepted_ab, c.u_cur, u_out)
            l_out = jnp.where(accepted_ab, c.l_cur, l_out)
            next_mode = jnp.where(accepted_ab, 5, next_mode)
            # merit blow-up: insurance from the previous good point
            u_next = jnp.where(over_max, c.u_prev, u_next)
            l_next = jnp.where(over_max, c.l_prev, l_next)
            next_mode = jnp.where(over_max, 2, next_mode)
            # exhausted the watchdog window: insurance from current point
            next_mode = jnp.where(exhausted, 2, next_mode)
            # continuing in B: QP failure -> fallback, else take the relaxed full step
            cont = in_ab & ~accepted_ab & ~over_max & ~exhausted
            next_mode = jnp.where(cont & ~qp_ok, 4, next_mode)
            step_ok = cont & qp_ok
            u_pv = jnp.where(step_ok, c.u_cur, u_pv)
            l_pv = jnp.where(step_ok, c.l_cur, l_pv)
            u_next = jnp.where(step_ok, c.u_cur + du_t, u_next)
            l_next = jnp.where(step_ok, lhat_t, l_next)
            s_next = jnp.where(step_ok, s_t + ds_t, s_next)
            t_next = jnp.where(step_ok, c.t + 1, c.t)

            # mode 2 transitions (insurance line search)
            m2 = mode == 2
            m2_fail_qp = m2 & ~qp_ok
            m2_acc = m2 & qp_ok & (phi_ls <= accept_ref)
            m2_worse = m2 & qp_ok & (phi_ls > phi_k) & ~m2_acc
            m2_cont = m2 & qp_ok & ~m2_acc & ~m2_worse
            u_out = jnp.where(m2_acc, u_ls, u_out)
            l_out = jnp.where(m2_acc, l_ls, l_out)
            next_mode = jnp.where(m2_acc, 5, next_mode)
            next_mode = jnp.where(m2_fail_qp | m2_worse, 4, next_mode)
            u_next = jnp.where(m2_cont, u_ls, u_next)
            l_next = jnp.where(m2_cont, l_ls, l_next)
            next_mode = jnp.where(m2_cont, 3, next_mode)

            # mode 3 transitions (second insurance round — always terminal on success)
            m3 = mode == 3
            m3_fail_qp = m3 & ~qp_ok
            m3_done = m3 & qp_ok
            u_out = jnp.where(m3_done, u_ls, u_out)
            l_out = jnp.where(m3_done, l_ls, l_out)
            next_mode = jnp.where(m3_done, 5, next_mode)
            next_mode = jnp.where(m3_fail_qp, 4, next_mode)

            # mode 4 (fallback): always terminal
            m4 = mode == 4
            u_out = jnp.where(m4, u_ls, u_out)
            l_out = jnp.where(m4, l_ls, l_out)
            next_mode = jnp.where(m4, 5, next_mode)

            return C(next_mode, t_next, u_next, l_next, s_next, u_pv, l_pv,
                     u_out, l_out, qp_n)

        init = C(mode=jnp.asarray(0), t=jnp.asarray(1),
                 u_cur=u_k + du_k, l_cur=l_k + dl_k, s_pred=s_k + ds_k,
                 u_prev=u_k, l_prev=l_k,
                 u_out=u_k, l_out=l_k, qp_n=jnp.asarray(0))
        out = jax.lax.while_loop(cond, body, init)
        return out.u_out, out.l_out, out.qp_n

    # ----------------------------------------------------------------- core loop
    def _make_body(self, x0, up, P):
        p = self.params
        dtype = self.dtype
        xtol = p.p_tol
        ltol = p.d_tol
        rel_tol_req = 3

        use_bfgs = p.hessian_approximation == 'bfgs'

        def body(c: _Carry) -> _Carry:
            # Under vmap the loop runs while ANY game is active; finished games must freeze.
            running = c.status == RUNNING

            if use_bfgs:
                # Damped BFGS update of the game Hessian (reference Nocedal proc. 18.2,
                # ``DGSQP.py:535-557``): gradient map d(u) = q + G'l at fixed l.
                q, G, g = self._eval_lite(c.u, c.l, x0, up, P)
                d_now = q + G.T @ c.l
                # gradient map at the previous iterate: Jacobian-free (only d is needed)
                d_prev = self.problem.stationarity(c.B_u, c.l, x0, up, P)
                y = d_now - d_prev
                sv = c.u - c.B_u
                Bs = regularized_convexification(c.B, 0.0) @ sv
                sBs = jnp.dot(sv, Bs)
                sy = jnp.dot(sv, y)
                t = jnp.where(sy >= 0.2 * sBs, 1.0,
                              0.8 * sBs / jnp.where(jnp.abs(sBs - sy) > 1e-300,
                                                    sBs - sy, 1e-300))
                r = t * y + (1 - t) * Bs
                B_upd = c.B - jnp.outer(Bs, Bs) / jnp.where(jnp.abs(sBs) > 1e-300, sBs, 1e-300) \
                    + jnp.outer(r, r) / jnp.maximum(jnp.dot(sv, r), 1e-300)
                first = c.it == 0
                valid = jnp.isfinite(B_upd).all() & (jnp.linalg.norm(sv) > 1e-14)
                Q = jnp.where(first | ~valid, c.B, B_upd)
            else:
                Q, q, G, g, _ = self._eval_full(c.u, c.l, x0, up, P)
            d = q + G.T @ c.l
            p_feas = jnp.maximum(0.0, jnp.max(g)) if self.n_c > 0 else jnp.asarray(0.0, dtype)
            comp = jnp.max(jnp.abs(g * c.l)) if self.n_c > 0 else jnp.asarray(0.0, dtype)
            stat = jnp.max(jnp.abs(d))

            diverged = stat > 1e5
            converged = (p_feas < xtol) & (comp < ltol) & (stat < ltol)
            keep_going = running & ~diverged & ~converged

            du, lhat, qp_ok, _ = self._qp(Q, q, G, g)
            dl = lhat - c.l
            s = jnp.minimum(0.0, g)
            ds = g + G @ du - s
            mu = _get_mu(du, c.l, dl, s, Q, q, G, g, p.merit_function)

            if p.nonmono_ls:
                u_n, l_n, wd_qp = self._watchdog(c.u, du, c.l, dl, s, ds, Q, q, G, g, mu,
                                                 x0, up, P)
                qp_add = 1 + wd_qp
            else:
                u_n, l_n, _ = self._line_search(jnp.asarray(True), c.u, du, c.l, dl, s, ds,
                                                Q, q, G, g, mu, x0, up, P)
                qp_add = jnp.asarray(1)

            active = keep_going & qp_ok
            u_out = jnp.where(active, u_n, c.u)
            l_out = jnp.where(active, l_n, c.l)

            B_next = jnp.where(use_bfgs & active, Q, c.B) if use_bfgs else c.B
            B_u_next = jnp.where(use_bfgs & active, c.u, c.B_u) if use_bfgs else c.B_u

            # relative-tolerance convergence (reference DGSQP.py:453-462)
            small = (jnp.linalg.norm(u_out - c.u) < xtol / 2) & \
                    (jnp.linalg.norm(l_out - c.l) < ltol / 2)
            rel_its = jnp.where(active & small, c.rel_its + 1, 0)
            conv_rel = active & (rel_its >= rel_tol_req) & (p_feas < xtol)

            it_next = c.it + jnp.where(active, 1, 0)
            qp_solves = c.qp_solves + jnp.where(keep_going, qp_add, 0)
            # deterministic analog of the reference's per-solve time_limit escape
            # (DGSQP.py:470-474): bound the cumulative QP-solve budget per game
            if p.qp_solves_limit is not None:
                over_budget = qp_solves >= p.qp_solves_limit
            else:
                over_budget = jnp.asarray(False)
            # stagnation escape: consecutive iterations without 1% stationarity
            # improvement (the plateau signature of the no-attainable-GNE instances —
            # see docs/convergence_analysis.md; deterministic time_limit analog)
            improved = stat < 0.99 * c.stat_best
            stat_best = jnp.where(active, jnp.minimum(stat, c.stat_best), c.stat_best)
            stall = jnp.where(active, jnp.where(improved, 0, c.stall + 1), c.stall)
            if p.stall_its is not None:
                is_stalled = stall >= p.stall_its
            else:
                is_stalled = jnp.asarray(False)
            new_status = jnp.where(converged, CONV_ABS,
                          jnp.where(diverged, DIVERGED,
                           jnp.where(~qp_ok, QP_FAIL,
                            jnp.where(conv_rel, CONV_REL,
                             jnp.where(it_next >= p.sqp_iters, MAX_IT,
                              jnp.where(over_budget, TIME_LIMIT,
                               jnp.where(is_stalled, STALLED, RUNNING)))))))
            status = jnp.where(running, new_status, c.status).astype(jnp.int32)
            p_feas = jnp.where(running, p_feas, c.p_feas)
            comp = jnp.where(running, comp, c.comp)
            stat = jnp.where(running, stat, c.stat)
            rel_its = jnp.where(running, rel_its, c.rel_its)
            stat_best = jnp.where(running, stat_best, c.stat_best)
            stall = jnp.where(running, stall, c.stall)
            return _Carry(u_out, l_out, it_next, status, rel_its,
                          qp_solves, p_feas, comp, stat, stat_best, stall,
                          B_next, B_u_next)

        return body

    # --------------------------------------------- flattened round machine
    def _make_round_body(self, x0, up, P):
        """One lockstep ROUND of the flattened SQP+watchdog machine.

        The nested formulation (``_make_body`` + ``_watchdog``) runs a while-loop of
        watchdog rounds INSIDE each SQP iteration; under ``vmap`` every game pays the
        slowest game's round count in every iteration (sum over iterations of the
        batch max).  Here the watchdog mode machine is hoisted to the top level: every
        round is exactly one evaluate + one convexified QP + one grid line search, and
        each game advances its own (iteration, watchdog-mode) state — the batch cost
        becomes the max over games of their own total round counts.  Decisions are
        identical to the nested machine (which mirrors the reference
        ``_watchdog_line_search_4``, ``DGSQP.py:1174-1288``).

        Mode map (nested watchdog mode in parens): FM_STEP = evaluate + QP at the
        accepted iterate to form a fresh step; FM_AB (0) = relaxed full-step A/B check,
        fused with next-step formation on acceptance; FM_INS2/FM_INS3 (2/3) = insurance
        QP + line search; FM_FB (4) = fallback line search along the iteration's
        original step.
        """
        p = self.params
        dtype = self.dtype
        xtol, ltol = p.p_tol, p.d_tol
        rel_tol_req = 3
        t_hat = 5
        merit_max = 1e6
        use_l1 = p.merit_function == 'stat_l1'

        def body(c: _FlatCarry) -> _FlatCarry:
            running = c.status == RUNNING
            is_step = c.mode == FM_STEP
            is_ab = c.mode == FM_AB
            is_2 = c.mode == FM_INS2
            is_3 = c.mode == FM_INS3
            is_fb = c.mode == FM_FB

            u_eval = jnp.where(is_step, c.u, c.u_cur)
            l_eval = jnp.where(is_step, c.l, c.l_cur)

            # ---- the round's single evaluate + QP
            Q_t, q_t, G_t, g_t, _ = self._eval_full(u_eval, l_eval, x0, up, P)
            d_t = q_t + G_t.T @ l_eval
            p_feas_t = jnp.maximum(0.0, jnp.max(g_t)) if self.n_c > 0 \
                else jnp.asarray(0.0, dtype)
            comp_t = jnp.max(jnp.abs(g_t * l_eval)) if self.n_c > 0 \
                else jnp.asarray(0.0, dtype)
            stat_t = jnp.max(jnp.abs(d_t))

            warm = (c.qp_lam, c.qp_t) if p.qp_warm_start else None
            du_t, lhat_t, fin, qp_t_out = self._qp(Q_t, q_t, G_t, g_t, warm=warm)
            dl_t = lhat_t - l_eval
            s_t = jnp.minimum(0.0, g_t)
            ds_t = g_t + G_t @ du_t - s_t

            # step-formation quantities (used by FM_STEP and fused FM_AB-acceptance)
            mu_t = _get_mu(du_t, l_eval, dl_t, s_t, Q_t, q_t, G_t, g_t, p.merit_function)
            phi_t = _merit_phi(l_eval, s_t, q_t, G_t, g_t, mu_t, use_l1)
            dphi_t = _merit_dphi(du_t, l_eval, dl_t, s_t, Q_t, q_t, G_t, g_t, mu_t, use_l1)

            # A/B candidate merit at u_cur with the ITERATION's mu and predicted slack
            phi_cur = _merit_phi(l_eval, c.s_pred, q_t, G_t, g_t, c.mu, use_l1)

            # ---- the round's single grid line search (modes 2/3 use this round's
            # step from u_cur; mode 4 uses the stored iteration-start step)
            phi0_23 = _merit_phi(l_eval, s_t, q_t, G_t, g_t, c.mu, use_l1)
            dphi0_23 = _merit_dphi(du_t, l_eval, dl_t, s_t, Q_t, q_t, G_t, g_t, c.mu,
                                   use_l1)
            ls_en = ((is_2 | is_3) & fin) | is_fb
            ls_u = jnp.where(is_fb, c.u_k, u_eval)
            ls_du = jnp.where(is_fb, c.du_k, du_t)
            ls_l = jnp.where(is_fb, c.l_k, l_eval)
            ls_dl = jnp.where(is_fb, c.dl_k, dl_t)
            ls_s = jnp.where(is_fb, c.s_k, s_t)
            ls_ds = jnp.where(is_fb, c.ds_k, ds_t)
            ls_phi0 = jnp.where(is_fb, c.phi_k, phi0_23)
            ls_dphi0 = jnp.where(is_fb, c.dphi_k, dphi0_23)
            u_ls, l_ls, phi_ls = self._grid_ls(ls_en, ls_u, ls_du, ls_l, ls_dl, ls_s,
                                               ls_ds, ls_phi0, ls_dphi0, c.mu, x0, up, P)

            # ---------------- decisions
            accept_ref = c.phi_k + p.beta * c.dphi_k
            over_max = is_ab & (phi_cur > merit_max) & (c.t > 1)
            accepted = is_ab & (phi_cur <= accept_ref) & ~over_max
            exhausted = is_ab & ~accepted & ~over_max & (c.t >= t_hat + 1)
            cont = is_ab & ~accepted & ~over_max & ~exhausted

            m2_fail = is_2 & ~fin
            m2_acc = is_2 & fin & (phi_ls <= accept_ref)
            m2_worse = is_2 & fin & (phi_ls > c.phi_k) & ~m2_acc
            m2_cont = is_2 & fin & ~m2_acc & ~m2_worse
            m3_fail = is_3 & ~fin
            m3_done = is_3 & fin

            # ---------------- iteration completion (install the new iterate)
            complete = accepted | m2_acc | m3_done | is_fb
            via_ls = m2_acc | m3_done | is_fb
            u_new = jnp.where(accepted, u_eval, jnp.where(via_ls, u_ls, c.u))
            l_new = jnp.where(accepted, l_eval, jnp.where(via_ls, l_ls, c.l))

            small = (jnp.linalg.norm(u_new - c.u) < xtol / 2) & \
                    (jnp.linalg.norm(l_new - c.l) < ltol / 2)
            rel_its = jnp.where(complete, jnp.where(small, c.rel_its + 1, 0), c.rel_its)
            conv_rel = complete & (rel_its >= rel_tol_req) & (c.p_feas < xtol)
            it_new = c.it + jnp.where(complete, 1, 0)

            # ---------------- status cascade
            status = c.status
            # FM_STEP: iteration-start convergence/divergence checks (nested body top)
            diverged_t = stat_t > 1e5
            converged_t = (p_feas_t < xtol) & (comp_t < ltol) & (stat_t < ltol)
            step_term = is_step & (converged_t | diverged_t)
            status = jnp.where(is_step & converged_t, CONV_ABS, status)
            status = jnp.where(is_step & diverged_t & ~converged_t, DIVERGED, status)
            step_qp_fail = is_step & ~step_term & ~fin
            status = jnp.where(step_qp_fail, QP_FAIL, status)
            step_go = is_step & ~step_term & ~step_qp_fail

            # completion-time checks (nested body tail: conv_rel > max_it > budget)
            over_it = it_new >= p.sqp_iters
            status = jnp.where(complete & conv_rel, CONV_REL, status)
            status = jnp.where(complete & ~conv_rel & over_it, MAX_IT, status)

            # fused next-iteration checks on acceptance (nested next-body top)
            acc_go0 = accepted & ~conv_rel & ~over_it
            status = jnp.where(acc_go0 & converged_t, CONV_ABS, status)
            status = jnp.where(acc_go0 & diverged_t & ~converged_t, DIVERGED, status)
            acc_body = acc_go0 & ~converged_t & ~diverged_t
            status = jnp.where(acc_body & ~fin, QP_FAIL, status)
            acc_go = acc_body & fin

            # QP accounting + the budget escape (reference time_limit analog)
            qp_inc = (is_step & ~step_term) | acc_body | cont | is_2 | is_3
            qp_solves = c.qp_solves + jnp.where(qp_inc, 1, 0)
            if p.qp_solves_limit is not None:
                over_budget = complete & (status == RUNNING) & \
                    (qp_solves >= p.qp_solves_limit)
                status = jnp.where(over_budget, TIME_LIMIT, status)

            # stagnation escape: consecutive accepted-iterate evaluations without a 1%
            # stationarity improvement (plateau signature of the no-attainable-GNE
            # instances, docs/convergence_analysis.md; deterministic time_limit analog)
            upd_stall = is_step | accepted
            improved = stat_t < 0.99 * c.stat_best
            stat_best = jnp.where(upd_stall,
                                  jnp.minimum(stat_t, c.stat_best), c.stat_best)
            stall = jnp.where(upd_stall,
                              jnp.where(improved, 0, c.stall + 1), c.stall)
            if p.stall_its is not None:
                status = jnp.where((status == RUNNING) & (stall >= p.stall_its),
                                   STALLED, status)

            # ---------------- carry updates
            form = step_go | acc_go          # a fresh step was installed this round
            advance = form | (cont & fin)    # candidate moves to u_eval + du_t

            u_k = jnp.where(form, u_eval, c.u_k)
            du_k = jnp.where(form, du_t, c.du_k)
            l_k = jnp.where(form, l_eval, c.l_k)
            dl_k = jnp.where(form, dl_t, c.dl_k)
            s_k = jnp.where(form, s_t, c.s_k)
            ds_k = jnp.where(form, ds_t, c.ds_k)
            mu_n = jnp.where(form, mu_t, c.mu)
            phi_k = jnp.where(form, phi_t, c.phi_k)
            dphi_k = jnp.where(form, dphi_t, c.dphi_k)

            u_prev = jnp.where(advance, u_eval, c.u_prev)
            l_prev = jnp.where(advance, l_eval, c.l_prev)
            u_cur = jnp.where(advance, u_eval + du_t,
                              jnp.where(over_max, c.u_prev,
                                        jnp.where(m2_cont, u_ls, c.u_cur)))
            l_cur = jnp.where(advance, lhat_t,
                              jnp.where(over_max, c.l_prev,
                                        jnp.where(m2_cont, l_ls, c.l_cur)))
            s_pred = jnp.where(advance, s_t + ds_t, c.s_pred)
            t_n = jnp.where(form, 1, jnp.where(cont & fin, c.t + 1, c.t))

            mode = c.mode
            mode = jnp.where(form, FM_AB, mode)
            mode = jnp.where(cont & ~fin, FM_FB, mode)
            mode = jnp.where(over_max | exhausted, FM_INS2, mode)
            mode = jnp.where(m2_fail | m2_worse | m3_fail, FM_FB, mode)
            mode = jnp.where(m2_cont, FM_INS3, mode)
            mode = jnp.where(via_ls, FM_STEP, mode)

            u_out = jnp.where(complete, u_new, c.u)
            l_out = jnp.where(complete, l_new, c.l)

            # iteration-start convergence telemetry (updated whenever this round
            # evaluated an accepted iterate: FM_STEP rounds and fused acceptances)
            upd = is_step | accepted
            p_feas_n = jnp.where(upd, p_feas_t, c.p_feas)
            comp_n = jnp.where(upd, comp_t, c.comp)
            stat_n = jnp.where(upd, stat_t, c.stat)

            # warm-start carry only advances on finite QP results: one transient
            # non-finite solve must not poison every later round's interior start
            qp_lam_n = jnp.where(fin, lhat_t, c.qp_lam)
            qp_t_n = jnp.where(fin, qp_t_out, c.qp_t)
            new = _FlatCarry(u_out, l_out, it_new, status.astype(jnp.int32), rel_its,
                             qp_solves, p_feas_n, comp_n, stat_n, mode, t_n,
                             u_cur, l_cur, s_pred, u_prev, l_prev,
                             u_k, du_k, l_k, dl_k, s_k, ds_k, mu_n, phi_k, dphi_k,
                             stat_best, stall, qp_lam_n, qp_t_n)
            # frozen games keep their state verbatim
            return jax.tree_util.tree_map(
                lambda n, o: jnp.where(running, n, o), new, c)

        return body

    def _init_flat_carry(self, u0, l0) -> _FlatCarry:
        dtype = self.dtype
        u0 = jnp.asarray(u0, dtype)
        l0 = jnp.asarray(l0, dtype)
        z = jnp.asarray(0.0, dtype)
        return _FlatCarry(u=u0, l=l0, it=jnp.asarray(0), status=jnp.asarray(RUNNING, jnp.int32),
                          rel_its=jnp.asarray(0), qp_solves=jnp.asarray(0),
                          p_feas=jnp.asarray(jnp.inf, dtype), comp=jnp.asarray(jnp.inf, dtype),
                          stat=jnp.asarray(jnp.inf, dtype),
                          mode=jnp.asarray(FM_STEP), t=jnp.asarray(1),
                          u_cur=u0, l_cur=l0, s_pred=jnp.zeros(self.n_c, dtype),
                          u_prev=u0, l_prev=l0,
                          u_k=u0, du_k=jnp.zeros_like(u0), l_k=l0, dl_k=jnp.zeros_like(l0),
                          s_k=jnp.zeros(self.n_c, dtype), ds_k=jnp.zeros(self.n_c, dtype),
                          mu=z, phi_k=z, dphi_k=z,
                          stat_best=jnp.asarray(jnp.inf, dtype), stall=jnp.asarray(0),
                          qp_lam=jnp.ones(self.n_c, dtype),
                          qp_t=jnp.ones(self.n_c, dtype))

    def _solve_core_flat(self, u0, l0, x0, up, P=None) -> SQPResult:
        body = self._make_round_body(x0, up, P)
        init = self._init_flat_carry(u0, l0)
        c = jax.lax.while_loop(lambda cc: cc.status == RUNNING, body, init)
        return self._finalize(c, x0, up, P)

    def _use_flat(self) -> bool:
        p = self.params
        mode = getattr(p, 'execution', 'auto')
        if mode == 'nested':
            return False
        if mode == 'flat':
            return True
        return p.nonmono_ls and p.hessian_approximation == 'none'

    def _init_carry(self, u0, l0, x0, up, P=None) -> _Carry:
        p = self.params
        dtype = self.dtype
        use_bfgs = p.hessian_approximation == 'bfgs'
        if use_bfgs:
            Q0, _, _, _, _ = self.problem.evaluate(jnp.asarray(u0, dtype),
                                                   jnp.asarray(l0, dtype), x0, up, P,
                                                   hessian=True)
            B0 = regularized_convexification(Q0, 0.0)
        else:
            B0 = jnp.zeros((0, 0), dtype)
        init = _Carry(u=jnp.asarray(u0, dtype), l=jnp.asarray(l0, dtype),
                      it=jnp.asarray(0), status=jnp.asarray(RUNNING, jnp.int32),
                      rel_its=jnp.asarray(0), qp_solves=jnp.asarray(0),
                      p_feas=jnp.asarray(jnp.inf, dtype), comp=jnp.asarray(jnp.inf, dtype),
                      stat=jnp.asarray(jnp.inf, dtype),
                      stat_best=jnp.asarray(jnp.inf, dtype), stall=jnp.asarray(0),
                      B=B0, B_u=jnp.asarray(u0, dtype) if use_bfgs else jnp.zeros((0,), dtype))
        return init

    def _finalize(self, c: _Carry, x0, up, P=None) -> SQPResult:
        dtype = self.dtype
        q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P, hessian=False)
        d = q + G.T @ c.l
        p_feas = jnp.maximum(0.0, jnp.max(g)) if self.n_c > 0 else jnp.asarray(0.0, dtype)
        comp = jnp.max(jnp.abs(g * c.l)) if self.n_c > 0 else jnp.asarray(0.0, dtype)
        stat = jnp.max(jnp.abs(d))
        return SQPResult(c.u, c.l, c.status, c.it, c.qp_solves, p_feas, comp, stat)

    def _solve_core(self, u0, l0, x0, up, P=None) -> SQPResult:
        if self._use_flat():
            return self._solve_core_flat(u0, l0, x0, up, P)
        body = self._make_body(x0, up, P)
        init = self._init_carry(u0, l0, x0, up, P)
        c = jax.lax.while_loop(lambda cc: cc.status == RUNNING, body, init)
        return self._finalize(c, x0, up, P)

    def _chunk(self, c: _Carry, x0, up, P=None, chunk_iters: int = 8) -> _Carry:
        """Run up to ``chunk_iters`` SQP iterations (finished games freeze inside the body).

        Used by :meth:`solve_batch_chunked` to keep each device program short — very long
        lockstep while-loops can trip accelerator watchdogs, and chunking gives the host a
        progress/convergence view between chunks."""
        body = self._make_body(x0, up, P)
        return jax.lax.fori_loop(0, chunk_iters, lambda i, cc: body(cc), c)

    _compact_min_bucket = 16

    def solve_batch_chunked(self, u0, l0, x0, up, P=None, chunk_iters: int = 8,
                            max_chunks: Optional[int] = None, verbose: bool = False,
                            compact: Optional[bool] = None):
        """Batched solve as a host loop over short jitted chunks.

        In flat (round-machine) execution each chunk step is one ROUND, which is much
        cheaper than a nested SQP iteration, so more of them fit per device program.
        ``compact=False`` disables straggler compaction: each compaction event costs
        host->device transfers (~1-2 s each through the axon tunnel) to save
        milliseconds of masked device compute, so remote-tunnel callers run faster
        fixed-layout; on locally-attached hardware leave it on (default)."""
        if self._use_flat():
            return self._solve_batch_chunked_flat(u0, l0, x0, up, chunk_iters,
                                                  max_chunks, verbose, compact)
        if not hasattr(self, '_chunk_jit'):
            self._chunk_jit = jax.jit(jax.vmap(
                lambda c, x, u_p: self._chunk(c, x, u_p, None, chunk_iters)))
            self._init_jit = jax.jit(jax.vmap(
                lambda u, l, x, u_p: self._init_carry(u, l, x, u_p, None)))
            self._final_jit = jax.jit(jax.vmap(
                lambda c, x, u_p: self._finalize(c, x, u_p, None)))
        carry = self._init_jit(u0, l0, x0, up)
        history = []
        max_chunks = max_chunks or (self.params.sqp_iters // chunk_iters + 2) * 8
        for i in range(max_chunks):
            carry = self._chunk_jit(carry, x0, up)
            n_run = int(jnp.sum(carry.status == RUNNING))
            history.append(dict(chunk=i, running=n_run,
                                iters_p50=float(jnp.median(carry.it)),
                                stat_p50=float(jnp.median(carry.stat))))
            if verbose:
                print(f'chunk {i}: {n_run} games still running')
            if n_run == 0:
                break
        res = self._final_jit(carry, x0, up)
        self.last_chunk_history = history
        return res

    def _solve_batch_chunked_flat(self, u0, l0, x0, up, chunk_iters: int = 8,
                                  max_chunks: Optional[int] = None,
                                  verbose: bool = False,
                                  compact: Optional[bool] = None):
        """Flat-execution batch solve: host loop over round chunks WITH batch compaction.

        After each chunk the finished games are harvested to a host-side store and the
        still-running stragglers continue in a smaller power-of-two batch (the generic
        driver in :mod:`dgsqp_tpu.solvers.chunked`).
        """
        from dgsqp_tpu.solvers.chunked import run_chunked_compacted

        flat_rounds = 4 * chunk_iters
        if not hasattr(self, '_flat_fns'):
            def chunk_rounds(c, x, u_p):
                body = self._make_round_body(x, u_p, None)
                return jax.lax.fori_loop(0, flat_rounds, lambda i, cc: body(cc), c)
            self._flat_fns = (
                jax.jit(jax.vmap(chunk_rounds)),
                jax.jit(jax.vmap(lambda u, l: self._init_flat_carry(u, l))),
                jax.jit(jax.vmap(lambda c, x, u_p: self._finalize(c, x, u_p, None))))
        chunk_fn, init_fn, final_fn = self._flat_fns

        max_chunks = max_chunks or (10 * self.params.sqp_iters // flat_rounds + 6)
        carry = init_fn(u0, l0)
        res, history = run_chunked_compacted(
            carry, x0, up, chunk_fn, final_fn=final_fn,
            running_status=RUNNING, max_chunks=max_chunks,
            min_bucket=getattr(self, '_compact_min_bucket', 16), verbose=verbose,
            can_compact=compact)
        self.last_chunk_history = history
        return res

    def solve_batch_traced(self, u0, l0, x0, up, P=None, num_iters: Optional[int] = None,
                           record_iterates: bool = False, record_conds: bool = False):
        """Batched solve with a per-SQP-iteration trace (the reference's ``IterationData``
        record, ``DGSQP_v2.py:31-52`` / rich ``solve_info``, ``DGSQP_v2.py:633-647``).

        Runs the nested body under ``lax.scan`` for a FIXED ``num_iters`` so every
        iteration's convergence quantities are captured — the instrumentation for
        diagnosing non-converged games.  Returns ``(SQPResult, trace)`` where ``trace``
        is a dict of (B, T)-shaped arrays: ``status, it, p_feas, comp, stat, qp_solves,
        du_norm, dl_norm`` (+ ``u, l`` of shape (B, T, n) with ``record_iterates``;
        + ``cond_Q, cond_G`` with ``record_conds`` — the reference's per-iteration
        conditioning log, ``DGSQP_v2.py:262-264``).  Frozen games repeat their terminal
        row, so the trace tail is the terminal state.
        """
        T = int(num_iters or self.params.sqp_iters)

        def one(u, l, x, u_p, Pv):
            body = self._make_body(x, u_p, Pv)
            init = self._init_carry(u, l, x, u_p, Pv)

            def step(c, _):
                c2 = body(c)
                rec = dict(status=c2.status, it=c2.it, p_feas=c2.p_feas, comp=c2.comp,
                           stat=c2.stat, qp_solves=c2.qp_solves,
                           du_norm=jnp.linalg.norm(c2.u - c.u),
                           dl_norm=jnp.linalg.norm(c2.l - c.l))
                if record_iterates:
                    rec['u'] = c2.u
                    rec['l'] = c2.l
                if record_conds:
                    Q, _, G, _, _ = self._eval_full(c2.u, c2.l, x, u_p, Pv)
                    sQ = jnp.linalg.svd(Q, compute_uv=False)
                    sG = jnp.linalg.svd(G, compute_uv=False)
                    tiny = jnp.asarray(1e-300, Q.dtype)
                    rec['cond_Q'] = sQ[0] / jnp.maximum(sQ[-1], tiny)
                    rec['cond_G'] = sG[0] / jnp.maximum(sG[-1], tiny)
                return c2, rec

            c, trace = jax.lax.scan(step, init, None, length=T)
            return self._finalize(c, x, u_p, Pv), trace

        if not hasattr(self, '_traced_jit'):
            self._traced_jit = {}
        key = (T, record_iterates, record_conds)
        if key not in self._traced_jit:
            # P rides through jit as a (shared, non-vmapped) traced argument so a
            # later call with different parameters cannot reuse a trace that baked
            # in the first call's P
            self._traced_jit[key] = jax.jit(
                jax.vmap(one, in_axes=(0, 0, 0, 0, None)))
        return self._traced_jit[key](u0, l0, x0, up, P)

    # ------------------------------------------------------------- host interface
    def initialize(self):
        pass

    def set_warm_start(self, u_ws: np.ndarray, l_ws: Optional[np.ndarray] = None):
        """Accepts (N, n_u) stage-ordered warm start, stores agent-stacked flat vector
        (reference ``DGSQP.py:271-281``)."""
        u_ws = np.asarray(u_ws)
        if u_ws.shape != (self.N, self.n_u):
            raise RuntimeError(f'Warm start shape {u_ws.shape} != {(self.N, self.n_u)}')
        parts = []
        off = 0
        for a in range(self.M):
            parts.append(u_ws[:, off:off + self.num_ua_d[a]].ravel())
            off += self.num_ua_d[a]
        self.u_ws = np.concatenate(parts)
        self.l_ws = l_ws

    def solve(self, states: List[VehicleState], parameters=None):
        solve_start = time.time()
        x0 = jnp.asarray(self.joint_dynamics.state2q(states), self.dtype)
        up = jnp.asarray(np.zeros(self.n_u), self.dtype)
        u0 = jnp.asarray(self.u_ws, self.dtype)

        if self.l_ws is not None:
            l0 = jnp.asarray(self.l_ws, self.dtype)
        else:
            l0 = self.problem.dual_warm_start(u0, x0, up, parameters)

        res = self._solve_jit(u0, l0, x0, up, parameters)
        u = np.asarray(res.u)
        l = np.asarray(res.l)

        x_bar = np.asarray(self.problem.rollout(res.u, x0))
        u_bar = np.asarray(self.problem.u_to_stage(res.u))
        self.q_pred = x_bar
        self.u_pred = u_bar
        self.l_pred = l

        status = int(res.status)
        msg = STATUS_MSG.get(status, 'unknown')
        J = np.asarray(self.problem.eval_costs(res.u, x0, up, parameters))
        solve_dur = time.time() - solve_start
        self.print_method(f'Solve status: {msg}')
        self.print_method(f'Solve iters: {int(res.iters)}')
        self.print_method(f'Solve time: {solve_dur:.2f}')
        self.print_method(str(J))

        return dict(time=solve_dur,
                    num_iters=int(res.iters),
                    status=(status in (CONV_ABS, CONV_REL)),
                    cost=J,
                    cond=dict(p_feas=float(res.p_feas), comp=float(res.comp),
                              stat=float(res.stat)),
                    qp_solves=int(res.qp_solves),
                    msg=msg,
                    init=dict(u=np.asarray(u0), l=np.asarray(l0)),
                    u_sol=u, l_sol=l)

    def step(self, states: List[VehicleState], parameters=None):
        """MPC step: solve, apply first input, shift warm start (reference ``DGSQP.py:283-297``)."""
        info = self.solve(states, parameters)
        self.joint_dynamics.qu2state(states, None, self.u_pred[0])
        self.state_input_predictions = self.joint_dynamics.qu2prediction(
            self.state_input_predictions, self.q_pred, self.u_pred)
        for pred in self.state_input_predictions:
            pred.t = states[0].t
        self.u_prev = self.u_pred[0]
        if info['msg'] not in ('diverged', 'qp_fail'):
            u_ws = np.vstack((self.u_pred[1:], self.u_pred[-1:]))
            self.set_warm_start(u_ws)
        return info

    def get_prediction(self) -> List[VehiclePrediction]:
        return self.state_input_predictions

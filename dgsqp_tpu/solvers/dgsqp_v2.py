"""DGSQP v2: the 2024 journal algorithm with non-monotone (NMS) globalization.

Re-implementation of ``/root/reference/DGSQP/solvers/DGSQP_v2.py:54-1319``.  Differences vs v1
that this module reproduces:

  * merit = 1/2 ||stacked Lagrangian gradient||^2 + mu * sum(max(0, g)) with the slack taken
    as s = max(0, g) (v1 used s = min(0, g) and included the complementarity term;
    reference ``DGSQP_v2.py:1143-1166``);
  * symmetric Hessian ``(Q + Q')/2`` fed to the QP (``DGSQP_v2.py:1116``);
  * regularization starts large (reg=1e2) and decays ``reg *= reg_decay`` on every m-step,
    with checkpoint save/restore (``DGSQP_v2.py:563,593``);
  * NMS step machine: cheap "d-steps" (accept the full SQP step while its norm is below a
    trust quantity ``delta`` which shrinks by ``gamma`` per step) punctuated every
    ``nms_frequency`` steps by "m-steps" that enforce merit decrease against the max of a
    rolling merit memory, with watchdog rollback to the last checkpoint + line search on
    failure (``DGSQP_v2.py:469-599``);
  * QP failure recovery = m-step from the last checkpoint (``DGSQP_v2.py:432-464``);
  * max-iteration budget counts m-steps only (``DGSQP_v2.py:407``).

Execution model is the same lockstep jit/vmap design as v1 (see ``dgsqp.py``).
"""
from __future__ import annotations

import time
from typing import List, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.dgsqp import RUNNING, CONV_ABS, CONV_REL, DIVERGED, QP_FAIL, MAX_IT, \
    STALLED, STATUS_MSG, SQPResult
from dgsqp_tpu.solvers.game_problem import GameProblem
from dgsqp_tpu.solvers.qp import solve_qp
from dgsqp_tpu.solvers.solver_types import DGSQPV2Params
from dgsqp_tpu.types import VehiclePrediction, VehicleState
from dgsqp_tpu.utils.math import nearest_pd


class _CarryV2(NamedTuple):
    u: jnp.ndarray
    l: jnp.ndarray
    u_im1: jnp.ndarray
    l_im1: jnp.ndarray
    it: jnp.ndarray
    m_it: jnp.ndarray
    status: jnp.ndarray
    rel_its: jnp.ndarray
    qp_solves: jnp.ndarray
    delta: jnp.ndarray
    reg: jnp.ndarray
    # decay rides in the carry (not closed over) so a (reg, reg_decay) sweep re-uses ONE
    # compiled chunk program — the sweep axis of the reference regularization study
    # (run_regularization_study.sh)
    reg_decay: jnp.ndarray
    ck_counter: jnp.ndarray
    # checkpoint payload (iterate + step + slack + merit parameter + trust/reg)
    ck_u: jnp.ndarray
    ck_l: jnp.ndarray
    ck_du: jnp.ndarray
    ck_dl: jnp.ndarray
    ck_s: jnp.ndarray
    ck_mu: jnp.ndarray
    ck_delta: jnp.ndarray
    ck_reg: jnp.ndarray
    # Armijo reference scalars AT the checkpoint (merit + directional derivative of
    # the merit along the checkpoint's own step, at the checkpoint's mu): the
    # reference's rollback line search runs Armijo from the loaded checkpoint with
    # the checkpoint's merit parameter (DGSQP_v2.py:537-545 + load_checkpoint);
    # storing the two scalars at commit time reproduces that test with zero extra
    # evaluations (the commit round evaluates at the checkpoint anyway)
    ck_phi0: jnp.ndarray
    ck_dphi0: jnp.ndarray
    ck_valid: jnp.ndarray
    # checkpoint created last round: its (du, dl, s, mu) payload is completed at the
    # TOP of this round from the QP step computed AT the checkpoint iterate — the
    # reference pairs each checkpoint with the step of its own iteration record
    # (load_checkpoint, DGSQP_v2.py:709-727), not the step that LED to it
    ck_fresh: jnp.ndarray
    # rolling merit memory
    memory: jnp.ndarray
    mem_ptr: jnp.ndarray
    p_feas: jnp.ndarray
    comp: jnp.ndarray
    stat: jnp.ndarray
    stat_best: jnp.ndarray   # best stationarity seen (stagnation escape)
    stall: jnp.ndarray       # consecutive m-iterations without 1% improvement


class DGSQPV2:
    """Host-facing v2 solver (constructor mirrors v1 / reference ``DGSQP_v2.py:55-64``)."""

    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params: DGSQPV2Params = None, print_method=print, xy_plot=None,
                 use_mx: bool = False, dtype=None):
        params = params or DGSQPV2Params()
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

        self.q_pred = np.zeros((self.N + 1, self.n_q))
        self.u_pred = np.zeros((self.N, self.n_u))
        self.l_pred = np.zeros(self.n_c)
        self.u_ws = np.zeros(self.N * self.n_u)
        self.l_ws = None
        self.u_prev = np.zeros(self.n_u)
        self.state_input_predictions = [VehiclePrediction() for _ in range(self.M)]

        # Optional approximate-game hook: fn(u, x0) -> parameter pytree, re-evaluated per
        # iteration ('always') or once per solve ('once').  Set by the frenet-approx
        # subclass (reference DGSQP_v2_frenet_approx.py:727-786).
        self._approx_update = None

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
            Q, q, G, g, x = self.problem.evaluate_dp(u, l, x0, up, P, hessian=True)
        else:
            Q, q, G, g, x = self.problem.evaluate(u, l, x0, up, P, hessian=True)
        return 0.5 * (Q + Q.T), q, G, g   # v2 symmetrizes (DGSQP_v2.py:1116)

    def _eval_lite(self, u, l, x0, up, P):
        q, G, g, _ = self.problem.evaluate(u, l, x0, up, P, hessian=False)
        return q, G, g

    def _phi(self, l, s, q, G, g, mu, use_l1: bool, obj=None):
        """Merit (reference ``DGSQP_v2.py:1157-1166``):
        'stat_l1':    1/2||q + G'l||^2 + mu*sum(s) (stat drops the complementarity term)
        'sum_obj_l1': sum_a J^a + mu*sum(s) (requires ``obj``)."""
        if self.params.merit_function == 'sum_obj_l1':
            return obj + mu * jnp.sum(s)
        return self._phi_d(q + G.T @ l, s, mu, use_l1)

    def _phi_d(self, d, s, mu, use_l1: bool, obj=None):
        """Merit from precomputed d = q + G'l (Jacobian-free form)."""
        if self.params.merit_function == 'sum_obj_l1':
            return obj + mu * jnp.sum(s)
        val = 0.5 * jnp.dot(d, d)
        if use_l1:
            val = val + mu * jnp.sum(s)
        return val

    def _dphi(self, du, l, dl, s, Q, q, G, g, mu, use_l1: bool, dobj=None):
        if self.params.merit_function == 'sum_obj_l1':
            return dobj - mu * jnp.sum(s)
        F = q + G.T @ l
        d = jnp.dot(F, Q @ du + G.T @ dl)
        if use_l1:
            d = d - mu * jnp.sum(s)
        return d

    def _obj_and_grad(self, u, x0, up, P):
        """Sum of agents' costs and its u-gradient (for the sum_obj_l1 merit;
        reference ``DGSQP_v2.py:1150-1152``)."""
        fn = lambda uu: jnp.sum(self.problem.eval_costs(uu, x0, up, P))
        return fn(u), jax.grad(fn)(u)

    def _get_mu(self, du, l, dl, s, Q, q, G, g, dobj=None):
        if self.params.merit_parameter is not None:
            return jnp.asarray(self.params.merit_parameter, self.dtype)
        d_c = self._dphi(du, l, dl, s, Q, q, G, g, 0.0, use_l1=True, dobj=dobj)
        vio = jnp.sum(s)
        rho = 0.5
        # dtype-aware feasibility noise floor (see dgsqp._get_mu for rationale)
        thresh = (1e-10 if self.dtype == jnp.float64 else 1e-5) * (1.0 + jnp.max(jnp.abs(g)))
        mu = jnp.abs(d_c) / ((1 - rho) * jnp.maximum(vio, 1e-300))
        return jnp.where(vio > thresh, mu, 0.0)

    def _qp(self, Q, q, G, g, reg):
        method = getattr(self.params, 'conv_method', 'eigh')
        if method == 'ns':
            # Newton-Schulz PSD projection: matmul-only (MXU) — measured 3.4x faster
            # than the batched eigh QR algorithm at the bench shapes (profile_kernels).
            # The MPCC game needs the tighter (iters=20, safety=1e-4) setting: at the
            # defaults its mixed cost scales leave a phantom O(1) regularizer
            # (see nearest_pd_ns docstring)
            from dgsqp_tpu.utils.math import nearest_pd_ns
            Qh = nearest_pd_ns(Q, iters=getattr(self.params, 'conv_ns_iters', 14),
                               safety=getattr(self.params, 'conv_ns_safety', 1e-3),
                               equilibrate=getattr(self.params, 'conv_ns_equil', False)) \
                + reg * jnp.eye(self.n_dec, dtype=self.dtype)
        elif method == 'none':
            # indefinite path: symmetrize + Levenberg shift only, NO PSD projection —
            # the QP keeps the exact (possibly indefinite) game Hessian and the kernel
            # runs its Levenberg-LU factorization (the reference's qrqp/CPLEX
            # OptimalityTarget=2 option, DGSQP.py:204-228)
            Qh = 0.5 * (Q + jnp.swapaxes(Q, -1, -2)) \
                + reg * jnp.eye(self.n_dec, dtype=self.dtype)
        else:
            Qh = nearest_pd(Q) + reg * jnp.eye(self.n_dec, dtype=self.dtype)
        sol = solve_qp(Qh, q, G, -g, tol=self.params.qp_tol if hasattr(self.params, 'qp_tol')
                       else 1e-8, max_iters=50, indefinite=(method == 'none'),
                       box=getattr(self, '_qp_box', None),
                       pairs=getattr(self, '_qp_pairs', None),
                       correctors=getattr(self.params, 'qp_correctors', 0))
        return sol.x, sol.lam, sol.ok

    def _line_search(self, enabled, u, du, l, dl, s, mu, mem_max, x0, up, P, P_fn=None,
                     eval0=None, ck_ref=None):
        """v2 backtracking line search (reference ``DGSQP_v2.py:729-760``).

        Returns (u_acc, l_acc, phi_acc_mu1) where phi is evaluated with mu=1 at the
        accepted point (fed into the merit memory).  ``P_fn`` (approximate game,
        ``approximation_eval='always'``) re-linearizes the MPCC parameters at each
        trial point (reference ``DGSQP_v2_frenet_approx.py:727-731``).

        ``eval0 = (Q0, q0, G0, g0, fresh)``: the body's already-computed derivatives at
        the CURRENT iterate plus a per-game mask of lanes whose LS point is that
        iterate.  Fresh lanes build the Armijo reference from the reused data (saving
        a second full Hessian evaluation per round).  Stale lanes (watchdog rollback /
        qp-fail recovery) use ``ck_ref = (phi0_ck, dphi0_ck)`` — the Armijo reference
        scalars recorded AT the checkpoint commit with the checkpoint's own step and
        mu — reproducing the reference's line search from the loaded checkpoint
        (``DGSQP_v2.py:537-545`` + ``load_checkpoint``) exactly.  Without ``ck_ref``
        stale lanes fall back to the non-monotone max-merit reference, which can
        deadlock when the checkpoint's merit sits above ``(1-sigma)*max(memory)``.
        """
        p = self.params
        use_l1 = p.merit_function in ('stat_l1', 'sum_obj_l1')
        sum_obj = p.merit_function == 'sum_obj_l1'

        if p.merit_decrease_condition == 'armijo':
            fresh = None
            if eval0 is not None and not sum_obj:
                Q0, q0, G0, g0, fresh = eval0
            else:
                Q0, q0, G0, g0 = self._eval_full(u, l, x0, up, P)
            if sum_obj:
                obj0, gobj0 = self._obj_and_grad(u, x0, up, P)
                dobj0 = jnp.dot(gobj0, du)
            else:
                obj0, dobj0 = None, None
            phi0 = self._phi(l, s, q0, G0, g0, mu, use_l1, obj=obj0)
            dphi0 = self._dphi(du, l, dl, jnp.maximum(0.0, g0), Q0, q0, G0, g0, mu, use_l1,
                               dobj=dobj0)

            if fresh is not None and ck_ref is not None:
                phi0_ck, dphi0_ck = ck_ref

                def ref(alpha):
                    return jnp.where(fresh, phi0 + p.merit_decrease * alpha * dphi0,
                                     phi0_ck + p.merit_decrease * alpha * dphi0_ck)
            elif fresh is not None:
                def ref(alpha):
                    return jnp.where(fresh, phi0 + p.merit_decrease * alpha * dphi0,
                                     (1 - p.merit_decrease * alpha) * mem_max)
            else:
                def ref(alpha):
                    return phi0 + p.merit_decrease * alpha * dphi0
        else:  # 'max'
            def ref(alpha):
                return (1 - p.merit_decrease * alpha) * mem_max

        # Parallel trial grid — decision-identical to first-accept backtracking but ONE
        # fixed-cost vmapped evaluation instead of a lockstep-serial loop (see
        # dgsqp._line_search for the rationale).  Merit trials are Jacobian-free.
        W = p.line_search_iters
        alphas = jnp.asarray(p.tau, self.dtype) ** jnp.arange(W, dtype=self.dtype)

        def phis_at(alpha):
            u_try = u + alpha * du
            l_try = l + alpha * dl
            P_t = P_fn(u_try) if P_fn is not None else P
            d_t, g_t = self.problem.merit_terms(u_try, l_try, x0, up, P_t)
            s_t = jnp.maximum(0.0, g_t)
            obj_t = jnp.sum(self.problem.eval_costs(u_try, x0, up, P_t)) if sum_obj else None
            phi_try = self._phi_d(d_t, s_t, mu, use_l1, obj=obj_t)
            phi1_try = self._phi_d(d_t, s_t, jnp.asarray(1.0, self.dtype),
                                   use_l1, obj=obj_t)
            return phi_try, phi1_try

        phis, phi1s = jax.vmap(phis_at)(alphas)
        ok = phis <= ref(alphas)
        idx = jnp.where(jnp.any(ok), jnp.argmax(ok), W - 1)
        alpha_sel = alphas[idx]
        u_t = jnp.where(enabled, u + alpha_sel * du, u)
        l_t = jnp.where(enabled, l + alpha_sel * dl, l)
        phi1 = jnp.where(enabled, phi1s[idx], jnp.asarray(jnp.inf, self.dtype))
        return u_t, l_t, phi1

    # ----------------------------------------------------------------- core loop
    def _make_body(self, x0, up, P):
        p = self.params
        dtype = self.dtype
        use_l1 = p.merit_function in ('stat_l1', 'sum_obj_l1')
        sum_obj = p.merit_function == 'sum_obj_l1'
        xtol, ltol = p.p_tol, p.d_tol
        rel_tol_req = 10   # reference DGSQP_v2.py:86
        mem_size = p.nms_memory_size

        def mem_max(memory):
            return jnp.max(memory)

        def mem_push(memory, ptr, val):
            ptr_n = (ptr + 1) % mem_size
            return memory.at[ptr_n].set(val), ptr_n

        # approximate-game parameter cadence (reference DGSQP_v2_frenet_approx.py:380,430,727):
        #   'once'   — recompute the MPCC linearization once per SQP iteration, at the
        #              current iterate, frozen through that iteration's trials;
        #   'always' — additionally recompute it inside EVERY evaluation (full-step
        #              trial, line-search merit trials), i.e. P moves with the trial point.
        approx_always = (self._approx_update is not None
                         and self.params.approximation_eval == 'always')

        def P_at(u):
            """Parameter pytree at trial point u ('always' cadence), else the frozen P."""
            return self._approx_update(u, x0) if approx_always else None

        def body(c: _CarryV2) -> _CarryV2:
            running = c.status == RUNNING

            if self._approx_update is not None:
                P_i = self._approx_update(c.u, x0)
            else:
                P_i = P
            Q, q, G, g = self._eval_full(c.u, c.l, x0, up, P_i)
            d = q + G.T @ c.l
            p_feas = jnp.maximum(0.0, jnp.max(g))
            comp = jnp.max(jnp.abs(g * c.l))
            stat = jnp.max(jnp.abs(d))

            diverged = stat > 1e10
            if getattr(p, 'conv_scaled_stat', False):
                # relative KKT test (see DGSQPV2Params.conv_scaled_stat): stat and comp
                # scale with the cost-gradient magnitude, p_feas stays absolute
                kkt_scale = jnp.maximum(1.0, jnp.max(jnp.abs(q)))
            else:
                kkt_scale = jnp.asarray(1.0, dtype)
            converged = (p_feas < xtol) & (comp < ltol * kkt_scale) & \
                        (stat < ltol * kkt_scale)
            max_it = c.m_it >= p.sqp_iters
            finished = diverged | converged | max_it
            keep_going = running & ~finished

            du, lhat, qp_ok = self._qp(Q, q, G, g, c.reg)
            dl = lhat - c.l

            # initialize the trust quantity on the very first iteration
            # (factor <= 0: delta starts at 0, so the first step is an m-step and gets
            # merit-checked instead of blindly accepted — see DGSQPV2Params)
            step_norm = jnp.linalg.norm(jnp.concatenate([du, dl]))
            f0 = max(0.0, float(getattr(p, 'nms_initial_step_size_factor', 20.0)))
            delta = jnp.where(c.it == 0, f0 * step_norm, c.delta)
            ck_delta = jnp.where(c.it == 0, delta, c.ck_delta)

            s = jnp.maximum(0.0, g)
            ds = jnp.maximum(0.0, g + G @ du) - s
            if sum_obj:
                obj_c, gobj_c = self._obj_and_grad(c.u, x0, up, P_i)
                dobj_c = jnp.dot(gobj_c, du)
            else:
                obj_c, dobj_c = None, None
            mu = self._get_mu(du, c.l, dl, s, Q, q, G, g, dobj=dobj_c)

            # Commit a checkpoint created last round: its iterate equals the current
            # iterate, so THIS round's (du, dl, s, mu) is the step computed AT the
            # checkpoint — the reference's (iterate, step) pairing.  The point AND the
            # step commit together: until this round's QP succeeds the previous
            # consistent (point, step) record stays in force, so a QP failure straight
            # after an m-step rolls back to a matched pair (the reference's clamp to a
            # consistent earlier record, DGSQP_v2.py:455).
            refresh = c.ck_fresh & keep_going & qp_ok
            ck_u_c = jnp.where(refresh, c.u, c.ck_u)
            ck_l_c = jnp.where(refresh, c.l, c.ck_l)
            ck_du_c = jnp.where(refresh, du, c.ck_du)
            ck_dl_c = jnp.where(refresh, dl, c.ck_dl)
            ck_s_c = jnp.where(refresh, s, c.ck_s)
            ck_mu_c = jnp.where(refresh, mu, c.ck_mu)
            ck_delta_c = jnp.where(refresh, delta, ck_delta)
            ck_reg_c = jnp.where(refresh, c.reg, c.ck_reg)
            # Armijo reference at the checkpoint, from THIS round's derivatives at
            # c.u (== the checkpoint on commit rounds) and its fresh step/mu
            phi0_here = self._phi(c.l, s, q, G, g, mu, use_l1, obj=obj_c)
            dphi0_here = self._dphi(du, c.l, dl, s, Q, q, G, g, mu, use_l1,
                                    dobj=dobj_c)
            ck_phi0_c = jnp.where(refresh, phi0_here, c.ck_phi0)
            ck_dphi0_c = jnp.where(refresh, dphi0_here, c.ck_dphi0)
            ck_valid = c.ck_valid | refresh

            if p.nms:
                qp_fail_recover = ~qp_ok & ck_valid
                m_step = (~qp_ok & ck_valid) | (qp_ok & ((c.ck_counter >= p.nms_frequency)
                                                         | (step_norm >= delta)))
                d_step = qp_ok & ~m_step
            else:
                qp_fail_recover = jnp.asarray(False)
                m_step = jnp.asarray(False)
                d_step = jnp.asarray(False)
            plain_ls = qp_ok & ~m_step & ~d_step if not p.nms else jnp.asarray(False)
            hard_qp_fail = ~qp_ok & (~ck_valid if p.nms else jnp.asarray(True))

            # ---------- d-step: accept the full step, shrink delta
            u_d = c.u + du
            l_d = c.l + dl

            # ---------- m-step
            # On QP failure the reference first restores the checkpoint and then runs the
            # m-step machinery from there (DGSQP_v2.py:432-464); otherwise the m-step acts
            # on the current iterate and the fresh QP step.
            src_u = jnp.where(qp_fail_recover, ck_u_c, c.u)
            src_l = jnp.where(qp_fail_recover, ck_l_c, c.l)
            src_du = jnp.where(qp_fail_recover, ck_du_c, du)
            src_dl = jnp.where(qp_fail_recover, ck_dl_c, dl)
            src_s = jnp.where(qp_fail_recover, ck_s_c, s)
            src_mu = jnp.where(qp_fail_recover, ck_mu_c, mu)

            # full-step trial against the non-monotone reference (DGSQP_v2.py:517-531)
            u_full = src_u + src_du
            l_full = src_l + src_dl
            P_f = P_at(u_full) if approx_always else P_i
            q_f, G_f, g_f = self._eval_lite(u_full, l_full, x0, up, P_f)
            s_f = jnp.maximum(0.0, g_f)
            obj_f = jnp.sum(self.problem.eval_costs(u_full, x0, up, P_f)) if sum_obj else None
            phi_full = self._phi(l_full, s_f, q_f, G_f, g_f, jnp.asarray(1.0, dtype), use_l1,
                                 obj=obj_f)
            R = (1 - p.merit_decrease) * mem_max(c.memory)
            accept_full = m_step & (phi_full <= R)

            # watchdog rollback source (reference load_checkpoint, DGSQP_v2.py:709-727)
            rollback = m_step & ~accept_full & ck_valid
            ls_u = jnp.where(rollback, ck_u_c, src_u)
            ls_l = jnp.where(rollback, ck_l_c, src_l)
            ls_du = jnp.where(rollback, ck_du_c, src_du)
            ls_dl = jnp.where(rollback, ck_dl_c, src_dl)
            ls_s = jnp.where(rollback, ck_s_c, src_s)
            ls_mu = jnp.where(rollback, ck_mu_c, src_mu)
            delta = jnp.where(rollback, ck_delta_c, delta)
            reg = jnp.where(rollback, ck_reg_c, c.reg)

            ls_enabled = (m_step & ~accept_full) | plain_ls
            ls_fresh = ~(rollback | qp_fail_recover)
            u_ls, l_ls, phi_ls = self._line_search(ls_enabled, ls_u, ls_du, ls_l, ls_dl,
                                                   ls_s, ls_mu, mem_max(c.memory), x0, up,
                                                   P_i, P_fn=P_at if approx_always else None,
                                                   eval0=(Q, q, G, g, ls_fresh),
                                                   ck_ref=(ck_phi0_c, ck_dphi0_c))

            # ---------- select the next iterate
            u_n = jnp.where(d_step, u_d,
                   jnp.where(accept_full, u_full,
                    jnp.where(ls_enabled, u_ls, c.u)))
            l_n = jnp.where(d_step, l_d,
                   jnp.where(accept_full, l_full,
                    jnp.where(ls_enabled, l_ls, c.l)))
            u_n = jnp.where(keep_going, u_n, c.u)
            l_n = jnp.where(keep_going, l_n, c.l)

            # ---------- bookkeeping
            mstep_done = keep_going & (m_step | plain_ls)
            phi_new = jnp.where(accept_full, phi_full, phi_ls)

            delta = jnp.where(keep_going & d_step, p.delta_decay * delta, delta)
            ck_counter = jnp.where(keep_going & d_step, c.ck_counter + 1,
                          jnp.where(mstep_done, 0, c.ck_counter))
            reg = jnp.where(mstep_done, reg * c.reg_decay, reg)

            memory, mem_ptr = mem_push(c.memory, c.mem_ptr, phi_new)
            memory = jnp.where(mstep_done, memory, c.memory)
            mem_ptr = jnp.where(mstep_done, mem_ptr, c.mem_ptr)

            # A new checkpoint is PENDING after every m-step (at the accepted point);
            # its full (point, step) record only commits at the next round's top once
            # the QP at that point succeeds (see the refresh block above) — until then
            # the previous consistent record stays in force.
            set_ck = mstep_done
            ck_fresh = jnp.where(keep_going, set_ck, c.ck_fresh)

            # relative-tolerance convergence, only checked on m-steps (DGSQP_v2.py:576-599)
            small = (jnp.linalg.norm(u_n - c.u_im1) < xtol) & \
                    (jnp.linalg.norm(l_n - c.l_im1) < ltol)
            rel_its = jnp.where(mstep_done & small, c.rel_its + 1,
                       jnp.where(mstep_done, 0, c.rel_its))
            conv_rel = mstep_done & (rel_its >= rel_tol_req) & (p_feas < xtol)
            u_im1 = jnp.where(mstep_done, u_n, c.u_im1)
            l_im1 = jnp.where(mstep_done, l_n, c.l_im1)

            m_it = c.m_it + jnp.where(mstep_done, 1, 0)
            it = c.it + jnp.where(keep_going, 1, 0)
            qp_solves = c.qp_solves + jnp.where(keep_going, 1, 0)

            # stagnation escape (deterministic time_limit analog; see DGSQP v1)
            improved = stat < 0.99 * c.stat_best
            stat_best = jnp.where(keep_going, jnp.minimum(stat, c.stat_best),
                                  c.stat_best)
            stall = jnp.where(keep_going, jnp.where(improved, 0, c.stall + 1), c.stall)
            if p.stall_its is not None:
                is_stalled = stall >= p.stall_its
            else:
                is_stalled = jnp.asarray(False)

            new_status = jnp.where(converged, CONV_ABS,
                          jnp.where(diverged, DIVERGED,
                           jnp.where(max_it, MAX_IT,
                            jnp.where(hard_qp_fail, QP_FAIL,
                             jnp.where(conv_rel, CONV_REL,
                              jnp.where(is_stalled, STALLED, RUNNING))))))
            status = jnp.where(running, new_status, c.status).astype(jnp.int32)

            return _CarryV2(u_n, l_n, u_im1, l_im1, it, m_it, status,
                            rel_its, qp_solves, delta, reg, c.reg_decay, ck_counter,
                            ck_u_c, ck_l_c, ck_du_c, ck_dl_c, ck_s_c, ck_mu_c,
                            ck_delta_c, ck_reg_c, ck_phi0_c, ck_dphi0_c,
                            ck_valid, ck_fresh, memory, mem_ptr,
                            jnp.where(running, p_feas, c.p_feas),
                            jnp.where(running, comp, c.comp),
                            jnp.where(running, stat, c.stat),
                            stat_best, stall)

        return body

    def _init_carry(self, u0, l0, x0, up, P=None) -> _CarryV2:
        p = self.params
        dtype = self.dtype
        use_l1 = p.merit_function in ('stat_l1', 'sum_obj_l1')
        sum_obj = p.merit_function == 'sum_obj_l1'
        mem_size = p.nms_memory_size

        if self._approx_update is not None:
            P = self._approx_update(u0, x0)

        # initial merit memory entry (reference DGSQP_v2.py:342-343)
        q_i0, G_i0, g_i0 = self._eval_lite(u0, l0, x0, up, P)
        obj_0 = jnp.sum(self.problem.eval_costs(jnp.asarray(u0, dtype), x0, up, P)) \
            if sum_obj else None
        phi0 = self._phi(l0, jnp.maximum(0.0, g_i0), q_i0, G_i0, g_i0,
                         jnp.asarray(1.0, dtype), use_l1, obj=obj_0)
        memory0 = jnp.full((mem_size,), -jnp.inf, dtype).at[0].set(phi0)

        z_u = jnp.asarray(u0, dtype)
        z_l = jnp.asarray(l0, dtype)
        init = _CarryV2(u=z_u, l=z_l, u_im1=z_u, l_im1=z_l,
                        it=jnp.asarray(0), m_it=jnp.asarray(0),
                        status=jnp.asarray(RUNNING, jnp.int32),
                        rel_its=jnp.asarray(0), qp_solves=jnp.asarray(0),
                        delta=jnp.asarray(jnp.inf, dtype),
                        reg=jnp.asarray(p.reg, dtype),
                        reg_decay=jnp.asarray(p.reg_decay, dtype),
                        ck_counter=jnp.asarray(0),
                        ck_u=z_u, ck_l=z_l, ck_du=jnp.zeros_like(z_u),
                        ck_dl=jnp.zeros_like(z_l), ck_s=jnp.zeros_like(z_l),
                        ck_mu=jnp.asarray(0.0, dtype),
                        ck_delta=jnp.asarray(jnp.inf, dtype),
                        ck_reg=jnp.asarray(p.reg, dtype),
                        ck_phi0=jnp.asarray(jnp.inf, dtype),
                        ck_dphi0=jnp.asarray(0.0, dtype),
                        ck_valid=jnp.asarray(False),
                        # the initial iterate is a pending checkpoint: round 0's
                        # successful QP commits (u0, step0) as the first consistent
                        # record, mirroring the reference's iter_data[0] fallback
                        # (DGSQP_v2.py:446-455: qp_fail hard-exits only when
                        # len(iter_data) == 0, i.e. before any successful QP)
                        ck_fresh=jnp.asarray(True),
                        memory=memory0, mem_ptr=jnp.asarray(0),
                        p_feas=jnp.asarray(jnp.inf, dtype),
                        comp=jnp.asarray(jnp.inf, dtype),
                        stat=jnp.asarray(jnp.inf, dtype),
                        stat_best=jnp.asarray(jnp.inf, dtype),
                        stall=jnp.asarray(0))
        return init

    def _finalize(self, c: _CarryV2, x0, up, P=None) -> SQPResult:
        if self._approx_update is not None:
            P = self._approx_update(c.u, x0)
        q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P, hessian=False)
        d = q + G.T @ c.l
        p_feas = jnp.maximum(0.0, jnp.max(g))
        comp = jnp.max(jnp.abs(g * c.l))
        stat = jnp.max(jnp.abs(d))
        return SQPResult(c.u, c.l, c.status, c.it, c.qp_solves, p_feas, comp, stat)

    def _solve_core(self, u0, l0, x0, up, P=None) -> SQPResult:
        body = self._make_body(x0, up, P)
        init = self._init_carry(u0, l0, x0, up, P)
        c = jax.lax.while_loop(lambda cc: cc.status == RUNNING, body, init)
        return self._finalize(c, x0, up, P)

    def _chunk(self, c: _CarryV2, x0, up, P=None, chunk_iters: int = 8) -> _CarryV2:
        body = self._make_body(x0, up, P)
        return jax.lax.fori_loop(0, chunk_iters, lambda i, cc: body(cc), c)

    def solve_batch_chunked(self, u0, l0, x0, up, P=None, chunk_iters: int = 8,
                            max_chunks: Optional[int] = None, verbose: bool = False,
                            compact: Optional[bool] = None):
        """Batched solve as a host loop over short jitted chunks WITH straggler
        compaction (the shared driver in :mod:`dgsqp_tpu.solvers.chunked`).

        v2 needs no separate "flat" machine: its NMS body is already a fixed-signature
        round (one evaluate + one QP + one parallel-grid line search per iteration —
        the d/m-step decisions are masked selects, not nested loops), so chunked
        lockstep execution plus compaction gives it the same batch-efficiency v1 gets
        from the flattened watchdog.
        """
        from dgsqp_tpu.solvers.chunked import run_chunked_compacted

        if not hasattr(self, '_chunk_jit'):
            self._chunk_jit = jax.jit(jax.vmap(
                lambda c, x, u_p: self._chunk(c, x, u_p, None, chunk_iters)))
            self._init_jit = jax.jit(jax.vmap(
                lambda u, l, x, u_p: self._init_carry(u, l, x, u_p, None)))
            self._final_jit = jax.jit(jax.vmap(
                lambda c, x, u_p: self._finalize(c, x, u_p, None)))
        carry = self._init_jit(u0, l0, x0, up)
        # v2 budgets count m-steps; allow ~6x in raw iterations before giving up
        max_chunks = max_chunks or (6 * self.params.sqp_iters // chunk_iters + 4)
        res, history = run_chunked_compacted(
            carry, x0, up, self._chunk_jit, final_fn=self._final_jit,
            running_status=RUNNING, max_chunks=max_chunks,
            min_bucket=getattr(self, '_compact_min_bucket', 16), verbose=verbose,
            can_compact=compact)
        self.last_chunk_history = history
        return res

    # per-iteration instrumented batch solve — duck-type compatible with the v1
    # implementation (same _make_body/_init_carry/_finalize surface); used by the
    # convergence diagnostics (reference IterationData, DGSQP_v2.py:31-52)
    from dgsqp_tpu.solvers.dgsqp import DGSQP as _DGSQP_v1
    solve_batch_traced = _DGSQP_v1.solve_batch_traced
    del _DGSQP_v1

    # ------------------------------------------------------------- host interface
    def initialize(self):
        pass

    def set_warm_start(self, u_ws: np.ndarray, l_ws: Optional[np.ndarray] = None):
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
        t_start = time.time()
        x0 = jnp.asarray(self.joint_dynamics.state2q(states), self.dtype)
        up = jnp.zeros(self.n_u, self.dtype)
        u0 = jnp.asarray(self.u_ws, self.dtype)
        if self.l_ws is not None:
            l0 = jnp.asarray(self.l_ws, self.dtype)
        else:
            l0 = self.problem.dual_warm_start(u0, x0, up, parameters)
        res = self._solve_jit(u0, l0, x0, up, parameters)

        self.q_pred = np.asarray(self.problem.rollout(res.u, x0))
        self.u_pred = np.asarray(self.problem.u_to_stage(res.u))
        self.l_pred = np.asarray(res.l)
        status = int(res.status)
        msg = STATUS_MSG.get(status, 'unknown')
        dur = time.time() - t_start
        self.print_method(f'Solve status: {msg}')
        self.print_method(f'Solve iters: {int(res.iters)}')
        self.print_method(f'Solve time: {dur:.2f}')
        return dict(time=dur, num_iters=int(res.iters),
                    status=(status in (CONV_ABS, CONV_REL)),
                    cond=dict(p_feas=float(res.p_feas), comp=float(res.comp),
                              stat=float(res.stat)),
                    qp_solves=int(res.qp_solves), msg=msg,
                    primal_sol=np.asarray(res.u), dual_sol=np.asarray(res.l),
                    x_pred=self.q_pred, u_pred=self.u_pred,
                    u_sol=np.asarray(res.u), l_sol=np.asarray(res.l),
                    conds=dict(p_feas=float(res.p_feas), comp=float(res.comp),
                               stat=float(res.stat)))

    def step(self, states: List[VehicleState], parameters=None):
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

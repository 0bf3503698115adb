"""Iterated best response (IBR): Gauss-Seidel sweeps of single-agent optimal control.

Re-implementation of the reference baseline (``/root/reference/DGSQP/solvers/IBR.py:26-802``)
which solves each agent's best-response NLP with IPOPT and sweeps agents until the joint input
stops changing.  Here each best response is a standard (single-agent) SQP — convexified QP
subproblem + Armijo line search on an exact-penalty merit — sharing the condensed evaluation
machinery; the sweep is a ``lax.fori_loop``.  IBR is primarily used as a warm-start generator
for the game solvers (``ibr_iters=1``, reference ``..._chicane.py:359-377``).
"""
from __future__ import annotations

import time
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.game_problem import GameProblem
from dgsqp_tpu.solvers.qp import solve_qp
from dgsqp_tpu.solvers.solver_types import IBRParams
from dgsqp_tpu.types import VehiclePrediction, VehicleState
from dgsqp_tpu.utils.math import regularized_convexification


class IBRResult(NamedTuple):
    u: jnp.ndarray          # (n_dec,) agent-stacked joint input
    converged: jnp.ndarray
    sweeps: jnp.ndarray
    delta: jnp.ndarray      # last max input change


class IBR:
    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params: IBRParams = None, print_method=print, dtype=None):
        params = params or IBRParams()
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
        self.n_dec = self.problem.n_dec
        self.br_idxs = [jnp.asarray(self.problem.constraint_indices_for_agent(a))
                        for a in range(self.M)]
        self.ua_slices = [(self.problem.ua_el_offsets[a], self.problem.ua_el_offsets[a + 1])
                          for a in range(self.M)]

        self.q_pred = np.zeros((self.N + 1, self.n_q))
        self.u_pred = np.zeros((self.N, self.n_u))
        self.u_ws = np.zeros(self.n_dec)
        self.state_input_predictions = [VehiclePrediction() for _ in range(self.M)]

        self._solve_jit = jax.jit(self._solve_core)
        self.initialized = True

    # ------------------------------------------------------------ best response
    def _br_step(self, a: int, u_full, l_a, x0, up, P):
        """One SQP iteration of agent a's best response with others' inputs frozen.

        Returns updated (u_full, l_a, kkt_res).
        """
        s0, s1 = self.ua_slices[a]
        idxs = self.br_idxs[a]
        prob = self.problem
        embed = getattr(self, '_ps_embed', None)

        def cost_fn(ua):
            uf = embed(u_full, ua) if embed is not None else u_full.at[s0:s1].set(ua)
            return prob.agent_cost(a, uf, x0, up, P)

        def cons_fn(ua):
            uf = embed(u_full, ua) if embed is not None else u_full.at[s0:s1].set(ua)
            return prob.eval_constraints(uf, x0, up, P)[idxs]

        ua = u_full[s0:s1]
        g = cons_fn(ua)
        q = jax.grad(cost_fn)(ua)
        G = jax.jacrev(cons_fn)(ua)

        def lag_grad(uu):
            return jax.grad(cost_fn)(uu) + jax.jacrev(cons_fn)(uu).T @ l_a

        Q = jax.jacfwd(lag_grad)(ua)
        Qh = regularized_convexification(Q, self.params.br_reg)
        sol = solve_qp(Qh, q, G, -g)
        du = jnp.where(sol.ok, sol.x, 0.0)
        l_new = jnp.where(sol.ok, sol.lam, l_a)

        # Armijo on the l1 exact-penalty merit
        mu = jnp.maximum(10.0, 2.0 * jnp.max(jnp.abs(l_new)) if l_new.size else 0.0)

        def merit(uu):
            return cost_fn(uu) + mu * jnp.sum(jnp.maximum(cons_fn(uu), 0.0))

        phi0 = merit(ua)
        dphi = jnp.dot(q, du) - mu * jnp.sum(jnp.maximum(g, 0.0))

        def ls_cond(cc):
            k, alpha, done = cc
            return (~done) & (k < self.params.line_search_iters)

        def ls_body(cc):
            k, alpha, done = cc
            ok = merit(ua + alpha * du) <= phi0 + 1e-4 * alpha * dphi
            return (k + 1, jnp.where(ok | done, alpha, alpha * 0.5), done | ok)

        _, alpha, _ = jax.lax.while_loop(
            ls_cond, ls_body, (jnp.asarray(0), jnp.asarray(1.0, self.dtype),
                               jnp.asarray(False)))
        ua_new = ua + alpha * du
        kkt = jnp.max(jnp.abs(jax.grad(cost_fn)(ua_new) + G.T @ l_new))
        return u_full.at[s0:s1].set(ua_new), l_new, kkt

    def _opponent_duals(self, o: int, u_full, x0, up, P):
        """Least-squares multiplier estimate for opponent o's BR KKT at ``u_full``.

        Solves min ||grad J_o + C_u' lam|| over lam supported on the near-active rows of
        o's constraints, clipped at 0 — the stand-in for the multipliers the reference
        carries over from o's last BR NLP solve (``IBR.py:616-621``).
        """
        prob = self.problem
        s0o, s1o = self.ua_slices[o]
        idxs = self.br_idxs[o]

        def cons_o(uf):
            return prob.eval_constraints(uf, x0, up, P)[idxs]

        g = cons_o(u_full)
        Gu = jax.jacrev(cons_o)(u_full)[:, s0o:s1o]
        grad = jax.grad(lambda uu: prob.agent_cost(o, uu, x0, up, P))(u_full)[s0o:s1o]
        eps_act = 1e-4 * (1.0 + jnp.max(jnp.abs(g)))
        act = (g > -eps_act).astype(u_full.dtype)
        Ga = Gu * act[:, None]
        lam, *_ = jnp.linalg.lstsq(Ga.T, -grad, rcond=None)
        return jnp.maximum(lam * act, 0.0)

    def _response_sensitivities(self, a: int, u_full, x0, up, P):
        """Opponent best-response sensitivities S_o = d u_o / d u_a via the implicit
        function theorem on each opponent's FULL BR KKT system (the reference's
        policy-sensitivity construction, ``IBR.py:642-657``):

            F(u_o, lam_o; u_a) = [ grad_{u_o}(J_o + lam_o' C_o) ; lam_o o C_o ] = 0
            S_o = -[dF/d(u_o, lam_o)]^{-1} dF/du_a   (u_o rows)

        Multipliers enter through :meth:`_opponent_duals`; the constraint-curvature and
        active-set coupling terms the round-1 implementation dropped are included.
        """
        prob = self.problem
        s0a, s1a = self.ua_slices[a]
        sens = {}
        for o in range(self.M):
            if o == a:
                continue
            s0o, s1o = self.ua_slices[o]
            n_o = s1o - s0o
            idxs = self.br_idxs[o]
            lam_o = self._opponent_duals(o, u_full, x0, up, P)
            m_o = lam_o.shape[0]

            def F(u_o, lam, u_a):
                uf = u_full.at[s0o:s1o].set(u_o).at[s0a:s1a].set(u_a)
                C = prob.eval_constraints(uf, x0, up, P)[idxs]
                lag = lambda uu: (prob.agent_cost(o, uu, x0, up, P)
                                  + jnp.dot(lam, prob.eval_constraints(uu, x0, up, P)[idxs]))
                stat = jax.grad(lag)(uf)[s0o:s1o]
                return jnp.concatenate([stat, lam * C])

            u_o0 = u_full[s0o:s1o]
            u_a0 = u_full[s0a:s1a]
            J_uo = jax.jacfwd(F, argnums=0)(u_o0, lam_o, u_a0)
            J_lam = jax.jacfwd(F, argnums=1)(u_o0, lam_o, u_a0)
            J_ua = jax.jacfwd(F, argnums=2)(u_o0, lam_o, u_a0)
            Jz = jnp.concatenate([J_uo, J_lam], axis=1)
            reg = 1e-8 * jnp.eye(n_o + m_o, dtype=u_full.dtype)
            S_full = -jnp.linalg.solve(Jz + reg, J_ua)
            sens[o] = S_full[:n_o]
        return sens

    def _solve_br(self, a: int, u_full, x0, up, P):
        """Solve agent a's best response to tolerance with an inner SQP loop.

        With ``use_ps`` the opponents' inputs respond linearly to agent a's deviation
        through the precomputed sensitivities (reference's sensitivity-augmented BR NLP,
        ``IBR.py:665-713``).
        """
        p = self.params
        m_a = len(self.problem.constraint_indices_for_agent(a))

        if p.use_ps and self.M > 1:
            sens = self._response_sensitivities(a, u_full, x0, up, P)
            s0a, s1a = self.ua_slices[a]
            ua_ref = u_full[s0a:s1a]
            base_full = u_full

            def embed(u_f, ua):
                """Replace agent a's block and shift opponents by their linear response."""
                out = u_f.at[s0a:s1a].set(ua)
                for o, S in sens.items():
                    s0o, s1o = self.ua_slices[o]
                    out = out.at[s0o:s1o].set(base_full[s0o:s1o] + S @ (ua - ua_ref))
                return out
            self._ps_embed = embed
        else:
            self._ps_embed = None

        def cond(c):
            u_f, l_a, it, done = c
            return (~done) & (it < p.br_sqp_iters)

        def body(c):
            u_f, l_a, it, done = c
            u_n, l_n, kkt = self._br_step(a, u_f, l_a, x0, up, P)
            s0, s1 = self.ua_slices[a]
            step = jnp.max(jnp.abs(u_n[s0:s1] - u_f[s0:s1]))
            conv = (kkt < p.d_tol) | (step < p.p_tol * 1e-2)
            return (u_n, l_n, it + 1, done | conv)

        l0 = jnp.zeros(m_a, self.dtype)
        u_f, l_a, it, done = jax.lax.while_loop(
            cond, body, (u_full, l0, jnp.asarray(0), jnp.asarray(False)))
        self._ps_embed = None
        return u_f

    def _solve_core(self, u0, x0, up, P=None) -> IBRResult:
        p = self.params

        def sweep(i, carry):
            u, delta, conv = carry
            u_prev_sweep = u
            for a in range(self.M):
                u = self._solve_br(a, u, x0, up, P)
            delta = jnp.max(jnp.abs(u - u_prev_sweep))
            return (u, delta, conv | (delta < p.p_tol))

        u, delta, conv = jax.lax.fori_loop(
            0, p.ibr_iters, sweep,
            (jnp.asarray(u0, self.dtype), jnp.asarray(jnp.inf, self.dtype),
             jnp.asarray(False)))
        return IBRResult(u, conv, jnp.asarray(p.ibr_iters), delta)

    # ------------------------------------------------------------- host interface
    def initialize(self):
        pass

    def set_warm_start(self, u_ws):
        """Accepts a list of per-agent (N, n_ua) arrays or one (N, n_u) stage matrix."""
        if isinstance(u_ws, (list, tuple)):
            parts = [np.asarray(ua).ravel() for ua in u_ws]
            self.u_ws = np.concatenate(parts)
        else:
            u_ws = np.asarray(u_ws)
            parts = []
            off = 0
            for a in range(self.M):
                na = self.problem.num_ua_d[a]
                parts.append(u_ws[:, off:off + na].ravel())
                off += na
            self.u_ws = np.concatenate(parts)

    def solve(self, states: List[VehicleState], parameters=None):
        t0 = time.time()
        x0 = jnp.asarray(self.joint_dynamics.state2q(states), self.dtype)
        up = jnp.zeros(self.n_u, self.dtype)
        res = self._solve_jit(jnp.asarray(self.u_ws, self.dtype), x0, up, parameters)
        self.q_pred = np.asarray(self.problem.rollout(res.u, x0))
        self.u_pred = np.asarray(self.problem.u_to_stage(res.u))
        dur = time.time() - t0
        msg = 'converged' if bool(res.converged) else 'max_it'
        self.print_method(f'IBR status: {msg} | delta: {float(res.delta):.3e}')
        return dict(time=dur, status=bool(res.converged), msg=msg,
                    u_sol=np.asarray(res.u), delta=float(res.delta))

    def step(self, states: List[VehicleState], parameters=None):
        info = self.solve(states, parameters)
        self.joint_dynamics.qu2state(states, None, self.u_pred[0])
        self.state_input_predictions = self.joint_dynamics.qu2prediction(
            self.state_input_predictions, self.q_pred, self.u_pred)
        return info

    def get_prediction(self):
        return self.state_input_predictions

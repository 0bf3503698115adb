"""Dynamic-game problem definition and condensed derivative evaluation.

This module is the TPU-native replacement for the reference's symbolic problem factory
(``/root/reference/DGSQP/solvers/DGSQP.py:587-1030`` — ``_build_solver``).  The reference builds
CasADi expression graphs for the rollout, the block chain-rule map ``Du_x``, per-agent cost
gradients ``q``, the constraint Jacobian ``G``, and the non-symmetric game Hessian ``Q`` via
backward dynamic-programming recursions, then C-compiles them.  Here the same mathematical
objects are produced by jax autodiff through a ``lax.scan`` rollout:

  * ``q``  = stacked per-agent gradients  q^a = D_{u^a} J^a(x(u), u)          (DGSQP.py:898-899)
  * ``g``  = stacked inequality constraints C(x(u), u) <= 0                   (DGSQP.py:911-915)
  * ``G``  = D_u C, via one reverse-mode Jacobian                             (DGSQP.py:918)
  * ``Q``  = D_u [D_{u^a} L^a]_a with L^a = J^a + l'C — the Jacobian of the stacked KKT
             stationarity map (NOT symmetric), via forward-over-reverse        (DGSQP.py:933-934)

Decision-variable layout matches the reference exactly: the input sequence is stacked BY AGENT,
``u = [u^1_0..u^1_{N-1}, u^2_0..u^2_{N-1}, ...]`` (``DGSQP.py:590``), so duals, Jacobians and
Hessian blocks are directly comparable across frameworks.

User-facing API parity: costs/constraints are supplied as per-agent lists of per-stage callables
(length N+1, entry N = terminal, entries may be ``None``), mirroring the reference's lists of
``ca.Function`` (``DGSQP.py:26-34``).  Callables are plain jnp functions:
    stage cost        f(x_k, u^a_k, u^a_{k-1})            -> scalar   [optionally (.., P)]
    terminal cost     f(x_N)                              -> scalar   [optionally (x_N, P)]
    agent constraint  f(x_k, u^a_k, u^a_{k-1})            -> (m,)     [optionally (.., P)]
    shared constraint f(x_k, u_k, u_{k-1})                -> (m,)     [optionally (.., P)]
Parameterized variants receive the solve-time parameter pytree ``P`` as their last argument.
"""
from __future__ import annotations

import inspect
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.dynamics.multi_agent import MultiAgentDynamicsModel


def _n_args(fn: Callable) -> int:
    return len(inspect.signature(fn).parameters)


def _call_stage(fn, x, u, um, P):
    """Call a stage callable with or without the parameter argument."""
    return fn(x, u, um, P) if _n_args(fn) >= 4 else fn(x, u, um)


def _call_term(fn, x, P):
    return fn(x, P) if _n_args(fn) >= 2 else fn(x)


def _as_stage_list(spec, N: int):
    """Normalize a cost/constraint spec to a list of length N+1 (stage 0..N-1 + terminal).

    Accepts: a list of length N+1 (reference-style), or a (stage_fn, terminal_fn) tuple, where
    either member may be None.
    """
    if spec is None:
        return [None] * (N + 1)
    if isinstance(spec, (list,)):
        if len(spec) != N + 1:
            raise ValueError(f'Expected list of length N+1={N + 1}, got {len(spec)}')
        return list(spec)
    if isinstance(spec, tuple) and len(spec) == 2:
        stage, term = spec
        return [stage] * N + [term]
    raise ValueError('Cost/constraint spec must be a list of length N+1 or a (stage, terminal) tuple')


class GameProblem:
    """An M-player open-loop dynamic game over horizon N with shared constraints.

    Constructor signature mirrors the reference solver constructors
    (``DGSQP.py:26-34``): joint dynamics, per-agent costs, per-agent constraints, shared
    constraints, and box bounds given as ``{'ub': [VehicleState]*M, 'lb': [VehicleState]*M}``.
    """

    def __init__(self,
                 joint_dynamics: MultiAgentDynamicsModel,
                 costs: Sequence,
                 agent_constraints: Sequence,
                 shared_constraints,
                 bounds: Dict,
                 N: int,
                 dtype=jnp.float64):
        self.joint_dynamics = joint_dynamics
        self.M = joint_dynamics.n_a
        self.N = N
        self.n_q = joint_dynamics.n_q
        self.n_u = joint_dynamics.n_u
        self.dtype = dtype

        self.num_qa_d = joint_dynamics.num_qa_d
        self.num_ua_d = joint_dynamics.num_ua_d
        self.num_ua_el = [N * n for n in self.num_ua_d]
        self.ua_el_offsets = np.concatenate([[0], np.cumsum(self.num_ua_el)]).astype(int)
        self.q_offsets = joint_dynamics.q_offsets
        self.u_offsets = joint_dynamics.u_offsets
        self.n_dec = N * self.n_u

        if len(costs) != self.M:
            raise ValueError(f'{self.M} agents but {len(costs)} cost specs provided')
        self.costs = [_as_stage_list(c, N) for c in costs]
        self.agent_constraints = [_as_stage_list(c, N) for c in (agent_constraints or [None] * self.M)]
        self.shared_constraints = _as_stage_list(shared_constraints, N)

        # --- process box constraints exactly like the reference (DGSQP.py:136-148)
        self.state_ub, self.state_lb, self.input_ub, self.input_lb = [], [], [], []
        self.state_ub_idxs, self.state_lb_idxs = [], []
        self.input_ub_idxs, self.input_lb_idxs = [], []
        for a in range(self.M):
            model = joint_dynamics.dynamics_models[a]
            su, iu = model.state2qu(bounds['ub'][a])
            sl, il = model.state2qu(bounds['lb'][a])
            self.state_ub.append(su)
            self.state_lb.append(sl)
            self.input_ub.append(iu)
            self.input_lb.append(il)
            self.state_ub_idxs.append(np.where(su < np.inf)[0])
            self.state_lb_idxs.append(np.where(sl > -np.inf)[0])
            self.input_ub_idxs.append(np.where(iu < np.inf)[0])
            self.input_lb_idxs.append(np.where(il > -np.inf)[0])

        # --- constraint dimension bookkeeping (matches reference n_cs/n_ca/n_c layout)
        self._count_constraints()

    # ------------------------------------------------------------ layout helpers
    def u_to_stage(self, u_flat):
        """Agent-stacked flat u -> (N, n_u) stage-major matrix (columns agent-ordered)."""
        blocks = []
        for a in range(self.M):
            ua = u_flat[self.ua_el_offsets[a]:self.ua_el_offsets[a + 1]]
            blocks.append(ua.reshape(self.N, self.num_ua_d[a]))
        return jnp.concatenate(blocks, axis=1)

    def stage_to_u(self, u_mat):
        """(N, n_u) stage matrix -> agent-stacked flat vector."""
        parts = []
        for a in range(self.M):
            parts.append(u_mat[:, self.u_offsets[a]:self.u_offsets[a + 1]].reshape(-1))
        return jnp.concatenate(parts)

    def agent_u_block(self, u_flat, a: int):
        return u_flat[self.ua_el_offsets[a]:self.ua_el_offsets[a + 1]]

    # ----------------------------------------------------------------- rollout
    def rollout(self, u_flat, x0):
        """State trajectory x(u, x0) by single shooting (reference ``DGSQP.py:598-601``).
        Returns (N+1, n_q)."""
        u_mat = self.u_to_stage(u_flat)
        fd = self.joint_dynamics.fd

        def step(x, u_k):
            x_next = fd(x, u_k)
            return x_next, x_next

        _, xs = jax.lax.scan(step, x0, u_mat)
        return jnp.concatenate([x0[None, :], xs], axis=0)

    # ------------------------------------------------------------------- costs
    def agent_cost(self, a: int, u_flat, x0, u_prev, P=None):
        """J^a(u) — scalar cost of agent a along the rollout (reference ``DGSQP.py:656-670``).

        Stage k cost depends on (x_k, u^a_k, u^a_{k-1}) with u^a_{-1} = the previous applied
        input; terminal cost on x_N.
        """
        x = self.rollout(u_flat, x0)
        return self._agent_cost_along(a, x, u_flat, u_prev, P)

    def _agent_cost_along(self, a, x, u_flat, u_prev, P):
        ua = self.agent_u_block(u_flat, a).reshape(self.N, self.num_ua_d[a])
        upa = u_prev[self.u_offsets[a]:self.u_offsets[a + 1]]
        J = jnp.asarray(0.0, dtype=x.dtype)
        for k in range(self.N):
            fn = self.costs[a][k]
            if fn is None:
                continue
            um = upa if k == 0 else ua[k - 1]
            J = J + _call_stage(fn, x[k], ua[k], um, P)
        if self.costs[a][self.N] is not None:
            J = J + _call_term(self.costs[a][self.N], x[self.N], P)
        return J

    def eval_costs(self, u_flat, x0, u_prev, P=None):
        """All agents' costs — the reference's ``f_J`` (``DGSQP.py:893``)."""
        x = self.rollout(u_flat, x0)
        return jnp.stack([self._agent_cost_along(a, x, u_flat, u_prev, P)
                          for a in range(self.M)])

    # -------------------------------------------------------------- constraints
    def _count_constraints(self):
        """Probe constraint shapes with zeros to record the exact reference layout
        (shared, then per-agent [nonlinear, input-box-ub, input-box-lb, state-box-ub,
        state-box-lb] per stage; ``DGSQP.py:730-821``)."""
        N, M = self.N, self.M
        self.n_cs = [0] * (N + 1)
        self.n_ca = [[0] * (N + 1) for _ in range(M)]
        self.n_c = [0] * (N + 1)
        x_z = np.zeros(self.n_q)
        u_z = np.zeros(self.n_u)

        def probe_len(fn, *args):
            out = fn(*args)
            return int(np.asarray(out).size)

        for k in range(N):
            if self.shared_constraints[k] is not None:
                fn = self.shared_constraints[k]
                self.n_cs[k] = probe_len(lambda *A: _call_stage(fn, *A, None), x_z, u_z, u_z)
            for a in range(M):
                n = 0
                if self.agent_constraints[a][k] is not None:
                    fn = self.agent_constraints[a][k]
                    ua_z = np.zeros(self.num_ua_d[a])
                    n += probe_len(lambda *A: _call_stage(fn, *A, None), x_z, ua_z, ua_z)
                n += len(self.input_ub_idxs[a]) + len(self.input_lb_idxs[a])
                if k > 0:
                    n += len(self.state_ub_idxs[a]) + len(self.state_lb_idxs[a])
                self.n_ca[a][k] = n
            self.n_c[k] = self.n_cs[k] + sum(self.n_ca[a][k] for a in range(M))
        # terminal
        if self.shared_constraints[N] is not None:
            fn = self.shared_constraints[N]
            self.n_cs[N] = probe_len(lambda xx: _call_term(fn, xx, None), x_z)
        for a in range(M):
            n = 0
            if self.agent_constraints[a][N] is not None:
                fn = self.agent_constraints[a][N]
                n += probe_len(lambda xx: _call_term(fn, xx, None), x_z)
            n += len(self.state_ub_idxs[a]) + len(self.state_lb_idxs[a])
            self.n_ca[a][N] = n
        self.n_c[N] = self.n_cs[N] + sum(self.n_ca[a][N] for a in range(M))
        self.n_c_total = int(sum(self.n_c))

    def eval_constraints(self, u_flat, x0, u_prev, P=None):
        """Stacked inequality constraints g(u) = C(x(u), u) <= 0 in reference order
        (``DGSQP.py:803-821``).  Returns (n_c_total,)."""
        x = self.rollout(u_flat, x0)
        return self._constraints_along(x, u_flat, u_prev, P)

    def _constraints_along(self, x, u_flat, u_prev, P):
        N, M = self.N, self.M
        u_mat = self.u_to_stage(u_flat)
        ua = [self.agent_u_block(u_flat, a).reshape(N, self.num_ua_d[a]) for a in range(M)]
        upa = [u_prev[self.u_offsets[a]:self.u_offsets[a + 1]] for a in range(M)]
        out = []
        for k in range(N):
            if self.shared_constraints[k] is not None:
                um = u_prev if k == 0 else u_mat[k - 1]
                out.append(jnp.atleast_1d(
                    _call_stage(self.shared_constraints[k], x[k], u_mat[k], um, P)))
            for a in range(M):
                if self.agent_constraints[a][k] is not None:
                    um = upa[a] if k == 0 else ua[a][k - 1]
                    out.append(jnp.atleast_1d(
                        _call_stage(self.agent_constraints[a][k], x[k], ua[a][k], um, P)))
                if len(self.input_ub_idxs[a]) > 0:
                    idx = self.input_ub_idxs[a]
                    out.append(ua[a][k][idx] - self.input_ub[a][idx])
                if len(self.input_lb_idxs[a]) > 0:
                    idx = self.input_lb_idxs[a]
                    out.append(self.input_lb[a][idx] - ua[a][k][idx])
                if k > 0:
                    if len(self.state_ub_idxs[a]) > 0:
                        idx = self.state_ub_idxs[a] + self.q_offsets[a]
                        out.append(x[k][idx] - self.state_ub[a][self.state_ub_idxs[a]])
                    if len(self.state_lb_idxs[a]) > 0:
                        idx = self.state_lb_idxs[a] + self.q_offsets[a]
                        out.append(self.state_lb[a][self.state_lb_idxs[a]] - x[k][idx])
        # terminal stage
        if self.shared_constraints[N] is not None:
            out.append(jnp.atleast_1d(_call_term(self.shared_constraints[N], x[N], P)))
        for a in range(M):
            if self.agent_constraints[a][N] is not None:
                out.append(jnp.atleast_1d(_call_term(self.agent_constraints[a][N], x[N], P)))
            if len(self.state_ub_idxs[a]) > 0:
                idx = self.state_ub_idxs[a] + self.q_offsets[a]
                out.append(x[N][idx] - self.state_ub[a][self.state_ub_idxs[a]])
            if len(self.state_lb_idxs[a]) > 0:
                idx = self.state_lb_idxs[a] + self.q_offsets[a]
                out.append(self.state_lb[a][self.state_lb_idxs[a]] - x[N][idx])
        if not out:
            return jnp.zeros((0,), dtype=u_flat.dtype)
        return jnp.concatenate(out)

    # --------------------------------------------------- condensed derivatives
    def eval_q(self, u_flat, x0, u_prev, P=None):
        """Stacked per-agent own-block cost gradients (the reference's ``f_q``,
        ``DGSQP.py:898-899``)."""
        parts = []
        for a in range(self.M):
            ga = jax.grad(lambda uu: self.agent_cost(a, uu, x0, u_prev, P))(u_flat)
            parts.append(self.agent_u_block(ga, a))
        return jnp.concatenate(parts)

    def stationarity(self, u_flat, l, x0, u_prev, P=None):
        """Stacked KKT stationarity map F(u, l) = [D_{u^a}(J^a + l'C)]_a.

        Its value equals q + G'l; its u-Jacobian is the game Hessian Q
        (reference ``DGSQP.py:933-947``).
        """
        parts = []
        for a in range(self.M):
            def lag(uu, a=a):
                return (self.agent_cost(a, uu, x0, u_prev, P)
                        + jnp.dot(l, self.eval_constraints(uu, x0, u_prev, P)))
            ga = jax.grad(lag)(u_flat)
            parts.append(self.agent_u_block(ga, a))
        return jnp.concatenate(parts)

    def evaluate(self, u_flat, l, x0, u_prev, P=None, hessian: bool = True):
        """The reference's hot ``_evaluate`` (``DGSQP.py:509-533``).

        Returns (Q, q, G, g, x) with hessian=True, else (q, G, g, x).
        """
        x = self.rollout(u_flat, x0)
        g = self._constraints_along(x, u_flat, u_prev, P)
        G = jax.jacrev(lambda uu: self.eval_constraints(uu, x0, u_prev, P))(u_flat)
        q = self.eval_q(u_flat, x0, u_prev, P)
        if not hessian:
            return q, G, g, x
        Q = jax.jacfwd(lambda uu: self.stationarity(uu, l, x0, u_prev, P))(u_flat)
        return Q, q, G, g, x

    def constraint_indices_for_agent(self, a: int) -> np.ndarray:
        """Row indices of the constraints entering agent a's best-response problem:
        shared rows + agent-a rows (incl. its box rows) at every stage.

        Mirrors the reference's ``Cbr_v_idxs`` bookkeeping (``DGSQP.py:806-821``).
        """
        idxs = []
        off = 0
        for k in range(self.N + 1):
            idxs.append(np.arange(off, off + self.n_cs[k]))
            a_off = off + self.n_cs[k]
            for b in range(self.M):
                if b == a:
                    idxs.append(np.arange(a_off, a_off + self.n_ca[b][k]))
                a_off += self.n_ca[b][k]
            off += self.n_c[k]
        return np.concatenate(idxs).astype(int)

    def dual_warm_start(self, u_flat, x0, u_prev, P=None):
        """Least-squares dual initialization l0 = max(0, -argmin_l ||G'l - q||)
        (reference ``DGSQP.py:320-324`` solves the same normal equations with sparse lsqr)."""
        q, G, _, _ = self.evaluate(u_flat, None, x0, u_prev, P, hessian=False)
        sol = jnp.linalg.lstsq(G.T, q)[0]
        return jnp.maximum(0.0, -sol)

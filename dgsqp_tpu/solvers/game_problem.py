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

Execution design: per-stage cost/constraint callables that are the SAME function across stages
are grouped and evaluated in one ``vmap`` over the stage axis, then scattered into the
reference's canonical row order with precomputed index maps — the XLA program stays small and
batched instead of unrolling N stages of tiny ops (compile time and runtime both scale with
the number of DISTINCT callables, not the horizon).

User-facing API parity: costs/constraints are supplied as per-agent lists of per-stage callables
(length N+1, entry N = terminal, entries may be ``None``), mirroring the reference's lists of
``ca.Function`` (``DGSQP.py:26-34``).  Callables are plain jnp functions:
    stage cost        f(x_k, u^a_k, u^a_{k-1})            -> scalar   [optionally (.., P)]
    terminal cost     f(x_N)                              -> scalar   [optionally (x_N, P)]
    agent constraint  f(x_k, u^a_k, u^a_{k-1})            -> (m,)     [optionally (.., P)]
    shared constraint f(x_k, u_k, u_{k-1})                -> (m,)     [optionally (.., P)]
A callable with attribute ``stage_indexed = True`` additionally receives the stage index k as
its last argument (used by the approximate-game path to index per-stage parameter arrays).
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


def _takes_params(fn: Callable) -> bool:
    n = _n_args(fn)
    if getattr(fn, 'stage_indexed', False):
        n -= 1
    return n >= 4


def _takes_params_term(fn: Callable) -> bool:
    n = _n_args(fn)
    if getattr(fn, 'stage_indexed', False):
        n -= 1
    return n >= 2


def _call_stage(fn, x, u, um, P, k=None):
    args = (x, u, um)
    if _takes_params(fn):
        args = args + (P,)
    if getattr(fn, 'stage_indexed', False):
        args = args + (k,)
    return fn(*args)


def _call_term(fn, x, P, k=None):
    args = (x,)
    if _takes_params_term(fn):
        args = args + (P,)
    if getattr(fn, 'stage_indexed', False):
        args = args + (k,)
    return fn(*args)


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


def _group_stages(fns: Sequence) -> List:
    """Group a length-N list of callables by identity: [(fn, np.array(ks)), ...]."""
    groups = {}
    order = []
    for k, fn in enumerate(fns):
        if fn is None:
            continue
        key = id(fn)
        if key not in groups:
            groups[key] = (fn, [])
            order.append(key)
        groups[key][1].append(k)
    return [(groups[key][0], np.asarray(groups[key][1])) for key in order]


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

        self._count_constraints()
        self._build_plan()

        # device copies of the box-bound tables in the problem dtype (numpy float64 arrays
        # would otherwise promote f32 computations when x64 is enabled)
        self._input_ub_j = [jnp.asarray(a, dtype) for a in self.input_ub]
        self._input_lb_j = [jnp.asarray(a, dtype) for a in self.input_lb]
        self._state_ub_j = [jnp.asarray(a, dtype) for a in self.state_ub]
        self._state_lb_j = [jnp.asarray(a, dtype) for a in self.state_lb]

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

    # -------------------------------------------------- constraint bookkeeping
    def _probe_rows(self, fn, x, u, um, terminal=False):
        # Parameterized constraints whose shape cannot be probed with P=None declare their
        # row count via an ``n_out`` attribute (used by the approximate-game closures).
        n_out = getattr(fn, 'n_out', None)
        if n_out is not None:
            return int(n_out)
        probe = getattr(fn, 'probe_rows', None)
        if probe is not None:
            return int(probe(x, u, um))
        if terminal:
            return int(np.asarray(_call_term(fn, x, None, 0)).size)
        return int(np.asarray(_call_stage(fn, x, u, um, None, 0)).size)

    def _count_constraints(self):
        """Record the exact reference layout (shared, then per-agent [nonlinear,
        input-box-ub, input-box-lb, state-box-ub, state-box-lb] per stage;
        ``DGSQP.py:730-821``) and the per-block row offsets."""
        N, M = self.N, self.M
        self.n_cs = [0] * (N + 1)
        self.n_ca = [[0] * (N + 1) for _ in range(M)]
        self.n_c = [0] * (N + 1)
        x_z = np.zeros(self.n_q)
        u_z = np.zeros(self.n_u)

        self._m_shared = [0] * (N + 1)   # rows of the nonlinear shared constraint at k
        self._m_agent = [[0] * (N + 1) for _ in range(M)]

        for k in range(N):
            if self.shared_constraints[k] is not None:
                self._m_shared[k] = self._probe_rows(self.shared_constraints[k], x_z, u_z, u_z)
            self.n_cs[k] = self._m_shared[k]
            for a in range(M):
                n = 0
                if self.agent_constraints[a][k] is not None:
                    ua_z = np.zeros(self.num_ua_d[a])
                    self._m_agent[a][k] = self._probe_rows(self.agent_constraints[a][k],
                                                           x_z, ua_z, ua_z)
                    n += self._m_agent[a][k]
                n += len(self.input_ub_idxs[a]) + len(self.input_lb_idxs[a])
                if k > 0:
                    n += len(self.state_ub_idxs[a]) + len(self.state_lb_idxs[a])
                self.n_ca[a][k] = n
            self.n_c[k] = self.n_cs[k] + sum(self.n_ca[a][k] for a in range(M))
        # terminal
        if self.shared_constraints[N] is not None:
            self._m_shared[N] = self._probe_rows(self.shared_constraints[N], x_z, None, None,
                                                 terminal=True)
        self.n_cs[N] = self._m_shared[N]
        for a in range(M):
            n = 0
            if self.agent_constraints[a][N] is not None:
                self._m_agent[a][N] = self._probe_rows(self.agent_constraints[a][N], x_z,
                                                       None, None, terminal=True)
                n += self._m_agent[a][N]
            n += len(self.state_ub_idxs[a]) + len(self.state_lb_idxs[a])
            self.n_ca[a][N] = n
        self.n_c[N] = self.n_cs[N] + sum(self.n_ca[a][N] for a in range(M))
        self.n_c_total = int(sum(self.n_c))

        # block start offsets
        self._stage_off = np.concatenate([[0], np.cumsum(self.n_c)]).astype(int)

    def _block_offsets(self, a: int, k: int):
        """Row offsets of agent a's sub-blocks at stage k: (nl, iub, ilb, sub, slb)."""
        base = self._stage_off[k] + self.n_cs[k] + sum(self.n_ca[b][k] for b in range(a))
        nl = base
        iub = nl + self._m_agent[a][k]
        ilb = iub + (len(self.input_ub_idxs[a]) if k < self.N else 0)
        sub = ilb + (len(self.input_lb_idxs[a]) if k < self.N else 0)
        slb = sub + (len(self.state_ub_idxs[a]) if (k > 0 or k == self.N) else 0)
        return nl, iub, ilb, sub, slb

    def input_box_structure(self):
        """Static (rows, cols) of the input-box rows of ``G``.

        Input-bound constraints are linear in the decision vector with a single
        ±1 entry (column = that input's element in the agent-stacked flat ``u``),
        so their rows of ``G`` are structurally constant across iterates.  The QP
        kernel uses this to fold them into the IPM normal matrix as a diagonal
        update instead of GEMM rows (``solve_qp(box=...)``).  State-box rows are
        dense in ``u`` (rows of ``±Du_x``) and are NOT included.
        """
        rows, cols = [], []
        for k in range(self.N):
            for a in range(self.M):
                _, iub, ilb, sub, _ = self._block_offsets(a, k)
                base_col = self.ua_el_offsets[a] + k * self.num_ua_d[a]
                for r, j in enumerate(self.input_ub_idxs[a]):
                    rows.append(iub + r)
                    cols.append(base_col + int(j))
                for r, j in enumerate(self.input_lb_idxs[a]):
                    rows.append(ilb + r)
                    cols.append(base_col + int(j))
        return tuple(int(r) for r in rows), tuple(int(c) for c in cols)

    def state_pair_structure(self):
        """Static (rows_plus, rows_minus) of paired state-bound rows of ``G``.

        A state upper bound ``x_j - ub <= 0`` has gradient ``+Du_x_j`` and the matching
        lower bound ``lb - x_j <= 0`` has gradient ``-Du_x_j`` — exact negations at every
        iterate.  The QP kernel folds each pair into ONE row of the IPM normal-matrix
        GEMM with combined weight (``solve_qp(pairs=...)``).  Only state indices present
        in BOTH the ub and lb lists are paired; state bounds exist for stages k=1..N-1
        and the terminal stage (k=0 states are fixed by the IC; see ``_count_rows``).
        """
        rows_p, rows_m = [], []
        for k in range(1, self.N + 1):
            for a in range(self.M):
                _, _, _, sub, slb = self._block_offsets(a, k)
                ub_idx = [int(j) for j in self.state_ub_idxs[a]]
                lb_idx = [int(j) for j in self.state_lb_idxs[a]]
                for pu, j in enumerate(ub_idx):
                    if j in lb_idx:
                        rows_p.append(sub + pu)
                        rows_m.append(slb + lb_idx.index(j))
        return tuple(rows_p), tuple(rows_m)

    def _build_plan(self):
        """Precompute vmap groups and destination index maps for vectorized assembly."""
        N, M = self.N, self.M

        # shared constraint groups over stages 0..N-1
        self._shared_groups = []
        for fn, ks in _group_stages(self.shared_constraints[:N]):
            m = self._m_shared[ks[0]]
            dest = np.stack([self._stage_off[k] + np.arange(m) for k in ks])
            self._shared_groups.append((fn, jnp.asarray(ks), jnp.asarray(dest)))

        # agent nonlinear constraint groups
        self._agent_groups = [[] for _ in range(M)]
        for a in range(M):
            for fn, ks in _group_stages(self.agent_constraints[a][:N]):
                m = self._m_agent[a][ks[0]]
                dest = np.stack([self._block_offsets(a, k)[0] + np.arange(m) for k in ks])
                self._agent_groups[a].append((fn, jnp.asarray(ks), jnp.asarray(dest)))

        # box destination maps
        self._iub_dest, self._ilb_dest = [], []
        self._sub_dest, self._slb_dest = [], []
        for a in range(M):
            if len(self.input_ub_idxs[a]):
                self._iub_dest.append(jnp.asarray(np.stack(
                    [self._block_offsets(a, k)[1] + np.arange(len(self.input_ub_idxs[a]))
                     for k in range(N)])))
            else:
                self._iub_dest.append(None)
            if len(self.input_lb_idxs[a]):
                self._ilb_dest.append(jnp.asarray(np.stack(
                    [self._block_offsets(a, k)[2] + np.arange(len(self.input_lb_idxs[a]))
                     for k in range(N)])))
            else:
                self._ilb_dest.append(None)
            if len(self.state_ub_idxs[a]):
                rows = [self._block_offsets(a, k)[3] + np.arange(len(self.state_ub_idxs[a]))
                        for k in list(range(1, N)) + [N]]
                self._sub_dest.append(jnp.asarray(np.stack(rows)))
            else:
                self._sub_dest.append(None)
            if len(self.state_lb_idxs[a]):
                rows = [self._block_offsets(a, k)[4] + np.arange(len(self.state_lb_idxs[a]))
                        for k in list(range(1, N)) + [N]]
                self._slb_dest.append(jnp.asarray(np.stack(rows)))
            else:
                self._slb_dest.append(None)

        # terminal nonlinear rows
        self._term_shared_dest = jnp.asarray(self._stage_off[N] + np.arange(self._m_shared[N])) \
            if self._m_shared[N] else None
        self._term_agent_dest = []
        for a in range(M):
            if self._m_agent[a][N]:
                self._term_agent_dest.append(jnp.asarray(
                    self._block_offsets(a, N)[0] + np.arange(self._m_agent[a][N])))
            else:
                self._term_agent_dest.append(None)

        # cost groups
        self._cost_groups = []
        for a in range(M):
            self._cost_groups.append(_group_stages(self.costs[a][:N]))

    # -------------------------------------------------------------- constraints
    def eval_constraints(self, u_flat, x0, u_prev, P=None):
        """Stacked inequality constraints g(u) = C(x(u), u) <= 0 in reference order
        (``DGSQP.py:803-821``).  Returns (n_c_total,)."""
        x = self.rollout(u_flat, x0)
        return self._constraints_along(x, u_flat, u_prev, P)

    def _constraints_along(self, x, u_flat, u_prev, P):
        N, M = self.N, self.M
        u_mat = self.u_to_stage(u_flat)
        um_mat = jnp.concatenate([u_prev[None], u_mat[:-1]], axis=0)   # u_{k-1} per stage
        ua = [self.agent_u_block(u_flat, a).reshape(N, self.num_ua_d[a]) for a in range(M)]
        uma = [jnp.concatenate([u_prev[self.u_offsets[a]:self.u_offsets[a + 1]][None],
                                ua[a][:-1]], axis=0) for a in range(M)]

        g = jnp.zeros(self.n_c_total, dtype=x.dtype)

        # shared nonlinear rows (vmapped per group)
        for fn, ks, dest in self._shared_groups:
            vals = jax.vmap(lambda k: jnp.atleast_1d(
                _call_stage(fn, x[k], u_mat[k], um_mat[k], P, k)))(ks)
            g = g.at[dest.reshape(-1)].set(vals.reshape(-1))

        # agent nonlinear rows
        for a in range(M):
            for fn, ks, dest in self._agent_groups[a]:
                vals = jax.vmap(lambda k: jnp.atleast_1d(
                    _call_stage(fn, x[k], ua[a][k], uma[a][k], P, k)))(ks)
                g = g.at[dest.reshape(-1)].set(vals.reshape(-1))

        # box rows (pure slicing)
        for a in range(M):
            if self._iub_dest[a] is not None:
                idx = self.input_ub_idxs[a]
                vals = ua[a][:, idx] - self._input_ub_j[a][idx]
                g = g.at[self._iub_dest[a].reshape(-1)].set(vals.reshape(-1))
            if self._ilb_dest[a] is not None:
                idx = self.input_lb_idxs[a]
                vals = self._input_lb_j[a][idx] - ua[a][:, idx]
                g = g.at[self._ilb_dest[a].reshape(-1)].set(vals.reshape(-1))
            if self._sub_dest[a] is not None:
                idx = self.state_ub_idxs[a] + self.q_offsets[a]
                vals = x[1:, idx] - self._state_ub_j[a][self.state_ub_idxs[a]]
                g = g.at[self._sub_dest[a].reshape(-1)].set(vals.reshape(-1))
            if self._slb_dest[a] is not None:
                idx = self.state_lb_idxs[a] + self.q_offsets[a]
                vals = self._state_lb_j[a][self.state_lb_idxs[a]] - x[1:, idx]
                g = g.at[self._slb_dest[a].reshape(-1)].set(vals.reshape(-1))

        # terminal nonlinear rows
        if self._term_shared_dest is not None:
            vals = jnp.atleast_1d(_call_term(self.shared_constraints[N], x[N], P, N))
            g = g.at[self._term_shared_dest].set(vals)
        for a in range(M):
            if self._term_agent_dest[a] is not None:
                vals = jnp.atleast_1d(_call_term(self.agent_constraints[a][N], x[N], P, N))
                g = g.at[self._term_agent_dest[a]].set(vals)
        return g

    # ------------------------------------------------------------------- costs
    def agent_cost(self, a: int, u_flat, x0, u_prev, P=None):
        """J^a(u) — scalar cost of agent a along the rollout (reference ``DGSQP.py:656-670``)."""
        x = self.rollout(u_flat, x0)
        return self._agent_cost_along(a, x, u_flat, u_prev, P)

    def _agent_cost_along(self, a, x, u_flat, u_prev, P):
        ua = self.agent_u_block(u_flat, a).reshape(self.N, self.num_ua_d[a])
        upa = u_prev[self.u_offsets[a]:self.u_offsets[a + 1]]
        uma = jnp.concatenate([upa[None], ua[:-1]], axis=0)
        J = jnp.asarray(0.0, dtype=x.dtype)
        for fn, ks in self._cost_groups[a]:
            vals = jax.vmap(lambda k: _call_stage(fn, x[k], ua[k], uma[k], P, k))(
                jnp.asarray(ks))
            J = J + jnp.sum(vals)
        if self.costs[a][self.N] is not None:
            J = J + _call_term(self.costs[a][self.N], x[self.N], P, self.N)
        return J

    def eval_costs(self, u_flat, x0, u_prev, P=None):
        """All agents' costs — the reference's ``f_J`` (``DGSQP.py:893``)."""
        x = self.rollout(u_flat, x0)
        return jnp.stack([self._agent_cost_along(a, x, u_flat, u_prev, P)
                          for a in range(self.M)])

    # --------------------------------------------------- condensed derivatives
    def _costs_and_constraints(self, u_flat, x0, u_prev, P):
        """One shared forward pass: rollout + all agent costs + stacked constraints."""
        x = self.rollout(u_flat, x0)
        C = self._constraints_along(x, u_flat, u_prev, P)
        Js = jnp.stack([self._agent_cost_along(a, x, u_flat, u_prev, P)
                        for a in range(self.M)])
        return Js, C, x

    def _own_blocks(self, rows):
        """Stack the own-agent u-block of per-agent gradient rows: rows is (M, n_dec)."""
        return jnp.concatenate([
            rows[a, self.ua_el_offsets[a]:self.ua_el_offsets[a + 1]]
            for a in range(self.M)])

    def eval_q(self, u_flat, x0, u_prev, P=None):
        """Stacked per-agent own-block cost gradients (the reference's ``f_q``,
        ``DGSQP.py:898-899``).  One vmapped reverse sweep with M seeds over a shared
        forward pass."""
        def Jfn(uu):
            x = self.rollout(uu, x0)
            return jnp.stack([self._agent_cost_along(a, x, uu, u_prev, P)
                              for a in range(self.M)])
        DJ = jax.jacrev(Jfn)(u_flat)
        return self._own_blocks(DJ)

    def stationarity(self, u_flat, l, x0, u_prev, P=None):
        """Stacked KKT stationarity map F(u, l) = [D_{u^a}(J^a + l'C)]_a.

        Its value equals q + G'l; its u-Jacobian is the game Hessian Q
        (reference ``DGSQP.py:933-947``).
        """
        d, _ = self.merit_terms(u_flat, l, x0, u_prev, P)
        return d

    def merit_terms(self, u_flat, l, x0, u_prev, P=None):
        """Cheap merit-function ingredients: (d, g) with d = q + G'l.

        The Lagrangian-gradient structure is exploited: the shared term ``grad(l'C)`` is
        identical across agents, so ONE reverse sweep computes it and M cheap sweeps add the
        per-agent cost gradients — all M+1 sweeps batched (vmapped seeds) over one shared
        forward pass.  Line searches evaluate the merit at every trial point, so this path
        is what bounds their cost (the reference evaluates its merit through full casadi
        Jacobians, ``DGSQP.py:962-976``).
        """
        def sigma(uu):
            Js, C, _ = self._costs_and_constraints(uu, x0, u_prev, P)
            return jnp.concatenate([Js, jnp.dot(l, C)[None]]), C
        Dsig, g = jax.jacrev(sigma, has_aux=True)(u_flat)
        d = self._own_blocks(Dsig[:self.M] + Dsig[self.M][None])
        return d, g

    def evaluate(self, u_flat, l, x0, u_prev, P=None, hessian: bool = True):
        """The reference's hot ``_evaluate`` (``DGSQP.py:509-533``).

        Returns (Q, q, G, g, x) with hessian=True, else (q, G, g, x).

        First derivatives (q, G) come from ONE forward-mode Jacobian of the stacked
        (costs, constraints) map — n_dec tangents through a single shared rollout, cheaper
        than row-wise reverse mode since n_dec << n_c.  The game Hessian row-block of agent
        a is [hess(J^a + l'C)] restricted to agent a's rows (``DGSQP.py:933-934``); since
        the ``l'C`` term is agent-independent its Hessian is computed ONCE and shared — the
        forward-over-reverse pass carries only M+1 scalar seeds instead of re-sweeping the
        full constraint stack per agent.
        """
        def fc(uu):
            Js, C, x = self._costs_and_constraints(uu, x0, u_prev, P)
            return (Js, C), (Js, C, x)

        (DJ, G), (Js, g, x) = jax.jacfwd(fc, has_aux=True)(u_flat)
        q = self._own_blocks(DJ)
        if not hessian:
            return q, G, g, x

        def sigma_grad(uu):
            def sigma(uu2):
                Js2, C2, _ = self._costs_and_constraints(uu2, x0, u_prev, P)
                return jnp.concatenate([Js2, jnp.dot(l, C2)[None]])
            return jax.jacrev(sigma)(uu)

        H = jax.jacfwd(sigma_grad)(u_flat)          # (M+1, n_dec, n_dec)
        Q = jnp.concatenate([
            (H[a] + H[self.M])[self.ua_el_offsets[a]:self.ua_el_offsets[a + 1], :]
            for a in range(self.M)], axis=0)
        return Q, q, G, g, x

    # --------------------------------------- DP (stagewise-GEMM) condensed evaluation
    def _dp_plan(self):
        """Constant structures for :meth:`evaluate_dp`: input selectors S_k = du_k/du
        (and the um shift), embedding index maps per group type, and the constant
        input-box rows of G (linear in u, so fixed)."""
        if hasattr(self, '_dp_sel'):
            return self._dp_sel
        N, M, nq, nu, nd = self.N, self.M, self.n_q, self.n_u, self.n_dec
        S = np.zeros((N, nu, nd))
        for a in range(M):
            da = self.num_ua_d[a]
            for k in range(N):
                for d in range(da):
                    S[k, self.u_offsets[a] + d,
                      self.ua_el_offsets[a] + k * da + d] = 1.0
        Sm = np.zeros_like(S)
        Sm[1:] = S[:-1]

        # constant input-box G rows
        G0 = np.zeros((self.n_c_total, nd))
        for a in range(M):
            da = self.num_ua_d[a]
            Sa = S[:, self.u_offsets[a]:self.u_offsets[a] + da, :]
            if self._iub_dest[a] is not None:
                idx = self.input_ub_idxs[a]
                G0[np.asarray(self._iub_dest[a]).reshape(-1)] = \
                    Sa[:, idx, :].reshape(-1, nd)
            if self._ilb_dest[a] is not None:
                idx = self.input_lb_idxs[a]
                G0[np.asarray(self._ilb_dest[a]).reshape(-1)] = \
                    -Sa[:, idx, :].reshape(-1, nd)
        # cache HOST arrays: the first call may happen inside a jit trace, where
        # jnp.asarray's dtype conversion stages a tracer — caching that leaks it into
        # every later trace (UnexpectedTracerError in the chunked driver's second jit)
        self._dp_sel = (np.asarray(S, dtype=self.dtype), np.asarray(Sm, dtype=self.dtype),
                        np.asarray(G0, dtype=self.dtype))
        return self._dp_sel

    def evaluate_dp(self, u_flat, l, x0, u_prev, P=None, hessian: bool = True):
        """Stage-structured (DP) evaluation: same outputs as :meth:`evaluate`
        ``(Q, q, G, g, x)``, assembled from per-stage derivatives and the forward
        sensitivity map ``X_k = dx_k/du`` instead of whole-trajectory AD sweeps.

        This is the reference's own structure — CasADi DP recursions for the cost and
        constraint Hessians (``DGSQP.py:679-727,829-877``) and the lower-triangular
        chain-rule map ``Du_x`` (``:642-650``) — recast TPU-first: every stage quantity
        is a small vmapped AD call (stage-cost/constraint Jacobians+Hessians, dynamics
        second derivatives shared across the M+1 scalars), and all horizon coupling is
        batched GEMMs against the (N, n_q, n_dec) sensitivity stack — MXU work instead
        of n_dec sequential AD tangents.  Selected by ``DGSQPParams.hessian_mode='dp'``.
        """
        N, M = self.N, self.M
        nq, nu, nd = self.n_q, self.n_u, self.n_dec
        L = nq + 2 * nu                       # lifted joint stage coords (x, u, um)
        dtype = x0.dtype
        jd = self.joint_dynamics
        u_mat = self.u_to_stage(u_flat)
        um_mat = jnp.concatenate([u_prev[None], u_mat[:-1]], axis=0)
        ua = [self.agent_u_block(u_flat, a).reshape(N, self.num_ua_d[a])
              for a in range(M)]
        uma = [jnp.concatenate([u_prev[self.u_offsets[a]:self.u_offsets[a + 1]][None],
                                ua[a][:-1]], axis=0) for a in range(M)]
        x = self.rollout(u_flat, x0)
        # plan is cached as HOST arrays; convert inside the CURRENT trace so nothing
        # staged in one jit leaks into the next
        S, Sm, G0 = (jnp.asarray(a) for a in self._dp_plan())

        A = jax.vmap(lambda q_, u_: jax.jacfwd(jd.fd, argnums=0)(q_, u_))(x[:-1], u_mat)
        B = jax.vmap(lambda q_, u_: jax.jacfwd(jd.fd, argnums=1)(q_, u_))(x[:-1], u_mat)

        def fstep(Xk, blk):
            A_k, B_k, S_k = blk
            Xn = A_k @ Xk + B_k @ S_k
            return Xn, Xn

        _, Xs = jax.lax.scan(fstep, jnp.zeros((nq, nd), dtype), (A, B, S))
        X = jnp.concatenate([jnp.zeros((1, nq, nd), dtype), Xs], axis=0)  # (N+1,nq,nd)

        g = self._constraints_along(x, u_flat, u_prev, P)

        G = G0
        grads = jnp.zeros((M, nd), dtype)          # full cost gradients dJ^a/du
        cx = jnp.zeros((M + 1, N, nq), dtype)      # stage x-gradients (adjoint sources)
        cNx = jnp.zeros((M + 1, nq), dtype)        # terminal x-gradients
        W = jnp.zeros((M + 1, N, L, L), dtype)     # lifted stage Hessians per sigma
        WN = jnp.zeros((M + 1, nq, nq), dtype)     # terminal Hessians

        def lifted(fn, du_dim):
            def s(z, Pp, k):
                return jnp.atleast_1d(_call_stage(fn, z[:nq], z[nq:nq + du_dim],
                                                  z[nq + du_dim:], Pp, k))
            return s

        def group_JH(fn, du_dim, zs, ks, w=None, want_h=True):
            """Per-stage lifted Jacobians (K, m, nq+2du) and, if want_h, Hessians of the
            w-weighted scalar (K, Lg, Lg)."""
            s = lifted(fn, du_dim)

            def one(z, k, wk):
                J = jax.jacfwd(lambda zz: s(zz, P, k))(z)
                if want_h:
                    H = jax.hessian(lambda zz: jnp.dot(wk, s(zz, P, k)))(z)
                else:
                    H = jnp.zeros((z.size, z.size), dtype)
                return J, H

            if w is None:
                w = jnp.ones((ks.shape[0], 1), dtype)
            return jax.vmap(one)(zs, ks, w)

        def embed_cols(rows_x, rows_u, rows_m, Zu, Zum, ks):
            """Chain-rule a (K, m, local) stage Jacobian into u_flat columns."""
            return (jnp.einsum('kmi,kid->kmd', rows_x, X[ks])
                    + jnp.einsum('kmi,kid->kmd', rows_u, Zu)
                    + jnp.einsum('kmi,kid->kmd', rows_m, Zum))

        # ---- per-agent costs (sigma = a): gradients, cx, stage Hessians
        for a in range(M):
            da = self.num_ua_d[a]
            Sa = S[:, self.u_offsets[a]:self.u_offsets[a] + da, :]
            Sma = Sm[:, self.u_offsets[a]:self.u_offsets[a] + da, :]
            # embedding of the (x, ua, uma) lifted coords into the joint (x, u, um)
            eidx = np.concatenate([np.arange(nq),
                                   nq + self.u_offsets[a] + np.arange(da),
                                   nq + nu + self.u_offsets[a] + np.arange(da)])
            for fn, ks in self._cost_groups[a]:
                ks_j = jnp.asarray(ks)
                zs = jnp.concatenate([x[ks], ua[a][ks], uma[a][ks]], axis=1)
                J, H = group_JH(fn, da, zs, ks_j, want_h=hessian)
                Jx, Ju, Jm = J[:, :, :nq], J[:, :, nq:nq + da], J[:, :, nq + da:]
                rows = embed_cols(Jx, Ju, Jm, Sa[ks_j], Sma[ks_j], ks_j)  # (K,1,nd)
                grads = grads.at[a].add(jnp.sum(rows[:, 0, :], axis=0))
                cx = cx.at[a, ks_j].add(Jx[:, 0, :])
                if hessian:
                    W = W.at[a, ks_j[:, None, None], eidx[None, :, None],
                             eidx[None, None, :]].add(H)
            if self.costs[a][N] is not None:
                fnN = self.costs[a][N]
                JN = jax.jacfwd(lambda xx: _call_term(fnN, xx, P, N))(x[N])
                grads = grads.at[a].add(JN @ X[N])
                cNx = cNx.at[a].add(JN)
                if hessian:
                    WN = WN.at[a].add(jax.hessian(
                        lambda xx: _call_term(fnN, xx, P, N))(x[N]))

        # ---- constraints (sigma = M, weighted by l): G rows, cx, stage Hessians
        def constraint_group(fn, ks, dest, du_dim, Zu_all, Zum_all, zs):
            ks_j = jnp.asarray(ks)
            w = l[jnp.asarray(dest)]                                   # (K, m)
            J, H = group_JH(fn, du_dim, zs, ks_j, w=w, want_h=hessian)
            Jx = J[:, :, :nq]
            Ju = J[:, :, nq:nq + du_dim]
            Jm = J[:, :, nq + du_dim:]
            rows = embed_cols(Jx, Ju, Jm, Zu_all[ks_j], Zum_all[ks_j], ks_j)
            return ks_j, Jx, H, rows, w

        for fn, ks, dest in self._shared_groups:
            zs = jnp.concatenate([x[np.asarray(ks)], u_mat[np.asarray(ks)],
                                  um_mat[np.asarray(ks)]], axis=1)
            ks_j, Jx, H, rows, w = constraint_group(fn, np.asarray(ks), dest, nu,
                                                    S, Sm, zs)
            G = G.at[jnp.asarray(dest).reshape(-1)].set(rows.reshape(-1, nd))
            cx = cx.at[M, ks_j].add(jnp.einsum('km,kmi->ki', w, Jx))
            if hessian:
                W = W.at[M, ks_j].add(H)

        for a in range(M):
            da = self.num_ua_d[a]
            Sa = S[:, self.u_offsets[a]:self.u_offsets[a] + da, :]
            Sma = Sm[:, self.u_offsets[a]:self.u_offsets[a] + da, :]
            eidx = np.concatenate([np.arange(nq),
                                   nq + self.u_offsets[a] + np.arange(da),
                                   nq + nu + self.u_offsets[a] + np.arange(da)])
            for fn, ks, dest in self._agent_groups[a]:
                zs = jnp.concatenate([x[np.asarray(ks)], ua[a][np.asarray(ks)],
                                      uma[a][np.asarray(ks)]], axis=1)
                ks_j, Jx, H, rows, w = constraint_group(fn, np.asarray(ks), dest, da,
                                                        Sa, Sma, zs)
                G = G.at[jnp.asarray(dest).reshape(-1)].set(rows.reshape(-1, nd))
                cx = cx.at[M, ks_j].add(jnp.einsum('km,kmi->ki', w, Jx))
                if hessian:
                    W = W.at[M, ks_j[:, None, None], eidx[None, :, None],
                             eidx[None, None, :]].add(H)

            # state-box rows: G rows are +/- X rows; adjoint picks up +/- l
            qo = self.q_offsets[a]
            if self._sub_dest[a] is not None:
                idx = self.state_ub_idxs[a] + qo
                dest = self._sub_dest[a]                       # stages 1..N-1 then N
                stages = np.array(list(range(1, N)) + [N])
                rows = X[jnp.asarray(stages)][:, idx, :]
                G = G.at[dest.reshape(-1)].set(rows.reshape(-1, nd))
                lw = l[dest]                                    # (len(stages), m)
                cx = cx.at[M, jnp.asarray(stages[:-1])].add(
                    jnp.zeros((stages.size - 1, nq), dtype).at[:, idx].add(lw[:-1]))
                cNx = cNx.at[M].add(jnp.zeros(nq, dtype).at[idx].add(lw[-1]))
            if self._slb_dest[a] is not None:
                idx = self.state_lb_idxs[a] + qo
                dest = self._slb_dest[a]
                stages = np.array(list(range(1, N)) + [N])
                rows = -X[jnp.asarray(stages)][:, idx, :]
                G = G.at[dest.reshape(-1)].set(rows.reshape(-1, nd))
                lw = l[dest]
                cx = cx.at[M, jnp.asarray(stages[:-1])].add(
                    jnp.zeros((stages.size - 1, nq), dtype).at[:, idx].add(-lw[:-1]))
                cNx = cNx.at[M].add(jnp.zeros(nq, dtype).at[idx].add(-lw[-1]))

        # terminal nonlinear constraint rows
        def term_rows(fn, dest):
            JN = jax.jacfwd(lambda xx: jnp.atleast_1d(_call_term(fn, xx, P, N)))(x[N])
            w = l[dest]
            HN = jax.hessian(lambda xx: jnp.dot(
                w, jnp.atleast_1d(_call_term(fn, xx, P, N))))(x[N]) if hessian \
                else jnp.zeros((nq, nq), dtype)
            return JN, w, HN

        if self._term_shared_dest is not None:
            fnN = self.shared_constraints[N]
            JN, w, HN = term_rows(fnN, self._term_shared_dest)
            G = G.at[self._term_shared_dest].set(JN @ X[N])
            cNx = cNx.at[M].add(w @ JN)
            if hessian:
                WN = WN.at[M].add(HN)
        for a in range(M):
            if self._term_agent_dest[a] is not None:
                fnN = self.agent_constraints[a][N]
                JN, w, HN = term_rows(fnN, self._term_agent_dest[a])
                G = G.at[self._term_agent_dest[a]].set(JN @ X[N])
                cNx = cNx.at[M].add(w @ JN)
                if hessian:
                    WN = WN.at[M].add(HN)

        q = self._own_blocks(grads)
        if not hessian:
            return q, G, g, x

        # ---- adjoints lambda^sigma_{k+1} per stage (backward scan, vmapped over sigma)
        def backward(lamN, cx_s):
            def bstep(lam, blk):
                A_k, cx_k = blk
                out = lam                       # lambda_{k+1} for this stage k
                return cx_k + A_k.T @ lam, out

            _, lam_kp1 = jax.lax.scan(bstep, lamN, (A, cx_s), reverse=True)
            return lam_kp1                      # (N, nq)

        lam_kp1 = jax.vmap(backward)(cNx, cx)   # (M+1, N, nq)

        # ---- dynamics curvature, shared across the M+1 scalars
        def dyn_T(q_, u_):
            Ed = jax.jacfwd(jax.jacfwd(jd.fd, argnums=0), argnums=0)(q_, u_)
            Fd = jax.jacfwd(jax.jacfwd(jd.fd, argnums=1), argnums=1)(q_, u_)
            Gd = jax.jacfwd(jax.jacfwd(jd.fd, argnums=1), argnums=0)(q_, u_)
            T = jnp.zeros((nq, nq + nu, nq + nu), dtype)
            T = T.at[:, :nq, :nq].set(Ed)
            T = T.at[:, nq:, nq:].set(Fd)
            T = T.at[:, nq:, :nq].set(Gd)
            T = T.at[:, :nq, nq:].set(jnp.swapaxes(Gd, 1, 2))
            return T

        T = jax.vmap(dyn_T)(x[:-1], u_mat)                       # (N, nq, nq+nu, nq+nu)
        Wdyn = jnp.einsum('ski,kijm->skjm', lam_kp1, T)          # (M+1, N, nq+nu, ...)
        W = W.at[:, :, :nq + nu, :nq + nu].add(Wdyn)

        # ---- horizon coupling: batched GEMMs against the sensitivity stack
        Z = jnp.concatenate([X[:-1], S, Sm], axis=1)             # (N, L, nd)
        tmp = jnp.einsum('sklj,kjd->skld', W, Z)
        H = jnp.einsum('kld,skle->sde', Z, tmp)                  # (M+1, nd, nd)
        H = H + jnp.einsum('ld,slj,je->sde', X[N], WN, X[N])

        Q = jnp.concatenate([
            (H[a] + H[M])[self.ua_el_offsets[a]:self.ua_el_offsets[a + 1], :]
            for a in range(M)], axis=0)
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

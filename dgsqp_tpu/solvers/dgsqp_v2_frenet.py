"""DGSQP v2 on the approximate (MPCC) game: per-iteration contouring/boundary re-linearization.

Re-implementation of ``/root/reference/DGSQP/solvers/DGSQP_v2_frenet_approx.py`` (1474 LoC):
the game is formulated on progress-augmented global-frame models; exact Frenet quantities are
replaced by, per agent and stage,

  * a quadratic contouring/lag cost  1/2 x'Q_e x + q_e'x  (Gauss-Newton at the previous
    iterate; contouring weight q_c = 0.1, lag weight q_l = 1000 — reference ``:84-89``), and
  * two linearized track-boundary half-planes  G x + g <= 0  (reference ``:1105-1118``),

with (Q_e, q_e, G, g) recomputed from the current rollout once per SQP iteration
(``approximation_eval='once'``, the study's "1 SQP evaluation" row) or additionally at
every merit/trial evaluation so the linearization moves with the line-search trial point
(``'always'``, "multiple SQP evaluation") — reference ``:380,430,727`` and
``run_kinematic_study.sh`` eval_type rows.
The parameters travel through the solver as a pytree ``P`` consumed by ``stage_indexed``
cost/constraint closures; the boundary reference ``z`` (interpolation between track edges)
defaults to the centerline (reference ``:378``).

Row-order note: the reference appends the boundary rows AFTER each agent's box rows;
here they live in the agent's nonlinear-constraint slot (before box rows).  Within-framework
comparisons are unaffected; only raw dual vector layouts differ.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
from dgsqp_tpu.solvers.solver_types import DGSQPV2Params


class DGSQPV2FrenetApprox(DGSQPV2):
    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params: DGSQPV2Params = None, print_method=print, use_mx=False,
                 xy_plot=None, wl=None, pose_idx=(0, 1), q_c: float = 0.1,
                 q_l: float = 1000.0, dtype=None):
        params = params or DGSQPV2Params()
        M = joint_dynamics.n_a
        N = params.N
        self.q_c, self.q_l = q_c, q_l
        models = joint_dynamics.dynamics_models
        self._f_cl = [m.contouring_lag_quad_approx(q_c, q_l) for m in models]
        self._f_tb = [m.track_boundary_lin_approx() for m in models]
        n_qa = [m.n_q for m in models]
        q_offsets = joint_dynamics.q_offsets
        # 'exact': differentiate through the track geometry instead of freezing a
        # per-iteration linearization (see contouring_lag_cost_exact) — the frozen-P
        # outer loop is a damped fixed point needing ~400 iterations; exact evaluation
        # gives ordinary SQP convergence.  Our TPU-native extension (no reference row).
        exact = getattr(params, 'approximation_eval', 'always') == 'exact'
        f_cl_x = [m.contouring_lag_cost_exact(q_c, q_l) for m in models]
        f_tb_x = [m.track_boundary_constraint_exact() for m in models]
        zref = [jnp.zeros(N + 1) for _ in range(M)]

        # ---- augment costs with the P-parameterized contouring/lag quadratic
        def make_cl_cost(a):
            if exact:
                def stage(x, u, um, P, k):
                    qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                    return f_cl_x[a](qa, zref[a][k])
                stage.stage_indexed = True

                def term(x, P, k):
                    qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                    return f_cl_x[a](qa, zref[a][k])
                term.stage_indexed = True
                return stage, term

            def stage(x, u, um, P, k):
                qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                Qe = P['Qe'][a][k]
                qe = P['qe'][a][k]
                return 0.5 * qa @ Qe @ qa + qe @ qa
            stage.stage_indexed = True

            def term(x, P, k):
                qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                return 0.5 * qa @ P['Qe'][a][k] @ qa + P['qe'][a][k] @ qa
            term.stage_indexed = True
            return stage, term

        from dgsqp_tpu.solvers.game_problem import _as_stage_list
        aug_costs = []
        for a in range(M):
            base = _as_stage_list(costs[a], N)
            cl_stage, cl_term = make_cl_cost(a)
            # one combined closure per DISTINCT base fn so stage grouping stays effective
            cache = {}
            stage_list = []
            for k in range(N):
                key = id(base[k])
                if key not in cache:
                    cache[key] = self._combine_stage(base[k], cl_stage)
                stage_list.append(cache[key])
            term_fn = self._combine_term(base[N], cl_term)
            aug_costs.append(stage_list + [term_fn])

        # ---- augment agent constraints with the boundary half-planes
        def make_tb_constr(a):
            if exact:
                def stage(x, u, um, P, k):
                    qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                    return f_tb_x[a](qa)
                stage.stage_indexed = True
                stage.n_out = 2

                def term(x, P, k):
                    qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                    return f_tb_x[a](qa)
                term.stage_indexed = True
                term.n_out = 2
                return stage, term

            def stage(x, u, um, P, k):
                qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                return P['Gtb'][a][k] @ qa + P['gtb'][a][k]
            stage.stage_indexed = True
            stage.n_out = 2

            def term(x, P, k):
                qa = jax.lax.dynamic_slice(x, (q_offsets[a],), (n_qa[a],))
                return P['Gtb'][a][k] @ qa + P['gtb'][a][k]
            term.stage_indexed = True
            term.n_out = 2
            return stage, term

        aug_agent_constraints = []
        for a in range(M):
            base = _as_stage_list(agent_constraints[a] if agent_constraints else None, N)
            tb_stage, tb_term = make_tb_constr(a)
            cache = {}
            stage_list = []
            for k in range(N):
                key = id(base[k])
                if key not in cache:
                    cache[key] = self._combine_stage(base[k], tb_stage, vector=True)
                stage_list.append(cache[key])
            term_fn = self._combine_term(base[N], tb_term, vector=True)
            aug_agent_constraints.append(stage_list + [term_fn])

        super().__init__(joint_dynamics, aug_costs, aug_agent_constraints,
                         shared_constraints, bounds, params, print_method=print_method,
                         dtype=dtype)

        # boundary interpolation reference (centerline by default, reference :378)
        self.reference = [np.zeros(N + 1) for _ in range(M)]
        self._n_qa = n_qa
        self._q_off = q_offsets
        # exact mode needs no parameter pytree — costs/constraints close over the
        # differentiable track splines directly
        self._approx_update = None if exact else self._evaluate_mpcc

    # closure factories (kept as methods so identical base fns share identity per stage)
    @staticmethod
    def _combine_stage(base_fn, extra_fn, vector: bool = False):
        from dgsqp_tpu.solvers.game_problem import _call_stage
        if base_fn is None:
            return extra_fn

        def fn(x, u, um, P, k):
            e = extra_fn(x, u, um, P, k)
            b = _call_stage(base_fn, x, u, um, P, k)
            if vector:
                return jnp.concatenate([jnp.atleast_1d(b), jnp.atleast_1d(e)])
            return b + e
        fn.stage_indexed = True
        if vector:
            import numpy as _np
            fn.probe_rows = lambda x, u, um: (
                _np.asarray(_call_stage(base_fn, x, u, um, None, 0)).size
                + int(extra_fn.n_out))
        return fn

    @staticmethod
    def _combine_term(base_fn, extra_fn, vector: bool = False):
        from dgsqp_tpu.solvers.game_problem import _call_term
        if base_fn is None:
            return extra_fn

        def fn(x, P, k):
            e = extra_fn(x, P, k)
            b = _call_term(base_fn, x, P, k)
            if vector:
                return jnp.concatenate([jnp.atleast_1d(b), jnp.atleast_1d(e)])
            return b + e
        fn.stage_indexed = True
        if vector:
            import numpy as _np
            fn.probe_rows = lambda x, u, um: (
                _np.asarray(_call_term(base_fn, x, None, 0)).size + int(extra_fn.n_out))
        return fn

    def _evaluate_mpcc(self, u_flat, x0):
        """Parameter pytree from the current iterate's rollout
        (reference ``_evaluate_mpcc``, ``DGSQP_v2_frenet_approx.py:760-786``)."""
        x = self.problem.rollout(u_flat, x0)
        P = {'Qe': [], 'qe': [], 'Gtb': [], 'gtb': []}
        for a in range(self.M):
            qa_traj = x[:, self._q_off[a]:self._q_off[a] + self._n_qa[a]]
            z = jnp.asarray(self.reference[a], x.dtype)
            Qe, qe = jax.vmap(self._f_cl[a])(qa_traj, z)
            Gtb, gtb = jax.vmap(self._f_tb[a])(qa_traj)
            P['Qe'].append(Qe)
            P['qe'].append(qe)
            P['Gtb'].append(Gtb)
            P['gtb'].append(gtb)
        return P

"""Mixed-complementarity baseline: semismooth Newton on the GNE KKT system.

The reference formulates the game KKT conditions as an MCP ``F(z) ⊥ lb <= z <= ub`` with
``z = (u, l)``, ``F = [D_{u^a}L^a stacked; -C]`` and ships it to the proprietary Julia PATH
solver through pyjulia (``/root/reference/DGSQP/solvers/PATHMCP.py:44-791``).  PATH cannot be
redistributed, so this module provides the comparison capability with our own solver: a
damped semismooth Newton method on the Fischer-Burmeister reformulation

    Phi(z) = [ F_u(u, l);  phi(l, -C(u)) ],    phi(a, b) = a + b - sqrt(a^2 + b^2 + eps^2)

whose roots are exactly the MCP solutions (u free, l >= 0 complementary with -C >= 0).
``F_u = q + G'l`` and its Jacobian blocks (the game Hessian Q and G) come from the same
condensed evaluation machinery DGSQP uses, mirroring how the reference shares its symbolic
factory between DGSQP and PATHMCP (``PATHMCP.py:401-762``).
"""
from __future__ import annotations

import time
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.game_problem import GameProblem
from dgsqp_tpu.solvers.solver_types import PATHMCPParams
from dgsqp_tpu.types import VehiclePrediction, VehicleState

RUNNING, SOLVED, DIVERGED, MAX_IT = 0, 1, 3, 5
STATUS_MSG = {SOLVED: 'MCP_Solved', DIVERGED: 'diverged', MAX_IT: 'max_it',
              RUNNING: 'running'}


class MCPResult(NamedTuple):
    u: jnp.ndarray
    l: jnp.ndarray
    status: jnp.ndarray
    iters: jnp.ndarray
    res: jnp.ndarray
    p_feas: jnp.ndarray
    comp: jnp.ndarray
    stat: jnp.ndarray


class PATHMCP:
    """Semismooth-Newton MCP solver with the reference PATHMCP's interface."""

    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params: PATHMCPParams = None, print_method=print, dtype=None):
        params = params or PATHMCPParams()
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

        self.q_pred = np.zeros((self.N + 1, self.n_q))
        self.u_pred = np.zeros((self.N, self.n_u))
        self.l_pred = np.zeros(self.n_c)
        self.u_ws = np.zeros(self.N * self.n_u)
        self.l_ws = None
        self.state_input_predictions = [VehiclePrediction() for _ in range(self.M)]

        self._solve_jit = jax.jit(self._solve_core)
        self._solve_batch_jit = jax.jit(jax.vmap(self._solve_core))
        self.initialized = True

    # ----------------------------------------------------------------- core loop
    def _phi(self, a, b, eps):
        return a + b - jnp.sqrt(a * a + b * b + eps * eps)

    def _solve_core(self, u0, l0, x0, up, P=None) -> MCPResult:
        p = self.params
        dtype = self.dtype
        eps = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)

        def Phi_and_jac(u, l):
            Q, q, G, g, _ = self.problem.evaluate(u, l, x0, up, P, hessian=True)
            Fu = q + G.T @ l
            b = -g
            phi = self._phi(l, b, eps)
            r = jnp.sqrt(l * l + b * b + eps * eps)
            Da = 1.0 - l / r
            Db = 1.0 - b / r
            top = jnp.concatenate([Q, G.T], axis=1)
            bot = jnp.concatenate([-Db[:, None] * G, jnp.diag(Da)], axis=1)
            J = jnp.concatenate([top, bot], axis=0)
            Phi = jnp.concatenate([Fu, phi])
            return Phi, J, g, Fu

        class C(NamedTuple):
            u: jnp.ndarray
            l: jnp.ndarray
            it: jnp.ndarray
            status: jnp.ndarray
            res: jnp.ndarray

        n_z = self.n_dec + self.n_c

        def cond(c: C):
            return c.status == RUNNING

        def body(c: C) -> C:
            running = c.status == RUNNING
            Phi, J, g, Fu = Phi_and_jac(c.u, c.l)
            res = jnp.max(jnp.abs(Phi))
            merit0 = 0.5 * jnp.dot(Phi, Phi)

            solved = res < p.tol
            diverged = (res > 1e8) | ~jnp.isfinite(res)

            Jr = J + p.reg * jnp.eye(n_z, dtype=dtype)
            dz = jnp.linalg.solve(Jr, -Phi)
            dz = jnp.where(jnp.isfinite(dz), dz, 0.0)

            # Armijo on the FB merit 1/2||Phi||^2
            def ls_cond(cc):
                k, alpha, done = cc
                return (~done) & (k < p.line_search_iters)

            def ls_body(cc):
                k, alpha, done = cc
                u_t = c.u + alpha * dz[:self.n_dec]
                l_t = c.l + alpha * dz[self.n_dec:]
                Phi_t, _, _, _ = Phi_and_jac(u_t, l_t)
                merit_t = 0.5 * jnp.dot(Phi_t, Phi_t)
                ok = merit_t <= (1 - 2 * p.beta * alpha) * merit0
                return (k + 1, jnp.where(ok | done, alpha, alpha * p.tau), done | ok)

            _, alpha, ls_ok = jax.lax.while_loop(
                ls_cond, ls_body, (jnp.asarray(0), jnp.asarray(1.0, dtype),
                                   jnp.asarray(False)))

            active = running & ~solved & ~diverged
            u_n = jnp.where(active, c.u + alpha * dz[:self.n_dec], c.u)
            l_n = jnp.where(active, c.l + alpha * dz[self.n_dec:], c.l)

            it_next = c.it + jnp.where(active, 1, 0)
            new_status = jnp.where(solved, SOLVED,
                          jnp.where(diverged, DIVERGED,
                           jnp.where(it_next >= p.max_iters, MAX_IT, RUNNING)))
            status = jnp.where(running, new_status, c.status).astype(jnp.int32)
            return C(u_n, l_n, it_next, status, jnp.where(running, res, c.res))

        init = C(jnp.asarray(u0, dtype), jnp.maximum(jnp.asarray(l0, dtype), 0.0),
                 jnp.asarray(0), jnp.asarray(RUNNING, jnp.int32),
                 jnp.asarray(jnp.inf, dtype))
        c = jax.lax.while_loop(cond, body, init)

        # final KKT conditions (reference re-evaluates outside Julia, PATHMCP.py:258-266)
        q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P, hessian=False)
        d = q + G.T @ c.l
        p_feas = jnp.maximum(0.0, jnp.max(g))
        comp = jnp.max(jnp.abs(g * c.l))
        stat = jnp.max(jnp.abs(d))
        return MCPResult(c.u, c.l, c.status, c.it, c.res, p_feas, comp, stat)

    # ------------------------------------------------------------- host interface
    def initialize(self):
        pass

    def set_warm_start(self, u_ws: np.ndarray, l_ws=None):
        u_ws = np.asarray(u_ws)
        if u_ws.shape != (self.N, self.n_u):
            raise RuntimeError(f'Warm start shape {u_ws.shape} != {(self.N, self.n_u)}')
        parts = []
        off = 0
        for a in range(self.M):
            na = self.problem.num_ua_d[a]
            parts.append(u_ws[:, off:off + na].ravel())
            off += na
        self.u_ws = np.concatenate(parts)
        self.l_ws = l_ws

    def solve(self, states: List[VehicleState], parameters=None):
        t0 = time.time()
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
        dur = time.time() - t0
        self.print_method(f'Solve status: {msg}')
        self.print_method(f'Solve time: {dur:.2f}')
        return dict(time=dur, num_iters=int(res.iters), status=(status == SOLVED),
                    cond=dict(p_feas=float(res.p_feas), comp=float(res.comp),
                              stat=float(res.stat)),
                    msg=msg, u_sol=np.asarray(res.u), l_sol=np.asarray(res.l))

    def step(self, states: List[VehicleState], parameters=None):
        info = self.solve(states, parameters)
        self.joint_dynamics.qu2state(states, None, self.u_pred[0])
        self.state_input_predictions = self.joint_dynamics.qu2prediction(
            self.state_input_predictions, self.q_pred, self.u_pred)
        u_ws = np.vstack((self.u_pred[1:], self.u_pred[-1:]))
        self.set_warm_start(u_ws)
        return info

    def get_prediction(self):
        return self.state_input_predictions


class PATHMCPFrenetApprox(PATHMCP):
    """MCP baseline on the approximate (MPCC) game.

    Stands in for ``PATHMCP_frenet_approx`` (``/root/reference/DGSQP/solvers/
    PATHMCP_frenet_approx.py``, 889 LoC) which re-evaluates the contouring/boundary
    approximations inside the Julia F/J callbacks: here the parameter pytree is recomputed
    from the current iterate once per Newton iteration.
    """

    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params=None, print_method=print, q_c: float = 0.1,
                 q_l: float = 1000.0, dtype=None):
        from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
        from dgsqp_tpu.solvers.solver_types import DGSQPV2Params
        # Reuse the frenet-approx cost/constraint augmentation machinery by building a
        # donor solver, then lift its problem + approx hook into this MCP solver.
        params = params or __import__('dgsqp_tpu.solvers.solver_types',
                                      fromlist=['PATHMCPParams']).PATHMCPParams()
        donor = DGSQPV2FrenetApprox(joint_dynamics, costs, agent_constraints,
                                    shared_constraints, bounds,
                                    DGSQPV2Params(N=params.N, dt=params.dt),
                                    print_method=None, q_c=q_c, q_l=q_l, dtype=dtype)
        super().__init__(joint_dynamics, donor.problem.costs,
                         donor.problem.agent_constraints,
                         donor.problem.shared_constraints, bounds, params,
                         print_method=print_method, dtype=dtype)
        self._donor = donor
        self._approx_update = donor._evaluate_mpcc
        # rebuild the jitted cores with the approximation threaded through
        import jax as _jax

        def core(u0, l0, x0, up, P=None):
            P = self._approx_update(u0, x0)
            return PATHMCP._solve_core(self, u0, l0, x0, up, P)

        self._solve_jit = _jax.jit(core)
        self._solve_batch_jit = _jax.jit(_jax.vmap(core))

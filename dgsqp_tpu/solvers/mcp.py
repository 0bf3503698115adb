"""Mixed-complementarity baseline: globalized semismooth Newton on the GNE KKT system.

The reference formulates the game KKT conditions as an MCP ``F(z) ⊥ lb <= z <= ub`` with
``z = (u, l)``, ``F = [D_{u^a}L^a stacked; -C]`` and ships it to the proprietary Julia PATH
solver through pyjulia (``/root/reference/DGSQP/solvers/PATHMCP.py:44-791``).  PATH cannot be
redistributed, so this module provides the comparison capability with our own solver on the
penalized Fischer-Burmeister reformulation

    Phi(z) = [ F_u(u, l);  phi(l, -C(u)) ]
    phi(a, b) = lam * (a + b - sqrt(a^2 + b^2 + eps^2)) + (1 - lam) * a_+ b_+

whose roots are exactly the MCP solutions (u free, l >= 0 complementary with -C >= 0).
``F_u = q + G'l`` and its Jacobian blocks (the game Hessian Q and G) come from the same
condensed evaluation machinery DGSQP uses, mirroring how the reference shares its symbolic
factory between DGSQP and PATHMCP (``PATHMCP.py:401-762``).

PATH's robustness comes from its globalization, not its Newton core (nonmonotone watchdog
path search, crash/restart heuristics, proximal perturbation — ``PATHMCP.py:168-266``
exposes the corresponding options).  The equivalents here, all inside one jit/vmap-safe
``lax.while_loop``:

  * **Schur-reduced Newton step**: the (n_dec + n_c) semismooth system is eliminated to an
    n_dec-size system through the diagonal ``D_a`` block — O((n_dec)^3) instead of
    O((n_dec + n_c)^3) per iteration — with an adaptive Levenberg shift.
  * **Descent safeguard**: the Newton direction is replaced by the exactly-scaled steepest
    descent direction of the FB merit when it fails a directional-derivative test, so the
    line search cannot wedge.
  * **Nonmonotone Armijo** on the FB merit against the max of the last ``nonmono_memory``
    accepted values (PATH's nonmonotone stationary-point strategy), evaluated on a parallel
    backtracking grid with Jacobian-free merit trials.
  * **Adaptive Levenberg regularization**: decreased on accepted steps, inflated on line
    search failures.
  * **Proximal-perturbation restarts** (PATH's ``proximal_perturbation``): on stagnation the
    iterate is reset to the best point seen and the system is replaced by
    ``Phi(z) + pert * (z - z_best)`` with an escalating-then-decaying ``pert``, changing the
    basin without leaving the solution set (convergence is always tested on the
    unperturbed residual).
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

        # approximate-game hook: fn(u, x0) -> MPCC parameter pytree, re-evaluated at
        # every F/J evaluation point (set by PATHMCPFrenetApprox; read at trace time
        # inside the solve cores, so subclasses may set it after this constructor runs)
        self._approx_update = None

        if params.method == 'josephy':
            self._solve_core = self._solve_core_josephy
        if params.method == 'hybrid':
            # two SEPARATE programs composed at the host level: compiling the two
            # while-loops (one embedding the QP kernel) into a single trace takes
            # pathologically long (>1 h CPU, >15 min TPU); split, each phase compiles
            # independently and the merge is a cheap third program
            self._phase1_jit = jax.jit(jax.vmap(self._solve_core_josephy))
            self._phase2_jit = jax.jit(jax.vmap(self._solve_core))
            self._merge_jit = jax.jit(jax.vmap(self._merge_hybrid))
            self._solve_batch_jit = self._solve_batch_hybrid
            self._solve_jit = lambda u, l, x, up_, P=None: jax.tree_util.tree_map(
                lambda a: a[0], self._solve_batch_hybrid(
                    u[None], l[None], x[None], up_[None], P))
        else:
            self._solve_jit = jax.jit(self._solve_core)
            self._solve_batch_jit = jax.jit(jax.vmap(self._solve_core))
        self.initialized = True

    @staticmethod
    def _merge_hybrid(r1: MCPResult, r2: MCPResult) -> MCPResult:
        """Keep whichever phase ended better (the polish never worsens the answer)."""
        take2 = (r2.res <= r1.res) | (r2.status == SOLVED)
        pick = lambda a2, a1: jnp.where(take2, a2, a1)
        return MCPResult(pick(r2.u, r1.u), pick(r2.l, r1.l),
                         jnp.where(take2, r2.status, r1.status).astype(jnp.int32),
                         r1.iters + r2.iters, pick(r2.res, r1.res),
                         pick(r2.p_feas, r1.p_feas), pick(r2.comp, r1.comp),
                         pick(r2.stat, r1.stat))

    def _solve_batch_hybrid(self, u0, l0, x0, up, P=None) -> MCPResult:
        """Josephy-Newton phase + smoothed FB-Newton polish (``method='hybrid'``).

        The Josephy phase (subproblem-exact linearized-MCP steps, residual watchdog)
        carries far-from-solution iterates into the capture basin — on chicane N=25 it
        drives the median residual from ~9 to ~0.08 but converges few games fully; the
        FB-Newton phase (``_solve_core``) is quadratically convergent exactly there.
        PATH has the same two-regime structure (pivoting path steps + Newton
        acceleration).  Iteration counts are summed; the polish starts from the
        Josephy phase's end point and is kept only where it does not worsen the
        residual.
        """
        r1 = self._phase1_jit(u0, l0, x0, up, P)
        r2 = self._phase2_jit(r1.u, r1.l, x0, up, P)
        return self._merge_jit(r1, r2)

    # ----------------------------------------------------------------- core loop
    def _phi(self, a, b, eps):
        """Penalized Fischer-Burmeister NCP function (Chen-Chen-Kanzow)."""
        lam = self.params.fb_lambda
        fb = a + b - jnp.sqrt(a * a + b * b + eps * eps)
        if lam >= 1.0:
            return fb
        return lam * fb + (1.0 - lam) * jnp.maximum(a, 0.0) * jnp.maximum(b, 0.0)

    def _phi_derivs(self, a, b, eps):
        """Clarke-generalized partial derivatives (D_a, D_b) of the penalized FB."""
        lam = self.params.fb_lambda
        r = jnp.sqrt(a * a + b * b + eps * eps)
        Da = 1.0 - a / r
        Db = 1.0 - b / r
        if lam >= 1.0:
            return Da, Db
        ap = jnp.maximum(a, 0.0)
        bp = jnp.maximum(b, 0.0)
        Da = lam * Da + (1.0 - lam) * bp * (a > 0)
        Db = lam * Db + (1.0 - lam) * ap * (b > 0)
        return Da, Db

    def _solve_core(self, u0, l0, x0, up, P=None) -> MCPResult:
        p = self.params
        dtype = self.dtype
        n_dec, n_c = self.n_dec, self.n_c
        eps_min = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)
        eps0 = jnp.asarray(p.eps0, dtype)
        reg_lo = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-7, dtype)
        reg_hi = jnp.asarray(1e4, dtype)
        W = p.line_search_iters
        R = p.nonmono_memory

        # approximate-game hook: the MPCC parameter pytree is recomputed at EVERY
        # evaluation point, mirroring the reference's ``_evaluate_mpcc`` call inside the
        # Julia F/J callbacks (``PATHMCP_frenet_approx.py``: the approximation moves
        # with the iterate that PATH queries)
        if getattr(self, '_approx_update', None) is not None:
            P_of = lambda u: self._approx_update(u, x0)
        else:
            P_of = lambda u: P

        def Phi_cheap(u, l, eps):
            """Jacobian-free Phi for merit trials (merit_terms: one shared fwd pass)."""
            d, g = self.problem.merit_terms(u, l, x0, up, P_of(u))
            return jnp.concatenate([d, self._phi(l, -g, eps)])

        def merit_pert(u, l, pert, ref_u, ref_l, eps):
            Phi = Phi_cheap(u, l, eps)
            Phi = Phi + pert * jnp.concatenate([u - ref_u, l - ref_l])
            return 0.5 * jnp.dot(Phi, Phi)

        class C(NamedTuple):
            u: jnp.ndarray
            l: jnp.ndarray
            it: jnp.ndarray
            status: jnp.ndarray
            res: jnp.ndarray
            reg: jnp.ndarray        # adaptive Levenberg shift
            pert: jnp.ndarray       # proximal perturbation strength
            ref_u: jnp.ndarray      # proximal center
            ref_l: jnp.ndarray
            best_u: jnp.ndarray     # best UNPERTURBED residual seen
            best_l: jnp.ndarray
            best_res: jnp.ndarray
            mem: jnp.ndarray        # (R,) last accepted perturbed merits
            stall: jnp.ndarray      # consecutive iterations w/o material progress
            restarts: jnp.ndarray
            eps: jnp.ndarray        # FB smoothing (continuation parameter)

        def cond(c: C):
            return c.status == RUNNING

        def body(c: C) -> C:
            running = c.status == RUNNING
            # ---- full evaluation: Phi, Jacobian blocks (at the CURRENT smoothing;
            # convergence/best-point tracking always use the SHARP eps_min residual)
            Q, q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P_of(c.u),
                                                  hessian=True)
            Fu = q + G.T @ c.l
            b = -g
            phi = self._phi(c.l, b, c.eps)
            Da, Db = self._phi_derivs(c.l, b, c.eps)
            Phi0 = jnp.concatenate([Fu, phi])
            res = jnp.max(jnp.abs(
                jnp.concatenate([Fu, self._phi(c.l, b, eps_min)])))  # sharp residual
            solved = res < p.tol
            diverged = (res > 1e10) | ~jnp.isfinite(res)

            # perturbed system: Phi_p = Phi + pert*(z - ref), J_p = J + pert*I
            du_ref = c.u - c.ref_u
            dl_ref = c.l - c.ref_l
            Phi_p = Phi0 + c.pert * jnp.concatenate([du_ref, dl_ref])
            Fu_p = Fu + c.pert * du_ref
            phi_p = phi + c.pert * dl_ref
            merit0 = 0.5 * jnp.dot(Phi_p, Phi_p)

            # ---- Schur-reduced Newton step on the perturbed system
            #   [[Q + pert I, G'], [-Db G, Da + pert + reg]] [du; dl] = -[Fu_p; phi_p]
            Dd = Da + c.pert + c.reg
            w = Db / Dd                                        # (n_c,)
            # K du = -Fu_p - G' (phi_p / Dd)  with K = Q + pert I + G' diag(w*Dd^0) ...
            # Block elimination: dl = (-phi_p + Db*(G du)) / Dd, substituted into
            #   (Q + (pert+reg) I) du + G' dl = -Fu_p
            K = Q + (c.pert + c.reg) * jnp.eye(n_dec, dtype=dtype) + (G.T * w) @ G
            rhs = -Fu_p + G.T @ (phi_p / Dd)
            du = jnp.linalg.solve(K, rhs)
            dl = (-phi_p + Db * (G @ du)) / Dd
            dz = jnp.concatenate([du, dl])
            dz = jnp.where(jnp.isfinite(dz), dz, 0.0)

            # ---- descent safeguard: gradient of the perturbed merit
            # grad = J_p' Phi_p assembled blockwise (no (n_dec+n_c)^2 matrix formed)
            grad_u = Q.T @ Fu_p + c.pert * Fu_p - G.T @ (Db * phi_p)
            grad_l = G @ Fu_p + (Da + c.pert) * phi_p
            grad = jnp.concatenate([grad_u, grad_l])
            dpsi_newton = jnp.dot(grad, dz)
            # exactly-scaled steepest descent: t* = ||grad||^2 / ||J grad||^2
            Jg_u = Q @ grad_u + c.pert * grad_u + G.T @ grad_l
            Jg_l = -Db * (G @ grad_u) + (Da + c.pert) * grad_l
            Jg2 = jnp.dot(Jg_u, Jg_u) + jnp.dot(Jg_l, Jg_l)
            g2 = jnp.dot(grad, grad)
            t_star = g2 / jnp.maximum(Jg2, 1e-300)
            dz_grad = -t_star * grad
            use_grad = (dpsi_newton > -1e-9 * jnp.dot(dz, dz)) | \
                ~jnp.isfinite(dpsi_newton)
            dz = jnp.where(use_grad, dz_grad, dz)
            dpsi = jnp.where(use_grad, -t_star * g2, dpsi_newton)

            # ---- nonmonotone Armijo on a parallel backtracking grid.  Unset memory
            # slots (start / just-restarted, stored as +inf) count as the CURRENT
            # merit, so the first step is plain monotone Armijo and later steps are
            # compared against the max of the last R accepted merits (PATH's
            # nonmonotone stationary-point strategy).
            merit_ref = jnp.max(jnp.where(jnp.isfinite(c.mem), c.mem, merit0))
            alphas = jnp.asarray(p.tau, dtype) ** jnp.arange(W, dtype=dtype)

            def merit_at(alpha):
                return merit_pert(c.u + alpha * dz[:n_dec], c.l + alpha * dz[n_dec:],
                                  c.pert, c.ref_u, c.ref_l, c.eps)

            merits = jax.vmap(merit_at)(alphas)
            ok = merits <= merit_ref + p.beta * alphas * dpsi
            any_ok = jnp.any(ok)
            idx = jnp.where(any_ok, jnp.argmax(ok), W - 1)
            alpha = alphas[idx]
            merit_new = merits[idx]

            active = running & ~solved & ~diverged
            u_n = jnp.where(active, c.u + alpha * dz[:n_dec], c.u)
            l_n = jnp.where(active, c.l + alpha * dz[n_dec:], c.l)

            # ---- adaptive regularization + stagnation accounting
            reg_n = jnp.where(any_ok, jnp.maximum(c.reg * 0.25, reg_lo),
                              jnp.minimum(c.reg * 10.0, reg_hi))
            progressed = any_ok & (merit_new < 0.99 * merit0)
            stall_n = jnp.where(progressed, 0, c.stall + 1)
            mem_n = jnp.where(any_ok,
                              jnp.concatenate([c.mem[1:], merit_new[None]]), c.mem)
            pert_n = c.pert * p.pert_decay
            # smoothing continuation: shrink eps toward eps_min as the SHARP residual
            # falls (phi(.,.,eps)=0 is the central path l*(-g)=eps^2/2, so this is an
            # interior-point homotopy on the complementarity rows)
            eps_n = jnp.where(any_ok,
                              jnp.clip(jnp.minimum(c.eps * p.eps_decay,
                                                   p.eps_frac * res),
                                       eps_min, eps0), c.eps)

            # best-seen (unperturbed residual) tracking
            better = res < c.best_res
            best_u = jnp.where(better, c.u, c.best_u)
            best_l = jnp.where(better, c.l, c.best_l)
            best_res = jnp.where(better, res, c.best_res)

            # ---- proximal-perturbation restart
            do_restart = active & (stall_n >= p.stall_its) & \
                (c.restarts < p.max_restarts)
            pert_restart = jnp.asarray(p.pert0, dtype) * (3.0 ** c.restarts)
            u_n = jnp.where(do_restart, best_u, u_n)
            l_n = jnp.where(do_restart, best_l, l_n)
            ref_u_n = jnp.where(do_restart, best_u, c.ref_u)
            ref_l_n = jnp.where(do_restart, best_l, c.ref_l)
            pert_n = jnp.where(do_restart, pert_restart, pert_n)
            reg_n = jnp.where(do_restart, jnp.asarray(p.reg, dtype), reg_n)
            mem_n = jnp.where(do_restart, jnp.full((R,), jnp.inf, dtype), mem_n)
            stall_n = jnp.where(do_restart, 0, stall_n)
            restarts_n = c.restarts + jnp.where(do_restart, 1, 0)
            eps_n = jnp.where(do_restart, eps0, eps_n)   # restart re-smooths

            # stagnation past the restart budget terminates as max_it-style failure
            exhausted = active & (stall_n >= p.stall_its) & \
                (c.restarts >= p.max_restarts)

            it_next = c.it + jnp.where(active, 1, 0)
            new_status = jnp.where(solved, SOLVED,
                          jnp.where(diverged, DIVERGED,
                           jnp.where((it_next >= p.max_iters) | exhausted, MAX_IT,
                                     RUNNING)))
            status = jnp.where(running, new_status, c.status).astype(jnp.int32)
            new = C(u_n, l_n, it_next, status, res, reg_n, pert_n,
                    ref_u_n, ref_l_n, best_u, best_l, best_res, mem_n,
                    stall_n, restarts_n, eps_n)
            return jax.tree_util.tree_map(
                lambda nn, oo: jnp.where(running, nn, oo), new, c)

        u0 = jnp.asarray(u0, dtype)
        l0 = jnp.maximum(jnp.asarray(l0, dtype), 0.0)
        init = C(u0, l0, jnp.asarray(0), jnp.asarray(RUNNING, jnp.int32),
                 jnp.asarray(jnp.inf, dtype), jnp.asarray(p.reg, dtype),
                 jnp.asarray(0.0, dtype), u0, l0, u0, l0,
                 jnp.asarray(jnp.inf, dtype), jnp.full((R,), jnp.inf, dtype),
                 jnp.asarray(0), jnp.asarray(0), eps0)
        c = jax.lax.while_loop(cond, body, init)

        # return the best point seen, not the last iterate (PATH reports its best point)
        take_best = ((c.best_res < c.res) | ~jnp.isfinite(c.res)) & (c.status != SOLVED)
        c = c._replace(u=jnp.where(take_best, c.best_u, c.u),
                       l=jnp.where(take_best, c.best_l, c.l),
                       res=jnp.where(take_best, c.best_res, c.res))

        # final KKT conditions (reference re-evaluates outside Julia, PATHMCP.py:258-266)
        q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P_of(c.u), hessian=False)
        d = q + G.T @ c.l
        p_feas = jnp.maximum(0.0, jnp.max(g))
        comp = jnp.max(jnp.abs(g * c.l))
        stat = jnp.max(jnp.abs(d))
        return MCPResult(c.u, c.l, c.status, c.it, c.res, p_feas, comp, stat)

    # --------------------------------------------------- Josephy-Newton core loop
    def _solve_core_josephy(self, u0, l0, x0, up, P=None) -> MCPResult:
        """Josephy-Newton MCP solve: each iteration linearizes the complementarity
        system at ``z = (u, l)`` and solves the resulting affine variational
        inequality EXACTLY —

            q + Q du + G' l_new = 0,    0 <= l_new  ⊥  -(g + G du) >= 0

        which is the KKT system of ``min ½ du'Q du + q'du  s.t.  g + G du <= 0`` with
        the UNCONVEXIFIED nonsymmetric game matrix, solved by the IPM kernel's
        Levenberg-LU path (``solve_qp(indefinite=True)``).  This is PATH's model: PATH
        solves the same linearized MCP by Lemke pivoting (``PATHMCP.py:168-266``); the
        smoothed FB-Newton method (``_solve_core``) only solves a SINGLE Newton system
        of the smoothed residual per iteration and creeps on the chicane N=25 suite
        (0/32 at 500 iterations), while the subproblem-exact iteration inherits the
        fast local convergence that makes PATH robust.

        Globalization is a nonmonotone WATCHDOG ON THE SHARP RESIDUAL, not an FB-merit
        Armijo search: Josephy steps are frequently FB-merit-ascent yet residual-
        contracting (measured: full steps drive res 9.5 -> 6e-4 in 13 iterations on
        games where every merit line search wedges at res ~ 5), which is exactly why
        PATH pairs its Newton core with a nonmonotone stationary-point strategy.  A
        damped grid theta in {tau^0..tau^(W-1)} picks the LARGEST step whose residual
        stays below ``jos_gamma * max(last R accepted residuals)``; if none qualifies,
        the greedy best-residual point on the grid is taken when it improves the
        current residual.  Stagnation (no new best residual for ``stall_its``
        iterations) restarts from the best point seen with the memory cleared, and the
        restart budget exhausting terminates as max_it.

        Mirrors the reference baseline's reuse of DGSQP's symbolic factory
        (``PATHMCP.py:401-762``): the linearization comes from the same
        ``GameProblem.evaluate`` the SQP solvers use.
        """
        from dgsqp_tpu.solvers.qp import solve_qp

        p = self.params
        dtype = self.dtype
        n_dec = self.n_dec
        eps_min = jnp.asarray(1e-10 if dtype == jnp.float64 else 1e-6, dtype)
        qp_tol = p.qp_tol if p.qp_tol is not None else \
            (1e-8 if dtype == jnp.float64 else 3e-7)
        W = p.line_search_iters
        R = p.nonmono_memory

        # approximate-game hook (see _solve_core): P re-linearized at every eval point
        if getattr(self, '_approx_update', None) is not None:
            P_of = lambda u: self._approx_update(u, x0)
        else:
            P_of = lambda u: P

        def Phi_cheap(u, l):
            d, g = self.problem.merit_terms(u, l, x0, up, P_of(u))
            return jnp.concatenate([d, self._phi(l, -g, eps_min)])

        def res_at(u, l):
            Phi = Phi_cheap(u, l)
            return jnp.max(jnp.abs(Phi))

        class C(NamedTuple):
            u: jnp.ndarray
            l: jnp.ndarray
            it: jnp.ndarray
            status: jnp.ndarray
            res: jnp.ndarray
            best_u: jnp.ndarray
            best_l: jnp.ndarray
            best_res: jnp.ndarray
            mem: jnp.ndarray        # (R,) last accepted sharp residuals
            stall: jnp.ndarray
            restarts: jnp.ndarray
            pert: jnp.ndarray       # proximal perturbation (set on restart, decays)

        def body(c: C) -> C:
            running = c.status == RUNNING
            Q, q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P_of(c.u),
                                                  hessian=True)
            Fu = q + G.T @ c.l
            phi = self._phi(c.l, -g, eps_min)
            res = jnp.max(jnp.abs(jnp.concatenate([Fu, phi])))
            solved = res < p.tol
            diverged = (res > 1e10) | ~jnp.isfinite(res)

            # proximal perturbation (PATH's restart device): the linearized MCP is
            # solved with Q + pert*I — centered at the current point (du = 0), so a
            # restart actually changes the subsequent step sequence instead of
            # deterministically replaying the stalled trajectory
            Q_eff = Q + c.pert * jnp.eye(n_dec, dtype=dtype)
            sol = solve_qp(Q_eff, q, G, -g, tol=qp_tol, max_iters=p.qp_max_iters,
                           indefinite=True, polish_iters=0)
            du = jnp.where(jnp.isfinite(sol.x), sol.x, 0.0)
            dl = jnp.where(jnp.isfinite(sol.lam), sol.lam, c.l) - c.l

            # ---- nonmonotone residual watchdog over a damped grid (see docstring)
            res_ref = jnp.max(jnp.where(jnp.isfinite(c.mem), c.mem, res))
            thetas = jnp.asarray(p.tau, dtype) ** jnp.arange(W, dtype=dtype)
            res_grid = jax.vmap(
                lambda th: res_at(c.u + th * du, c.l + th * dl))(thetas)
            res_grid = jnp.where(jnp.isfinite(res_grid), res_grid, jnp.inf)
            ok = res_grid <= p.jos_gamma * res_ref
            any_ok = jnp.any(ok)
            # accepted: LARGEST step passing the watchdog; fallback: greedy best
            # residual on the grid when it strictly improves
            idx = jnp.where(any_ok, jnp.argmax(ok), jnp.argmin(res_grid))
            theta = thetas[idx]
            res_new = res_grid[idx]
            take_fallback = ~any_ok & (res_new < 0.97 * res)
            step_ok = any_ok | take_fallback

            active = running & ~solved & ~diverged
            u_n = jnp.where(active & step_ok, c.u + theta * du, c.u)
            l_n = jnp.where(active & step_ok, c.l + theta * dl, c.l)
            mem_n = jnp.where(step_ok,
                              jnp.concatenate([c.mem[1:], res_new[None]]), c.mem)

            better = res < c.best_res
            best_u = jnp.where(better, c.u, c.best_u)
            best_l = jnp.where(better, c.l, c.best_l)
            best_res = jnp.where(better, res, c.best_res)
            stall_n = jnp.where(better | (res_new < best_res), 0, c.stall + 1)

            # stagnation: restart from the best point with cleared memory (PATH's
            # restart heuristic); past the budget, terminate as max_it
            do_restart = active & (stall_n >= p.stall_its) & \
                (c.restarts < p.max_restarts)
            u_n = jnp.where(do_restart, best_u, u_n)
            l_n = jnp.where(do_restart, best_l, l_n)
            mem_n = jnp.where(do_restart, jnp.full((R,), jnp.inf, dtype), mem_n)
            stall_n = jnp.where(do_restart, 0, stall_n)
            restarts_n = c.restarts + jnp.where(do_restart, 1, 0)
            # each restart perturbs harder (restart k: pert0 * 2^k); between restarts
            # the perturbation decays multiplicatively back toward the pure model
            pert_n = jnp.where(do_restart,
                               p.pert0 * (2.0 ** c.restarts.astype(dtype)),
                               c.pert * p.pert_decay)
            exhausted = active & (stall_n >= p.stall_its) & \
                (c.restarts >= p.max_restarts)

            it_next = c.it + jnp.where(active, 1, 0)
            new_status = jnp.where(solved, SOLVED,
                          jnp.where(diverged, DIVERGED,
                           jnp.where((it_next >= p.max_iters) | exhausted, MAX_IT,
                                     RUNNING)))
            status = jnp.where(running, new_status, c.status).astype(jnp.int32)
            new = C(u_n, l_n, it_next, status, res, best_u, best_l, best_res,
                    mem_n, stall_n, restarts_n, pert_n)
            return jax.tree_util.tree_map(
                lambda nn, oo: jnp.where(running, nn, oo), new, c)

        u0 = jnp.asarray(u0, dtype)
        l0 = jnp.maximum(jnp.asarray(l0, dtype), 0.0)
        init = C(u0, l0, jnp.asarray(0), jnp.asarray(RUNNING, jnp.int32),
                 jnp.asarray(jnp.inf, dtype), u0, l0,
                 jnp.asarray(jnp.inf, dtype), jnp.full((R,), jnp.inf, dtype),
                 jnp.asarray(0), jnp.asarray(0), jnp.asarray(0.0, dtype))
        c = jax.lax.while_loop(lambda cc: cc.status == RUNNING, body, init)

        take_best = ((c.best_res < c.res) | ~jnp.isfinite(c.res)) & (c.status != SOLVED)
        c = c._replace(u=jnp.where(take_best, c.best_u, c.u),
                       l=jnp.where(take_best, c.best_l, c.l),
                       res=jnp.where(take_best, c.best_res, c.res))

        q, G, g, _ = self.problem.evaluate(c.u, c.l, x0, up, P_of(c.u), hessian=False)
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
    PATHMCP_frenet_approx.py``, 889 LoC), which re-evaluates the contouring/boundary
    approximations inside the Julia F/J callbacks.  The same cadence here: the
    ``_approx_update`` hook re-linearizes the MPCC parameter pytree at EVERY residual/
    Jacobian evaluation point inside the Newton/Josephy loops (``P_of`` in the solve
    cores), so the MCP the solver converges on is the self-consistent approximate game
    — a fixed point of both the complementarity system and the re-linearization.
    """

    def __init__(self, joint_dynamics, costs, agent_constraints, shared_constraints,
                 bounds, params=None, print_method=print, q_c: float = 0.1,
                 q_l: float = 1000.0, dtype=None):
        from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
        from dgsqp_tpu.solvers.solver_types import DGSQPV2Params, PATHMCPParams
        # Reuse the frenet-approx cost/constraint augmentation machinery by building a
        # donor solver, then lift its problem + approx hook into this MCP solver.
        params = params or PATHMCPParams()
        donor = DGSQPV2FrenetApprox(joint_dynamics, costs, agent_constraints,
                                    shared_constraints, bounds,
                                    DGSQPV2Params(N=params.N, dt=params.dt),
                                    print_method=None, q_c=q_c, q_l=q_l, dtype=dtype)
        super().__init__(joint_dynamics, donor.problem.costs,
                         donor.problem.agent_constraints,
                         donor.problem.shared_constraints, bounds, params,
                         print_method=print_method, dtype=dtype)
        self._donor = donor
        # read at trace time by the solve cores (the jit wrappers built by the base
        # constructor trace lazily, on first call — after this line runs)
        self._approx_update = donor._evaluate_mpcc

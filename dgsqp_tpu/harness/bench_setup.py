"""Shared construction of the flagship bench problem (chicane duel, ICRA config).

One place builds the scenario, solver, and warm-started batch used by ``bench.py``,
``scripts/diagnose_failures.py``, and ad-hoc profiling — so diagnostics always run the
exact configuration the headline number is measured on (reference configuration:
``scripts/DGSQP_ALGAMES_monte_carlo_chicane.py:161-174``).
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp


def build_bench_solver(horizon: int = 25, solver_name: str = 'v1', scenario=None):
    """Returns (scenario, solver) in the bench configuration (env-overridable)."""
    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
    from dgsqp_tpu.solvers.solver_types import DGSQPParams, DGSQPV2Params

    qp_tol = 1e-8 if jax.config.jax_enable_x64 else 3e-7
    if solver_name == 'approx':
        # approximate (progress-augmented MPCC) formulation — the journal study's fast
        # configuration (reference DGSQP_v2_frenet_approx.py:380,430; study config
        # comparison_study_barc/run_kinematic_study.sh approximate rows)
        from dgsqp_tpu.harness.scenarios import build_approximate_duel
        from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox

        sc = scenario or build_approximate_duel(N=horizon)
        # nms_frequency=1 + small reg: in the lockstep TPU body every round already
        # pays the m-step cost (full-step trial + parallel LS grid), so the reference's
        # d-step economy is free here — checking merit EVERY step makes small
        # regularization safe (large-reg schedules exist to protect blind d-steps; see
        # docs/approx_convergence.md and the reference reg study
        # run_regularization_study.sh which sweeps reg down to 0)
        params = DGSQPV2Params(N=sc.N, dt=sc.dt,
                               sqp_iters=int(os.environ.get('DGSQP_BENCH_SQP_ITERS', 150)),
                               p_tol=1e-3, d_tol=1e-3,
                               # 10-point grid: tau^10 ~ 1e-3 already returns the
                               # numerically-dead tail; each trial re-rolls the exact
                               # track geometry, so the grid is the hot LS cost
                               line_search_iters=int(os.environ.get('DGSQP_BENCH_LS', 10)),
                               merit_function='stat_l1',
                               merit_decrease_condition=os.environ.get(
                                   'DGSQP_BENCH_MERIT_COND', 'armijo'),
                               nms_frequency=int(os.environ.get('DGSQP_BENCH_NMSFREQ', 1)),
                               nms_memory_size=int(os.environ.get('DGSQP_BENCH_NMSMEM', 10)),
                               # constant reg=1: with every step merit-checked the big
                               # reg ramp is pure drag — probe sweep (batch 16): 16/16
                               # conv_abs max 33 iters vs max 38-62 for the 100*decay^k
                               # schedules whose early rounds just shed regularization
                               reg=float(os.environ.get('DGSQP_BENCH_REG', 1.0)),
                               reg_decay=float(os.environ.get('DGSQP_BENCH_REG_DECAY', 1.0)),
                               # 'exact' (TPU-native): differentiate through the track
                               # geometry instead of freezing the MPCC linearization —
                               # the frozen-P fixed point creeps ~400 iterations; exact
                               # + the indefinite QP kernel solves in 21-39 (x64 8/8
                               # conv_abs; docs/approx_convergence.md round-4 part 2)
                               approximation_eval=os.environ.get('DGSQP_BENCH_EVAL', 'exact'),
                               nms_initial_step_size_factor=float(
                                   os.environ.get('DGSQP_BENCH_DELTA0', 0.0)),
                               conv_scaled_stat=os.environ.get(
                                   'DGSQP_BENCH_SCALED', '1') == '1',
                               # exact-mode Hessians need an ACCURATE PSD projection
                               # (sloppy clipping leaves a ~0.95-rate linear creep);
                               # ns at (30, 1e-5, equilibrated) matches eigh's
                               # iteration counts (37-62 vs 23-80 f32 probe) at
                               # matmul-only cost — eigh's batched QR algorithm is
                               # ~350 ms/round at these shapes on TPU.  The true
                               # indefinite (Levenberg-LU) path is unstable here.
                               conv_method=os.environ.get('DGSQP_BENCH_CONV', 'ns'),
                               conv_ns_iters=int(os.environ.get('DGSQP_BENCH_NS_ITERS', 30)),
                               conv_ns_safety=float(
                                   os.environ.get('DGSQP_BENCH_NS_SAFETY', 1e-5)),
                               conv_ns_equil=os.environ.get(
                                   'DGSQP_BENCH_NS_EQUIL', '1') == '1',
                               nms=True, qp_tol=qp_tol,
                               stall_its=int(os.environ.get('DGSQP_BENCH_STALL', 0)) or None,
                               qp_box_split=os.environ.get('DGSQP_BENCH_BOX', '1') == '1',
                               qp_correctors=int(os.environ.get('DGSQP_BENCH_CORR', 2)))
        solver = DGSQPV2FrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                     sc.shared_constraints, sc.bounds, params,
                                     print_method=None)
        return sc, solver
    sc = scenario or build_chicane_scenario(N=horizon, theta_deg=45.0)
    if solver_name == 'v2':
        # EXACT game wants the opposite NMS operating point from the MPCC game: the
        # reference journal NMS knobs (freq=10, mem=10, delta0=20 — blind d-steps
        # tolerate the merit excursion of productive full Newton steps) but with SMALL
        # regularization (reg=1e-3, no decay — r3's reg=1e2/0.95 strangled the steps
        # into conv_rel creep).  Measured (docs/approx_convergence.md): 12/16 bench
        # games converge conv_abs in 15-31 iterations, the identical cohort as v1.
        params = DGSQPV2Params(N=sc.N, dt=sc.dt,
                               reg=float(os.environ.get('DGSQP_BENCH_REG', 1e-3)),
                               reg_decay=float(os.environ.get('DGSQP_BENCH_REG_DECAY', 1.0)),
                               nms=True,
                               nms_frequency=int(os.environ.get('DGSQP_BENCH_NMSFREQ', 10)),
                               nms_memory_size=int(os.environ.get('DGSQP_BENCH_NMSMEM', 10)),
                               nms_initial_step_size_factor=float(
                                   os.environ.get('DGSQP_BENCH_DELTA0', 20.0)),
                               sqp_iters=int(os.environ.get('DGSQP_BENCH_SQP_ITERS', 100)),
                               p_tol=1e-3, d_tol=1e-3, merit_decrease=0.01,
                               merit_decrease_condition=os.environ.get(
                                   'DGSQP_BENCH_MERIT_COND', 'armijo'),
                               qp_tol=qp_tol,
                               conv_method=os.environ.get('DGSQP_BENCH_CONV', 'ns'),
                               stall_its=int(os.environ.get('DGSQP_BENCH_STALL', 15)) or None,
                               hessian_mode=os.environ.get('DGSQP_BENCH_HESS', 'ad'),
                               qp_box_split=os.environ.get('DGSQP_BENCH_BOX', '1') == '1',
                               qp_correctors=int(os.environ.get('DGSQP_BENCH_CORR', 2)))
        solver = DGSQPV2(sc.joint_model, sc.costs, sc.agent_constraints,
                         sc.shared_constraints, sc.bounds, params, print_method=None)
    else:
        # line_search_iters: the reference config uses 50, but trials beyond ~20 have
        # alpha <= tau^20 ~ 1e-6 whose accepted point is numerically identical to the
        # line-search-failure return; 20 keeps the decisions while trimming the grid.
        params = DGSQPParams(N=sc.N, dt=sc.dt, reg=1e-3,
                             nonmono_ls=os.environ.get('DGSQP_BENCH_NMLS', '1') == '1',
                             line_search_iters=int(os.environ.get('DGSQP_BENCH_LS', 20)),
                             sqp_iters=int(os.environ.get('DGSQP_BENCH_SQP_ITERS', 50)),
                             p_tol=1e-3, d_tol=1e-3,
                             beta=0.01, tau=0.5, qp_tol=qp_tol,
                             qp_max_iters=int(os.environ.get('DGSQP_BENCH_QP_ITERS', 25)),
                             qp_solves_limit=int(os.environ.get('DGSQP_BENCH_QP_BUDGET', 100)),
                             # ns (Newton-Schulz, MXU matmuls) measured at 1.7x the
                             # throughput of eigh at equal conv_abs (57.8% vs 57.4%,
                             # batch 256) and strictly better incl-rel (84.4% vs 70.7%)
                             conv_method=os.environ.get('DGSQP_BENCH_CONV', 'ns'),
                             qp_polish_iters=int(os.environ.get('DGSQP_BENCH_POLISH', 4)),
                             # stagnation escape (iterations without 1% stat improvement
                             # before terminating as 'stalled'; 0 = off).  Default ON:
                             # measured at this exact config (N=25, CPU mesh A/B) with
                             # IDENTICAL conv_abs/conv_rel and -15% total QP solves —
                             # the plateaued games set the batch tail otherwise
                             stall_its=int(os.environ.get('DGSQP_BENCH_STALL', 15)) or None,
                             # cross-round IPM warm start (flat execution).  Default ON:
                             # measured on TPU r3 at 54.39 solves/s/chip, conv_abs 58.2%
                             # vs 52.61 / 57.0% for the same build with it off
                             # (results/bench_sweep_r3.jsonl)
                             qp_warm_start=os.environ.get('DGSQP_BENCH_QP_WS', '1') == '1',
                             # fold input-box rows of G into the IPM normal matrix as a
                             # diagonal update (200/525 rows at this config), and pair the
                             # ±Du_x state-bound rows.  Default ON: measured on TPU at
                             # 23.43 vs 22.45 solves/s/chip with identical statuses
                             # (results/bench_sweep_r2d.jsonl, config stall15+box+corr2)
                             qp_box_split=os.environ.get('DGSQP_BENCH_BOX', '1') == '1',
                             # Gondzio centrality correctors per IPM iteration (part of the
                             # measured-best r2d config; see qp_box_split note)
                             qp_correctors=int(os.environ.get('DGSQP_BENCH_CORR', 2)),
                             # 'ad' (fwd-over-rev sweep) or 'dp' (stagewise GEMM assembly)
                             hessian_mode=os.environ.get('DGSQP_BENCH_HESS', 'ad'))
        solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                       sc.shared_constraints, sc.bounds, params, print_method=None)
    return sc, solver


def build_bench_batch(sc, solver, batch: int, seed: int = 0, device=None):
    """Sample + warm-start the bench batch; returns (u0, l0, x0, up) on ``device``."""
    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions

    dtype = solver.dtype
    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, batch, seed=seed)
    u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((batch, sc.joint_model.n_u), dtype)
    from dgsqp_tpu.harness.warm_start import seed_virtual_rate_prev
    up = seed_virtual_rate_prev(up, jnp.asarray(u_ws, dtype)[:, 0, :], sc.joint_model)
    def _dws(u, x, p):
        # approximate-game solvers need their parameter pytree (contouring/boundary
        # linearizations) built from the warm start before any constraint evaluate
        Pv = solver._approx_update(u, x) \
            if getattr(solver, '_approx_update', None) is not None else None
        return solver.problem.dual_warm_start(u, x, p, P=Pv)
    l0 = jax.jit(jax.vmap(_dws))(u0, x0, up)
    if device is not None:
        u0, l0, x0, up = (jax.device_put(a, device) for a in (u0, l0, x0, up))
    return u0, l0, x0, up

#!/usr/bin/env python3
"""Monte-Carlo study dispatcher.

TPU-native counterpart of the reference runner
(``/root/reference/scripts/comparison_study_barc/monte_carlo_main.py:8-124``): one argparse
entry point dispatching {scenario} x {solver} x {formulation}, except that the reference's
per-sample Python loop with ``--start_idx`` resume becomes a single batched, sharded solve.

Examples:
    python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp --n 200
    python scripts/monte_carlo_main.py --scenario chicane --solver dgsqp_v2 --n 500
    python scripts/monte_carlo_main.py --scenario merge --solver dgsqp --n 100
    python scripts/monte_carlo_main.py --scenario agents --agents 3 --solver dgsqp
    python scripts/monte_carlo_main.py --scenario chicane --formulation approximate
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scenario', default='chicane',
                    choices=['chicane', 'curve', 'merge', 'agents', 'dynamic', 'duel'],
                    help="'duel' = the journal comparison-study game (same costs in "
                         "both formulations: exact = build_exact_duel, approximate = "
                         "build_approximate_duel on the same track)")
    ap.add_argument('--cost_setting', type=int, default=0,
                    help='dynamic study cost setting (reference '
                         'exact_dynamic_game_dynamic.py:103-118)')
    ap.add_argument('--formulation', default='exact', choices=['exact', 'approximate'])
    ap.add_argument('--solver', default='dgsqp',
                    choices=['dgsqp', 'dgsqp_v2', 'algames', 'mcp'])
    ap.add_argument('--n', type=int, default=200, help='number of Monte-Carlo samples')
    ap.add_argument('--N', type=int, default=25, help='horizon length')
    ap.add_argument('--theta', type=float, default=45.0, help='track swept angle (deg)')
    ap.add_argument('--agents', type=int, default=3, help='agent count (agents scenario)')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--sqp_iters', type=int, default=50)
    ap.add_argument('--p_tol', type=float, default=1e-3)
    ap.add_argument('--d_tol', type=float, default=1e-3)
    ap.add_argument('--merit_function', default='stat_l1')
    ap.add_argument('--merit_decrease_condition', default='armijo')
    ap.add_argument('--eval_type', default='exact', choices=['always', 'once', 'exact'],
                    help="MPCC geometry cadence: 'once' re-linearizes per SQP "
                         "iteration, 'always' additionally at every merit/trial point "
                         "(both reference-faithful frozen-P modes, ~400-iteration "
                         "fixed point); 'exact' differentiates through the track "
                         "splines (TPU-native, 21-39 iterations)")
    ap.add_argument('--conv', default=None, choices=['eigh', 'ns', 'none'],
                    help="Hessian convexification; the approximate game defaults to "
                         "'eigh' (exact clipping — a sloppy projection leaves a "
                         "~0.95-rate creep on the MPCC Hessian; 'none' = indefinite "
                         "kernel, unstable on this game)")
    ap.add_argument('--no_nms', action='store_true')
    ap.add_argument('--reg_init', type=float, default=None)
    ap.add_argument('--reg_decay', type=float, default=None)
    ap.add_argument('--nms_frequency', type=int, default=None)
    ap.add_argument('--nms_memory', type=int, default=None)
    ap.add_argument('--delta0', type=float, default=None,
                    help='nms_initial_step_size_factor (reference hardcodes 20; '
                         '0 = merit-check every step incl. the first)')
    ap.add_argument('--dgsqp_ws', type=int, default=0,
                    help='warm-start the oracle solver from a K-iteration DGSQP '
                         'prefix (primal + duals); oracle certification stays its own')
    ap.add_argument('--ibr_ws', action='store_true',
                    help='refine the PID warm start with one batched IBR sweep '
                         '(reference DGSQP_comp_monte_carlo.py ibr_ws=True)')
    ap.add_argument('--reference_faithful', action='store_true',
                    help="approximate game only: run the reference study's own "
                         "configuration (input-rate rows built but passed None, "
                         "frozen-P 'once' cadence, reg=1e2*0.95^k, nms freq=10, "
                         "delta0=20, sqp_iters=500, ABSOLUTE tolerances — "
                         "comparison_study_barc/globals.py:31-40 + "
                         "approximate_dynamic_game.py:194-201) instead of the "
                         "tuned TPU operating point")
    ap.add_argument('--out', default='results')
    ap.add_argument('--devices', type=int, default=None)
    ap.add_argument('--skip_existing', action='store_true',
                    help='resume analog of the reference --start_idx: skip configs whose '
                         'output pickle already exists')
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        # the axon TPU plugin overrides JAX_PLATFORMS/JAX_PLATFORM_NAME; only a config
        # update after import reliably pins the platform (DGSQP_PLATFORM=cpu for a
        # CPU-mesh run without claiming the TPU tunnel)
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    if os.environ.get('DGSQP_X64') == '1':
        # oracle-grade runs (ALGAMES/MCP cross-checks) need f64: the AL penalty climbs
        # to rho=1e7, which is numerically hopeless in f32 — the reference baselines
        # always ran f64 CPython/CasADi
        jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_default_matmul_precision', 'highest')
    # setup computation (samplers, PID warm starts, dual warm starts) stays on host
    # CPU — under the axon tunnel every eager op is a network round trip; only the
    # sharded batch solve is explicitly placed on the accelerator (run_mc_study)
    try:
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
    except Exception:
        pass
    # persistent compile cache: the oracle programs (hybrid MCP, ALGAMES) cost minutes
    # of XLA time per shape — cache them across study invocations like bench.py does
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               str(Path(__file__).resolve().parent.parent / '.jax_cache'))
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

    from dgsqp_tpu.harness.mc_study import run_mc_study, analyze_results, save_results
    from dgsqp_tpu.harness.scenarios import (build_agents_scenario,
                                             build_approximate_duel,
                                             build_chicane_scenario,
                                             build_curve_scenario, build_merge_scenario)
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
    from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
    from dgsqp_tpu.solvers.solver_types import DGSQPParams, DGSQPV2Params

    if args.scenario == 'dynamic' and args.formulation == 'approximate':
        from dgsqp_tpu.harness.scenarios import build_dynamic_approximate_duel
        scenario = build_dynamic_approximate_duel(
            N=args.N, cost_setting=args.cost_setting,
            rate_constraints=not args.reference_faithful)
    elif args.scenario == 'dynamic':
        from dgsqp_tpu.harness.scenarios import build_dynamic_duel
        scenario = build_dynamic_duel(N=args.N, cost_setting=args.cost_setting)
    elif args.scenario == 'duel' and args.formulation == 'exact':
        from dgsqp_tpu.harness.scenarios import build_exact_duel
        scenario = build_exact_duel(N=args.N)
    elif args.formulation == 'approximate':
        scenario = build_approximate_duel(
            N=args.N, rate_constraints=not args.reference_faithful)
    elif args.scenario == 'chicane':
        scenario = build_chicane_scenario(N=args.N, theta_deg=args.theta)
    elif args.scenario == 'curve':
        scenario = build_curve_scenario(N=args.N, theta_deg=max(args.theta, 60.0))
    elif args.scenario == 'merge':
        scenario = build_merge_scenario(N=min(args.N, 20))
    else:
        scenario = build_agents_scenario(M=args.agents, N=args.N,
                                         theta_deg=args.theta)

    reg_tag = '_ref' if args.reference_faithful else ''
    if args.reg_init is not None or args.reg_decay is not None:
        reg_tag = f'_reg{args.reg_init if args.reg_init is not None else "d"}' \
                  f'_decay{args.reg_decay if args.reg_decay is not None else "d"}' \
                  f'_{args.eval_type}'
    out_name = Path(args.out) / (f'{scenario.name}_{args.solver}_{args.formulation}'
                                 f'{reg_tag}_n{args.n}_s{args.seed}.pkl')
    if args.skip_existing and out_name.exists():
        print(f'skip (exists): {out_name}', file=sys.stderr)
        return

    solver = None
    if args.formulation == 'approximate' and args.solver == 'mcp':
        # approximate-game oracle: PATH-role MCP with per-evaluation MPCC
        # re-linearization (reference PATHMCP_frenet_approx.py)
        from dgsqp_tpu.solvers.mcp import PATHMCPFrenetApprox
        from dgsqp_tpu.solvers.solver_types import PATHMCPParams
        mcp = PATHMCPFrenetApprox(
            scenario.joint_model, scenario.costs, scenario.agent_constraints,
            scenario.shared_constraints, scenario.bounds,
            PATHMCPParams(N=scenario.N, dt=scenario.dt, tol=args.p_tol,
                          method=os.environ.get('DGSQP_MCP_METHOD', 'hybrid'),
                          max_iters=int(os.environ.get('DGSQP_MCP_ITERS', 200)),
                          max_restarts=int(os.environ.get('DGSQP_MCP_RESTARTS', 4))),
            print_method=None)
        res = run_mc_study(scenario, num_samples=args.n, seed=args.seed, solver=mcp,
                           ibr_ws=args.ibr_ws, dgsqp_ws_iters=args.dgsqp_ws)
    elif args.formulation == 'approximate':
        if args.reference_faithful:
            # the reference study's own knobs (globals.py:31-40): frozen-P cadence,
            # heavy decaying proximal regularization, blind d-steps, absolute tols
            params = DGSQPV2Params(N=scenario.N, dt=scenario.dt,
                                   sqp_iters=max(args.sqp_iters, 500),
                                   p_tol=args.p_tol, d_tol=args.d_tol,
                                   merit_function=args.merit_function,
                                   merit_decrease_condition=args.merit_decrease_condition,
                                   approximation_eval=('once' if args.eval_type == 'exact'
                                                       else args.eval_type),
                                   reg=1e2, reg_decay=0.95, nms_frequency=10,
                                   nms_memory_size=10,
                                   nms_initial_step_size_factor=20.0,
                                   conv_scaled_stat=False,
                                   conv_method=args.conv or 'eigh',
                                   nms=not args.no_nms)
        else:
            # measured-best MPCC operating point (docs/approx_convergence.md): every
            # step merit-checked (freq=1, delta0=0), exact track-geometry evaluation,
            # constant reg=1, gradient-scaled KKT tolerance
            params = DGSQPV2Params(N=scenario.N, dt=scenario.dt,
                                   sqp_iters=max(args.sqp_iters, 150), p_tol=args.p_tol,
                                   d_tol=args.d_tol, merit_function=args.merit_function,
                                   merit_decrease_condition=args.merit_decrease_condition,
                                   approximation_eval=args.eval_type,
                                   reg=1.0, reg_decay=1.0, nms_frequency=1,
                                   nms_memory_size=10, nms_initial_step_size_factor=0.0,
                                   conv_scaled_stat=True,
                                   conv_method=args.conv or 'eigh',
                                   nms=not args.no_nms)
        if args.reg_init is not None:
            params.reg = args.reg_init
        if args.reg_decay is not None:
            params.reg_decay = args.reg_decay
        if args.nms_frequency is not None:
            params.nms_frequency = args.nms_frequency
        if args.nms_memory is not None:
            params.nms_memory_size = args.nms_memory
        if args.delta0 is not None:
            params.nms_initial_step_size_factor = args.delta0
        solver = DGSQPV2FrenetApprox(scenario.joint_model, scenario.costs,
                                     scenario.agent_constraints,
                                     scenario.shared_constraints, scenario.bounds,
                                     params, print_method=None)
        res = run_mc_study(scenario, num_samples=args.n, seed=args.seed,
                           n_devices=args.devices, solver=solver)
    elif args.solver == 'dgsqp':
        params = DGSQPParams(N=scenario.N, dt=scenario.dt, reg=1e-3, nonmono_ls=True,
                             line_search_iters=50, sqp_iters=args.sqp_iters,
                             p_tol=args.p_tol, d_tol=args.d_tol, beta=0.01, tau=0.5,
                             merit_function=args.merit_function)
        if args.conv:
            params.conv_method = args.conv
        res = run_mc_study(scenario, solver_params=params, num_samples=args.n,
                           seed=args.seed, n_devices=args.devices,
                           ibr_ws=args.ibr_ws)
    elif args.solver == 'dgsqp_v2':
        params = DGSQPV2Params(N=scenario.N, dt=scenario.dt, sqp_iters=args.sqp_iters,
                               p_tol=args.p_tol, d_tol=args.d_tol,
                               merit_function=args.merit_function,
                               merit_decrease_condition=args.merit_decrease_condition,
                               nms=not args.no_nms)
        if args.reg_init is not None:
            params.reg = args.reg_init
        if args.reg_decay is not None:
            params.reg_decay = args.reg_decay
        if args.nms_frequency is not None:
            params.nms_frequency = args.nms_frequency
        if args.nms_memory is not None:
            params.nms_memory_size = args.nms_memory
        if args.delta0 is not None:
            params.nms_initial_step_size_factor = args.delta0
        res = run_mc_study(scenario, solver_params=params, num_samples=args.n,
                           seed=args.seed, solver_cls=DGSQPV2, n_devices=args.devices,
                           ibr_ws=args.ibr_ws)
    elif args.solver == 'algames':
        from dgsqp_tpu.harness.mc_study import run_mc_study_algames
        res = run_mc_study_algames(scenario, num_samples=args.n, seed=args.seed)
    elif args.solver == 'mcp':
        from dgsqp_tpu.solvers.mcp import PATHMCP
        from dgsqp_tpu.solvers.solver_types import PATHMCPParams
        # oracle-grade configuration: the Josephy+FB hybrid (PATH's two-regime
        # structure); override with DGSQP_MCP_METHOD for quick fbnewton-only runs
        mcp = PATHMCP(scenario.joint_model, scenario.costs, scenario.agent_constraints,
                      scenario.shared_constraints, scenario.bounds,
                      PATHMCPParams(N=scenario.N, dt=scenario.dt, tol=args.p_tol,
                                    method=os.environ.get('DGSQP_MCP_METHOD', 'hybrid'),
                                    max_iters=int(os.environ.get('DGSQP_MCP_ITERS', 200)),
                                    max_restarts=int(os.environ.get('DGSQP_MCP_RESTARTS', 4))),
                      print_method=None)
        res = run_mc_study(scenario, num_samples=args.n, seed=args.seed, solver=mcp,
                           ibr_ws=args.ibr_ws, dgsqp_ws_iters=args.dgsqp_ws)
    else:
        print(f'solver {args.solver} batched study not wired yet', file=sys.stderr)
        sys.exit(2)

    stats = analyze_results(res)
    save_results(res, out_name)
    print(json.dumps(stats, indent=2, default=str))


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""Per-iteration diagnosis of the approximate (MPCC) game at the bench configuration.

Traces a small batch of bench-sampled games through DGSQPV2FrenetApprox at several
(reg_init, reg_decay) points of the reference regularization study
(``/root/reference/scripts/comparison_study_barc/run_regularization_study.sh``), printing
the stat/p_feas trajectory — the instrument for the round-4 "approx game converges 0%"
investigation (VERDICT r3, Weak #1).

Usage: DGSQP_PLATFORM=cpu python scripts/diagnose_approx.py [--N 25] [--batch 4]
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--N', type=int, default=25)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--iters', type=int, default=200)
    ap.add_argument('--eval_type', default='once')
    ap.add_argument('--solver', default='approx', choices=['approx', 'v2', 'v1'],
                    help='approx = MPCC formulation; v2 = exact game, v2 engine')
    ap.add_argument('--configs', default='100:0.95,10:0.8,1:0.8,0:1.0')
    ap.add_argument('--x64', action='store_true')
    args = ap.parse_args()

    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    if args.x64:
        jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_default_matmul_precision', 'highest')
    import numpy as np

    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver

    if args.solver == 'approx':
        from dgsqp_tpu.harness.scenarios import build_approximate_duel
        sc = build_approximate_duel(N=args.N)
    else:
        from dgsqp_tpu.harness.scenarios import build_chicane_scenario
        sc = build_chicane_scenario(N=args.N, theta_deg=45.0)
    for cfg in args.configs.split(','):
        reg, decay = (float(v) for v in cfg.split(':'))
        os.environ['DGSQP_BENCH_REG'] = str(reg)
        os.environ['DGSQP_BENCH_REG_DECAY'] = str(decay)
        os.environ['DGSQP_BENCH_EVAL'] = args.eval_type
        _, solver = build_bench_solver(horizon=args.N, solver_name=args.solver,
                                       scenario=sc)
        u0, l0, x0, up = build_bench_batch(sc, solver, args.batch, seed=0)
        res, trace = solver.solve_batch_traced(u0, l0, x0, up, num_iters=args.iters)
        st = np.asarray(res.status)
        stat = np.asarray(trace['stat'])
        pf = np.asarray(trace['p_feas'])
        print(f'\n=== solver={args.solver} reg={reg} decay={decay} eval={args.eval_type} ===')
        print('statuses:', st.tolist(), 'iters:', np.asarray(res.iters).tolist())
        print('final stat:', ' '.join(f'{v:.2e}' for v in np.asarray(res.stat)))
        step = max(1, args.iters // 10)
        for b in range(args.batch):
            print(f'  g{b} stat: ' + ' '.join(f'{v:9.2e}' for v in stat[b, ::step]))
            print(f'  g{b} feas: ' + ' '.join(f'{v:9.2e}' for v in pf[b, ::step]))


if __name__ == '__main__':
    main()

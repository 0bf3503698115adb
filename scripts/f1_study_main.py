#!/usr/bin/env python3
"""F1 comparison-study runner (BASELINE config 5).

CLI counterpart of the reference's ``comparison_study_f1/monte_carlo_main.py`` +
``run_study.sh``: the progress-augmented dynamic-bicycle approximate game on the
20 m Austin segment, raceline-sampled ICs, solved batched by the approximate DGSQP
(and optionally the MCP stand-in for the PATH baseline).

Usage:
    DGSQP_PLATFORM=cpu python scripts/f1_study_main.py --n 32 --N 15 \
        --solvers dgsqp --out results/r4/f1_study.json
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=32)
    ap.add_argument('--N', type=int, default=15)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--solvers', nargs='+', default=['dgsqp'],
                    choices=['dgsqp', 'path'])
    ap.add_argument('--sqp_iters', type=int, default=150)
    ap.add_argument('--eval_type', default='exact',
                    choices=['always', 'once', 'exact'])
    ap.add_argument('--out', default='results/f1_study.json')
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    if os.environ.get('DGSQP_X64') == '1':
        jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_default_matmul_precision', 'highest')
    # setup computation stays on host CPU; only the batched solve should touch
    # the accelerator (every eager op is a tunnel round trip — and the sampler's
    # global_to_local previously tripped TPU-unsupported ops when run eagerly)
    try:
        jax.config.update('jax_default_device', jax.devices('cpu')[0])
    except Exception:
        pass
    jax.config.update('jax_compilation_cache_dir',
                      str(Path(__file__).resolve().parent.parent / '.jax_cache'))

    from dgsqp_tpu.harness.f1_study import (build_f1_scenario, f1_solver_params,
                                            run_f1_study)

    sc = build_f1_scenario(N=args.N)
    report = {'N': args.N, 'n': args.n, 'seed': args.seed, 'results': {}}
    for solver in args.solvers:
        params = f1_solver_params(args.N, sqp_iters=args.sqp_iters,
                                  approximation_eval=args.eval_type) \
            if solver == 'dgsqp' else None
        out = run_f1_study(N=args.N, num_samples=args.n, seed=args.seed,
                           solver=solver, params=params, scenario=sc)
        out.pop('u_sol', None)
        out.pop('x0', None)
        report['results'][solver] = out
        print(f'# {solver}: {out}', file=sys.stderr, flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2, default=str))
    print(json.dumps(report, indent=2, default=str))


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""Classify non-converged games from the flagship chicane bench.

The instrumentation VERDICT r1 asked for: runs the bench batch, isolates every game
that did not reach ``conv_abs_tol``, re-solves them with a per-iteration trace
(:meth:`DGSQP.solve_batch_traced`), and classifies each failure:

  * ``stalled``        — stationarity plateaued (relative change < 10%) over the last
                         third of the trace while feasible: the line search cannot make
                         progress (precision floor or merit landscape).
  * ``slow``           — stationarity still decreasing at the horizon: needs more
                         iterations (a budget, not an algorithm, problem).
  * ``oscillating``    — stationarity non-monotone with large swings: watchdog cycling.
  * ``infeasible``     — primal feasibility never reached p_tol.

Also cross-checks the failures against a retry configuration sweep (the cascade from
``harness/mc_study.py``) and reports how many convert.  Mirrors the failure analysis the
reference does by hand from its pickled per-solve ``solve_info``
(``scripts/comparison_study_barc/analyze_data.py:59-86``).

Usage (TPU or CPU):
    JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/diagnose_failures.py \
        --batch 256 --out results/diagnosis.json
"""
import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def classify_trace(p_feas, comp, stat, p_tol, d_tol):
    """Label one game's (T,) trace tails."""
    T = len(stat)
    tail = slice(2 * T // 3, T)
    s_tail = stat[tail]
    if np.max(p_feas[tail]) > p_tol:
        return 'infeasible'
    # steadily improving ('slow', i.e. budget-limited) must be checked BEFORE
    # 'oscillating' — a monotone decreasing tail also has a large max/min ratio
    first, last = np.median(s_tail[:len(s_tail) // 2]), np.median(s_tail[len(s_tail) // 2:])
    if last < 0.7 * first:
        return 'slow'
    rng = np.max(s_tail) - np.min(s_tail)
    if np.max(s_tail) > 3 * np.min(s_tail) and rng > 0.5 * np.median(s_tail):
        return 'oscillating'
    return 'stalled'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=256)
    ap.add_argument('--horizon', type=int, default=25)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--trace_iters', type=int, default=50)
    ap.add_argument('--retries', action='store_true', help='also run the retry sweep')
    ap.add_argument('--out', default='results/diagnosis.json')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_default_matmul_precision', 'highest')
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache_dir:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    cpu = jax.devices('cpu')[0]
    accel = jax.devices()[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
    from dgsqp_tpu.solvers.dgsqp import CONV_ABS, STATUS_MSG
    from dgsqp_tpu.solvers.solver_types import DGSQPParams

    batch = args.batch if accel.platform != 'cpu' else min(args.batch, 16)
    sc, solver = build_bench_solver(horizon=args.horizon)
    u0, l0, x0, up = build_bench_batch(sc, solver, batch, seed=args.seed, device=accel)

    print(f'# solving batch {batch} on {accel.platform}', file=sys.stderr)
    res = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=8)
    status = np.asarray(res.status)
    fail = np.where(status != CONV_ABS)[0]
    print(f'# {fail.size}/{batch} non-conv_abs games '
          f'({ {STATUS_MSG[int(s)]: int((status == s).sum()) for s in np.unique(status)} })',
          file=sys.stderr)
    report = {'batch': batch, 'platform': accel.platform,
              'status_counts': {STATUS_MSG[int(s)]: int((status == s).sum())
                                for s in np.unique(status)}}
    if fail.size == 0:
        print(json.dumps(report))
        return

    # ---- traced re-solve of the failures (padded to a power of two)
    n_pad = max(16, 1 << (fail.size - 1).bit_length())
    pad = np.concatenate([fail, np.repeat(fail[:1], n_pad - fail.size)])
    sub = lambda a: jax.device_put(jnp.asarray(np.asarray(a)[pad]), accel)
    print(f'# tracing {fail.size} failures (padded to {n_pad}) for '
          f'{args.trace_iters} iters', file=sys.stderr)
    tres, trace = solver.solve_batch_traced(sub(u0), sub(l0), sub(x0), sub(up),
                                            num_iters=args.trace_iters)
    tr = {k: np.asarray(v)[:fail.size] for k, v in trace.items()}

    p = solver.params
    labels = {}
    for i, g in enumerate(fail):
        lab = classify_trace(tr['p_feas'][i], tr['comp'][i], tr['stat'][i],
                             p.p_tol, p.d_tol)
        labels[int(g)] = dict(
            label=lab, status=STATUS_MSG[int(status[g])],
            stat_final=float(tr['stat'][i, -1]), p_feas_final=float(tr['p_feas'][i, -1]),
            comp_final=float(tr['comp'][i, -1]),
            stat_min=float(tr['stat'][i].min()),
            qp_solves=int(tr['qp_solves'][i, -1]))
    from collections import Counter
    label_counts = Counter(v['label'] for v in labels.values())
    print(f'# failure classes: {dict(label_counts)}', file=sys.stderr)
    report['failure_classes'] = dict(label_counts)
    report['failures'] = labels
    # how close are the stalled games? distribution of terminal stationarity
    stat_fin = np.array([v['stat_final'] for v in labels.values()])
    report['stat_final_percentiles'] = {
        q: float(np.percentile(stat_fin, int(q))) for q in ('10', '50', '90')}
    print(f"# terminal stationarity of failures: p10/p50/p90 = "
          f"{report['stat_final_percentiles']}", file=sys.stderr)

    # ---- retry sweep: which alternative configurations convert the failures?
    if args.retries:
        from dataclasses import replace
        from dgsqp_tpu.solvers.dgsqp import DGSQP
        retry_cfgs = {
            'reg1e-2': replace(p, reg=1e-2),
            'reg1e-1': replace(p, reg=1e-1),
            'merit_stat': replace(p, merit_function='stat'),   # the OTHER merit
                                                               # (stat_l1 is the default)
            'eigh': replace(p, conv_method='eigh'),
            'iters150_budget500': replace(p, sqp_iters=150, qp_solves_limit=500),
        }
        conversions = {}
        for name, cfg in retry_cfgs.items():
            rslv = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                         sc.shared_constraints, sc.bounds, cfg, print_method=None)
            r2 = rslv.solve_batch_chunked(sub(u0), sub(l0), sub(x0), sub(up),
                                          chunk_iters=8)
            st2 = np.asarray(r2.status)[:fail.size]
            conversions[name] = int((st2 == CONV_ABS).sum())
            print(f'# retry {name}: {conversions[name]}/{fail.size} converted',
                  file=sys.stderr)
        report['retry_conversions'] = conversions

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != 'failures'}))


if __name__ == '__main__':
    main()

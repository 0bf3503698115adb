#!/usr/bin/env python3
"""Per-instance cross-tab: flagship-bench failures vs the independent oracles.

The flagship v1 bench (chicane duel, N=25, seed 0) stalls on ~19% of its games
(status 'stalled'/'conv_rel').  This script solves the SAME first-n samples with
the exact bench configuration and cross-tabulates every failure against the
independent-oracle results (MCP / ALGAMES MC pickles on the identical sampler
stream), answering VERDICT r4 item 2a's alternative done-criterion: do the
oracles solve the instances the bench configuration stalls on, or are those
games hard for every method (a problem-instance property, not a solver defect)?

Usage:
    DGSQP_PLATFORM=cpu python scripts/stalled_oracle_crosstab.py \
        --oracles results/r5/oracle/*_mcp_*_n128_s0.pkl \
                  results/r5/oracle/*_algames_*_n128_s0.pkl \
        --n 128 --out docs/stalled_oracle_crosstab_r5.json
"""
import argparse
import json
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--oracles', nargs='+', required=True)
    ap.add_argument('--n', type=int, default=128)
    ap.add_argument('--out', default='docs/stalled_oracle_crosstab_r5.json')
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    jax.config.update('jax_default_matmul_precision', 'highest')
    jax.config.update('jax_compilation_cache_dir',
                      str(Path(__file__).resolve().parent.parent / '.jax_cache'))

    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
    from dgsqp_tpu.solvers.dgsqp import CONV_ABS, STATUS_MSG

    sc, solver = build_bench_solver(horizon=25, solver_name='v1')
    u0, l0, x0, up = build_bench_batch(sc, solver, args.n, seed=0)
    res = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=4)
    st_bench = np.asarray(res.status)

    oracles = {}
    x0_np = np.asarray(x0)
    covered = np.zeros(args.n, bool)
    for p in args.oracles:
        with open(p, 'rb') as f:
            o = pickle.load(f)
        # align oracle samples to bench rows by initial-condition matching (the
        # two runs share the seeded sampler stream but may diverge in the
        # rejection tail when the candidate-batch schedule differs)
        d = np.linalg.norm(x0_np[:, None, :] - o.x0[None, :, :], axis=-1)
        j = d.argmin(axis=1)
        hit = d[np.arange(args.n), j] < 1e-5
        conv = np.zeros(args.n, bool)
        conv[hit] = np.isin(o.statuses[j[hit]], (CONV_ABS,))
        covered |= hit
        print(f'# {p}: aligned {int(hit.sum())}/{args.n} bench samples',
              file=sys.stderr)
        oracles[o.solver] = conv

    oracle_any = np.zeros(args.n, bool)
    for conv in oracles.values():
        oracle_any |= conv

    fail = (st_bench != CONV_ABS) & covered
    rows = []
    for i in np.where(fail)[0]:
        rows.append(dict(sample=int(i),
                         bench_status=STATUS_MSG.get(int(st_bench[i]), '?'),
                         **{k: bool(v[i]) for k, v in oracles.items()}))
    report = dict(
        n=args.n,
        aligned=int(covered.sum()),
        bench_conv_abs=int((st_bench == CONV_ABS).sum()),
        bench_failures=int(fail.sum()),
        failures_oracle_solved=int((fail & oracle_any).sum()),
        failures_oracle_also_fails=int((fail & ~oracle_any).sum()),
        oracle_conv_counts={k: int(v.sum()) for k, v in oracles.items()},
        per_failure=rows,
    )
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items() if k != 'per_failure'},
                     indent=2))


if __name__ == '__main__':
    main()

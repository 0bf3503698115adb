#!/usr/bin/env python3
"""Cross-solver / cross-formulation GNE agreement analyzer.

CLI counterpart of the reference's ``analyze_data_gne_compare.py``: loads two MCResults
pickles produced by ``monte_carlo_main.py`` on the SAME scenario/seed and reports the
normalized-MSE distribution, the equilibrium-match rate (the BASELINE >=95% metric), and
disagreement localization.

Usage:
    python scripts/gne_compare_main.py results/chicane_dgsqp.pkl results/chicane_mcp.pkl \
        --N 25 --num_ua 2 2 --scale 2.1 0.436 2.1 0.436
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
    ap.add_argument('pkl_a')
    ap.add_argument('pkl_b')
    ap.add_argument('--N', type=int, required=True)
    ap.add_argument('--num_ua', type=int, nargs='+', default=[2, 2])
    ap.add_argument('--layout_a', default='agent_flat', choices=['agent_flat', 'stage'])
    ap.add_argument('--layout_b', default='agent_flat', choices=['agent_flat', 'stage'])
    ap.add_argument('--scale', type=float, nargs='+', default=None,
                    help='per-channel input normalization (reference uses the bounds '
                         '[2, 0.436] per agent, analyze_data_gne_compare.py:169)')
    ap.add_argument('--match_tol', type=float, default=0.1)
    ap.add_argument('--success', default='abs', choices=['abs', 'any'])
    # cross-formulation comparison (exact vs progress-augmented): select the shared
    # input channels, e.g. --num_ua_b 3 3 --keep_cols_b 0 1 3 4 drops the arc-speed
    # channel of a PA run (reference analyze_data_gne_compare.py:160-162)
    ap.add_argument('--num_ua_b', type=int, nargs='+', default=None)
    ap.add_argument('--keep_cols_a', type=int, nargs='+', default=None)
    ap.add_argument('--keep_cols_b', type=int, nargs='+', default=None)
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from dgsqp_tpu.harness.analysis import gne_compare

    with open(args.pkl_a, 'rb') as f:
        res_a = pickle.load(f)
    with open(args.pkl_b, 'rb') as f:
        res_b = pickle.load(f)

    if res_a.x0.shape != res_b.x0.shape:
        print('NOTE: different state layouts (cross-formulation comparison) — '
              'samples aligned by index/seed', file=sys.stderr)
    elif not np.allclose(res_a.x0, res_b.x0, atol=1e-9):
        print('WARNING: the two runs have different initial conditions — '
              'comparison is sample-aligned by index only', file=sys.stderr)

    rep = gne_compare(res_a, res_b, N=args.N, num_ua=args.num_ua,
                      layout_a=args.layout_a, layout_b=args.layout_b,
                      input_scale=args.scale, match_tol=args.match_tol,
                      success=args.success, num_ua_b=args.num_ua_b,
                      keep_cols_a=args.keep_cols_a, keep_cols_b=args.keep_cols_b)
    rep['solver_a'] = res_a.solver
    rep['solver_b'] = res_b.solver
    txt = json.dumps(rep, indent=2)
    print(txt)
    if args.out:
        Path(args.out).write_text(txt)


if __name__ == '__main__':
    main()

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
    ap.add_argument('--out', default=None)
    args = ap.parse_args()

    from dgsqp_tpu.harness.analysis import gne_compare

    with open(args.pkl_a, 'rb') as f:
        res_a = pickle.load(f)
    with open(args.pkl_b, 'rb') as f:
        res_b = pickle.load(f)

    if not np.allclose(res_a.x0, res_b.x0, atol=1e-9):
        print('WARNING: the two runs have different initial conditions — '
              'comparison is sample-aligned by index only', file=sys.stderr)

    rep = gne_compare(res_a, res_b, N=args.N, num_ua=args.num_ua,
                      layout_a=args.layout_a, layout_b=args.layout_b,
                      input_scale=args.scale, match_tol=args.match_tol,
                      success=args.success)
    rep['solver_a'] = res_a.solver
    rep['solver_b'] = res_b.solver
    txt = json.dumps(rep, indent=2)
    print(txt)
    if args.out:
        Path(args.out).write_text(txt)


if __name__ == '__main__':
    main()

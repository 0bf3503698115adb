"""Result aggregation and cross-solver comparison.

Equivalents of the reference's post-processing scripts:
  * ``scripts/process_data_curve.py:28-100`` / ``process_data_comp.py`` /
    ``process_data_merge.py`` / ``process_data_ablation.py`` — convergence percentages,
    diverged/max-iteration counts, QP-solve counts, solve-time statistics, terminal
    feasibility violations -> :func:`summarize`;
  * ``scripts/comparison_study_barc/analyze_data.py:36-105`` — per-config success rates and
    solve-time stats (now produced directly by ``mc_study.analyze_results``) plus
    success-location scatter data -> :func:`success_locations`;
  * ``scripts/comparison_study_barc/analyze_data_gne_compare.py`` (361 LoC) — cross-checking
    that two solvers (or the exact and approximate formulations) agree on the game's
    equilibrium -> :func:`gne_compare`.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dgsqp_tpu.harness.mc_study import MCResults
from dgsqp_tpu.solvers.dgsqp import CONV_ABS, CONV_REL, STATUS_MSG


def summarize(results: MCResults) -> Dict:
    """Per-config summary table row (reference ``process_data_curve.py:28-100``)."""
    st = results.statuses
    conv = np.isin(st, (CONV_ABS, CONV_REL))
    out = dict(
        scenario=results.scenario,
        solver=results.solver,
        total=int(results.num_samples),
        conv_pct=100.0 * conv.mean() if len(st) else 0.0,
        diverged=int((st == 3).sum()),
        qp_fail=int((st == 4).sum()),
        max_iter=int((st == 5).sum()),
        mean_sqp_iters=float(results.iters[conv].mean()) if conv.any() else float('nan'),
        mean_qp_solves=float(results.qp_solves[conv].mean()) if conv.any() else float('nan'),
        solve_time_mean_s=results.wall_time_s / max(results.num_samples, 1),
        feas_vio_mean=float(results.p_feas[~conv].mean()) if (~conv).any() else 0.0,
        feas_vio_max=float(results.p_feas.max()) if len(st) else 0.0,
    )
    return out


def success_locations(results: MCResults, ego_s_idx: int = 4, ego_ey_idx: int = 5):
    """(s, e_y, converged) triples of the ego initial conditions — the data behind the
    reference's success-location scatter on the track map (``analyze_data.py:88-105``)."""
    conv = np.isin(results.statuses, (CONV_ABS, CONV_REL))
    return np.stack([results.x0[:, ego_s_idx], results.x0[:, ego_ey_idx],
                     conv.astype(float)], axis=-1)


def gne_compare(results_a: MCResults, results_b: MCResults,
                u_tol: float = 1e-2, traj_compare=None) -> Dict:
    """Equilibrium agreement between two solvers on the SAME sampled instances.

    The reference's ``analyze_data_gne_compare.py`` cross-checks exact-vs-approximate GNE
    agreement sample by sample; here agreement is measured on the input sequences (and
    optionally a trajectory functional).  This is also the BASELINE.json
    'equilibrium-match rate' metric.
    """
    assert results_a.num_samples == results_b.num_samples
    conv_a = np.isin(results_a.statuses, (CONV_ABS, CONV_REL))
    conv_b = np.isin(results_b.statuses, (CONV_ABS, CONV_REL))
    both = conv_a & conv_b
    if results_a.u_sol.shape == results_b.u_sol.shape:
        du = np.abs(results_a.u_sol - results_b.u_sol).max(axis=tuple(
            range(1, results_a.u_sol.ndim)))
        match = both & (du <= u_tol)
        du_stats = dict(max_input_gap_p50=float(np.median(du[both])) if both.any() else None,
                        max_input_gap_max=float(du[both].max()) if both.any() else None)
    elif traj_compare is not None:
        gaps = np.array([traj_compare(results_a.u_sol[i], results_b.u_sol[i])
                         for i in range(results_a.num_samples)])
        match = both & (gaps <= u_tol)
        du_stats = dict(traj_gap_p50=float(np.median(gaps[both])) if both.any() else None)
    else:
        raise ValueError('Different decision spaces: provide traj_compare')
    return dict(
        total=int(results_a.num_samples),
        both_converged=int(both.sum()),
        match=int(match.sum()),
        match_rate_of_both=float(match.sum() / both.sum()) if both.any() else 0.0,
        match_rate_of_total=float(match.mean()),
        **du_stats,
    )


def format_table(rows, keys=None) -> str:
    if not rows:
        return '(no rows)'
    keys = keys or list(rows[0].keys())
    widths = {k: max(len(str(k)), max(len(f'{r.get(k, "")}'[:18]) for r in rows))
              for k in keys}
    lines = ['  '.join(str(k).ljust(widths[k]) for k in keys)]
    for r in rows:
        lines.append('  '.join(f'{r.get(k, "")}'[:18].ljust(widths[k]) for k in keys))
    return '\n'.join(lines)

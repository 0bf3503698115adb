#!/usr/bin/env python3
"""In-process regularization sweep of the approximate (MPCC) game.

TPU-native counterpart of the reference's
``comparison_study_barc/run_regularization_study.sh`` +
``analyze_data_regularization.py``: reg_init x reg_decay grid under the frozen-P
cadences, M samples per cell — each cell ONE batched solve instead of M
sequential processes, and the whole grid one process (the per-cell cost is one
retrace + one batched solve; compiled binaries come from the persistent cache).

Usage:
    python scripts/regularization_study_main.py --m 64 --N 25 \
        --out results/r5/regularization
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--m', type=int, default=64, help='samples per cell')
    ap.add_argument('--N', type=int, default=25)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--evals', nargs='+', default=['once', 'always'])
    ap.add_argument('--regs', nargs='+', type=float, default=[1.0, 100.0, 1000.0])
    ap.add_argument('--decays', nargs='+', type=float,
                    default=[0.5, 0.8, 0.95, 1.0])
    ap.add_argument('--include_reg0', action='store_true', default=True)
    ap.add_argument('--sqp_iters', type=int, default=150)
    ap.add_argument('--out', default='results/r5/regularization')
    args = ap.parse_args()

    import os
    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    if os.environ.get('DGSQP_X64') == '1':
        jax.config.update('jax_enable_x64', True)
    jax.config.update('jax_default_matmul_precision', 'highest')
    jax.config.update('jax_compilation_cache_dir',
                      str(Path(__file__).resolve().parent.parent / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    import jax.numpy as jnp
    from dgsqp_tpu.harness.mc_study import run_provenance
    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.harness.scenarios import build_approximate_duel
    from dgsqp_tpu.harness.warm_start import seed_virtual_rate_prev
    from dgsqp_tpu.solvers.dgsqp import CONV_ABS, CONV_REL, STATUS_MSG
    from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
    from dgsqp_tpu.solvers.solver_types import DGSQPV2Params

    cpu = jax.devices('cpu')[0]
    accel = jax.devices()[0]
    jax.config.update('jax_default_device', cpu)

    sc = build_approximate_duel(N=args.N)
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    cells = []
    for ev in args.evals:
        for reg in args.regs:
            for decay in args.decays:
                cells.append((ev, reg, decay))
        if args.include_reg0:
            cells.append((ev, 0.0, 1.0))

    # sample once; every cell sees the identical batch (the reference study fixes
    # the sampler seed per configuration, monte_carlo_sampler.py:22)
    x0_np, u_ws, _, _ = sample_duel_initial_conditions(sc, args.m, seed=args.seed)

    rows = []
    for ci, (ev, reg, decay) in enumerate(cells):
        params = DGSQPV2Params(N=sc.N, dt=sc.dt, sqp_iters=args.sqp_iters,
                               p_tol=1e-3, d_tol=1e-3,
                               merit_function='stat_l1',
                               merit_decrease_condition='armijo',
                               approximation_eval=ev,
                               reg=reg, reg_decay=decay, nms_frequency=1,
                               nms_memory_size=10,
                               nms_initial_step_size_factor=0.0,
                               conv_scaled_stat=True, conv_method='eigh', nms=True)
        solver = DGSQPV2FrenetApprox(sc.joint_model, sc.costs,
                                     sc.agent_constraints, sc.shared_constraints,
                                     sc.bounds, params, print_method=None)
        dtype = solver.dtype
        u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
        x0 = jnp.asarray(x0_np, dtype)
        up = jnp.zeros((args.m, sc.joint_model.n_u), dtype)
        up = seed_virtual_rate_prev(up, jnp.asarray(u_ws, dtype)[:, 0, :],
                                    sc.joint_model)

        def _dws(u, x, p):
            Pv = solver._approx_update(u, x) \
                if solver._approx_update is not None else None
            return solver.problem.dual_warm_start(u, x, p, P=Pv)
        l0 = jax.jit(jax.vmap(_dws))(u0, x0, up)
        u0, l0, x0d, upd = (jax.device_put(a, accel) for a in (u0, l0, x0, up))

        t0 = time.time()
        res = solver.solve_batch_chunked(u0, l0, x0d, upd)
        st = np.asarray(res.status)
        wall = time.time() - t0
        iters = np.asarray(res.iters)
        conv = np.isin(st, (CONV_ABS,))
        conv_any = np.isin(st, (CONV_ABS, CONV_REL))
        row = dict(eval=ev, reg=reg, decay=decay, m=args.m,
                   conv_abs=int(conv.sum()), conv_incl_rel=int(conv_any.sum()),
                   mean_iters=float(iters[conv_any].mean()) if conv_any.any()
                   else None,
                   max_iters=int(iters.max()), wall_s=round(wall, 1),
                   status_counts={STATUS_MSG.get(int(s), str(s)):
                                  int((st == s).sum()) for s in np.unique(st)})
        rows.append(row)
        print(f'[{ci + 1}/{len(cells)}] {json.dumps(row)}', flush=True)

    report = dict(rows=rows, N=args.N, m=args.m, seed=args.seed,
                  provenance=run_provenance(solver, seed=args.seed))
    (out_dir / 'regularization_sweep.json').write_text(
        json.dumps(report, indent=2, default=str))
    print(f'# wrote {out_dir / "regularization_sweep.json"}')


if __name__ == '__main__':
    main()

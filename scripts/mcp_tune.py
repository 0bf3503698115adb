#!/usr/bin/env python3
"""A/B harness for the MCP baseline's globalization knobs on the chicane suite.

Runs the same sampled batch through PATHMCP configurations and prints per-config
convergence counts — the tuning loop for VERDICT r2 item 2 (PATH-strength baseline).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    jax.config.update('jax_platforms', os.environ.get('DGSQP_PLATFORM', 'cpu'))
    if os.environ.get('DGSQP_X64', '1') == '1':
        jax.config.update('jax_enable_x64', True)
    import jax.numpy as jnp

    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.solvers.mcp import PATHMCP, SOLVED
    from dgsqp_tpu.solvers.solver_types import PATHMCPParams

    B = int(os.environ.get('B', 32))
    N = int(os.environ.get('N', 15))
    tol = float(os.environ.get('TOL', 1e-3))
    sc = build_chicane_scenario(N=N, theta_deg=45.0)

    configs = {
        'default': {},
        'plain-fb': dict(fb_lambda=1.0),
        'lam0.8': dict(fb_lambda=0.8),
        'lam0.6': dict(fb_lambda=0.6),
        'mem16': dict(nonmono_memory=16),
        'mem3': dict(nonmono_memory=3),
        'no-restart': dict(max_restarts=0),
        'stall12': dict(stall_its=12),
        'restarts8': dict(max_restarts=8, stall_its=4),
        'pert0.1': dict(pert0=0.1),
        'iters400': dict(max_iters=400),
        'combo1': dict(fb_lambda=0.8, nonmono_memory=16, pert0=0.1),
        'combo2': dict(fb_lambda=0.8, pert0=0.1, max_restarts=8, max_iters=400),
        'combo3': dict(fb_lambda=0.8, nonmono_memory=16),
        'combo4': dict(fb_lambda=0.8, pert0=0.1),
        'eps-off': dict(eps0=1e-9),
        'eps1e-1': dict(eps0=1e-1),
        'eps3e-1': dict(eps0=3e-1),
        'eps1e0': dict(eps0=1.0),
        'eps1e-1-slow': dict(eps0=1e-1, eps_decay=0.9),
        'eps1e0-slow': dict(eps0=1.0, eps_decay=0.9, eps_frac=0.2),
        'eps1e0-plainfb': dict(eps0=1.0, eps_decay=0.9, eps_frac=0.2, fb_lambda=1.0),
        'patient': dict(stall_its=50, max_restarts=2, max_iters=500),
        'patient-eps': dict(stall_its=50, max_restarts=2, max_iters=500, eps0=1.0,
                            eps_decay=0.9, eps_frac=0.2),
        'patient-tol2': dict(stall_its=50, max_restarts=2, max_iters=500),
        'josephy': dict(method='josephy'),
        'josephy-stall12': dict(method='josephy', stall_its=12),
        'josephy-g2': dict(method='josephy', jos_gamma=2.0),
        'josephy-g1.2': dict(method='josephy', jos_gamma=1.2),
        'josephy-stall10': dict(method='josephy', stall_its=10, max_restarts=6),
        'fbnewton': dict(method='fbnewton'),
        'hybrid': dict(method='hybrid'),
        'hybrid-g1.5': dict(method='hybrid', jos_gamma=1.5),
        'hybrid-stall10': dict(method='hybrid', stall_its=10, max_restarts=6),
    }
    sel = os.environ.get('CONFIGS')
    if sel:
        configs = {k: v for k, v in configs.items() if k in sel.split(',')}

    use_ibr = os.environ.get('IBR_WS', '0') == '1'
    x0 = u0 = l0 = up = None
    for name, kw in configs.items():
        params = PATHMCPParams(N=sc.N, dt=sc.dt, tol=tol, **kw)
        solver = PATHMCP(sc.joint_model, sc.costs, sc.agent_constraints,
                         sc.shared_constraints, sc.bounds, params, print_method=None)
        if x0 is None:
            dtype = solver.dtype
            x0_h, u_ws, _, _ = sample_duel_initial_conditions(sc, B, seed=0)
            u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
            x0 = jnp.asarray(x0_h, dtype)
            up = jnp.zeros((B, sc.joint_model.n_u), dtype)
            if use_ibr:
                from dgsqp_tpu.solvers.ibr import IBR
                from dgsqp_tpu.solvers.solver_types import IBRParams
                ibr = IBR(sc.joint_model, sc.costs, sc.agent_constraints,
                          sc.shared_constraints, sc.bounds,
                          IBRParams(N=sc.N, dt=sc.dt, ibr_iters=1,
                                    p_tol=1e-3, d_tol=1e-3), print_method=None)
                u0 = jax.jit(jax.vmap(
                    lambda u, x, p: ibr._solve_core(u, x, p, None).u))(u0, x0, up)
            l0 = jax.jit(jax.vmap(
                lambda u, x, p: solver.problem.dual_warm_start(u, x, p)))(u0, x0, up)
        res = solver._solve_batch_jit(u0, l0, x0, up, None)
        st = np.asarray(res.status)
        iters = np.asarray(res.iters)
        resid = np.asarray(res.res)
        conv = int((st == SOLVED).sum())
        fail = resid[st != SOLVED]
        fail_p = (f'fail res p10/p50/p90 = {np.percentile(fail, 10):.2e}/'
                  f'{np.percentile(fail, 50):.2e}/{np.percentile(fail, 90):.2e}'
                  if fail.size else 'all solved')
        print(f'{name:12s} conv {conv}/{B}  statuses '
              f'{dict(zip(*[a.tolist() for a in np.unique(st, return_counts=True)]))}  '
              f'iters p50={np.median(iters):.0f} max={iters.max()}  {fail_p}', flush=True)


if __name__ == '__main__':
    main()

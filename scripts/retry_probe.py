#!/usr/bin/env python3
"""Probe which alternative configurations rescue games the standard config fails.

Runs the bench chicane batch under the reference configuration, collects the
non-converged games, and re-solves just those under a battery of variants
(regularization, merit function, v2-NMS).  Informs the harness retry cascade.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os
import time

import numpy as np


def main():
    batch = int(os.environ.get('B', 256))
    N = int(os.environ.get('N', 25))

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

    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS
    from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
    from dgsqp_tpu.solvers.solver_types import DGSQPParams, DGSQPV2Params

    sc = build_chicane_scenario(N=N, theta_deg=45.0)
    base_kw = dict(N=sc.N, dt=sc.dt, nonmono_ls=True, line_search_iters=20,
                   sqp_iters=50, p_tol=1e-3, d_tol=1e-3, beta=0.01, tau=0.5,
                   qp_tol=3e-7, qp_max_iters=25, qp_solves_limit=100)
    solver0 = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                    sc.shared_constraints, sc.bounds,
                    DGSQPParams(reg=1e-3, **base_kw), print_method=None)
    dtype = solver0.dtype

    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, batch, seed=0)
    u0 = jax.vmap(solver0.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((batch, 4), dtype)
    l0 = jax.jit(jax.vmap(lambda u, x, p: solver0.problem.dual_warm_start(u, x, p)))(
        u0, x0, up)
    u0, l0, x0, up = (jax.device_put(a, accel) for a in (u0, l0, x0, up))

    res = solver0.solve_batch_chunked(u0, l0, x0, up)
    st = np.asarray(res.status)
    fail = np.where(st != CONV_ABS)[0]
    print(f'# base: conv_abs {np.mean(st == CONV_ABS) * 100:.1f}% | {fail.size} failures',
          flush=True)

    # pad failure subset to a power of two
    n_pad = 1 << (fail.size - 1).bit_length()
    pad = np.concatenate([fail, np.repeat(fail[:1], n_pad - fail.size)])
    sel = lambda a: jax.device_put(jnp.asarray(np.asarray(a)[pad]), accel)
    u0f, l0f, x0f, upf = sel(u0), sel(l0), sel(x0), sel(up)

    def report(name, solver):
        t0 = time.time()
        r = solver.solve_batch_chunked(u0f, l0f, x0f, upf)
        dt_s = time.time() - t0
        stf = np.asarray(r.status)[:fail.size]
        print(f'# {name:24s} rescued {int(np.sum(stf == CONV_ABS))}/{fail.size} '
              f'({dt_s:.1f}s)', flush=True)

    variants = {
        'v1 reg=1e-2': DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                             sc.shared_constraints, sc.bounds,
                             DGSQPParams(reg=1e-2, **base_kw), print_method=None),
        'v1 reg=1e-1': DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                             sc.shared_constraints, sc.bounds,
                             DGSQPParams(reg=1e-1, **base_kw), print_method=None),
        'v1 merit=stat': DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                               sc.shared_constraints, sc.bounds,
                               DGSQPParams(reg=1e-3, merit_function='stat', **base_kw),
                               print_method=None),
        'v2 max': DGSQPV2(sc.joint_model, sc.costs, sc.agent_constraints,
                          sc.shared_constraints, sc.bounds,
                          DGSQPV2Params(N=sc.N, dt=sc.dt, reg=1e2, reg_decay=0.95,
                                        nms=True, nms_frequency=5, nms_memory_size=3,
                                        sqp_iters=100, p_tol=1e-3, d_tol=1e-3,
                                        merit_decrease=0.01,
                                        merit_decrease_condition='max', qp_tol=3e-7),
                          print_method=None),
    }
    for name, solver in variants.items():
        report(name, solver)


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""Benchmark driver: batched two-agent chicane game solves per second per chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the driver target is >=500 concurrent 2-agent chicane solves/s on a v5e-16
(BASELINE.md), i.e. 31.25 solves/s/chip; ``vs_baseline`` is measured solves/s/chip divided
by that per-chip target.  The game configuration matches the reference MC study
(``scripts/DGSQP_ALGAMES_monte_carlo_chicane.py``: N=25, theta=45deg, p/d_tol=1e-3,
nonmono watchdog line search).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    n_env = os.environ.get('DGSQP_BENCH_BATCH')
    N_env = os.environ.get('DGSQP_BENCH_N')
    batch = int(n_env) if n_env else 256
    horizon = int(N_env) if N_env else 25

    import jax
    import jax.numpy as jnp

    # TPU MXU matmuls default to bfloat16 inputs; the SQP's Jacobians/Hessians/KKT solves
    # need full f32 accumulation or the merit machinery sees ~1e-2 noise.
    jax.config.update('jax_default_matmul_precision', 'highest')

    platform = jax.devices()[0].platform
    on_tpu = platform != 'cpu'
    if not on_tpu:
        # CPU smoke mode: keep it small
        batch = min(batch, 8)
        jax.config.update('jax_enable_x64', False)

    # All eager/setup computation stays on host CPU — under the axon tunnel every eager op
    # is a network round trip; only the jitted batch solve should touch the TPU.
    cpu = jax.devices('cpu')[0]
    accel = jax.devices()[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL
    from dgsqp_tpu.solvers.solver_types import DGSQPParams

    sc = build_chicane_scenario(N=horizon, theta_deg=45.0)
    params = DGSQPParams(N=sc.N, dt=sc.dt, reg=1e-3, nonmono_ls=True, line_search_iters=50,
                         sqp_iters=50, p_tol=1e-3, d_tol=1e-3, beta=0.01, tau=0.5,
                         qp_tol=1e-8 if jax.config.jax_enable_x64 else 3e-7)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints, sc.shared_constraints,
                   sc.bounds, params, print_method=None)
    dtype = solver.dtype

    print(f'# platform={platform} dtype={dtype.__name__} batch={batch} N={horizon}',
          file=sys.stderr)

    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, batch, seed=0)
    u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((batch, sc.joint_model.n_u), dtype)
    l0 = jax.jit(jax.vmap(lambda u, x, p: solver.problem.dual_warm_start(u, x, p)))(
        u0, x0, up)

    # explicit accelerator placement for the hot path
    u0, l0, x0, up = (jax.device_put(a, accel) for a in (u0, l0, x0, up))

    # warm-up / compile
    t0 = time.time()
    res = solver._solve_batch_jit(u0, l0, x0, up, None)
    jax.block_until_ready(res)
    compile_and_first = time.time() - t0
    print(f'# first batch solve (incl compile): {compile_and_first:.1f}s', file=sys.stderr)

    # timed run
    t0 = time.time()
    res = solver._solve_batch_jit(u0, l0, x0, up, None)
    jax.block_until_ready(res)
    dur = time.time() - t0

    status = np.asarray(res.status)
    conv = np.isin(status, (CONV_ABS, CONV_REL)).mean()
    iters = np.asarray(res.iters)
    solves_per_s = batch / dur

    print(f'# solve time: {dur:.2f}s for {batch} games | convergence {conv * 100:.1f}% | '
          f'iters p50={np.median(iters):.0f} max={iters.max()}', file=sys.stderr)

    target_per_chip = 500.0 / 16.0
    print(json.dumps({
        'metric': 'chicane_2agent_solves_per_s_per_chip',
        'value': round(solves_per_s, 3),
        'unit': 'solves/s/chip',
        'vs_baseline': round(solves_per_s / target_per_chip, 3),
        'convergence_rate': round(float(conv), 4),
        'batch': batch,
        'horizon': horizon,
        'platform': platform,
    }))


if __name__ == '__main__':
    main()

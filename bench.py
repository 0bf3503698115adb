#!/usr/bin/env python3
"""Benchmark driver: batched two-agent chicane game solves per second per chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline: the driver target is >=500 concurrent 2-agent chicane solves/s on a v5e-16
(BASELINE.md), i.e. 31.25 solves/s/chip; ``vs_baseline`` is measured solves/s/chip divided
by that per-chip target.  The game configuration matches the reference MC study
(``scripts/DGSQP_ALGAMES_monte_carlo_chicane.py``: N=25, theta=45deg, p/d_tol=1e-3).

Env knobs: DGSQP_BENCH_BATCH (default 256), DGSQP_BENCH_N (25), DGSQP_BENCH_SOLVER
(v1|v2, default v1), DGSQP_BENCH_CHUNK (8).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    batch = int(os.environ.get('DGSQP_BENCH_BATCH', 256))
    horizon = int(os.environ.get('DGSQP_BENCH_N', 25))
    solver_name = os.environ.get('DGSQP_BENCH_SOLVER', 'v1')
    chunk = int(os.environ.get('DGSQP_BENCH_CHUNK', 8))

    import jax
    import jax.numpy as jnp

    # TPU MXU matmuls default to bfloat16 inputs; the SQP's Jacobians/Hessians/KKT solves
    # need full f32 accumulation or the merit machinery sees ~1e-2 noise.
    jax.config.update('jax_default_matmul_precision', 'highest')
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache_dir:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)

    platform = jax.devices()[0].platform
    on_tpu = platform != 'cpu'
    if not on_tpu:
        batch = min(batch, 8)

    # All eager/setup computation stays on host CPU — under the axon tunnel every eager op
    # is a network round trip; only the jitted batch solve should touch the TPU.
    cpu = jax.devices('cpu')[0]
    accel = jax.devices()[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL
    from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
    from dgsqp_tpu.solvers.solver_types import DGSQPParams, DGSQPV2Params

    sc = build_chicane_scenario(N=horizon, theta_deg=45.0)
    qp_tol = 1e-8 if jax.config.jax_enable_x64 else 3e-7
    if solver_name == 'v2':
        params = DGSQPV2Params(N=sc.N, dt=sc.dt, reg=1e2, reg_decay=0.95, nms=True,
                               nms_frequency=5, nms_memory_size=3, sqp_iters=100,
                               p_tol=1e-3, d_tol=1e-3, merit_decrease=0.01,
                               merit_decrease_condition='max', qp_tol=qp_tol)
        solver = DGSQPV2(sc.joint_model, sc.costs, sc.agent_constraints,
                         sc.shared_constraints, sc.bounds, params, print_method=None)
    else:
        # line_search_iters: the reference config uses 50, but trials beyond ~20 have
        # alpha <= tau^20 ~ 1e-6 whose accepted point is numerically identical to the
        # line-search-failure return; 20 keeps the decisions while trimming the grid.
        params = DGSQPParams(N=sc.N, dt=sc.dt, reg=1e-3,
                             nonmono_ls=os.environ.get('DGSQP_BENCH_NMLS', '1') == '1',
                             line_search_iters=int(os.environ.get('DGSQP_BENCH_LS', 20)),
                             sqp_iters=int(os.environ.get('DGSQP_BENCH_SQP_ITERS', 50)),
                             p_tol=1e-3, d_tol=1e-3,
                             beta=0.01, tau=0.5, qp_tol=qp_tol,
                             qp_max_iters=int(os.environ.get('DGSQP_BENCH_QP_ITERS', 25)),
                             qp_solves_limit=int(os.environ.get('DGSQP_BENCH_QP_BUDGET', 100)),
                             # ns (Newton-Schulz, MXU matmuls) measured at 1.7x the
                             # throughput of eigh at equal conv_abs (57.8% vs 57.4%,
                             # batch 256) and strictly better incl-rel (84.4% vs 70.7%)
                             conv_method=os.environ.get('DGSQP_BENCH_CONV', 'ns'),
                             qp_polish_iters=int(os.environ.get('DGSQP_BENCH_POLISH', 4)))
        solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                       sc.shared_constraints, sc.bounds, params, print_method=None)
    dtype = solver.dtype

    print(f'# platform={platform} dtype={dtype.__name__} solver={solver_name} '
          f'batch={batch} N={horizon} chunk={chunk}', file=sys.stderr)

    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, batch, seed=0)
    u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((batch, sc.joint_model.n_u), dtype)
    l0 = jax.jit(jax.vmap(lambda u, x, p: solver.problem.dual_warm_start(u, x, p)))(
        u0, x0, up)

    # explicit accelerator placement for the hot path
    u0, l0, x0, up = (jax.device_put(a, accel) for a in (u0, l0, x0, up))

    def run(verbose=False):
        res = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=chunk,
                                         verbose=verbose)
        jax.block_until_ready(res)
        return res

    t0 = time.time()
    res = run(verbose=False)
    compile_and_first = time.time() - t0
    print(f'# first batch solve (incl compile): {compile_and_first:.1f}s', file=sys.stderr)

    t0 = time.time()
    res = run()
    dur = time.time() - t0

    status = np.asarray(res.status)
    conv = np.isin(status, (CONV_ABS,)).mean()
    conv_any = np.isin(status, (CONV_ABS, CONV_REL)).mean()
    iters = np.asarray(res.iters)
    solves_per_s = batch / dur

    print(f'# solve time: {dur:.2f}s for {batch} games | conv_abs {conv * 100:.1f}% '
          f'(incl rel {conv_any * 100:.1f}%) | iters p50={np.median(iters):.0f} '
          f'max={iters.max()}', file=sys.stderr)
    from dgsqp_tpu.solvers.dgsqp import STATUS_MSG
    hist = {STATUS_MSG.get(int(s), str(s)): int((status == s).sum())
            for s in np.unique(status)}
    print(f'# status counts: {hist}', file=sys.stderr)
    ch = getattr(solver, 'last_chunk_history', None)
    if ch:
        prof = [c['running'] for c in ch]
        print(f'# chunks: {len(ch)} | running-after-chunk: {prof}', file=sys.stderr)

    target_per_chip = 500.0 / 16.0
    print(json.dumps({
        'metric': 'chicane_2agent_solves_per_s_per_chip',
        'value': round(solves_per_s, 3),
        'unit': 'solves/s/chip',
        'vs_baseline': round(solves_per_s / target_per_chip, 3),
        'convergence_rate': round(float(conv), 4),
        'convergence_rate_incl_rel': round(float(conv_any), 4),
        'batch': batch,
        'horizon': horizon,
        'solver': solver_name,
        'platform': platform,
    }))


if __name__ == '__main__':
    main()

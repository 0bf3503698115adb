#!/usr/bin/env python3
"""Per-kernel timing breakdown on the current accelerator.

Times the hot pieces of one SQP iteration at batch size B: evaluate (with/without Hessian),
convexification (eigh), the QP solve, and one full 8-iteration solver chunk.  Each timed
function is wrapped to return a single scalar so the host genuinely waits for completion —
``block_until_ready`` alone does not force full materialization through the axon tunnel.
Guides kernel optimization (SURVEY.md perf plan).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os
import time

import numpy as np


def main():
    B = int(os.environ.get('B', 128))
    N = int(os.environ.get('N', 25))

    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        # the axon plugin overrides JAX_PLATFORMS/JAX_PLATFORM_NAME; only a config
        # update after import reliably pins the platform (e.g. DGSQP_PLATFORM=cpu)
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    import jax.numpy as jnp
    jax.config.update('jax_default_matmul_precision', 'highest')
    accel = jax.devices()[0]
    cpu = jax.devices('cpu')[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.qp import solve_qp
    from dgsqp_tpu.solvers.solver_types import DGSQPParams
    from dgsqp_tpu.utils.math import regularized_convexification

    sc = build_chicane_scenario(N=N, theta_deg=45.0)
    params = DGSQPParams(N=N, dt=sc.dt, reg=1e-3, nonmono_ls=True,
                         line_search_iters=50, sqp_iters=50, p_tol=1e-3, d_tol=1e-3,
                         beta=0.01, tau=0.5)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints, sc.shared_constraints,
                   sc.bounds, params, print_method=None)
    dtype = solver.dtype
    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, B, seed=0)
    u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((B, 4), dtype)
    l0 = jnp.zeros((B, solver.n_c), dtype)
    u0, x0, up, l0 = (jax.device_put(a, accel) for a in (u0, x0, up, l0))

    def scalarize(fn):
        def wrapped(*args):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in leaves
                       if l.size), out
        return wrapped

    def timeit(name, fn, *args, reps=3):
        f = jax.jit(scalarize(fn))
        s, out = f(*args)
        float(s)  # forces completion + warms the compile cache
        t0 = time.time()
        for _ in range(reps):
            s, out = f(*args)
            float(s)
        dt = (time.time() - t0) / reps
        print(f'{name:28s} {dt * 1e3:9.1f} ms   ({dt * 1e6 / B:8.1f} us/game)', flush=True)
        return out

    eval_full = jax.vmap(lambda u, l, x, p: solver.problem.evaluate(
        u, l, x, p, None, hessian=True))
    eval_lite = jax.vmap(lambda u, l, x, p: solver.problem.evaluate(
        u, l, x, p, None, hessian=False))
    merit = jax.vmap(lambda u, l, x, p: solver.problem.merit_terms(u, l, x, p, None))
    conv_eigh = jax.vmap(lambda Q: regularized_convexification(Q, 1e-3, method='eigh'))
    conv_ns = jax.vmap(lambda Q: regularized_convexification(Q, 1e-3, method='ns'))
    qp = jax.vmap(lambda Q, q, G, g: solve_qp(Q, q, G, -g, tol=3e-7,
                                              max_iters=solver.params.qp_max_iters))
    rollout = jax.vmap(lambda u, x: solver.problem.rollout(u, x))

    print(f'# batch={B} N={N} platform={accel.platform} n_dec={solver.n_dec} '
          f'n_c={solver.n_c} qp_iters={solver.params.qp_max_iters} '
          f'ls={solver.params.line_search_iters}', flush=True)
    eval_dp = jax.vmap(lambda u, l, x, p: solver.problem.evaluate_dp(
        u, l, x, p, None, hessian=True))
    timeit('rollout', rollout, u0, x0)
    timeit('merit terms (d, g)', merit, u0, l0, x0, up)
    out_l = timeit('evaluate (q,G,g)', eval_lite, u0, l0, x0, up)
    out_f = timeit('evaluate (+Q hessian)', eval_full, u0, l0, x0, up)
    timeit('evaluate_dp (+Q, GEMM)', eval_dp, u0, l0, x0, up)
    Q, q, G, g, _ = out_f
    timeit('convexify (eigh)', conv_eigh, Q)
    Qh = timeit('convexify (ns)', conv_ns, Q)
    timeit('QP (IPM + PDAS polish)', qp, Qh, q, G, g)

    # grid line search at the bench width (merit trials are the dominant LS cost)
    W = solver.params.line_search_iters
    du0 = 0.01 * jnp.ones_like(u0)
    s0 = jnp.minimum(0.0, g)
    zphi = jnp.zeros((B,), u0.dtype)
    grid = jax.vmap(lambda u, du, l, s, x, p: solver._grid_ls(
        jnp.asarray(True), u, du, l, jnp.zeros_like(l), s, jnp.zeros_like(s),
        jnp.asarray(jnp.inf, u0.dtype), jnp.asarray(0.0, u0.dtype),
        jnp.asarray(1.0, u0.dtype), x, p, None))
    timeit(f'grid line search (W={W})', grid, u0, du0, l0, s0, x0, up)

    # one flat ROUND chunk (the production bench path) and the nested chunk
    init_flat = jax.jit(jax.vmap(lambda u, l: solver._init_flat_carry(u, l)))(u0, l0)
    round_chunk = jax.vmap(lambda c, x, u_p: jax.lax.fori_loop(
        0, 8, lambda i, cc: solver._make_round_body(x, u_p, None)(cc), c))
    timeit('flat rounds x8 (bench path)', round_chunk, init_flat, x0, up, reps=1)
    init = jax.jit(jax.vmap(lambda u, l, x, u_p: solver._init_carry(u, l, x, u_p, None)))(
        u0, l0, x0, up)
    chunk = jax.vmap(lambda c, x, u_p: solver._chunk(c, x, u_p, None, 8))
    timeit('solver chunk (8 SQP iters)', chunk, init, x0, up, reps=1)


if __name__ == '__main__':
    main()

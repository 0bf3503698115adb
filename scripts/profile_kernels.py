#!/usr/bin/env python3
"""Per-kernel timing breakdown on the current accelerator.

Times the hot pieces of one SQP iteration at batch size B: evaluate (with/without Hessian),
convexification (eigh), and the QP solve.  Guides kernel optimization (SURVEY.md perf plan).
"""
import os
import time

import numpy as np


def main():
    B = int(os.environ.get('B', 128))
    N = int(os.environ.get('N', 25))

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_default_matmul_precision', 'highest')
    cpu = jax.devices('cpu')[0]
    accel = jax.devices()[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.qp import solve_qp
    from dgsqp_tpu.solvers.solver_types import DGSQPParams
    from dgsqp_tpu.utils.math import regularized_convexification

    sc = build_chicane_scenario(N=N, theta_deg=45.0)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints, sc.shared_constraints,
                   sc.bounds, DGSQPParams(N=N, dt=sc.dt), print_method=None)
    dtype = solver.dtype
    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, B, seed=0)
    u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((B, 4), dtype)
    l0 = jnp.zeros((B, solver.n_c), dtype)
    u0, x0, up, l0 = (jax.device_put(a, accel) for a in (u0, x0, up, l0))

    def timeit(name, fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f'{name:28s} {dt * 1e3:9.1f} ms   ({dt * 1e6 / B:8.1f} us/game)')
        return out

    eval_full = jax.jit(jax.vmap(lambda u, l, x, p: solver.problem.evaluate(
        u, l, x, p, None, hessian=True)))
    eval_lite = jax.jit(jax.vmap(lambda u, l, x, p: solver.problem.evaluate(
        u, l, x, p, None, hessian=False)))
    conv = jax.jit(jax.vmap(lambda Q: regularized_convexification(Q, 1e-3)))
    qp = jax.jit(jax.vmap(lambda Q, q, G, g: solve_qp(Q, q, G, -g, tol=3e-7)))
    rollout = jax.jit(jax.vmap(lambda u, x: solver.problem.rollout(u, x)))

    print(f'# batch={B} N={N} platform={accel.platform} n_dec={solver.n_dec} '
          f'n_c={solver.n_c}')
    timeit('rollout', rollout, u0, x0)
    out_l = timeit('evaluate (q,G,g)', eval_lite, u0, l0, x0, up)
    out_f = timeit('evaluate (+Q hessian)', eval_full, u0, l0, x0, up)
    Q, q, G, g, _ = out_f
    Qh = timeit('nearest_pd + reg (eigh)', conv, Q)
    timeit('QP (IPM + PDAS polish)', qp, Qh, q, G, g)


if __name__ == '__main__':
    main()

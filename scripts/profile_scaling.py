#!/usr/bin/env python3
"""Batch-scaling profile of the flat-round hot ops, amortizing dispatch overhead.

Each op is run REPS times inside one jitted fori_loop (carry-dependent so XLA cannot
dead-code or hoist it), so the per-call tunnel dispatch (~25 ms) is paid once.  Reports
on-device ms per call at each batch size — the data that decides the bench batch size and
the convexification/QP iteration budgets.

Env: BATCHES (comma list, default "128,512,2048"), REPS (default 8).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os
import time

import numpy as np


def main():
    batches = [int(b) for b in os.environ.get('BATCHES', '128,512,2048').split(',')]
    reps = int(os.environ.get('REPS', 8))
    N = int(os.environ.get('N', 25))

    import jax
    import jax.numpy as jnp
    jax.config.update('jax_default_matmul_precision', 'highest')
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache_dir:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    accel = jax.devices()[0]
    cpu = jax.devices('cpu')[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
    from dgsqp_tpu.harness.bench_setup import build_bench_solver
    from dgsqp_tpu.solvers.qp import solve_qp
    from dgsqp_tpu.utils.math import regularized_convexification

    # the exact bench configuration (same env knobs), so profiles explain bench numbers
    sc, solver = build_bench_solver(horizon=N)
    dtype = solver.dtype

    def timed_loop(name, fn, args, B):
        """Run fn REPS times in one jitted fori_loop; time per call on device."""
        def loop(a0, *rest):
            def body(i, a):
                out = fn(a, *rest)
                # fold a scalar function of the output into the carry so XLA cannot
                # dead-code or hoist the call out of the loop
                s = sum(jnp.mean(jnp.abs(leaf.astype(jnp.float32)))
                        for leaf in jax.tree_util.tree_leaves(out)
                        if hasattr(leaf, 'dtype') and leaf.size)
                return jax.tree_util.tree_map(
                    lambda x: x + (1e-12 * s).astype(x.dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, a)
            return jax.lax.fori_loop(0, reps, body, a0)

        f = jax.jit(lambda a0, *rest: jnp.sum(jnp.abs(
            jax.tree_util.tree_leaves(loop(a0, *rest))[0].astype(jnp.float32))))
        s = f(*args); float(s)
        t0 = time.time()
        s = f(*args); float(s)
        dt = (time.time() - t0 - 0.025) / reps
        print(f'B={B:5d} {name:32s} {dt * 1e3:9.2f} ms/call ({dt * 1e6 / B:7.2f} us/game)',
              flush=True)
        return dt

    for B in batches:
        x0, u_ws, _, _ = sample_duel_initial_conditions(sc, B, seed=0)
        u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
        x0 = jnp.asarray(x0, dtype)
        up = jnp.zeros((B, 4), dtype)
        l0 = jnp.ones((B, solver.n_c), dtype) * 0.1
        u0, x0, up, l0 = (jax.device_put(a, accel) for a in (u0, x0, up, l0))

        eval_full = jax.vmap(lambda u, l, x, p: solver.problem.evaluate(
            u, l, x, p, None, hessian=True))
        Q, q, G, g, _ = jax.jit(eval_full)(u0, l0, x0, up)
        Qh = jax.jit(jax.vmap(lambda Qi: regularized_convexification(Qi, 1e-3)))(Q)

        timed_loop('evaluate(+Q)', lambda u, l, x, p: eval_full(u, l, x, p),
                   (u0, l0, x0, up), B)
        timed_loop('conv eigh', lambda Qi: jax.vmap(
            lambda Qj: regularized_convexification(Qj, 1e-3))(Qi), (Q,), B)
        timed_loop('conv ns', lambda Qi: jax.vmap(
            lambda Qj: regularized_convexification(Qj, 1e-3, method='ns'))(Qi), (Q,), B)
        timed_loop('qp it25', lambda Qi, qi, Gi, gi: jax.vmap(
            lambda a, b, c, d: solve_qp(a, b, c, -d, tol=3e-7, max_iters=25))(
                Qi, qi, Gi, gi), (Qh, q, G, g), B)
        timed_loop('qp it12', lambda Qi, qi, Gi, gi: jax.vmap(
            lambda a, b, c, d: solve_qp(a, b, c, -d, tol=3e-7, max_iters=12))(
                Qi, qi, Gi, gi), (Qh, q, G, g), B)
        timed_loop('merit grid 20', lambda u, l, x, p: jax.vmap(
            lambda ui, li, xi, pi: jax.vmap(lambda al: solver.problem.merit_terms(
                ui + al * 0.01, li, xi, pi, None)[0].sum())(
                    jnp.linspace(0.1, 1.0, 20).astype(dtype)))(u, l, x, p),
            (u0, l0, x0, up), B)

        # one full flat round
        body = None
        def round_fn(c, x, p):
            nonlocal body
            if body is None:
                body = solver._make_round_body(x, p, None)
            return body(c)
        init = jax.jit(jax.vmap(lambda u, l: solver._init_flat_carry(u, l)))(u0, l0)
        timed_loop('flat round', lambda c, x, p: jax.vmap(
            lambda ci, xi, pi: solver._make_round_body(xi, pi, None)(ci))(c, x, p),
            (init, x0, up), B)


if __name__ == '__main__':
    main()

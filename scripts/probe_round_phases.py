#!/usr/bin/env python3
"""Decompose the flat-round cost at EXACT bench parameters, tunnel-corrected.

Each timed function is scalarized (sum-abs of outputs) and synced by pulling ONE scalar
to host; a null-op measured the same way gives the tunnel round-trip baseline, which is
subtracted.  Marginal cost per round comes from (32-round chunk - 8-round chunk) / 24.
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    B = int(os.environ.get('B', 256))
    N = int(os.environ.get('N', 25))
    import jax
    import jax.numpy as jnp
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    jax.config.update('jax_default_matmul_precision', 'highest')
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR')
    if cache:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    accel = jax.devices()[0]
    cpu = jax.devices('cpu')[0]
    jax.config.update('jax_default_device', cpu)

    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver

    sc, solver = build_bench_solver(horizon=N)
    dtype = solver.dtype
    u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0, device=accel)
    p = solver.params
    print(f'# batch={B} N={N} platform={accel.platform} conv={p.conv_method} '
          f'ls={p.line_search_iters} qp_iters={p.qp_max_iters} box={p.qp_box_split} '
          f'corr={p.qp_correctors}', flush=True)

    def scalarize(fn):
        def wrapped(*args):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.abs(jnp.asarray(l, jnp.float32))) for l in leaves
                       if l.size)
        return wrapped

    baseline = [0.0]

    def timeit(name, fn, *args, reps=3, raw=False):
        f = jax.jit(scalarize(fn))
        t0 = time.time()
        float(f(*args))
        compile_t = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            float(f(*args))
        dt = (time.time() - t0) / reps
        corr = dt - (0.0 if raw else baseline[0])
        print(f'{name:36s} {dt * 1e3:9.2f} ms  (net {corr * 1e3:9.2f} ms, '
              f'compile {compile_t:.1f}s)', flush=True)
        return dt

    baseline[0] = timeit('null (tunnel RT)', lambda u: u * 2.0, u0, reps=5, raw=True)

    prob = solver.problem
    eval_full = jax.vmap(lambda u, l, x, pp: prob.evaluate(u, l, x, pp, None,
                                                           hessian=True))
    timeit('evaluate (+Q)', eval_full, u0, l0, x0, up)

    Q, q, G, g, _ = jax.jit(eval_full)(u0, l0, x0, up)
    qp_fn = jax.vmap(lambda Qi, qi, Gi, gi: solver._qp(Qi, qi, Gi, gi))
    timeit('convexify+QP (bench cfg)', qp_fn, Q, q, G, g)

    from dgsqp_tpu.utils.math import regularized_convexification
    timeit('convexify only (ns)',
           jax.vmap(lambda Qi: regularized_convexification(Qi, p.reg, method='ns')), Q)

    du = 0.01 * jnp.ones_like(u0)
    s0 = jnp.minimum(0.0, g)
    grid = jax.vmap(lambda u, duu, l, s, x, pp: solver._grid_ls(
        jnp.asarray(True), u, duu, l, jnp.zeros_like(l), s, jnp.zeros_like(s),
        jnp.asarray(jnp.inf, dtype), jnp.asarray(0.0, dtype),
        jnp.asarray(1.0, dtype), x, pp, None))
    timeit(f'grid LS (W={p.line_search_iters})', grid, u0, du, l0, s0, x0, up)

    init_flat = jax.jit(jax.vmap(lambda u, l: solver._init_flat_carry(u, l)))(u0, l0)

    def rounds(n):
        return jax.vmap(lambda c, x, u_p: jax.lax.fori_loop(
            0, n, lambda i, cc: solver._make_round_body(x, u_p, None)(cc), c))

    t1 = timeit('flat rounds x1', rounds(1), init_flat, x0, up, reps=2)
    t8 = timeit('flat rounds x8', rounds(8), init_flat, x0, up, reps=2)
    t32 = timeit('flat rounds x32 (bench chunk)', rounds(32), init_flat, x0, up, reps=1)
    print(f'# marginal per round (32-8)/24: {(t32 - t8) / 24 * 1e3:.2f} ms', flush=True)
    print(f'# marginal per round (8-1)/7:  {(t8 - t1) / 7 * 1e3:.2f} ms', flush=True)


if __name__ == '__main__':
    main()

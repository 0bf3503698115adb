#!/usr/bin/env python3
"""Per-piece timing of one approximate-game SQP round at the bench config.

Times, at batch B on the current accelerator: evaluate(+Hessian), evaluate-lite,
the NS projection, the QP solve, the 10-point LS merit grid, and one 4-round chunk —
the data behind the approx-bench throughput work (docs/approx_convergence.md part 2).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    B = int(os.environ.get('B', 256))
    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_default_matmul_precision', 'highest')
    jax.config.update('jax_compilation_cache_dir',
                      str(Path(__file__).resolve().parent.parent / '.jax_cache'))
    cpu = jax.devices('cpu')[0]
    accel = jax.devices()[0]
    jax.config.update('jax_default_device', cpu)
    print(f'# platform={accel.platform} B={B}', file=sys.stderr, flush=True)

    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
    from dgsqp_tpu.utils.math import nearest_pd_ns

    sc, solver = build_bench_solver(horizon=25, solver_name='approx')
    u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0, device=accel)

    def timeit(name, fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])[:1]
        print(f'{name}: {(time.time() - t0) / reps * 1000:.1f} ms', flush=True)
        return out

    ev_h = jax.jit(jax.vmap(lambda u, l, x, p: solver._eval_full(u, l, x, p, None)[:4]))
    Q, q, G, g = timeit('evaluate+hessian', ev_h, u0, l0, x0, up)

    ev_l = jax.jit(jax.vmap(lambda u, l, x, p: solver._eval_lite(u, l, x, p, None)))
    timeit('evaluate lite', ev_l, u0, l0, x0, up)

    ns = jax.jit(lambda Q: nearest_pd_ns(Q, iters=30, safety=1e-5, equilibrate=True))
    timeit('ns30 projection', ns, Q)

    reg = jnp.asarray(1.0, solver.dtype)
    qp = jax.jit(jax.vmap(lambda Q, q, G, g: solver._qp(Q, q, G, g, reg)[0]))
    timeit('QP (bench conv path)', qp, Q, q, G, g)

    mu = jnp.ones((B,), solver.dtype)
    du = jnp.zeros_like(u0) + 0.01
    dl = jnp.zeros_like(l0)
    ss = jax.jit(jax.vmap(lambda gg: jnp.maximum(0.0, gg)))(g)
    mem = jnp.full((B,), 1e3, solver.dtype)
    ls = jax.jit(jax.vmap(
        lambda u, du, l, dl, s, mu, mm, x, p: solver._line_search(
            True, u, du, l, dl, s, mu, mm, x, p, None)))
    timeit(f'LS grid (W={solver.params.line_search_iters})',
           ls, u0, du, l0, dl, ss, mu, mem, x0, up)

    chunk = jax.jit(lambda c, x, p: solver._chunk_rounds(c, x, p)) \
        if hasattr(solver, '_chunk_rounds') else None
    print('# done', file=sys.stderr, flush=True)


if __name__ == '__main__':
    main()

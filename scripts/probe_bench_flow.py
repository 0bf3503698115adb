#!/usr/bin/env python3
"""Fine-grained timing of the exact bench flow: where does wall time go outside the
chunk programs?  Instruments solve_batch_chunked's stages with forced syncs."""
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
    u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0, device=accel)

    def run():
        res = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=8)
        jax.block_until_ready(res)
        return res

    t0 = time.time()
    res = run()
    print(f'# run1 (compile): {time.time() - t0:.1f}s', flush=True)
    for rep in range(3):
        t0 = time.time()
        res = run()
        total = time.time() - t0
        walls = [c.get('wall_s') for c in solver.last_chunk_history]
        print(f'# run{rep + 2}: total {total:.2f}s | chunk walls {walls} '
              f'(sum {sum(walls):.2f}s) | outside {total - sum(walls):.2f}s', flush=True)
    # force a REAL materialization and time it separately
    t0 = time.time()
    s = float(jnp.sum(res.u.astype(jnp.float32)))
    print(f'# pull res.u sum: {time.time() - t0:.2f}s', flush=True)


if __name__ == '__main__':
    main()

#!/usr/bin/env python3
"""Measure axon-tunnel dispatch/pull semantics for the chunked bench flow.

Questions this answers (round-4 throughput work, VERDICT items 3/9):
  * does dispatching a chunk program BLOCK on the tunnel, or is it async?
  * what does one status pull (device->host ~256 int32) cost?
  * wall time of k back-to-back dispatches + ONE final pull, vs k x (dispatch + pull)
    — i.e. the headroom of pipelined/deferred-status driving.

Usage: python scripts/probe_pipeline.py   (on the TPU; CPU smoke with DGSQP_PLATFORM=cpu)
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
    chunk = int(os.environ.get('CHUNK', 4))
    k = int(os.environ.get('K', 7))
    import jax
    import jax.numpy as jnp
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    jax.config.update('jax_default_matmul_precision', 'highest')
    cache_dir = os.environ.get('JAX_COMPILATION_CACHE_DIR',
                               str(Path(__file__).resolve().parent.parent / '.jax_cache'))
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
    accel = jax.devices()[0]
    cpu = jax.devices('cpu')[0]
    jax.config.update('jax_default_device', cpu)
    print(f'# platform={accel.platform} B={B} N={N} chunk={chunk} k={k}', flush=True)

    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver

    sc, solver = build_bench_solver(horizon=N)
    u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0, device=accel)

    # compile init + chunk programs (same jits solve_batch_chunked uses)
    t0 = time.time()
    solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=chunk, max_chunks=1,
                               compact=False)
    print(f'# compile+first chunk: {time.time() - t0:.1f}s', flush=True)
    chunk_fn, init_fn, _ = solver._flat_fns
    carry0 = init_fn(u0, l0)
    np.asarray(carry0.status)

    # --- A: dispatch+pull per chunk (current driver behavior)
    t0 = time.time()
    c = carry0
    walls = []
    for i in range(k):
        t1 = time.time()
        c = chunk_fn(c, x0, up)
        st = np.asarray(c.status)
        walls.append(round(time.time() - t1, 3))
    tA = time.time() - t0
    print(f'A dispatch+pull per chunk: total {tA:.2f}s walls={walls} running_end='
          f'{int((st == 0).sum())}', flush=True)

    # --- B: k back-to-back dispatches, one pull at the end
    t0 = time.time()
    c = carry0
    d_walls = []
    for i in range(k):
        t1 = time.time()
        c = chunk_fn(c, x0, up)
        d_walls.append(round(time.time() - t1, 3))
    t_disp = time.time() - t0
    st = np.asarray(c.status)
    tB = time.time() - t0
    print(f'B {k} dispatches then pull: dispatch loop {t_disp:.2f}s '
          f'(per-dispatch {d_walls}), total {tB:.2f}s running_end={int((st == 0).sum())}',
          flush=True)

    # --- C: pure status pull RTT (carry already resident)
    pulls = []
    for _ in range(5):
        t1 = time.time()
        np.asarray(c.status)
        pulls.append(round(time.time() - t1, 3))
    print(f'C status pull x5: {pulls}', flush=True)

    # --- D: tiny jitted op roundtrip (dispatch + pull of 1 scalar)
    f = jax.jit(lambda a: jnp.sum(a))
    s = f(c.l)
    float(s)
    rts = []
    for _ in range(5):
        t1 = time.time()
        float(f(c.l))
        rts.append(round(time.time() - t1, 3))
    print(f'D tiny jit dispatch+scalar pull x5: {rts}', flush=True)


if __name__ == '__main__':
    main()

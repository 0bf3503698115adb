#!/usr/bin/env python3
"""Time every host-side driver operation of the chunked bench flow, forced-synced.

probe_bench_flow showed ~6-8 s outside the chunk programs; this isolates which driver
ops (init, status pulls, harvest scatter, compaction gathers, transfers, finalize) eat
it under the axon tunnel.
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
    u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0, device=accel)

    def sync(x):
        jax.block_until_ready(x)
        # force a REAL pull of one scalar (block_until_ready alone can be a no-op
        # through the tunnel)
        leaf = jax.tree_util.tree_leaves(x)[0]
        float(jnp.sum(leaf.astype(jnp.float32)).block_until_ready()
              if hasattr(leaf, 'astype') else 0.0)
        return x

    times = {}

    def timed(name, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        sync(out)
        dt = time.time() - t0
        times[name] = times.get(name, 0.0) + dt
        return out

    # --- replicate _solve_batch_chunked_flat with per-op syncs
    flat_rounds = 32
    def chunk_rounds(c, x, u_p):
        body = solver._make_round_body(x, u_p, None)
        return jax.lax.fori_loop(0, flat_rounds, lambda i, cc: body(cc), c)
    chunk_fn = jax.jit(jax.vmap(chunk_rounds))
    init_fn = jax.jit(jax.vmap(lambda u, l: solver._init_flat_carry(u, l)))
    final_fn = jax.jit(jax.vmap(lambda c, x, u_p: solver._finalize(c, x, u_p, None)))

    @jax.jit
    def scatter_into(store, carry, scatter_idx):
        return jax.tree_util.tree_map(
            lambda s, c: s.at[scatter_idx].set(c, mode='drop'), store, carry)

    gather = jax.jit(lambda tree, idx: jax.tree_util.tree_map(lambda a: a[idx], tree))

    from dgsqp_tpu.solvers.dgsqp import RUNNING

    for rep in range(2):
        times.clear()
        t_total0 = time.time()
        carry = timed('init', init_fn, u0, l0)
        store = carry
        x0_all, up_all = x0, up
        x0_c, up_c = x0, up
        idx_h = np.arange(B)
        valid_h = np.ones(B, bool)
        for i in range(20):
            carry = timed(f'chunk{i}', chunk_fn, carry, x0_c, up_c)
            t0 = time.time()
            status_h = np.asarray(carry.status)
            times[f'statuspull{i}'] = time.time() - t0
            running = (status_h == RUNNING) & valid_h
            n_run = int(running.sum())
            if n_run == 0:
                sidx = jnp.asarray(np.where(valid_h, idx_h, B), jnp.int32)
                sidx = timed('put-final', jax.device_put, sidx, accel)
                store = timed('harvest-final', scatter_into, store, carry, sidx)
                break
            bucket = max(16, 1 << (n_run - 1).bit_length())
            if bucket <= valid_h.size // 2:
                sidx = jnp.asarray(np.where(valid_h, idx_h, B), jnp.int32)
                sidx = timed('put', jax.device_put, sidx, accel)
                store = timed('harvest', scatter_into, store, carry, sidx)
                sel = np.where(running)[0]
                pad = np.concatenate([sel, np.repeat(sel[:1], bucket - sel.size)])
                pad_dev = timed('put', jax.device_put, jnp.asarray(pad, jnp.int32), accel)
                carry = timed('gather-carry', gather, carry, pad_dev)
                idx_h = idx_h[pad]
                valid_h = np.zeros(bucket, bool)
                valid_h[:sel.size] = True
                idx_dev = timed('put', jax.device_put, jnp.asarray(idx_h, jnp.int32), accel)
                x0_c, up_c = timed('gather-args', gather, (x0_all, up_all), idx_dev)
        res = timed('final', final_fn, store, x0_all, up_all)
        total = time.time() - t_total0
        rows = ' | '.join(f'{k} {v:.2f}s' for k, v in times.items() if v > 0.05)
        print(f'# rep{rep}: total {total:.2f}s || {rows}', flush=True)


if __name__ == '__main__':
    main()

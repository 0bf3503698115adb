#!/usr/bin/env python3
"""Microbenchmark: TPU cost of sequential scan steps vs unrolled, at bench shapes.

The round-phase profile (scripts/profile_kernels.py) shows every phase containing the
N=25 rollout scan costs ~26-30 ms at batch 256 — latency-bound, not FLOPs-bound.  This
probe isolates (a) raw scan-step overhead, (b) the effect of ``unroll``, (c) the real
rollout and condensed evaluation with unrolled scans.
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
    accel = jax.devices()[0]
    cpu = jax.devices('cpu')[0]
    jax.config.update('jax_default_device', cpu)

    def timeit(name, fn, *args, reps=5):
        f = jax.jit(fn)
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(reps):
            out = f(*args)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        print(f'{name:44s} {dt * 1e3:9.2f} ms', flush=True)
        return out

    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (B, 12), jnp.float32), accel)
    u = jax.device_put(jax.random.normal(key, (B, N, 4), jnp.float32), accel)

    # (a) trivial 12-dim nonlinear step, scan vs unroll
    def step(c, uk):
        c2 = c + 0.01 * jnp.tanh(c * 1.1 + uk @ jnp.ones((4, 12), c.dtype))
        return c2, c2

    for unroll in (1, 5, 25):
        timeit(f'trivial scan N={N} unroll={unroll}',
               lambda xx, uu, r=unroll: jax.vmap(
                   lambda xi, ui: jax.lax.scan(step, xi, ui, unroll=r))(xx, uu), x, u)

    # batch-leading scan (no vmap of the scan; batch inside the step)
    def step_b(c, uk):
        c2 = c + 0.01 * jnp.tanh(c * 1.1 + uk @ jnp.ones((4, 12), c.dtype))
        return c2, c2

    timeit('trivial scan, batch-inside-step unroll=1',
           lambda xx, uu: jax.lax.scan(step_b, xx, jnp.swapaxes(uu, 0, 1)), x, u)

    # (b) the real model rollout
    from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
    sc, solver = build_bench_solver(horizon=N)
    u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0, device=accel)
    prob = solver.problem

    timeit('real rollout (current scan)',
           jax.vmap(lambda uu, xx: prob.rollout(uu, xx)), u0, x0)

    fd = prob.joint_dynamics.fd

    def rollout_unrolled(u_flat, x0_):
        u_mat = prob.u_to_stage(u_flat)
        xs = [x0_]
        for k in range(N):
            xs.append(fd(xs[-1], u_mat[k]))
        return jnp.stack(xs)

    timeit('real rollout (python-unrolled)',
           jax.vmap(rollout_unrolled), u0, x0)

    def rollout_scan_unroll(u_flat, x0_):
        u_mat = prob.u_to_stage(u_flat)
        _, xs = jax.lax.scan(lambda c, uk: (fd(c, uk),) * 2, x0_, u_mat, unroll=N)
        return jnp.concatenate([x0_[None], xs], 0)

    timeit('real rollout (scan unroll=N)',
           jax.vmap(rollout_scan_unroll), u0, x0)

    # (c) condensed evaluation with the unrolled rollout monkey-patched in
    orig = prob.rollout
    timeit('evaluate(+Q) current',
           jax.vmap(lambda uu, ll, xx, pp: prob.evaluate(uu, ll, xx, pp, None,
                                                         hessian=True)),
           u0, l0, x0, up)
    prob.rollout = rollout_unrolled
    timeit('evaluate(+Q) unrolled rollout',
           jax.vmap(lambda uu, ll, xx, pp: prob.evaluate(uu, ll, xx, pp, None,
                                                         hessian=True)),
           u0, l0, x0, up)
    prob.rollout = orig


if __name__ == '__main__':
    main()

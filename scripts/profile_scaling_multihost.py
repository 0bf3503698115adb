#!/usr/bin/env python3
"""Scaling-efficiency measurement: 1 device / 1 host (8-device mesh) / 2 processes.

Produces the BASELINE.md-required scaling table (``results/scaling_r3.json``): the same
chicane batch solved on (a) one CPU device, (b) one process with an 8-device CPU mesh,
(c) two processes with 4 devices each joined over jax.distributed (localhost fake-DCN) —
the N>=2-hosts tier, CPU-simulated because this environment exposes one real TPU chip.
The real-chip tier is taken from the driver's BENCH artifact (solves/s/chip on TPU).

Usage: python scripts/profile_scaling_multihost.py [--n 64] [--N 10] [--out results/scaling_r3.json]
"""
import argparse
import json
import os
import socket
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import numpy as np

_WORKER = r'''
import os, sys, json, time
pid = int(sys.argv[1]); port = sys.argv[2]; B = int(sys.argv[3]); N = int(sys.argv[4])
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from dgsqp_tpu.parallel.mesh import init_distributed
assert init_distributed(coordinator_address=f'localhost:{port}',
                        num_processes=2, process_id=pid)
assert len(jax.devices()) == 8
from jax.sharding import NamedSharding, PartitionSpec, Mesh
from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
sc, solver = build_bench_solver(horizon=N)
mesh = Mesh(np.array(jax.devices()), axis_names=('games',))
sharding = NamedSharding(mesh, PartitionSpec('games'))
u0, l0, x0, up = build_bench_batch(sc, solver, B, seed=0)
def put(a):
    a = np.asarray(a)
    local = a[pid * (B // 2):(pid + 1) * (B // 2)]
    return jax.make_array_from_process_local_data(sharding, local, a.shape)
u0, l0, x0, up = map(put, (u0, l0, x0, up))
def run():
    res = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=8)
    jax.block_until_ready(res)
    return res
res = run()
t0 = time.time(); res = run(); dur = time.time() - t0
conv = float(jnp.mean((res.status == 1).astype(jnp.float32)))
if pid == 0:
    print(json.dumps({'dur_s': dur, 'games_per_s': B / dur, 'conv': conv}), flush=True)
'''


def tier_single(n_devices: int, B: int, N: int):
    """Run a tier in a subprocess with n_devices virtual CPU devices, one process."""
    code = f'''
import os, json, time
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count={n_devices}'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
from dgsqp_tpu.parallel.mesh import games_mesh
from jax.sharding import NamedSharding, PartitionSpec
sc, solver = build_bench_solver(horizon={N})
u0, l0, x0, up = build_bench_batch(sc, solver, {B}, seed=0)
mesh = games_mesh()
sharding = NamedSharding(mesh, PartitionSpec('games'))
u0, l0, x0, up = (jax.device_put(a, sharding) for a in (u0, l0, x0, up))
def run():
    res = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=8)
    jax.block_until_ready(res)
    return res
res = run()
t0 = time.time(); res = run(); dur = time.time() - t0
conv = float(jnp.mean((res.status == 1).astype(jnp.float32)))
print(json.dumps({{'dur_s': dur, 'games_per_s': {B} / dur, 'conv': conv}}), flush=True)
'''
    out = subprocess.run([sys.executable, '-c', code], capture_output=True, text=True,
                         cwd=ROOT, timeout=2400)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def tier_two_process(B: int, N: int):
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen([sys.executable, '-c', _WORKER, str(pid), port,
                               str(B), str(N)],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                              text=True, cwd=ROOT)
             for pid in range(2)]
    outs = [p.communicate(timeout=2400) for p in procs]
    for p, (o, e) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(e[-2000:])
    return json.loads(outs[0][0].strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=64)
    ap.add_argument('--N', type=int, default=10)
    ap.add_argument('--out', default='results/scaling_r3.json')
    args = ap.parse_args()

    report = {'batch': args.n, 'horizon': args.N,
              'note': 'CPU-simulated tiers (virtual devices share host cores, so '
                      'parallel efficiency is bounded by core contention, not ICI/DCN); '
                      'the real-chip tier is the TPU BENCH artifact',
              'tiers': {}}
    t0 = time.time()
    report['tiers']['1_device'] = tier_single(1, args.n, args.N)
    print(f"# 1 device: {report['tiers']['1_device']}", flush=True)
    report['tiers']['1_host_8dev'] = tier_single(8, args.n, args.N)
    print(f"# 1 host x 8 dev: {report['tiers']['1_host_8dev']}", flush=True)
    report['tiers']['2_proc_4dev'] = tier_two_process(args.n, args.N)
    print(f"# 2 proc x 4 dev: {report['tiers']['2_proc_4dev']}", flush=True)

    g1 = report['tiers']['1_device']['games_per_s']
    g8 = report['tiers']['1_host_8dev']['games_per_s']
    g2p = report['tiers']['2_proc_4dev']['games_per_s']
    report['speedup_1host_vs_1dev'] = round(g8 / g1, 3)
    report['efficiency_1host'] = round(g8 / (8 * g1), 3)
    report['multihost_retention'] = round(g2p / g8, 3)   # 2-proc vs same-width 1-proc
    report['wall_s'] = round(time.time() - t0, 1)

    bench = ROOT / 'BENCH_r02.json'
    if bench.exists():
        try:
            report['tpu_1chip_solves_per_s'] = json.load(open(bench))['parsed']['value']
        except Exception:
            pass

    out = ROOT / args.out
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    main()

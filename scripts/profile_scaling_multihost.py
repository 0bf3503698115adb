#!/usr/bin/env python3
"""Scaling-efficiency measurement with core-pinned tiers (weak scaling).

Produces the BASELINE.md-required scaling table (``results/scaling_r4.json``).  The
virtual-device CPU mesh shares physical cores, so an unpinned "8 devices on 4 cores"
tier only measures core contention (r3 artifact: efficiency 0.087 — methodology, not
the framework).  Here every tier gets ONE physical core per device via ``taskset``,
and the per-device batch is fixed, so the tiers measure what actually changes at
scale: sharding overhead (tier b vs a) and the jax.distributed process boundary with
collective-free batch parallelism (tier c vs b).

  a) 1 device  x 1 core,  B games          — baseline
  b) 4 devices x 4 cores, 4B games, 1 proc — intra-process sharding (the ICI analog)
  c) 2 procs x 2 devices x 2 cores, 4B games over jax.distributed — the DCN analog

The real-chip tier is the driver's TPU BENCH artifact (solves/s/chip).

Usage: python scripts/profile_scaling_multihost.py [--per_dev 16] [--N 10]
       [--out results/scaling_r4.json]
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
n_dev = int(sys.argv[5])
os.environ['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n_dev}'
import numpy as np
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from dgsqp_tpu.parallel.mesh import init_distributed
assert init_distributed(coordinator_address=f'localhost:{port}',
                        num_processes=2, process_id=pid)
assert len(jax.devices()) == 2 * n_dev
from jax.sharding import NamedSharding, PartitionSpec, Mesh
from dgsqp_tpu.harness.bench_setup import build_bench_batch, build_bench_solver
sc, solver = build_bench_solver(horizon=N)
mesh = Mesh(np.array(jax.devices()), axis_names=('games',))
sharding = NamedSharding(mesh, PartitionSpec('games'))
# replicated per-device workload (see tier_single rep semantics)
u0, l0, x0, up = build_bench_batch(sc, solver, B // 4, seed=0)
u0, l0, x0, up = (jnp.concatenate([a] * 4) for a in (u0, l0, x0, up))
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


def _taskset(cpus: str):
    return ['taskset', '-c', cpus] if cpus else []


def tier_single(n_devices: int, B: int, N: int, cpus: str, rep: int = 1):
    """One process, ``n_devices`` virtual CPU devices, pinned to ``cpus``.

    ``rep>1`` replicates a ``B/rep``-game draw ``rep`` times so every device
    solves the IDENTICAL per-device workload (weak scaling without changing the
    instance mix — a larger fresh draw adds stragglers the 1-device tier never
    sees and measures instance hardness instead of scaling overhead)."""
    code = '''
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
u0, l0, x0, up = build_bench_batch(sc, solver, {B_draw}, seed=0)
if {rep} > 1:
    u0, l0, x0, up = (jnp.concatenate([a] * {rep}) for a in (u0, l0, x0, up))
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
print(json.dumps({'dur_s': dur, 'games_per_s': {B} / dur, 'conv': conv}), flush=True)
'''
    code = code.replace('{B_draw}', str(B // rep)).replace('{rep}', str(rep)).replace('{B}', str(B)).replace('{N}', str(N)).replace('{n_devices}', str(n_devices))
    out = subprocess.run(_taskset(cpus) + [sys.executable, '-c', code],
                         capture_output=True, text=True, cwd=ROOT, timeout=2400)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def tier_two_process(B: int, N: int, dev_per_proc: int, cpu_sets):
    """Two jax.distributed processes, each pinned to its own disjoint core set."""
    with socket.socket() as s:
        s.bind(('localhost', 0))
        port = str(s.getsockname()[1])
    procs = [subprocess.Popen(_taskset(cpu_sets[pid]) + [sys.executable, '-c', _WORKER,
                              str(pid), port, str(B), str(N), str(dev_per_proc)],
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
    ap.add_argument('--per_dev', type=int, default=16, help='games per device')
    ap.add_argument('--N', type=int, default=10)
    ap.add_argument('--out', default='results/scaling_r4.json')
    args = ap.parse_args()

    n_cores = os.cpu_count() or 4
    if n_cores < 4:
        print(f'WARNING: {n_cores} cores < 4; tiers will contend', file=sys.stderr)
    B1 = args.per_dev
    B4 = 4 * args.per_dev

    report = {'games_per_device': args.per_dev, 'horizon': args.N,
              'note': 'core-pinned weak scaling: one physical core per virtual device '
                      'in every tier, per-device batch fixed; tier b/a = sharding '
                      'overhead, tier c/b = jax.distributed process boundary; the '
                      'real-chip tier is the TPU BENCH artifact',
              'tiers': {}}
    t0 = time.time()
    report['tiers']['1_device_1core'] = tier_single(1, B1, args.N, '0')
    print(f"# a) 1 dev x 1 core: {report['tiers']['1_device_1core']}", flush=True)
    report['tiers']['4_devices_4cores'] = tier_single(4, B4, args.N, '0-3', rep=4)
    print(f"# b) 4 dev x 4 cores: {report['tiers']['4_devices_4cores']}", flush=True)
    report['tiers']['2proc_x_2dev'] = tier_two_process(B4, args.N, 2, ['0-1', '2-3'])
    print(f"# c) 2 proc x 2 dev x 2 cores: {report['tiers']['2proc_x_2dev']}", flush=True)

    g1 = report['tiers']['1_device_1core']['games_per_s']
    g4 = report['tiers']['4_devices_4cores']['games_per_s']
    g2p = report['tiers']['2proc_x_2dev']['games_per_s']
    report['speedup_4dev_vs_1dev'] = round(g4 / g1, 3)
    report['efficiency_4dev'] = round(g4 / (4 * g1), 3)
    report['multihost_retention'] = round(g2p / g4, 3)   # 2-proc vs same-width 1-proc
    report['wall_s'] = round(time.time() - t0, 1)

    for tag in ('BENCH_r03.json', 'BENCH_r02.json'):
        bench = ROOT / tag
        if bench.exists():
            try:
                report['tpu_1chip_solves_per_s'] = json.load(open(bench))['parsed']['value']
                break
            except Exception:
                pass

    out = ROOT / args.out
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == '__main__':
    main()

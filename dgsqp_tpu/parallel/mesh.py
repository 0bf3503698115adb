"""Device-mesh helpers: shard game batches across chips, aggregate statistics.

The reference scales Monte-Carlo studies with sequential shell loops over single-process
python runs (``scripts/comparison_study_barc/run_kinematic_study.sh``).  Here the batch of
games IS the parallel axis: a 1-D ``games`` mesh over all available devices, batch arrays
sharded over it, and the vmapped solver jitted with explicit shardings so each chip solves
its shard in lockstep.  Convergence statistics come back as replicated scalars (XLA inserts
the cross-chip reductions).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize ``jax.distributed`` for multi-host (N>=2 processes) execution.

    Multi-host is the framework's third scaling tier (BASELINE.md: 1 chip / 1 host /
    N>=2 hosts): each host runs one process, ``jax.devices()`` becomes the GLOBAL device
    list, and the 1-D ``games`` mesh spans hosts — game batches shard over ICI within a
    host and DCN across hosts, with XLA inserting the cross-host collectives for the
    replicated convergence statistics.

    Arguments default to the standard env vars (``DGSQP_COORDINATOR``,
    ``DGSQP_NUM_PROCESSES``, ``DGSQP_PROCESS_ID``; TPU pods can omit all three and use
    JAX's automatic cluster detection).  Returns True if distributed mode was
    initialized, False for single-process runs (no env set).
    """
    coordinator_address = coordinator_address or os.environ.get('DGSQP_COORDINATOR')
    if num_processes is None and os.environ.get('DGSQP_NUM_PROCESSES'):
        num_processes = int(os.environ['DGSQP_NUM_PROCESSES'])
    if process_id is None and os.environ.get('DGSQP_PROCESS_ID'):
        process_id = int(os.environ['DGSQP_PROCESS_ID'])
    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)
    return True


def games_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D ``games`` mesh over the GLOBAL device list (spans hosts under
    ``jax.distributed``)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=('games',))


def shard_batch(mesh: Mesh, arr: np.ndarray):
    """Place a batch array onto the mesh's ``games`` axis, multi-host aware.

    Single-process: a plain ``device_put`` with a NamedSharding.  Multi-process: ``arr``
    is the PROCESS-LOCAL shard (this host's games) and the returned value is the global
    sharded array assembled via ``jax.make_array_from_process_local_data`` — the
    standard multi-host ingestion path (each host feeds only its own games).
    """
    sharding = NamedSharding(mesh, P('games'))
    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(arr), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr))


def pad_to_multiple(arr: np.ndarray, multiple: int):
    """Pad the batch axis up to a multiple (games per chip must divide evenly); returns
    (padded, original_length)."""
    b = arr.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return arr, b
    pad = np.repeat(arr[-1:], rem, axis=0)
    return np.concatenate([arr, pad], axis=0), b


def sharded_batch_solve(solve_core, mesh: Mesh, *batch_args):
    """jit a vmapped ``solve_core`` with the batch axis sharded over ``mesh``.

    ``batch_args`` are host arrays with leading batch axis divisible by mesh size.
    Returns the solver result pytree (sharded; index it on host as usual).
    """
    sharding = NamedSharding(mesh, P('games'))
    fn = jax.jit(jax.vmap(solve_core),
                 in_shardings=tuple(sharding for _ in batch_args),
                 out_shardings=sharding)
    placed = [jax.device_put(a, sharding) for a in batch_args]
    return fn(*placed)


def convergence_stats(statuses: jnp.ndarray):
    """Fleet-wide convergence statistics (the in-loop analogue of the reference's offline
    ``analyze_data.py`` aggregation)."""
    conv = (statuses == 1) | (statuses == 2)
    return dict(total=int(statuses.shape[0]),
                converged=int(jnp.sum(conv)),
                rate=float(jnp.mean(conv.astype(jnp.float32))))

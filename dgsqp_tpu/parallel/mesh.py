"""Device-mesh helpers: shard game batches across chips, aggregate statistics.

The reference scales Monte-Carlo studies with sequential shell loops over single-process
python runs (``scripts/comparison_study_barc/run_kinematic_study.sh``).  Here the batch of
games IS the parallel axis: a 1-D ``games`` mesh over all available devices, batch arrays
sharded over it, and the vmapped solver jitted with explicit shardings so each chip solves
its shard in lockstep.  Convergence statistics come back as replicated scalars (XLA inserts
the cross-chip reductions).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def games_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=('games',))


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

"""Generic chunked batch execution with host-side straggler compaction.

All lockstep batched solvers share the same host loop: run a short jitted chunk of
iterations, harvest finished games into a host-side store, compact the still-running
stragglers into a smaller power-of-two batch, repeat.  The Monte-Carlo tail then costs
compute proportional to the number of games still solving instead of the original batch
size — the batched answer to the reference's one-process-per-sample scheduling
(``scripts/comparison_study_barc/monte_carlo_main.py``).

Used by ``DGSQP`` (flat round machine) and ``DGSQPV2`` (whose NMS body is already a
fixed-signature round).  Compaction is skipped when inputs are sharded over multiple
devices — SPMD runs keep their static layout (per-shard compaction is the documented
follow-up).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _multi_device(a) -> bool:
    sh = getattr(a, 'sharding', None)
    return sh is not None and len(getattr(sh, 'device_set', ())) > 1


def run_chunked_compacted(carry, x0, up, chunk_fn: Callable, *,
                          running_status: int, status_field: str = 'status',
                          max_chunks: int, min_bucket: int = 16,
                          can_compact: Optional[bool] = None,
                          verbose: bool = False, print_method=print):
    """Drive ``chunk_fn(carry, x0, up) -> carry`` to completion with compaction.

    ``carry`` is a batched NamedTuple pytree whose ``status_field`` leaf holds per-game
    int status codes (``running_status`` = still-solving).  Returns ``(final_carry,
    x0_full, up_full, history)`` where ``final_carry`` is re-assembled in the ORIGINAL
    batch order on the input device.
    """
    first_leaf = jax.tree_util.tree_leaves(carry)[0]
    if can_compact is None:
        can_compact = not any(_multi_device(a) for a in (first_leaf, x0, up))

    # Multi-host (jax.distributed) arrays are not fully addressable from any one
    # process: no host-side harvest/compaction is possible, so run the plain chunk
    # loop with a device-side (replicated) running count and return the sharded carry.
    if not getattr(first_leaf, 'is_fully_addressable', True):
        history = []
        for i in range(max_chunks):
            carry = chunk_fn(carry, x0, up)
            n_run = int(jnp.sum(getattr(carry, status_field) == running_status))
            history.append(dict(chunk=i, running=n_run, batch=-1))
            if verbose:
                print_method(f'chunk {i}: {n_run} games still running (multi-host)')
            if n_run == 0:
                break
        return carry, x0, up, history

    B0 = np.asarray(getattr(carry, status_field)).shape[0]
    try:
        target_dev = list(first_leaf.devices())[0]
    except Exception:
        target_dev = None

    def to_dev(a):
        return jax.device_put(a, target_dev) if target_dev is not None \
            else jnp.asarray(a)

    x0_h = np.asarray(x0)
    up_h = np.asarray(up)
    store = jax.tree_util.tree_map(lambda a: np.array(a), carry)  # writable copies
    idx = np.arange(B0)              # original game index of each live slot
    valid = np.ones(B0, bool)        # live slot holds a real (non-pad) game
    x0_c, up_c = jnp.asarray(x0), jnp.asarray(up)
    history = []

    def harvest(carry):
        carry_h = jax.tree_util.tree_map(np.asarray, carry)
        for s_leaf, c_leaf in zip(store, carry_h):
            s_leaf[idx[valid]] = c_leaf[valid]
        return carry_h

    for i in range(max_chunks):
        carry = chunk_fn(carry, x0_c, up_c)
        status_h = np.asarray(getattr(carry, status_field))
        running = (status_h == running_status) & valid
        n_run = int(running.sum())
        history.append(dict(chunk=i, running=n_run, batch=int(valid.size)))
        if verbose:
            print_method(f'chunk {i}: {n_run} games still running (batch {valid.size})')
        if n_run == 0:
            harvest(carry)
            break
        bucket = max(min_bucket, 1 << (n_run - 1).bit_length())
        if can_compact and bucket <= valid.size // 2:
            carry_h = harvest(carry)
            sel = np.where(running)[0]
            pad = np.concatenate([sel, np.repeat(sel[:1], bucket - sel.size)])
            carry = jax.tree_util.tree_map(lambda a: to_dev(a[pad]), carry_h)
            idx = idx[pad]
            valid = np.zeros(bucket, bool)
            valid[:sel.size] = True
            x0_c = to_dev(x0_h[idx])
            up_c = to_dev(up_h[idx])
    else:
        harvest(carry)

    final_carry = jax.tree_util.tree_map(to_dev, type(carry)(*store))
    return final_carry, to_dev(x0_h), to_dev(up_h), history

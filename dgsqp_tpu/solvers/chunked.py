"""Generic chunked batch execution with host-side straggler compaction.

All lockstep batched solvers share the same host loop: run a short jitted chunk of
iterations, harvest finished games into a host-side store, compact the still-running
stragglers into a smaller power-of-two batch, repeat.  The Monte-Carlo tail then costs
compute proportional to the number of games still solving instead of the original batch
size — the batched answer to the reference's one-process-per-sample scheduling
(``scripts/comparison_study_barc/monte_carlo_main.py``).

Used by ``DGSQP`` (flat round machine) and ``DGSQPV2`` (whose NMS body is already a
fixed-signature round).  Single-host SPMD batches (a ``NamedSharding`` over a device
mesh) compact GLOBALLY: the straggler gather is jitted with explicit ``out_shardings``
so the smaller bucket is re-sharded evenly over the same mesh (the compaction bucket is
rounded up to a multiple of the device count).  Only multi-host (``jax.distributed``)
arrays — not fully addressable from one process — fall back to the fixed-layout loop.
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec


def _multi_device(a) -> bool:
    sh = getattr(a, 'sharding', None)
    return sh is not None and len(getattr(sh, 'device_set', ())) > 1


def _batch_sharding(*arrays) -> Optional[NamedSharding]:
    """A rank-1 NamedSharding over the batch axis, if any input is mesh-sharded.

    Normalized to ``P(<batch axis name>)`` so it is valid as ``out_shardings`` for
    every carry leaf regardless of rank (a caller's ``P('games', None)`` spec would
    otherwise fail to apply to rank-1 leaves)."""
    for a in arrays:
        sh = getattr(a, 'sharding', None)
        if isinstance(sh, NamedSharding) and len(sh.device_set) > 1:
            spec = sh.spec
            axis = spec[0] if len(spec) else None
            if axis is None:
                continue            # replicated / batch axis unsharded: no mesh layout
            return NamedSharding(sh.mesh, PartitionSpec(axis))
    return None


def run_chunked_compacted(carry, x0, up, chunk_fn: Callable, *,
                          final_fn: Callable,
                          running_status: int, status_field: str = 'status',
                          max_chunks: int, min_bucket: int = 16,
                          can_compact: Optional[bool] = None,
                          verbose: bool = False, print_method=print):
    """Drive ``chunk_fn(carry, x0, up) -> carry`` to completion with compaction.

    ``carry`` is a batched NamedTuple pytree whose ``status_field`` leaf holds per-game
    int status codes (``running_status`` = still-solving).  ``final_fn(carry, x0, up)``
    extracts the (much smaller) per-game result pytree from a carry.  Returns
    ``(result, history)`` where ``result`` is in the ORIGINAL batch order.
    """
    first_leaf = jax.tree_util.tree_leaves(carry)[0]
    batch_sh = _batch_sharding(x0, first_leaf)
    if can_compact is None:
        # single-device batches always compact; mesh-sharded batches compact when the
        # mesh is known (NamedSharding) so the bucket can be re-sharded explicitly
        can_compact = (not any(_multi_device(a) for a in (first_leaf, x0, up))
                       or batch_sh is not None)

    # Fixed-layout fallback — no harvest/compaction, the carry keeps its sharding:
    #   * multi-host (jax.distributed) arrays: not fully addressable from one process;
    #   * multi-device batches with a non-NamedSharding (no mesh to re-shard against);
    #   * callers that force can_compact=False (remote-tunnel configurations where
    #     each compaction event costs more than the masked compute it saves).
    if (not getattr(first_leaf, 'is_fully_addressable', True)
            or not can_compact):
        history = []
        for i in range(max_chunks):
            carry = chunk_fn(carry, x0, up)
            n_run = int(jnp.sum(getattr(carry, status_field) == running_status))
            history.append(dict(chunk=i, running=n_run, batch=-1))
            if verbose:
                print_method(f'chunk {i}: {n_run} games still running (fixed layout)')
            if n_run == 0:
                break
        return final_fn(carry, x0, up), history

    B0 = int(getattr(carry, status_field).shape[0])
    if batch_sh is None:
        # Single-device batches: fully device-resident compaction with a RESULTS
        # store.  Harvesting full carries through a dynamic-index scatter serializes
        # one row-DMA per batch row per pytree leaf on TPU (~1.5 s per event at
        # bucket 128-256, measured 2026-08-20); instead each compaction event
        # finalizes the current bucket (small result pytree) and merges finished
        # games into a dense result store with gather + where only.
        return _run_chunked_device_compacted(
            carry, x0, up, chunk_fn, final_fn, running_status=running_status,
            status_field=status_field, max_chunks=max_chunks,
            min_bucket=min_bucket, verbose=verbose, print_method=print_method)
    n_dev = 1
    if batch_sh is not None:
        # mesh-sharded batch: index vectors ride REPLICATED over the same mesh (a
        # single-device placement here breaks the jitted scatter/gather), and the
        # compacted bucket re-shards over the batch axis via explicit out_shardings
        n_dev = len(batch_sh.device_set)
        rep_sh = NamedSharding(batch_sh.mesh, PartitionSpec())

        def to_dev(a):
            return jax.device_put(a, rep_sh)
    else:
        try:
            target_dev = list(first_leaf.devices())[0]
        except Exception:
            target_dev = None

        def to_dev(a):
            return jax.device_put(a, target_dev) if target_dev is not None \
                else jnp.asarray(a)

    # Everything bulky stays ON DEVICE: the store is scatter-updated there, compaction is
    # a device-side gather, and the host only ever reads the per-game STATUS bytes (under
    # the axon tunnel every host<->device copy is a network hop — harvesting full carries
    # through numpy dominated the solve wall-clock before this).  Each compaction event is
    # ONE fused index upload + ONE jitted call (harvest scatter + carry gather + args
    # gather together): the unfused version cost 3 uploads + 3 dispatches, ~0.25 s each
    # through the tunnel (scripts/probe_driver_ops.py measurements).
    store = carry
    x0_all, up_all = jnp.asarray(x0), jnp.asarray(up)
    x0_c, up_c = x0_all, up_all
    idx_h = np.arange(B0)            # original game index of each live slot (host)
    valid_h = np.ones(B0, bool)      # live slot holds a real (non-pad) game (host)
    history = []

    @jax.jit
    def scatter_into(store, carry, scatter_idx):
        # invalid slots carry index B0 -> dropped by out-of-bounds scatter semantics
        return jax.tree_util.tree_map(
            lambda s, c: s.at[scatter_idx].set(c, mode='drop'), store, carry)

    def _compact(store, carry, x0_all, up_all, packed):
        """packed = [scatter_idx (cur_size) | pad slots (bucket) | new orig idx (bucket)]."""
        cur_size = jax.tree_util.tree_leaves(carry)[0].shape[0]
        scatter_idx = packed[:cur_size]
        bucket = (packed.shape[0] - cur_size) // 2
        pad = packed[cur_size:cur_size + bucket]
        new_idx = packed[cur_size + bucket:]
        store = jax.tree_util.tree_map(
            lambda s, c: s.at[scatter_idx].set(c, mode='drop'), store, carry)
        carry = jax.tree_util.tree_map(lambda a: a[pad], carry)
        # padding slots carry new_idx == B0: clamped gather reads game B0-1's args,
        # harmless (their carry slots are pad duplicates never harvested)
        args = jax.tree_util.tree_map(
            lambda a: a[jnp.minimum(new_idx, B0 - 1)], (x0_all, up_all))
        return store, carry, args[0], args[1]

    if batch_sh is not None:
        # compacted bucket re-shards evenly over the mesh's batch axis; the harvest
        # store keeps the full-batch sharding
        compact = jax.jit(_compact, out_shardings=(None, batch_sh, batch_sh, batch_sh))
    else:
        compact = jax.jit(_compact)

    def harvest(carry):
        scatter_idx = to_dev(jnp.asarray(np.where(valid_h, idx_h, B0), jnp.int32))
        return scatter_into(store, carry, scatter_idx)

    import time as _time
    compacted = False
    for i in range(max_chunks):
        _t0 = _time.time()
        carry = chunk_fn(carry, x0_c, up_c)
        status_h = np.asarray(getattr(carry, status_field))   # tiny transfer
        running = (status_h == running_status) & valid_h
        n_run = int(running.sum())
        history.append(dict(chunk=i, running=n_run, batch=int(valid_h.size),
                            wall_s=round(_time.time() - _t0, 3)))
        if verbose:
            print_method(f'chunk {i}: {n_run} games still running (batch {valid_h.size})')
        if n_run == 0:
            # never compacted => the carry IS the store in original order: skip the
            # harvest scatter (one upload + one dispatch through the tunnel)
            store = harvest(carry) if compacted else carry
            break
        bucket = max(min_bucket, 1 << (n_run - 1).bit_length())
        bucket = -(-bucket // n_dev) * n_dev     # divisible by the mesh size
        if can_compact and bucket <= valid_h.size // 2:
            compacted = True
            sel = np.where(running)[0]
            pad = np.concatenate([sel, np.repeat(sel[:1], bucket - sel.size)])
            scatter_idx = np.where(valid_h, idx_h, B0)
            idx_h = idx_h[pad]
            new_idx = idx_h.copy()
            valid_h = np.zeros(bucket, bool)
            valid_h[:sel.size] = True
            new_idx[sel.size:] = B0
            packed = to_dev(jnp.asarray(
                np.concatenate([scatter_idx, pad, new_idx]), jnp.int32))
            store, carry, x0_c, up_c = compact(store, carry, x0_all, up_all, packed)
    else:
        # max_chunks exhausted with games still running
        store = harvest(carry) if compacted else carry

    return final_fn(store, x0_all, up_all), history


def _run_chunked_device_compacted(carry, x0, up, chunk_fn, final_fn, *,
                                  running_status: int, status_field: str,
                                  max_chunks: int, min_bucket: int,
                                  verbose: bool, print_method=print):
    """Single-device chunk driver: device-resident compaction via a RESULTS store.

    The live-slot bookkeeping (original index per slot, valid mask) lives on the
    device alongside the carry.  A compaction event is ONE jitted dispatch that
    (a) finalizes the current bucket with ``final_fn`` (the result pytree is tiny
    compared to the carry — no Q/G Hessian leaves), (b) merges finished games into
    a dense full-batch result store using gather + where (dynamic-index SCATTER of
    large leaves serializes row-DMAs on TPU: ~1.5 s per event at bucket 128-256,
    vs ~0.1 s for this merge), and (c) gathers the stragglers into a smaller
    power-of-two bucket with re-gathered (x0, up) args.  The host only pulls the
    per-game status bytes between chunks and the tiny idx/valid vectors after a
    compaction; there are no host->device uploads at all.
    """
    import time as _time

    B0 = int(getattr(carry, status_field).shape[0])
    x0_all, up_all = jnp.asarray(x0), jnp.asarray(up)
    x0_c, up_c = x0_all, up_all
    idx_d = jnp.arange(B0, dtype=jnp.int32)
    valid_d = jnp.ones(B0, bool)
    valid_h = np.ones(B0, bool)
    history = []
    compacted = False
    # dense result store, filled by merges (every valid game is merged exactly once
    # as finished, or by the final take-all merge)
    res_shapes = jax.eval_shape(final_fn, carry, x0_all, up_all)
    res_store = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), res_shapes)

    def merge_dev(res_store, carry, idx, valid, x0_c, up_c, x0_all, up_all,
                  k: int, take_all: bool):
        status = getattr(carry, status_field)
        running = (status == running_status) & valid
        res_b = final_fn(carry, x0_c, up_c)
        harvestable = valid & (jnp.ones_like(running) if take_all else ~running)
        midx = jnp.where(valid, idx, B0)
        take = jnp.zeros(B0 + 1, bool).at[midx].set(harvestable, mode='drop')[:B0]
        inv = jnp.zeros(B0 + 1, jnp.int32).at[midx].set(
            jnp.arange(idx.shape[0], dtype=jnp.int32), mode='drop')[:B0]
        res_store = jax.tree_util.tree_map(
            lambda s, r: jnp.where(take.reshape((B0,) + (1,) * (r.ndim - 1)),
                                   r[inv], s),
            res_store, res_b)
        # stable sort on ~running: running slots first, original slot order kept
        order = jnp.argsort(~running, stable=True)
        sel = order[:k]
        new_carry = jax.tree_util.tree_map(lambda a: a[sel], carry)
        new_idx = idx[sel]
        new_valid = running[sel]
        safe = jnp.where(new_valid, new_idx, 0)
        return res_store, new_carry, new_idx, new_valid, x0_all[safe], up_all[safe]

    merge_jit = jax.jit(merge_dev, static_argnums=(8, 9))
    # NOTE on a rejected design: fusing the merge into the next chunk's program
    # (one dispatch per chunk) was measured WORSE through the axon tunnel — the
    # enlarged executables overflow the server-side executable cache and get
    # reloaded on every call (12-47 s per fused call, 2026-08-20).  The separate
    # merge dispatch costs a steady ~0.6 s/event instead.

    for i in range(max_chunks):
        _t0 = _time.time()
        carry = chunk_fn(carry, x0_c, up_c)
        status_h = np.asarray(getattr(carry, status_field))   # tiny transfer
        running = (status_h == running_status) & valid_h
        n_run = int(running.sum())
        history.append(dict(chunk=i, running=n_run, batch=int(valid_h.size),
                            wall_s=round(_time.time() - _t0, 3)))
        if verbose:
            print_method(f'chunk {i}: {n_run} games still running '
                         f'(batch {valid_h.size})')
        if n_run == 0:
            break
        bucket = max(min_bucket, 1 << (n_run - 1).bit_length())
        if bucket <= valid_h.size // 2:
            compacted = True
            _tc = _time.time()
            res_store, carry, idx_d, valid_d, x0_c, up_c = merge_jit(
                res_store, carry, idx_d, valid_d, x0_c, up_c, x0_all, up_all,
                bucket, False)
            valid_h = np.asarray(valid_d)
            history[-1]['compact_s'] = round(_time.time() - _tc, 3)

    if not compacted:
        # carry is still the full batch in original order: finalize directly
        return final_fn(carry, x0_all, up_all), history
    # merge the last bucket (including any still-running games at chunk exhaustion)
    res_store, *_ = merge_jit(res_store, carry, idx_d, valid_d, x0_c, up_c,
                              x0_all, up_all, 1, True)
    return res_store, history

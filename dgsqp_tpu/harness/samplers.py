"""Monte-Carlo initial-condition samplers with rejection, vectorized.

Mirrors the reference sampling logic (``DGSQP_ALGAMES_monte_carlo_chicane.py:384-467``,
``comparison_study_barc/monte_carlo_sampler.py:22-52``): ego sampled on the first track
segment, target placed at ring distance ``1.2*obs_d`` around the ego, rejection on
off-track placement and on warm-start trajectory collision.  Vectorized: candidate batches
are drawn, warm-started in one vmap, filtered, and topped up until the requested count.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.harness.warm_start import duel_warm_start


def sample_duel_initial_conditions(scenario, num_samples: int, seed: int = 0,
                                   max_rounds: int = 50):
    """Draw ``num_samples`` accepted (x0_joint, u_ws, v_refs, lat_refs) tuples.

    Returns arrays:
        x0     (B, n_q)  joint initial states (global xy filled from Frenet pose)
        u_ws   (B, N, n_u) PID warm-start input sequences (stage-ordered)
        v_ref  (B, 2), lat_ref (B, 2)
    """
    track = scenario.track
    first_seg_len = float(scenario.track.cl_segs[0, 0])
    hw = scenario.half_width
    obs_d = scenario.obs_d
    rng = np.random.default_rng(seed)

    ws_batch = jax.jit(jax.vmap(
        lambda q0, vr, lr: duel_warm_start(scenario, q0, vr, lr)))

    xs, us, vrs, lrs = [], [], [], []
    need = num_samples
    for _ in range(max_rounds):
        B = max(2 * need, 8)
        ego_s = np.maximum(0.1, rng.random(B) * first_seg_len)
        ego_ey = rng.random(B) * hw * 2 - hw
        ego_v = rng.random(B) + 2
        d = 2 * np.pi * rng.random(B)
        tar_s = ego_s + 1.2 * obs_d * np.cos(d)
        tar_ey = ego_ey + 1.2 * obs_d * np.sin(d)
        tar_v = rng.random(B) + 2
        geo_ok = (tar_s >= 0) & (np.abs(tar_ey) <= hw)

        ego_xyp = np.asarray(track.local_to_global(
            np.stack([ego_s, ego_ey, np.zeros(B)], axis=-1)))
        tar_xyp = np.asarray(track.local_to_global(
            np.stack([tar_s, tar_ey, np.zeros(B)], axis=-1)))
        # joint state per agent: [x, y, v, e_psi, s, x_tran]
        x0 = np.stack([ego_xyp[:, 0], ego_xyp[:, 1], ego_v, np.zeros(B), ego_s, ego_ey,
                       tar_xyp[:, 0], tar_xyp[:, 1], tar_v, np.zeros(B), tar_s, tar_ey],
                      axis=-1)
        v_ref = np.stack([ego_v, tar_v], axis=-1)
        lat_ref = np.stack([ego_ey, tar_ey], axis=-1)

        u_ws, q_ws, collision = ws_batch(jnp.asarray(x0), jnp.asarray(v_ref),
                                         jnp.asarray(lat_ref))
        ok = geo_ok & ~np.asarray(collision)
        idx = np.where(ok)[0][:need]
        if idx.size:
            xs.append(x0[idx])
            us.append(np.asarray(u_ws)[idx])
            vrs.append(v_ref[idx])
            lrs.append(lat_ref[idx])
            need -= idx.size
        if need == 0:
            break
    if need > 0:
        raise RuntimeError(f'Sampler failed to draw {num_samples} valid ICs '
                           f'({need} missing after {max_rounds} rounds)')
    return (np.concatenate(xs), np.concatenate(us),
            np.concatenate(vrs), np.concatenate(lrs))

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

from dgsqp_tpu.harness.warm_start import (duel_warm_start, pa_twins, pa_warm_start,
                                           pid_warm_start)


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

    twins = pa_twins(scenario)
    if twins is None:
        ws_batch = jax.jit(jax.vmap(
            lambda q0, vr, lr: duel_warm_start(scenario, q0, vr, lr)))
    else:
        # progress-augmented scenario: PID rolls on combined twins; the returned x0 is
        # converted to the PA layout inside pa_warm_start
        def _pa(q0, vr, lr):
            u_ws, x0_pa, coll = pa_warm_start(scenario, twins, q0, vr, lr)
            return u_ws, x0_pa, coll
        ws_batch = jax.jit(jax.vmap(_pa))

    xs, us, vrs, lrs = [], [], [], []
    need = num_samples
    # fixed candidate batch (see sample_agents_initial_conditions: variable B
    # re-compiles the warm-start rollout every round)
    B = max(2 * num_samples, 8)
    for _ in range(max_rounds):
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
        if twins is not None:
            x0 = np.asarray(q_ws)       # pa_warm_start returns the PA-layout x0 here
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


def sample_agents_initial_conditions(scenario, num_samples: int, seed: int = 0,
                                     max_rounds: int = 400):
    """IC sampler for the M-agent scaling study (``DGSQP_monte_carlo_agents.py:262-310``):
    every agent placed independently on the first track segment, PID warm start, pairwise
    collision rejection."""
    track = scenario.track
    M = scenario.joint_model.n_a
    first_seg_len = float(track.cl_segs[0, 0])
    hw = scenario.half_width
    rng = np.random.default_rng(seed)

    ws_batch = jax.jit(jax.vmap(
        lambda q0, vr, lr: pid_warm_start(scenario, q0, vr, lr)))

    xs, us, vrs, lrs = [], [], [], []
    need = num_samples
    # fixed candidate batch: a need-proportional B re-jits the vmapped warm-start
    # rollout with a fresh shape every round — one multi-second compile per round
    # (a network round trip each through the axon tunnel), which dominated sampler
    # wall-clock at the M>=3 / obs_r=0.4 acceptance rates
    B = max(8 * num_samples, 64)
    for _ in range(max_rounds):
        s = np.maximum(0.1, rng.random((B, M)) * first_seg_len)
        ey = rng.random((B, M)) * hw * 2 - hw
        v = rng.random((B, M)) + 2

        x0 = np.zeros((B, 6 * M))
        for a in range(M):
            xyp = np.asarray(track.local_to_global(
                np.stack([s[:, a], ey[:, a], np.zeros(B)], axis=-1)))
            x0[:, 6 * a:6 * (a + 1)] = np.stack(
                [xyp[:, 0], xyp[:, 1], v[:, a], np.zeros(B), s[:, a], ey[:, a]], axis=-1)

        u_ws, q_ws, collision = ws_batch(jnp.asarray(x0), jnp.asarray(v), jnp.asarray(ey))
        ok = ~np.asarray(collision)
        idx = np.where(ok)[0][:need]
        if idx.size:
            xs.append(x0[idx])
            us.append(np.asarray(u_ws)[idx])
            vrs.append(v[idx])
            lrs.append(ey[idx])
            need -= idx.size
        if need == 0:
            break
    if need > 0:
        raise RuntimeError(f'Agents sampler failed: {need} missing after {max_rounds} rounds')
    return (np.concatenate(xs), np.concatenate(us),
            np.concatenate(vrs), np.concatenate(lrs))


def sample_merge_initial_conditions(scenario, num_samples: int, seed: int = 1,
                                    max_rounds: int = 80):
    """IC sampler for the merge study (``DGSQP_merge_monte_carlo.py:427-500``): jittered
    nominal states for the two straight-lane cars and the ramp car, zero-input warm-start
    rollouts, pairwise collision rejection.

    Returns (x0 (B, 12), u_ws (B, N, 6) all-zero, None, None).
    """
    geo = scenario.merge_geometry
    th = geo['th']
    x5, x7 = geo['x5'], geo['x7']
    N = scenario.N
    rng = np.random.default_rng(seed)
    models = scenario.joint_model.dynamics_models

    def rollout_zero(x0_batch):
        def one(q0):
            qs = [q0]
            for k in range(N):
                parts = []
                for a, m in enumerate(models):
                    qa = qs[-1][4 * a:4 * (a + 1)]
                    parts.append(m.fd(qa, jnp.zeros(2)))
                qs.append(jnp.concatenate(parts))
            return jnp.stack(qs)
        return jax.jit(jax.vmap(one))(x0_batch)

    xs = []
    need = num_samples
    for _ in range(max_rounds):
        B = max(2 * need, 8)

        def jitter(x_nom, y_nom, v_nom=0.3, p_nom=0.0):
            x = x_nom + 0.5 * rng.random(B) - 0.25
            y = y_nom + 0.1 * rng.random(B) - 0.05
            v = v_nom * (1 + 0.06 * rng.random(B) - 0.03)
            p = p_nom + (5 * rng.random(B) - 2.5) * np.pi / 180
            return np.stack([x, y, v, p], axis=-1)

        c1 = jitter(0.0, 0.15)
        c2 = jitter(0.5, 0.15)
        # ramp car: jitter along ramp direction
        x_nom = 0.25
        y_nom = -(float(x7[0] + x5[0]) / 2 - 0.25) * np.tan(th)
        s_r = 0.5 * rng.random(B) - 0.25
        ey_r = 0.1 * rng.random(B) - 0.05
        c3 = np.stack([x_nom + s_r * np.cos(th) - ey_r * np.sin(th),
                       y_nom + s_r * np.sin(th) + ey_r * np.cos(th),
                       0.3 * (1 + 0.06 * rng.random(B) - 0.03),
                       np.pi / 12 + (5 * rng.random(B) - 2.5) * np.pi / 180], axis=-1)
        x0 = np.concatenate([c1, c2, c3], axis=-1)

        q_traj = np.asarray(rollout_zero(jnp.asarray(x0)))  # (B, N+1, 12)
        ok = np.ones(B, dtype=bool)
        for i in range(3):
            for j in range(i + 1, 3):
                d = np.linalg.norm(q_traj[:, :, 4 * i:4 * i + 2] -
                                   q_traj[:, :, 4 * j:4 * j + 2], axis=-1)
                ok &= (d >= scenario.obs_d).all(axis=1)
        idx = np.where(ok)[0][:need]
        if idx.size:
            xs.append(x0[idx])
            need -= idx.size
        if need == 0:
            break
    if need > 0:
        raise RuntimeError(f'Merge sampler failed: {need} missing after {max_rounds} rounds')
    x0 = np.concatenate(xs)
    u_ws = np.zeros((num_samples, N, 6))
    return x0, u_ws, None, None

"""Batched PID warm starts, JAX-native.

The reference warm-starts every Monte-Carlo trial by rolling PID lane-followers through the
plant model with exact integration and stacking the resulting input sequences
(``DGSQP_ALGAMES_monte_carlo_chicane.py:409-467``, ``comparison_study_barc/warm_start.py``).
Here the same PID + rollout is a pure jnp ``lax.scan`` — jit-able and vmap-able over thousands
of initial conditions at once, replacing the per-trial Python loops.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pid_rollout(model, q0, v_ref, lat_ref, N: int, dt: float,
                u_abs, u_rate, steer_ki: float = 0.005, n_sub: int = 10):
    """Roll one agent's PID lane follower for N steps.

    Matches the reference controllers (``..._chicane.py:411-437``): speed PID with Kp=1 on
    ``v - v_ref``; steering PID with Kp=1, Ki=steer_ki on ``5*(x_tran - lat_ref) + e_psi``;
    per-step rate clamps then absolute clamps.  The model is advanced with fine RK4 substeps
    (the reference integrates with solve_ivp).

    Args:
        model: dynamics model exposing ``fc(q, u)`` with state containing
               (v, e_psi, x_tran) at the indices given by its marshalling
               (kinematic bicycle combined: v=2, e_psi=3, x_tran=5).
        q0: (n_q,) initial state.
        u_abs: (2,) absolute input limits [u_a_max, u_steer_max].
        u_rate: (2,) per-second rate limits (clamped as-is per step, matching the script's
               PIDParams which pass the raw rate bound as du_max).
    Returns:
        (u_seq (N, 2), q_seq (N+1, n_q))
    """
    V_IDX, EPSI_IDX, EY_IDX = 2, 3, 5
    h = dt / n_sub

    def rk4_step(q, u):
        def sub(qq, _):
            a1 = model.fc(qq, u)
            a2 = model.fc(qq + (h / 2) * a1, u)
            a3 = model.fc(qq + (h / 2) * a2, u)
            a4 = model.fc(qq + h * a3, u)
            return qq + h * (a1 + 2 * a2 + 2 * a3 + a4) / 6, None
        out, _ = jax.lax.scan(sub, q, None, length=n_sub)
        return out

    def step(carry, _):
        q, e_st, ei_st, ua_prev, us_prev = carry
        # speed PID (Kp=1)
        ua = -(q[V_IDX] - v_ref)
        dua = jnp.clip(ua - ua_prev, -u_rate[0], u_rate[0])
        ua = jnp.clip(ua_prev + dua, -u_abs[0], u_abs[0])
        # steering PID (Kp=1, Ki)
        err = 5.0 * (q[EY_IDX] - lat_ref) + q[EPSI_IDX]
        ei = jnp.clip(ei_st + err * dt, -100.0, 100.0)
        us = -(err + steer_ki * ei)
        dus = jnp.clip(us - us_prev, -u_rate[1], u_rate[1])
        us = jnp.clip(us_prev + dus, -u_abs[1], u_abs[1])
        u = jnp.array([ua, us])
        q_next = rk4_step(q, u)
        return (q_next, err, ei, ua, us), (u, q_next)

    init = (q0, jnp.asarray(0.0, q0.dtype), jnp.asarray(0.0, q0.dtype),
            jnp.asarray(0.0, q0.dtype), jnp.asarray(0.0, q0.dtype))
    _, (u_seq, q_seq) = jax.lax.scan(step, init, None, length=N)
    q_all = jnp.concatenate([q0[None], q_seq], axis=0)
    return u_seq, q_all


def pid_warm_start(scenario, q0_joint, v_refs, lat_refs):
    """Warm-start all M agents of a racing scenario from a joint initial state.

    Returns (u_ws stage-ordered (N, n_u), q_ws (N+1, n_q), collision flag) where collision
    uses the reference's check: any-step pairwise global xy distance below ``obs_d``
    (``..._chicane.py:38-43``, ``DGSQP_monte_carlo_agents.py`` uses the same helper).
    """
    models = scenario.joint_model.dynamics_models
    n_qs = scenario.joint_model.num_qa_d
    off = 0
    u_list, q_list = [], []
    for a, m in enumerate(models):
        q0 = q0_joint[off:off + n_qs[a]]
        u_seq, q_seq = pid_rollout(m, q0, v_refs[a], lat_refs[a], scenario.N, scenario.dt,
                                   jnp.asarray(scenario.input_ub),
                                   jnp.asarray(scenario.input_rate_ub))
        u_list.append(u_seq)
        q_list.append(q_seq)
        off += n_qs[a]
    u_ws = jnp.concatenate(u_list, axis=1)
    q_ws = jnp.concatenate(q_list, axis=1)
    collision = jnp.asarray(False)
    for i in range(len(models)):
        for j in range(i + 1, len(models)):
            d = jnp.linalg.norm(q_list[i][:, 0:2] - q_list[j][:, 0:2], axis=1)
            collision = collision | jnp.any(d < scenario.obs_d)
    return u_ws, q_ws, collision


# Backwards-compatible name for the 2-agent case.
duel_warm_start = pid_warm_start


def seed_virtual_rate_prev(up, u_ws_stage0, joint_model):
    """Seed the previous-input vector's VIRTUAL arc-speed channels from the warm start.

    The progress-augmented (MPCC) formulation adds a virtual input ``u_ds`` (arc speed
    of the reference point).  Its physically meaningful "previous value" at the initial
    stage is the car's actual progress rate ``sdot(0)`` — the PID warm start's first
    ``ds`` value — not 0: with ``u_prev = 0`` the input-rate rows cap ``u_ds(0)`` at
    ``dt * u_ds_rate`` (0.5 m/s) while the car moves at 2-3 m/s, and the q_l=1e3 lag
    cost then forces a brake-and-swerve start (see build_approximate_duel).  The real
    channels keep ``u_prev = 0`` like the exact formulation's.
    """
    import numpy as np
    offs = np.cumsum([0] + [getattr(m, 'n_u', 2)
                            for m in joint_model.dynamics_models])
    up = jnp.asarray(up)
    for a, m in enumerate(joint_model.dynamics_models):
        if getattr(m, 'n_u', 2) >= 3:
            idx = int(offs[a]) + 2          # u_ds = third channel of a PA agent
            up = up.at[..., idx].set(u_ws_stage0[..., idx])
    return up


def pa_twins(scenario):
    """Combined-bicycle twins for warm-starting progress-augmented scenarios.

    Returns None for plain 2-input scenarios; otherwise one ``KinematicBicycleCombined``
    per PA agent, sharing its config and track — the reference warm-starts the
    approximate game by rolling PID through the EXACT model and appending the arc-speed
    channel (``comparison_study_barc/warm_start.py:79-121``).
    """
    models = scenario.joint_model.dynamics_models
    if all(getattr(m, 'n_u', 2) == 2 for m in models):
        return None
    from dgsqp_tpu.dynamics.models import KinematicBicycleCombined
    return [KinematicBicycleCombined(0.0, m.model_config, track=m.track)
            for m in models]


def pa_warm_start(scenario, twins, q0_joint, v_refs, lat_refs):
    """PID warm start for progress-augmented (MPCC) scenarios.

    ``q0_joint`` is in the COMBINED layout ([x, y, v, e_psi, s, x_tran] per agent, the
    sampler's native frame).  Rolls the PID lane followers on the combined twins, then:

      * per-agent inputs ``[u_a, u_steer]`` get the virtual arc speed appended as
        ``u_ds_k = (s_{k+1} - s_k)/dt`` (reference ``warm_start.py:103-121``);
      * the PA initial state is ``[x, y, v, psi, s]`` with global heading
        ``psi = e_psi + track tangent angle at s``.

    Returns (u_ws stage-ordered (N, 3M), x0_pa (5M,), collision flag).
    """
    N, dt = scenario.N, scenario.dt
    off = 0
    u_list, q_list, x0_list = [], [], []
    for a, m in enumerate(twins):
        q0 = q0_joint[off:off + 6]
        u_seq, q_seq = pid_rollout(m, q0, v_refs[a], lat_refs[a], N, dt,
                                   jnp.asarray(scenario.input_ub[:2]),
                                   jnp.asarray(scenario.input_rate_ub[:2]))
        ds = (q_seq[1:, 4] - q_seq[:-1, 4]) / dt
        u_list.append(jnp.concatenate([u_seq, ds[:, None]], axis=1))
        q_list.append(q_seq)
        psi0 = q0[3] + m.track.tangent_angle(q0[4])
        x0_list.append(jnp.stack([q0[0], q0[1], q0[2], psi0, q0[4]]))
        off += 6
    u_ws = jnp.concatenate(u_list, axis=1)
    x0_pa = jnp.concatenate(x0_list)
    collision = jnp.asarray(False)
    for i in range(len(twins)):
        for j in range(i + 1, len(twins)):
            d = jnp.linalg.norm(q_list[i][:, 0:2] - q_list[j][:, 0:2], axis=1)
            collision = collision | jnp.any(d < scenario.obs_d)
    return u_ws, x0_pa, collision

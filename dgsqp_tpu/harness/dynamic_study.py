"""Exact dynamic-bicycle comparison study: sampler + warm start (journal "dynamic study").

Mirrors ``/root/reference/scripts/comparison_study_barc/monte_carlo_sampler_dynamic.py``
(raceline-relative IC sampling on L_track_barc with vehicle-box collision rejection) and
``warm_start_dynamic.py``.  Deviation, as in the F1 study: the reference warm-starts each
trial with a CA-LTV-MPC raceline tracker (``warm_start_dynamic.py:17-207``); here the warm
start is a raceline-following PID rollout of the dynamic bicycle itself — one ``lax.scan``,
vmapped over all samples at once, which is the batched execution model this framework is
built around.  Both produce feasible input sequences tracking the raceline at the sampled
offset; neither is the game solution.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.tracks.track_lib import load_mpclab_raceline

# globals.py constants (reference ``comparison_study_barc/globals.py``)
VL, VW = 0.37, 0.195
_RACELINE_NPZ = Path(__file__).parent / 'data' / 'L_track_barc_raceline.npz'
_BOX_R = float(np.sqrt((VL / 2) ** 2 + (VW / 2) ** 2))


def ltrack_raceline(time_scale: float = 1.7):
    """The study raceline (reference ``monte_carlo_sampler_dynamic.py:14-15``)."""
    return load_mpclab_raceline(_RACELINE_NPZ, 'L_track_barc', time_scale=time_scale)


def dynamic_warm_start(scenario, x0_joint, v_refs, ey_refs, n_sub: int = 10):
    """PID raceline-follower rollout of both DynamicBicycleCombined agents.

    State layout per car: [x, y, vx, vy, psidot, epsi, s, xtran].  Speed PID (Kp=1) on
    ``vx - v_ref``; steering PID on ``5*(xtran - ey_ref) + epsi`` — the same controller
    shape the kinematic studies use (``warm_start.pid_rollout``).  Returns
    (u_ws (N, 4) stage-ordered, q_ws (N+1, 16), collision flag using the shared-constraint
    radius ``scenario.obs_d``).
    """
    models = scenario.joint_model.dynamics_models
    N, dt = scenario.N, scenario.dt
    h = dt / n_sub
    ua_max, us_max = float(scenario.input_ub[0]), float(scenario.input_ub[1])
    V, EPSI, EY = 2, 5, 7

    def agent_rollout(model, q0, v_ref, ey_ref):
        def rk4(q, u):
            def sub(qq, _):
                a1 = model.fc(qq, u)
                a2 = model.fc(qq + (h / 2) * a1, u)
                a3 = model.fc(qq + (h / 2) * a2, u)
                a4 = model.fc(qq + h * a3, u)
                return qq + h * (a1 + 2 * a2 + 2 * a3 + a4) / 6, None
            out, _ = jax.lax.scan(sub, q, None, length=n_sub)
            return out

        def step(q, _):
            ua = jnp.clip(-(q[V] - v_ref), -ua_max, ua_max)
            err = 5.0 * (q[EY] - ey_ref) + q[EPSI]
            us = jnp.clip(-err, -us_max, us_max)
            u = jnp.array([ua, us])
            q_n = rk4(q, u)
            return q_n, (u, q_n)

        _, (u_seq, q_seq) = jax.lax.scan(step, q0, None, length=N)
        return u_seq, jnp.concatenate([q0[None], q_seq], axis=0)

    n1 = models[0].n_q
    u1, q1 = agent_rollout(models[0], x0_joint[:n1], v_refs[0], ey_refs[0])
    u2, q2 = agent_rollout(models[1], x0_joint[n1:], v_refs[1], ey_refs[1])
    u_ws = jnp.concatenate([u1, u2], axis=1)
    q_ws = jnp.concatenate([q1, q2], axis=1)
    d2 = (q1[:, 0] - q2[:, 0]) ** 2 + (q1[:, 1] - q2[:, 1]) ** 2
    collision = jnp.any(d2 < scenario.obs_d ** 2)
    return u_ws, q_ws, collision


def sample_dynamic_duel_initial_conditions(scenario, num_samples: int, seed: int = 0,
                                           max_rounds: int = 60):
    """Raceline-relative IC sampler (reference ``monte_carlo_sampler_dynamic.py:28-57``).

    Car 1: s ~ U(0, L); lateral = raceline e_y + U(-1, 1) clipped to 90% of local widths;
    v = raceline v_long + U(-0.75, 0.75); e_psi from the raceline.  Car 2: s displaced by
    ``1.2*obs_d*U(-1, 1)``, same lateral/speed law.  Rejection: vehicle-box collision
    (radius sqrt((VL/2)^2+(VW/2)^2) per car) at the initial pose, plus warm-start rollout
    collision at the game's constraint radius.
    """
    track = scenario.track
    raceline, s2t, _ = ltrack_raceline()
    L = float(track.track_length)
    rng = np.random.default_rng(seed)
    obs_d = scenario.obs_d

    ws_batch = jax.jit(jax.vmap(
        lambda q0, vr, er: dynamic_warm_start(scenario, q0, vr, er)))

    def lookup(s):
        cols = raceline(s2t(jnp.asarray(s)))
        return (np.asarray(cols[3]), np.asarray(cols[6]), np.asarray(cols[8]))  # v, epsi, ey

    def draw_car(s):
        v_r, ep_r, ey_r = lookup(s)
        lw = np.asarray(track.left_width(jnp.asarray(s)))
        rw = np.asarray(track.right_width(jnp.asarray(s)))
        ey = np.clip(ey_r + (2 * rng.random(s.shape) - 1), -0.9 * rw, 0.9 * lw)
        v = v_r + (1.5 * rng.random(s.shape) - 0.75)
        xyp = np.asarray(track.local_to_global(np.stack([s, ey, ep_r], axis=-1)))
        return v, ep_r, ey, xyp

    xs, us, vrs, ers = [], [], [], []
    need = num_samples
    # fixed candidate batch: a need-proportional B would re-jit ws_batch (the vmapped
    # N-stage RK4 rollout) with a fresh shape every round — one multi-second XLA
    # compile per round dominating sampler wall-clock
    B = max(2 * num_samples, 8)
    for _ in range(max_rounds):
        s1 = L * rng.random(B)
        v1, ep1, ey1, xyp1 = draw_car(s1)
        s2 = s1 + 1.2 * obs_d * (2 * rng.random(B) - 1)
        s2 = np.mod(s2, L)
        v2, ep2, ey2, xyp2 = draw_car(s2)

        box_ok = (np.sum((xyp1[:, :2] - xyp2[:, :2]) ** 2, axis=1)
                  >= (2 * _BOX_R) ** 2)

        # joint state per car: [x, y, vx, vy, psidot, epsi, s, xtran]
        zeros = np.zeros(B)
        x0 = np.stack([xyp1[:, 0], xyp1[:, 1], v1, zeros, zeros, ep1, s1, ey1,
                       xyp2[:, 0], xyp2[:, 1], v2, zeros, zeros, ep2, s2, ey2], axis=-1)
        v_ref = np.stack([v1, v2], axis=-1)
        ey_ref = np.stack([ey1, ey2], axis=-1)
        u_ws, q_ws, collision = ws_batch(jnp.asarray(x0), jnp.asarray(v_ref),
                                         jnp.asarray(ey_ref))
        ok = box_ok & ~np.asarray(collision)
        idx = np.where(ok)[0][:need]
        if idx.size:
            xs.append(x0[idx])
            us.append(np.asarray(u_ws)[idx])
            vrs.append(v_ref[idx])
            ers.append(ey_ref[idx])
            need -= idx.size
        if need == 0:
            break
    if need > 0:
        raise RuntimeError(f'Dynamic sampler failed to draw {num_samples} valid ICs '
                           f'({need} missing after {max_rounds} rounds)')
    return (np.concatenate(xs), np.concatenate(us),
            np.concatenate(vrs), np.concatenate(ers))


def combined_to_pa_dynamic(x0_combined, q_ws, u_ws, track, dt):
    """Map an exact-dynamic (combined) sample + warm start to the PA layout.

    Per-car combined layout [x, y, vx, vy, psidot, epsi, s, xtran] becomes the PA
    layout [vx, vy, psidot, x, y, psi, s] with global heading
    ``psi = epsi + track tangent angle at s``; the warm-start inputs get the virtual
    arc-speed channel appended as ``u_ds_k = (s_{k+1} - s_k)/dt`` from the rollout's
    progress trace (reference ``warm_start_dynamic.py`` arc-speed construction).
    Batched: x0_combined (B, 16), q_ws (B, N+1, 16), u_ws (B, N, 4) ->
    (x0_pa (B, 14), u_pa (B, N, 6)).
    """
    B = x0_combined.shape[0]
    x0_pa = np.zeros((B, 14))
    u_pa_parts = []
    for a, off in enumerate((0, 8)):
        c = x0_combined[:, off:off + 8]
        psi = c[:, 5] + np.asarray(track.tangent_angle(jnp.asarray(c[:, 6])))
        x0_pa[:, 7 * a:7 * (a + 1)] = np.stack(
            [c[:, 2], c[:, 3], c[:, 4], c[:, 0], c[:, 1], psi, c[:, 6]], axis=-1)
        s_traj = q_ws[:, :, off + 6]
        ds = (s_traj[:, 1:] - s_traj[:, :-1]) / dt
        u_pa_parts.append(np.concatenate(
            [u_ws[:, :, 2 * a:2 * (a + 1)], ds[:, :, None]], axis=-1))
    return x0_pa, np.concatenate(u_pa_parts, axis=-1)


def sample_dynamic_pa_initial_conditions(pa_scenario, num_samples: int, seed: int = 0):
    """IC sampler for the approximate (PA) dynamic duel.

    Samples with the EXACT dynamic duel's raceline-relative sampler (the reference
    warm-starts the approximate game through the exact model and appends the
    arc-speed channel, ``warm_start_dynamic.py``), then converts states and inputs
    to the PA layout.
    """
    from dgsqp_tpu.harness.scenarios import build_dynamic_duel
    exact = build_dynamic_duel(N=pa_scenario.N, dt=pa_scenario.dt,
                               car_r=pa_scenario.obs_d / 2)
    x0c, u_ws, v_ref, ey_ref = sample_dynamic_duel_initial_conditions(
        exact, num_samples, seed=seed)
    ws_batch = jax.jit(jax.vmap(
        lambda q0, vr, er: dynamic_warm_start(exact, q0, vr, er)))
    u_ws2, q_ws, _ = ws_batch(jnp.asarray(x0c), jnp.asarray(v_ref),
                              jnp.asarray(ey_ref))
    x0_pa, u_pa = combined_to_pa_dynamic(x0c, np.asarray(q_ws), np.asarray(u_ws2),
                                         pa_scenario.track, pa_scenario.dt)
    return x0_pa, u_pa, v_ref, ey_ref

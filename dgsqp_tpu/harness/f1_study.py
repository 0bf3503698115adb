"""F1-track comparison study: dynamic-bicycle approximate game on the Austin circuit.

TPU-native equivalent of ``/root/reference/scripts/comparison_study_f1/`` (globals.py,
approximate_dynamic_game.py:13-220, monte_carlo_sampler.py:22-52, monte_carlo_main.py):
a two-car duel of progress-augmented dynamic bicycles on a 20 m segment of the
tenth-scale F1 Austin B-spline track, initial conditions sampled around the TUM
raceline, solved with DGSQP-v2 (NMS) or PATH on the Frenet-approximate (MPCC) game.

Deviation: the reference warm-starts each trial with a CA-LTV-MPC raceline tracker
(``warm_start.py:14-207``); here the warm start is a raceline-following PID rollout of
the progress-augmented model itself (speed + steering PID, arc speed tied to body
speed), which is fully jit/vmap-able over the sample batch.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.dynamics import DynamicBicycleConfig, MultiAgentDynamicsModel, \
    MultiAgentModelConfig
from dgsqp_tpu.dynamics.progress_augmented import DynamicBicycleProgressAugmented
from dgsqp_tpu.harness.scenarios import Scenario
from dgsqp_tpu.tracks.track_lib import get_track, load_tum_raceline
from dgsqp_tpu.types import (BodyAngularVelocity, BodyLinearVelocity, OrientationEuler,
                             ParametricPose, Position, VehicleActuation, VehicleState)

# reference comparison_study_f1/globals.py
TRACK = 'f1_austin_tenth_scale'
DT = 0.1
VL, VW = 0.56, 0.2
CAR_R = float(np.hypot(VL / 2, VW / 2))
SEGMENT = (60.0, 80.0)
TOL = 1e-4

_RACELINE_CSV = os.path.join(os.path.dirname(__file__), 'data', 'traj_race_cl.csv')


def f1_track_segment():
    """The 20 m Austin segment used by the study (``monte_carlo_sampler.py:9``)."""
    return get_track(TRACK).get_track_segment(list(SEGMENT), 10)


def f1_raceline():
    """TUM raceline restricted to the study segment (``monte_carlo_sampler.py:14``)."""
    return load_tum_raceline(_RACELINE_CSV, TRACK, tenth_scale=True,
                             segment=list(SEGMENT))


def _car_config(dt):
    # reference approximate_dynamic_game.py:23-54
    return DynamicBicycleConfig(dt=dt, model_name='dynamic_bicycle', noise=False,
                                discretization_method='rk4',
                                wheel_dist_front=0.18, wheel_dist_rear=0.18,
                                simple_slip=False, tire_model='pacejka',
                                mass=70.0, yaw_inertia=2.0627, wheel_friction=0.9,
                                pacejka_b_front=10.0, pacejka_b_rear=10.0,
                                pacejka_c_front=2.5, pacejka_c_rear=2.5)


def build_f1_scenario(N: int = 15, dt: float = DT,
                      comp_weights=(1.0, 5.0), input_weight=(1.0, 1.0, 1e-4),
                      input_rate_weight=(1.0, 1.0, 1e-4),
                      u_a_max: float = 2.1, u_steer_max: float = 0.436,
                      u_ds_max: float = 4.0, track=None) -> Scenario:
    """Two-car approximate dynamic game (``approximate_dynamic_game.py:13-220``).

    Stage costs are quadratic input + input-rate penalties; terminal costs are linear
    progress + competitive terms on the augmented arc states; the only explicit
    constraint is shared collision avoidance (the track boundary enters through the
    Frenet-approximation parameters inside ``DGSQPV2FrenetApprox``).
    """
    if track is None:
        track = f1_track_segment()
    car1 = DynamicBicycleProgressAugmented(0.0, _car_config(dt), track=track)
    car2 = DynamicBicycleProgressAugmented(0.0, _car_config(dt), track=track)
    joint = MultiAgentDynamicsModel(0.0, [car1, car2], MultiAgentModelConfig(dt=dt))

    # per-agent PA state [vx, vy, psidot, x, y, psi, s] -> joint indices
    S1, S2 = 6, 13
    XY1, XY2 = (3, 4), (10, 11)
    obs_d = 2 * CAR_R

    def make_cost(own_s, other_s):
        w, wr = input_weight, input_rate_weight

        def stage(x, u, um):
            return 0.5 * (w[0] * u[0] ** 2 + w[1] * u[1] ** 2 + w[2] * u[2] ** 2) \
                + 0.5 * (wr[0] * (u[0] - um[0]) ** 2 + wr[1] * (u[1] - um[1]) ** 2
                         + wr[2] * (u[2] - um[2]) ** 2)

        def term(x):
            return -comp_weights[0] * x[own_s] + comp_weights[1] * (x[other_s] - x[own_s])
        return (stage, term)

    costs = [make_cost(S1, S2), make_cost(S2, S1)]

    def obs_avoid(x, u, um):
        dx = x[XY1[0]] - x[XY2[0]]
        dy = x[XY1[1]] - x[XY2[1]]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    def obs_avoid_term(x):
        dx = x[XY1[0]] - x[XY2[0]]
        dy = x[XY1[1]] - x[XY2[1]]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    shared_constraints = [None] + [obs_avoid] * (N - 1) + [obs_avoid_term]
    # the f1 study attaches no per-agent nonlinear constraints
    # (approximate_dynamic_game.py:202-206)
    agent_constraints = [[None] * (N + 1), [None] * (N + 1)]

    def bound(sign):
        return VehicleState(
            x=Position(x=sign * np.inf, y=sign * np.inf),
            p=ParametricPose(s=sign * np.inf, x_tran=sign * np.inf, e_psi=sign * np.inf),
            e=OrientationEuler(psi=sign * np.inf),
            v=BodyLinearVelocity(v_long=sign * np.inf, v_tran=sign * np.inf),
            w=BodyAngularVelocity(w_psi=sign * np.inf),
            u=VehicleActuation(u_a=sign * u_a_max, u_steer=sign * u_steer_max,
                               u_ds=u_ds_max if sign > 0 else 0.0))

    bounds = {'ub': [bound(1), bound(1)], 'lb': [bound(-1), bound(-1)]}

    return Scenario(name='f1_austin', track=track, joint_model=joint, costs=costs,
                    agent_constraints=agent_constraints,
                    shared_constraints=shared_constraints, bounds=bounds, N=N, dt=dt,
                    obs_d=obs_d, half_width=float(track.half_width),
                    input_ub=np.array([u_a_max, u_steer_max, u_ds_max]),
                    input_lb=np.array([-u_a_max, -u_steer_max, 0.0]),
                    input_rate_ub=np.array([10.0, 4.5, 5.0]),
                    input_rate_lb=np.array([-10.0, -4.5, -5.0]))


def f1_warm_start(scenario, x0_joint, v_refs, ey_refs, n_sub: int = 4):
    """Raceline-following PID rollout of the PA dynamic bicycles (see module docstring).

    Returns (u_ws (N, 6) stage-ordered, q_ws (N+1, 14), collision flag).
    """
    track = scenario.track
    models = scenario.joint_model.dynamics_models
    N, dt = scenario.N, scenario.dt
    h = dt / n_sub

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

        def step(carry, _):
            q, ua_p, us_p = carry
            sey = track.global_to_local(jnp.array([q[3], q[4], q[5]]))
            ua = jnp.clip(-(q[0] - v_ref), -2.1, 2.1)
            err = 5.0 * (sey[1] - ey_ref) + sey[2]
            us = jnp.clip(-err, -0.436, 0.436)
            uds = jnp.clip(q[0], 0.0, 4.0)
            u = jnp.array([ua, us, uds])
            q_n = rk4(q, u)
            return (q_n, ua, us), (u, q_n)

        z = jnp.asarray(0.0, q0.dtype)
        _, (u_seq, q_seq) = jax.lax.scan(step, (q0, z, z), None, length=N)
        return u_seq, jnp.concatenate([q0[None], q_seq], axis=0)

    u1, q1 = agent_rollout(models[0], x0_joint[:7], v_refs[0], ey_refs[0])
    u2, q2 = agent_rollout(models[1], x0_joint[7:], v_refs[1], ey_refs[1])
    u_ws = jnp.concatenate([u1, u2], axis=1)
    q_ws = jnp.concatenate([q1, q2], axis=1)
    d2 = (q1[:, 3] - q2[:, 3]) ** 2 + (q1[:, 4] - q2[:, 4]) ** 2
    collision = jnp.any(d2 < scenario.obs_d ** 2)
    return u_ws, q_ws, collision


def sample_f1_initial_conditions(scenario, num_samples: int, seed: int = 0,
                                 max_rounds: int = 60):
    """Raceline-relative IC sampler (``monte_carlo_sampler.py:28-54``): car 1 anywhere on
    the first L-10 m, lateral offset U(-1,1) around the raceline clipped to 90% of the
    local widths, speed raceline +/- 0.75; car 2 ahead by up to 3 car lengths."""
    track = scenario.track
    raceline, s2t, _ = f1_raceline()
    L = float(track.track_length)
    rng = np.random.default_rng(seed)

    ws_batch = jax.jit(jax.vmap(lambda q0, vr, er: f1_warm_start(scenario, q0, vr, er)))

    def lookup(s):
        cols = raceline(s2t(jnp.asarray(s)))
        return (np.asarray(cols[3]), np.asarray(cols[6]), np.asarray(cols[8]))  # v, epsi, ey

    xs, us, vrs, ers = [], [], [], []
    need = num_samples
    for _ in range(max_rounds):
        B = max(2 * need, 8)
        s1 = (L - 10.0) * rng.random(B)
        v1r, ep1, ey1r = lookup(s1)
        lw1 = np.asarray(track.left_width(jnp.asarray(s1)))
        rw1 = np.asarray(track.right_width(jnp.asarray(s1)))
        ey1 = np.clip(ey1r + (2 * rng.random(B) - 1), -0.9 * rw1, 0.9 * lw1)
        v1 = v1r + (1.5 * rng.random(B) - 0.75)

        s2 = s1 + 3 * rng.random(B) * VL
        v2r, ep2, ey2r = lookup(s2)
        lw2 = np.asarray(track.left_width(jnp.asarray(s2)))
        rw2 = np.asarray(track.right_width(jnp.asarray(s2)))
        ey2 = np.clip(ey2r + (2 * rng.random(B) - 1), -0.9 * rw2, 0.9 * lw2)
        v2 = v2r + (1.5 * rng.random(B) - 0.75)

        xyp1 = np.asarray(track.local_to_global(np.stack([s1, ey1, ep1], axis=-1)))
        xyp2 = np.asarray(track.local_to_global(np.stack([s2, ey2, ep2], axis=-1)))
        geo_ok = (np.sum((xyp1[:, :2] - xyp2[:, :2]) ** 2, axis=1)
                  >= scenario.obs_d ** 2) & (s2 <= L)

        # PA joint state [vx, vy, psidot, x, y, psi, s] per car
        x0 = np.stack([v1, np.zeros(B), np.zeros(B), xyp1[:, 0], xyp1[:, 1],
                       xyp1[:, 2], s1,
                       v2, np.zeros(B), np.zeros(B), xyp2[:, 0], xyp2[:, 1],
                       xyp2[:, 2], s2], axis=-1)
        v_ref = np.stack([v1, v2], axis=-1)
        ey_ref = np.stack([ey1, ey2], axis=-1)
        u_ws, q_ws, collision = ws_batch(jnp.asarray(x0), jnp.asarray(v_ref),
                                         jnp.asarray(ey_ref))
        ok = geo_ok & ~np.asarray(collision)
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
        raise RuntimeError(f'F1 sampler failed to draw {num_samples} valid ICs')
    return (np.concatenate(xs), np.concatenate(us),
            np.concatenate(vrs), np.concatenate(ers))


def f1_solver_params(N: int, *, reference_faithful: bool = False, **overrides):
    """Tuned TPU operating point for the F1 study's DGSQP-v2 (NOT the reference
    configuration: sqp_iters 150 vs 500, constant reg=1 vs 1e2*0.95^k,
    nms_frequency 1 vs 10, delta0 0 vs 20, gradient-scaled KKT tolerance — the
    measured-best MPCC point, docs/approx_convergence.md; the reference's blind
    d-step schedule creeps for ~1000 iterations on this problem class).

    ``reference_faithful=True`` restores the reference study's own knobs
    (``comparison_study_f1/globals.py:25-50``: sqp_iters=500, reg=1e2 decaying
    0.95/m-step, nms_frequency=10, delta0=20, absolute tolerances) for
    replication runs."""
    from dgsqp_tpu.solvers.solver_types import DGSQPV2Params
    if reference_faithful:
        kw = dict(N=N, dt=DT, nms=True, nms_frequency=10, nms_memory_size=10,
                  nms_initial_step_size_factor=20.0, line_search_iters=20,
                  sqp_iters=500, p_tol=TOL, d_tol=TOL,
                  reg=1e2, reg_decay=0.95, delta_decay=0.99, merit_decrease=0.01,
                  conv_scaled_stat=False, approximation_eval='once',
                  beta=0.01, tau=0.5)
    else:
        kw = dict(N=N, dt=DT, nms=True, nms_frequency=1, nms_memory_size=10,
                  nms_initial_step_size_factor=0.0, line_search_iters=20,
                  sqp_iters=150, p_tol=TOL, d_tol=TOL,
                  reg=1.0, reg_decay=1.0, delta_decay=0.99, merit_decrease=0.01,
                  conv_scaled_stat=True, approximation_eval='once',
                  beta=0.01, tau=0.5)
    kw.update(overrides)
    return DGSQPV2Params(**kw)


def run_f1_study(N: int = 15, num_samples: int = 10, seed: int = 0,
                 solver: str = 'dgsqp', params=None, scenario=None):
    """One F1-study configuration (``monte_carlo_main.py:8-94``), batched."""
    from dgsqp_tpu.solvers.dgsqp import CONV_ABS, CONV_REL, STATUS_MSG

    sc = scenario or build_f1_scenario(N=N)
    params = params or f1_solver_params(N)
    if solver == 'dgsqp':
        from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
        slv = DGSQPV2FrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                  sc.shared_constraints, sc.bounds, params,
                                  print_method=None)
    elif solver == 'path':
        from dgsqp_tpu.solvers.mcp import PATHMCPFrenetApprox
        from dgsqp_tpu.solvers.solver_types import PATHMCPParams
        slv = PATHMCPFrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                  sc.shared_constraints, sc.bounds,
                                  PATHMCPParams(N=N, dt=DT, p_tol=TOL),
                                  print_method=None)
    else:
        raise ValueError(f'unknown solver {solver}')

    dtype = slv.dtype
    x0, u_ws, _, _ = sample_f1_initial_conditions(sc, num_samples, seed=seed)
    u0 = jnp.asarray(np.stack([np.asarray(slv.problem.stage_to_u(jnp.asarray(u, dtype)))
                               for u in u_ws]))
    x0 = jnp.asarray(x0, dtype)
    up = jnp.zeros((num_samples, sc.joint_model.n_u), dtype)
    from dgsqp_tpu.harness.warm_start import seed_virtual_rate_prev
    up = seed_virtual_rate_prev(up, jnp.asarray(u_ws, dtype)[:, 0, :], sc.joint_model)
    l0 = jnp.zeros((num_samples, slv.n_c), dtype)

    import time
    t0 = time.time()
    res = slv._solve_batch_jit(u0, l0, x0, up, None)
    jax.block_until_ready(res)
    wall = time.time() - t0
    statuses = np.asarray(res.status)
    conv = np.isin(statuses, (CONV_ABS, CONV_REL))
    return dict(total=num_samples, converged=int(conv.sum()),
                success_rate=float(conv.mean()), wall_time_s=wall,
                status_counts={STATUS_MSG.get(int(s), str(s)): int((statuses == s).sum())
                               for s in np.unique(statuses)},
                u_sol=np.asarray(res.u), x0=np.asarray(x0))

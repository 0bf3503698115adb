"""Benchmark scenario factories: the reference's Monte-Carlo study games, TPU-native.

Each builder reproduces a reference experiment script's game setup (costs, constraints,
bounds, solver parameters) as jnp callables over the joint state:

  * chicane / curve  — 2-agent kinematic-bicycle-combined racing duel
      (``/root/reference/scripts/DGSQP_ALGAMES_monte_carlo_chicane.py:134-357``, ``..._curve.py``)
  * merge            — 3 global-frame unicycles in a polygonal merge environment
      (``/root/reference/scripts/DGSQP_merge_monte_carlo.py:40-384``)
  * agents           — M-agent scaling study on a curved track
      (``/root/reference/scripts/DGSQP_monte_carlo_agents.py:98-205``)
  * dynamic duel     — 2-agent DYNAMIC-bicycle (Pacejka) exact game on L_track_barc
      (``/root/reference/scripts/comparison_study_barc/exact_dynamic_game_dynamic.py:13-204``)
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.dynamics import (DynamicBicycleConfig, DynamicBicycleCombined,
                                KinematicBicycleConfig, KinematicBicycleCombined,
                                MultiAgentDynamicsModel, MultiAgentModelConfig,
                                UnicycleConfig, KinematicUnicycle)
from dgsqp_tpu.tracks import ChicaneTrack, CurveTrack
from dgsqp_tpu.types import (BodyAngularVelocity, BodyLinearVelocity, OrientationEuler,
                             ParametricPose, Position, VehicleActuation, VehicleState)


@dataclass
class Scenario:
    name: str
    track: object
    joint_model: MultiAgentDynamicsModel
    costs: list
    agent_constraints: list
    shared_constraints: object
    bounds: dict
    N: int
    dt: float
    obs_d: float
    half_width: float
    # per-agent input bounds for warm-start/PID use
    input_ub: np.ndarray
    input_lb: np.ndarray
    input_rate_ub: np.ndarray
    input_rate_lb: np.ndarray


def _vehicle_bound(half_width, u_a, u_steer):
    st = VehicleState(
        x=Position(x=np.inf, y=np.inf),
        p=ParametricPose(s=np.inf, x_tran=half_width, e_psi=np.inf),
        e=OrientationEuler(psi=np.inf),
        v=BodyLinearVelocity(v_long=np.inf, v_tran=np.inf),
        w=BodyAngularVelocity(w_psi=np.inf),
        u=VehicleActuation(u_a=u_a, u_steer=u_steer))
    return st


def _neg(st: VehicleState) -> VehicleState:
    out = VehicleState(
        x=Position(x=-st.x.x, y=-st.x.y),
        p=ParametricPose(s=-st.p.s, x_tran=-st.p.x_tran, e_psi=-st.p.e_psi),
        e=OrientationEuler(psi=-st.e.psi),
        v=BodyLinearVelocity(v_long=-st.v.v_long, v_tran=-st.v.v_tran),
        w=BodyAngularVelocity(w_psi=-st.w.w_psi),
        u=VehicleActuation(u_a=-st.u.u_a, u_steer=-st.u.u_steer))
    return out


def build_racing_duel(track, N: int = 25, dt: float = 0.1,
                      comp_weights=(10.0, 5.0), input_weight=(1.0, 1.0),
                      input_rate_weight=(1.0, 1.0), blocking_weight: float = 0.0,
                      obs_weight: float = 0.0, obs_r: float = 0.3,
                      agent_r: float = 0.4, half_width: float = 1.0,
                      u_a_max: float = 2.1, u_steer_max: float = 0.436,
                      u_a_rate: float = 10.0, u_steer_rate: float = np.pi,
                      comp_linear: bool = False, drag_coefficient: float = 0.1,
                      slip_coefficient: float = 0.1, rate_constraints: bool = True,
                      name: str = 'duel') -> Scenario:
    """Two kinematic-bicycle-combined agents racing on a track.

    Costs/constraints mirror the chicane MC script exactly
    (``DGSQP_ALGAMES_monte_carlo_chicane.py:197-357``): quadratic input + input-rate stage
    cost, terminal progress + arctan competitive cost, per-agent input-rate constraints,
    shared collision-avoidance constraint active for stages 1..N.
    """
    cfg = KinematicBicycleConfig(dt=dt, model_name='kinematic_bicycle_cl', noise=False,
                                 discretization_method='euler',
                                 wheel_dist_front=0.13, wheel_dist_rear=0.13,
                                 drag_coefficient=drag_coefficient,
                                 slip_coefficient=slip_coefficient, code_gen=False)
    ego = KinematicBicycleCombined(0.0, cfg, track=track)
    tar = KinematicBicycleCombined(0.0, KinematicBicycleConfig(**{**cfg.__dict__}), track=track)
    joint = MultiAgentDynamicsModel(0.0, [ego, tar], MultiAgentModelConfig(dt=dt))

    # joint-state indices (ego block then tar block, 6 states each)
    EGO_X, EGO_Y, EGO_S, EGO_EY = 0, 1, 4, 5
    TAR_X, TAR_Y, TAR_S, TAR_EY = 6, 7, 10, 11
    obs_cost_d = 2 * obs_r
    obs_d = 2 * agent_r

    def make_costs(own_s, other_s, own_ey, other_ey):
        w_in = input_weight
        w_rt = input_rate_weight

        def stage(x, u, um):
            c = 0.5 * (w_in[0] * u[0] ** 2 + w_in[1] * u[1] ** 2) \
                + 0.5 * (w_rt[0] * (u[0] - um[0]) ** 2 + w_rt[1] * (u[1] - um[1]) ** 2)
            if blocking_weight > 0:
                c = c + 0.5 * blocking_weight * (x[own_ey] - x[other_ey]) ** 2
            if obs_weight > 0:
                dxy = x[EGO_X:EGO_Y + 1] - x[TAR_X:TAR_Y + 1]
                sat = jnp.maximum(0.0, obs_cost_d - jnp.sqrt(jnp.sum(dxy ** 2) + 1e-12))
                c = c + 0.5 * obs_weight * sat ** 2
            return c

        def term(x):
            if comp_linear:
                # journal comparison-study competitive term (exact_dynamic_game.py:
                # car1_comp_cost, linear); the ICRA MC scripts use the arctan form
                c = -comp_weights[0] * x[own_s] + comp_weights[1] * (x[other_s] - x[own_s])
            else:
                c = -comp_weights[0] * x[own_s] \
                    + comp_weights[1] * jnp.arctan(x[other_s] - x[own_s])
            if blocking_weight > 0:
                c = c + 0.5 * blocking_weight * (x[own_ey] - x[other_ey]) ** 2
            if obs_weight > 0:
                dxy = x[EGO_X:EGO_Y + 1] - x[TAR_X:TAR_Y + 1]
                sat = jnp.maximum(0.0, obs_cost_d - jnp.sqrt(jnp.sum(dxy ** 2) + 1e-12))
                c = c + 0.5 * obs_weight * sat ** 2
            return c

        return (stage, term)

    costs = [make_costs(EGO_S, TAR_S, EGO_EY, TAR_EY),
             make_costs(TAR_S, EGO_S, TAR_EY, EGO_EY)]

    # per-agent input-rate constraints (4 rows per stage per agent)
    def rate_constr(x, u, um):
        return jnp.array([(u[0] - um[0]) - dt * u_a_rate,
                          dt * (-u_a_rate) - (u[0] - um[0]),
                          (u[1] - um[1]) - dt * u_steer_rate,
                          dt * (-u_steer_rate) - (u[1] - um[1])])

    if rate_constraints:
        agent_constraints = [[rate_constr] * N + [None], [rate_constr] * N + [None]]
    else:
        # journal comparison-study convention: rate rows built but passed as None
        # (exact_dynamic_game.py:186-199)
        agent_constraints = [[None] * (N + 1), [None] * (N + 1)]

    # shared collision avoidance: (obs_d)^2 - ||p_ego - p_tar||^2 <= 0, stages 1..N
    def obs_avoid(x, u, um):
        dx = x[EGO_X] - x[TAR_X]
        dy = x[EGO_Y] - x[TAR_Y]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    def obs_avoid_term(x):
        dx = x[EGO_X] - x[TAR_X]
        dy = x[EGO_Y] - x[TAR_Y]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    shared_constraints = [None] + [obs_avoid] * (N - 1) + [obs_avoid_term]

    ub = _vehicle_bound(half_width, u_a_max, u_steer_max)
    lb = _neg(ub)
    bounds = {'ub': [ub, ub.copy()], 'lb': [lb, lb.copy()]}

    return Scenario(name=name, track=track, joint_model=joint, costs=costs,
                    agent_constraints=agent_constraints, shared_constraints=shared_constraints,
                    bounds=bounds, N=N, dt=dt, obs_d=obs_d, half_width=half_width,
                    input_ub=np.array([u_a_max, u_steer_max]),
                    input_lb=np.array([-u_a_max, -u_steer_max]),
                    input_rate_ub=np.array([u_a_rate, u_steer_rate]),
                    input_rate_lb=np.array([-u_a_rate, -u_steer_rate]))


def build_chicane_scenario(N: int = 25, theta_deg: float = 45.0, dt: float = 0.1,
                           half_width: float = 1.0, **kw) -> Scenario:
    """BASELINE config 1: two-agent chicane duel
    (``DGSQP_ALGAMES_monte_carlo_chicane.py:139-150``)."""
    track = ChicaneTrack(enter_straight_length=1, curve1_length=4,
                         curve1_swept_angle=theta_deg * np.pi / 180, mid_straight_length=1,
                         exit_straight_length=5, curve2_length=4,
                         curve2_swept_angle=theta_deg * np.pi / 180,
                         width=half_width * 2, slack=0.8, mirror=False)
    return build_racing_duel(track, N=N, dt=dt, half_width=half_width,
                             name=f'chicane_t{int(theta_deg)}_N{N}', **kw)


def build_dynamic_duel(N: int = 25, dt: float = 0.1, cost_setting: int = 0,
                       track_name: str = 'L_track_barc',
                       car_r: float = 0.23) -> Scenario:
    """Two DYNAMIC-bicycle (Pacejka) agents in the journal's exact game on L_track_barc.

    Mirrors ``comparison_study_barc/exact_dynamic_game_dynamic.py:13-204`` with
    ``globals.py`` constants (dt=0.1, rk4/M=10, car radii 0.23): quadratic input +
    input-rate stage costs, LINEAR terminal progress/competition cost
    ``-c0*s_own + c1*(s_other - s_own)``, NO per-agent constraints (the reference builds
    rate constraints but passes None), shared collision avoidance for stages 1..N and the
    terminal stage.  Bounds: |u_a|<=2.1, |u_steer|<=0.436, |x_tran|<=half-width.
    """
    from dgsqp_tpu.tracks.track_lib import get_track
    track = get_track(track_name)
    H = float(track.half_width)

    if cost_setting == 0:
        input_weight = (1.0, 1.0)
        input_rate_weight = (1.0, 1.0)
        comp_weights = (1.0, 5.0)
    elif cost_setting == 1:
        input_weight = (1e-1, 1e-1)
        input_rate_weight = (1e-1, 1e-1)
        comp_weights = (0.0, 1.0)
    else:
        raise ValueError(f'unknown cost_setting {cost_setting}')

    cfg = DynamicBicycleConfig(dt=dt, model_name='dynamic_bicycle', noise=False,
                               discretization_method='rk4', M=10, simple_slip=False,
                               tire_model='pacejka', mass=2.2187, yaw_inertia=0.02723,
                               wheel_friction=0.9, pacejka_b_front=5.0, pacejka_b_rear=5.0,
                               pacejka_c_front=2.28, pacejka_c_rear=2.28)
    car1 = DynamicBicycleCombined(0.0, cfg, track=track)
    car2 = DynamicBicycleCombined(0.0, DynamicBicycleConfig(**{**cfg.__dict__}), track=track)
    joint = MultiAgentDynamicsModel(0.0, [car1, car2], MultiAgentModelConfig(dt=dt))

    # joint-state indices (8 states per car: x y vx vy psidot epsi s xtran)
    C1_X, C1_Y, C1_S = 0, 1, 6
    C2_X, C2_Y, C2_S = 8, 9, 14
    obs_d = 2 * car_r

    def make_costs(own_s, other_s):
        w_in, w_rt = input_weight, input_rate_weight

        def stage(x, u, um):
            return 0.5 * (w_in[0] * u[0] ** 2 + w_in[1] * u[1] ** 2) \
                + 0.5 * (w_rt[0] * (u[0] - um[0]) ** 2 + w_rt[1] * (u[1] - um[1]) ** 2)

        def term(x):
            return -comp_weights[0] * x[own_s] + comp_weights[1] * (x[other_s] - x[own_s])

        return (stage, term)

    costs = [make_costs(C1_S, C2_S), make_costs(C2_S, C1_S)]

    def obs_avoid(x, u, um):
        dx = x[C1_X] - x[C2_X]
        dy = x[C1_Y] - x[C2_Y]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    def obs_avoid_term(x):
        dx = x[C1_X] - x[C2_X]
        dy = x[C1_Y] - x[C2_Y]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    shared_constraints = [None] + [obs_avoid] * (N - 1) + [obs_avoid_term]
    agent_constraints = [[None] * (N + 1), [None] * (N + 1)]

    u_a_max, u_steer_max = 2.1, 0.436
    ub = _vehicle_bound(H, u_a_max, u_steer_max)
    lb = _neg(ub)
    bounds = {'ub': [ub, ub.copy()], 'lb': [lb, lb.copy()]}

    return Scenario(name=f'dynamic_duel_N{N}_c{cost_setting}', track=track,
                    joint_model=joint, costs=costs,
                    agent_constraints=agent_constraints,
                    shared_constraints=shared_constraints,
                    bounds=bounds, N=N, dt=dt, obs_d=obs_d, half_width=H,
                    input_ub=np.array([u_a_max, u_steer_max]),
                    input_lb=np.array([-u_a_max, -u_steer_max]),
                    input_rate_ub=np.array([10.0, 4.5]),
                    input_rate_lb=np.array([-10.0, -4.5]))


def build_dynamic_approximate_duel(N: int = 25, dt: float = 0.1, cost_setting: int = 0,
                                   track_name: str = 'L_track_barc',
                                   car_r: float = 0.23,
                                   rate_constraints: bool = True) -> Scenario:
    """APPROXIMATE (MPCC) counterpart of :func:`build_dynamic_duel`: two
    progress-augmented DYNAMIC bicycles (Pacejka) on L_track_barc.

    Mirrors ``comparison_study_barc/approximate_dynamic_game_dynamic.py:13-230``:
    quadratic input + input-rate stage costs including the virtual arc-speed channel
    (weight 1e-4), linear terminal progress/competition cost on the progress states,
    shared collision avoidance on the global positions; contouring/lag costs and
    track-boundary constraints are added inside ``DGSQPV2FrenetApprox``.  As in
    :func:`build_approximate_duel`, the reference builds input-rate rows but passes
    None (``:194-201``); ``rate_constraints=True`` (our default) activates them as a
    per-stage trust region, ``False`` is the reference-faithful configuration.
    """
    from dgsqp_tpu.dynamics.progress_augmented import DynamicBicycleProgressAugmented
    from dgsqp_tpu.tracks.track_lib import get_track
    track = get_track(track_name)
    H = float(track.half_width)

    if cost_setting == 0:
        input_weight = (1.0, 1.0, 1e-4)
        input_rate_weight = (1.0, 1.0, 1e-4)
        comp_weights = (1.0, 5.0)
    elif cost_setting == 1:
        input_weight = (1e-1, 1e-1, 1e-4)
        input_rate_weight = (1e-1, 1e-1, 1e-4)
        comp_weights = (0.0, 1.0)
    else:
        raise ValueError(f'unknown cost_setting {cost_setting}')

    cfg = DynamicBicycleConfig(dt=dt, model_name='dynamic_bicycle', noise=False,
                               discretization_method='rk4', M=10, simple_slip=False,
                               tire_model='pacejka', mass=2.2187, yaw_inertia=0.02723,
                               wheel_friction=0.9, pacejka_b_front=5.0,
                               pacejka_b_rear=5.0, pacejka_c_front=2.28,
                               pacejka_c_rear=2.28)
    car1 = DynamicBicycleProgressAugmented(0.0, cfg, track=track)
    car2 = DynamicBicycleProgressAugmented(
        0.0, DynamicBicycleConfig(**{**cfg.__dict__}), track=track)
    joint = MultiAgentDynamicsModel(0.0, [car1, car2], MultiAgentModelConfig(dt=dt))

    # per-car PA layout [vx, vy, psidot, x, y, psi, s] (reference car{1,2}_{x,y,s}_idx
    # = 3,4,6 / 10,11,13)
    C1_X, C1_Y, C1_S = 3, 4, 6
    C2_X, C2_Y, C2_S = 10, 11, 13
    obs_d = 2 * car_r

    def make_cost(own_s, other_s):
        w, wr = input_weight, input_rate_weight

        def stage(x, u, um):
            return 0.5 * (w[0] * u[0] ** 2 + w[1] * u[1] ** 2 + w[2] * u[2] ** 2) \
                + 0.5 * (wr[0] * (u[0] - um[0]) ** 2 + wr[1] * (u[1] - um[1]) ** 2
                         + wr[2] * (u[2] - um[2]) ** 2)

        def term(x):
            return -comp_weights[0] * x[own_s] \
                + comp_weights[1] * (x[other_s] - x[own_s])
        return (stage, term)

    costs = [make_cost(C1_S, C2_S), make_cost(C2_S, C1_S)]

    def obs_avoid(x, u, um):
        dx = x[C1_X] - x[C2_X]
        dy = x[C1_Y] - x[C2_Y]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    def obs_avoid_term(x):
        dx = x[C1_X] - x[C2_X]
        dy = x[C1_Y] - x[C2_Y]
        return jnp.array([obs_d ** 2 - (dx * dx + dy * dy)])

    shared_constraints = [None] + [obs_avoid] * (N - 1) + [obs_avoid_term]

    u_a_rate, u_steer_rate, u_ds_rate = 10.0, 4.5, 5.0

    def rate_constr(x, u, um):
        return jnp.array([(u[0] - um[0]) - dt * u_a_rate,
                          -dt * u_a_rate - (u[0] - um[0]),
                          (u[1] - um[1]) - dt * u_steer_rate,
                          -dt * u_steer_rate - (u[1] - um[1]),
                          (u[2] - um[2]) - dt * u_ds_rate,
                          -dt * u_ds_rate - (u[2] - um[2])])

    if rate_constraints:
        agent_constraints = [[rate_constr] * N + [None], [rate_constr] * N + [None]]
    else:
        agent_constraints = [[None] * (N + 1), [None] * (N + 1)]

    u_a_max, u_steer_max, u_ds_max = 2.1, 0.436, 4.0

    def bound(sign):
        return VehicleState(
            x=Position(x=sign * np.inf, y=sign * np.inf),
            p=ParametricPose(s=sign * np.inf, x_tran=sign * np.inf,
                             e_psi=sign * np.inf),
            e=OrientationEuler(psi=sign * np.inf),
            v=BodyLinearVelocity(v_long=sign * np.inf, v_tran=sign * np.inf),
            w=BodyAngularVelocity(w_psi=sign * np.inf),
            u=VehicleActuation(u_a=sign * u_a_max, u_steer=sign * u_steer_max,
                               u_ds=u_ds_max if sign > 0 else 0.0))

    bounds = {'ub': [bound(1), bound(1)], 'lb': [bound(-1), bound(-1)]}

    return Scenario(name=f'dynamic_approx_duel_N{N}_c{cost_setting}', track=track,
                    joint_model=joint, costs=costs,
                    agent_constraints=agent_constraints,
                    shared_constraints=shared_constraints, bounds=bounds, N=N, dt=dt,
                    obs_d=obs_d, half_width=H,
                    input_ub=np.array([u_a_max, u_steer_max, u_ds_max]),
                    input_lb=np.array([-u_a_max, -u_steer_max, 0.0]),
                    input_rate_ub=np.array([u_a_rate, u_steer_rate, u_ds_rate]),
                    input_rate_lb=np.array([-u_a_rate, -u_steer_rate, -u_ds_rate]))


def build_curve_scenario(N: int = 25, theta_deg: float = 90.0, dt: float = 0.1,
                         half_width: float = 1.0, **kw) -> Scenario:
    """BASELINE config 2: curved-track duel (``DGSQP_ALGAMES_monte_carlo_curve.py``)."""
    track = CurveTrack(enter_straight_length=1, curve_length=8,
                       curve_swept_angle=theta_deg * np.pi / 180, exit_straight_length=5,
                       width=half_width * 2, slack=0.8, ccw=True)
    return build_racing_duel(track, N=N, dt=dt, half_width=half_width,
                             name=f'curve_t{int(theta_deg)}_N{N}', **kw)


def build_agents_scenario(M: int = 3, N: int = 25, theta_deg: float = 90.0,
                          dt: float = 0.1, half_width: float = 1.0,
                          comp_weights=(10.0, 5.0), obs_r: float = 0.4,
                          u_a_max: float = 2.1, u_steer_max: float = 0.436,
                          u_a_rate: float = 10.0, u_steer_rate: float = np.pi) -> Scenario:
    """BASELINE config 4: agent-count scaling study, M kinematic-bicycle-combined agents on
    a curved track (``scripts/DGSQP_monte_carlo_agents.py:98-290``).

    Per-agent terminal cost: own-progress + arctan competitive terms against EVERY other
    agent; shared constraints: pairwise collision avoidance with radius ``obs_r`` each.
    """
    track = CurveTrack(enter_straight_length=1, curve_length=8,
                       curve_swept_angle=theta_deg * np.pi / 180, exit_straight_length=5,
                       width=half_width * 2, slack=0.8, ccw=True)
    cfg = KinematicBicycleConfig(dt=dt, model_name='kinematic_bicycle_cl', noise=False,
                                 discretization_method='euler',
                                 wheel_dist_front=0.13, wheel_dist_rear=0.13,
                                 drag_coefficient=0.1, slip_coefficient=0.1)
    models = [KinematicBicycleCombined(0.0, KinematicBicycleConfig(**{**cfg.__dict__}),
                                       track=track) for _ in range(M)]
    joint = MultiAgentDynamicsModel(0.0, models, MultiAgentModelConfig(dt=dt))

    n_qa = 6
    xy_idx = [np.array([0, 1]) + n_qa * a for a in range(M)]
    s_idx = [4 + n_qa * a for a in range(M)]

    def make_cost(a):
        def stage(x, u, um):
            return 0.5 * (u[0] ** 2 + u[1] ** 2) \
                + 0.5 * ((u[0] - um[0]) ** 2 + (u[1] - um[1]) ** 2)

        def term(x):
            c = -comp_weights[0] * x[s_idx[a]]
            for b in range(M):
                if b != a:
                    c = c + comp_weights[1] * jnp.arctan(x[s_idx[b]] - x[s_idx[a]])
            return c
        return (stage, term)

    costs = [make_cost(a) for a in range(M)]

    def rate_constr(x, u, um):
        return jnp.array([(u[0] - um[0]) - dt * u_a_rate,
                          dt * (-u_a_rate) - (u[0] - um[0]),
                          (u[1] - um[1]) - dt * u_steer_rate,
                          dt * (-u_steer_rate) - (u[1] - um[1])])

    agent_constraints = [[rate_constr] * N + [None] for _ in range(M)]

    obs_d = 2 * obs_r

    def obs_avoid(x):
        rows = []
        for i in range(M):
            for j in range(i + 1, M):
                dxy = x[xy_idx[i]] - x[xy_idx[j]]
                rows.append(obs_d ** 2 - jnp.dot(dxy, dxy))
        return jnp.stack(rows)

    shared_constraints = [None] + [(lambda x, u, um: obs_avoid(x))] * (N - 1) \
        + [lambda x: obs_avoid(x)]

    ub = _vehicle_bound(half_width, u_a_max, u_steer_max)
    bounds = {'ub': [ub.copy() for _ in range(M)],
              'lb': [_neg(ub) for _ in range(M)]}

    return Scenario(name=f'agents_M{M}_t{int(theta_deg)}_N{N}', track=track,
                    joint_model=joint, costs=costs, agent_constraints=agent_constraints,
                    shared_constraints=shared_constraints, bounds=bounds, N=N, dt=dt,
                    obs_d=obs_d, half_width=half_width,
                    input_ub=np.array([u_a_max, u_steer_max]),
                    input_lb=np.array([-u_a_max, -u_steer_max]),
                    input_rate_ub=np.array([u_a_rate, u_steer_rate]),
                    input_rate_lb=np.array([-u_a_rate, -u_steer_rate]))


def build_merge_scenario(N: int = 20, dt: float = 0.1) -> Scenario:
    """BASELINE config 3: 3-unicycle highway merge in a hand-built polygonal environment
    (``scripts/DGSQP_merge_monte_carlo.py:40-384``).

    Cars 1-2 drive the straight lane, car 3 enters on a ramp; per-agent lane half-plane
    constraints (piecewise normals on the ramp), pairwise collision avoidance shared
    constraints, quadratic goal-tracking costs.
    """
    ll, lw, mw, mp = 5.0, 0.3, 0.3, 1.5
    th = np.pi / 12
    r = 0.1

    ns = np.array([0.0, 1.0])
    nm = np.array([-np.sin(th), np.cos(th)])
    x1 = np.array([0.0, lw])
    x3 = np.array([0.0, 0.0])
    x5 = np.array([mp, 0.0])
    x6 = np.array([mp + lw / np.tan(th), lw])
    x7 = np.array([mp + mw / np.sin(th), 0.0])

    goals = [np.array([4.0, 0.15, 0.3, 0.0]),
             np.array([4.5, 0.15, 0.3, 0.0]),
             np.array([4.25, 0.15, 0.3, 0.0])]

    models = [KinematicUnicycle(0.0, UnicycleConfig(dt=dt, discretization_method='rk3', M=1))
              for _ in range(3)]
    joint = MultiAgentDynamicsModel(0.0, models, MultiAgentModelConfig(dt=dt))

    n_qa = 4
    xy_idx = [np.array([0, 1]) + n_qa * a for a in range(3)]
    q_idx = [np.arange(4) + n_qa * a for a in range(3)]

    W = jnp.asarray(np.diag([1.0, 10.0, 1.0, 1.0]))

    def make_cost(a):
        goal = jnp.asarray(goals[a])

        def stage(x, u, um):
            dq = x[q_idx[a]] - goal
            return 0.5 * 0.1 * (u[0] ** 2 + u[1] ** 2) + 0.5 * dq @ W @ dq

        def term(x):
            dq = x[q_idx[a]] - goal
            return 10.0 * 0.5 * dq @ W @ dq
        return (stage, term)

    costs = [make_cost(a) for a in range(3)]

    # lane constraints (reference merge script lines 66-74, 316-318)
    def straight_lane(p):
        return jnp.array([p[1] - (lw - r),     # below left boundary (shifted in by r)
                          r - p[1]])           # above right boundary

    def ramp_lane(p):
        n_l = jnp.where(p[0] < x6[0], jnp.asarray(nm), jnp.asarray(ns))
        n_r = jnp.where(p[0] < x7[0], -jnp.asarray(nm), -jnp.asarray(ns))
        c_l = n_l @ (p - jnp.asarray(x6)) + r
        c_r = n_r @ (p - jnp.asarray(x7)) + r
        return jnp.array([c_l, c_r])

    def make_lane(a):
        lane = ramp_lane if a == 2 else straight_lane

        def stage(x, u, um):
            return lane(x[xy_idx[a]])

        def term(x):
            return lane(x[xy_idx[a]])
        return [stage] * N + [term]

    agent_constraints = [make_lane(a) for a in range(3)]

    agent_r = 0.1
    obs_d = 2 * agent_r

    def obs_avoid(x):
        rows = []
        for i in range(3):
            for j in range(i + 1, 3):
                dxy = x[xy_idx[i]] - x[xy_idx[j]]
                rows.append(obs_d ** 2 - jnp.dot(dxy, dxy))
        return jnp.stack(rows)

    shared_constraints = [None] + [(lambda x, u, um: obs_avoid(x))] * (N - 1) \
        + [lambda x: obs_avoid(x)]

    def bound_state(v_max, u_a, u_steer):
        st = VehicleState(
            x=Position(x=np.inf, y=np.inf),
            p=ParametricPose(s=np.inf, x_tran=np.inf, e_psi=np.inf),
            e=OrientationEuler(psi=np.inf),
            v=BodyLinearVelocity(v_long=v_max, v_tran=np.inf),
            w=BodyAngularVelocity(w_psi=np.inf),
            u=VehicleActuation(u_a=u_a, u_steer=u_steer))
        return st

    ub = bound_state(2.0, 2.0, 4.5)
    lb = VehicleState(
        x=Position(x=-np.inf, y=-np.inf),
        p=ParametricPose(s=-np.inf, x_tran=-np.inf, e_psi=-np.inf),
        e=OrientationEuler(psi=-np.inf),
        v=BodyLinearVelocity(v_long=-2.0, v_tran=-np.inf),
        w=BodyAngularVelocity(w_psi=-np.inf),
        u=VehicleActuation(u_a=-2.0, u_steer=-4.5))
    bounds = {'ub': [ub.copy() for _ in range(3)], 'lb': [lb.copy() for _ in range(3)]}

    sc = Scenario(name=f'merge_N{N}', track=None, joint_model=joint, costs=costs,
                  agent_constraints=agent_constraints, shared_constraints=shared_constraints,
                  bounds=bounds, N=N, dt=dt, obs_d=obs_d, half_width=lw / 2,
                  input_ub=np.array([2.0, 4.5]), input_lb=np.array([-2.0, -4.5]),
                  input_rate_ub=np.array([np.inf, np.inf]),
                  input_rate_lb=np.array([-np.inf, -np.inf]))
    sc.merge_geometry = dict(ll=ll, lw=lw, mw=mw, mp=mp, th=th, r=r,
                             x1=x1, x3=x3, x5=x5, x6=x6, x7=x7, goals=goals)
    return sc


def build_approximate_duel(track=None, N: int = 25, dt: float = 0.1,
                           comp_weights=(1.0, 5.0), input_weight=(1.0, 1.0, 1e-4),
                           input_rate_weight=(1.0, 1.0, 1e-4), agent_r: float = 0.21,
                           u_a_max: float = 2.1, u_steer_max: float = 0.436,
                           u_ds_max: float = 4.0, u_a_rate: float = 10.0,
                           u_steer_rate: float = 4.5, u_ds_rate: float = 5.0,
                           half_width: float = 1.0, rate_constraints: bool = True,
                           name: str = 'approx_duel') -> Scenario:
    """Approximate (MPCC) racing duel on progress-augmented kinematic bicycles.

    Mirrors the comparison-study factory
    (``scripts/comparison_study_barc/approximate_dynamic_game.py:13-226``): quadratic
    input/rate stage costs (incl. the virtual arc-speed channel), linear progress +
    competitive terminal costs on the progress states, shared collision avoidance; the
    contouring/lag costs and track-boundary constraints are added inside
    ``DGSQPV2FrenetApprox`` through the per-iteration parameter pytree.
    """
    from dgsqp_tpu.dynamics.progress_augmented import KinematicBicycleProgressAugmented
    if track is None:
        track = ChicaneTrack(enter_straight_length=1, curve1_length=4,
                             curve1_swept_angle=np.pi / 4, mid_straight_length=1,
                             exit_straight_length=5, curve2_length=4,
                             curve2_swept_angle=np.pi / 4, width=half_width * 2,
                             slack=0.8, mirror=False)
    cfg = KinematicBicycleConfig(dt=dt, model_name='kinematic_bicycle', noise=False,
                                 discretization_method='euler',
                                 wheel_dist_front=0.13, wheel_dist_rear=0.13)
    car1 = KinematicBicycleProgressAugmented(0.0, cfg, track=track)
    car2 = KinematicBicycleProgressAugmented(
        0.0, KinematicBicycleConfig(**{**cfg.__dict__}), track=track)
    joint = MultiAgentDynamicsModel(0.0, [car1, car2], MultiAgentModelConfig(dt=dt))

    # joint indices: agent blocks of 5 states [x, y, v, psi, s]
    S1, S2 = 4, 9
    XY1, XY2 = (0, 1), (5, 6)
    obs_d = 2 * agent_r

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

    # Input-rate rows as agent constraints.  The reference study builds these rows but
    # passes None (approximate_dynamic_game.py:194-201) and instead tames the MPCC's
    # linearization-chasing with its reg~1e2 proximal schedule over ~400 creeping
    # iterations (measured: our engine reproduces exactly that — 405-451 x64
    # iterations to stat 1e-3 without the rows).  The rows are the TPU-native answer:
    # they act as a per-stage trust region that keeps the re-linearization point
    # honest, giving 11-25-iteration solves.  Two conditions keep the game faithful:
    # (1) build_exact_duel carries the identical rows on the real channels, and
    # (2) the virtual arc-speed channel's previous input must be seeded with the
    # car's actual initial progress rate (samplers/bench set u_prev[u_ds] = ds0) —
    # with u_prev=0 the row caps u_ds(0) at 0.5 m/s while the car moves at 2-3 m/s
    # and the q_l=1e3 lag cost forces a brake-and-swerve start (measured: 0%
    # exact<->approx match)
    def rate_constr(x, u, um):
        return jnp.array([(u[0] - um[0]) - dt * u_a_rate,
                          -dt * u_a_rate - (u[0] - um[0]),
                          (u[1] - um[1]) - dt * u_steer_rate,
                          -dt * u_steer_rate - (u[1] - um[1]),
                          (u[2] - um[2]) - dt * u_ds_rate,
                          -dt * u_ds_rate - (u[2] - um[2])])

    if rate_constraints:
        agent_constraints = [[rate_constr] * N + [None], [rate_constr] * N + [None]]
    else:
        # reference-faithful configuration: the study builds the rate rows but
        # passes None (approximate_dynamic_game.py:194-201), relying on the
        # reg~1e2 proximal schedule instead — the measured ~400-iteration frozen-P
        # creep configuration (see the rate-row note above)
        agent_constraints = [[None] * (N + 1), [None] * (N + 1)]

    def bound(sign):
        st = VehicleState(
            x=Position(x=sign * np.inf, y=sign * np.inf),
            p=ParametricPose(s=sign * np.inf, x_tran=sign * np.inf, e_psi=sign * np.inf),
            e=OrientationEuler(psi=sign * np.inf),
            v=BodyLinearVelocity(v_long=sign * np.inf, v_tran=sign * np.inf),
            w=BodyAngularVelocity(w_psi=sign * np.inf),
            u=VehicleActuation(u_a=sign * u_a_max, u_steer=sign * u_steer_max,
                               u_ds=u_ds_max if sign > 0 else 0.0))
        return st

    bounds = {'ub': [bound(1), bound(1)], 'lb': [bound(-1), bound(-1)]}

    return Scenario(name=name, track=track, joint_model=joint, costs=costs,
                    agent_constraints=agent_constraints,
                    shared_constraints=shared_constraints, bounds=bounds, N=N, dt=dt,
                    obs_d=obs_d, half_width=half_width,
                    input_ub=np.array([u_a_max, u_steer_max, u_ds_max]),
                    input_lb=np.array([-u_a_max, -u_steer_max, 0.0]),
                    input_rate_ub=np.array([u_a_rate, u_steer_rate, u_ds_rate]),
                    input_rate_lb=np.array([-u_a_rate, -u_steer_rate, -u_ds_rate]))


def build_exact_duel(track=None, N: int = 25, dt: float = 0.1,
                     comp_weights=(1.0, 5.0), agent_r: float = 0.21,
                     half_width: float = 1.0, name: str = 'exact_duel') -> Scenario:
    """EXACT-formulation counterpart of :func:`build_approximate_duel` — the journal
    comparison study's exact game (``comparison_study_barc/exact_dynamic_game.py:13-240``)
    on the same track with the same costs: frenet-combined kinematic bicycles, quadratic
    input + input-rate stage costs (weights 1.0), LINEAR terminal progress/competition
    ``-c0*s_own + c1*(s_other - s_own)``, shared collision avoidance (radius 0.21 each,
    matching the approximate duel), track kept via the |x_tran| <= half-width state
    bound.  Input-rate rows on the real channels mirror the approximate duel's (the
    reference study passes None in both builders and pays ~400 proximal iterations
    instead — see the rate-row note in build_approximate_duel), so the two
    formulations of the SAME game differ only in how the track geometry enters.
    """
    if track is None:
        track = ChicaneTrack(enter_straight_length=1, curve1_length=4,
                             curve1_swept_angle=np.pi / 4, mid_straight_length=1,
                             exit_straight_length=5, curve2_length=4,
                             curve2_swept_angle=np.pi / 4, width=half_width * 2,
                             slack=0.8, mirror=False)
    # drag/slip 0: the comparison-study configs leave them at their defaults
    # (exact_dynamic_game.py KinematicBicycleConfig) and the progress-augmented model
    # carries none — the two formulations must share the identical plant
    return build_racing_duel(track, N=N, dt=dt, comp_weights=comp_weights,
                             input_weight=(1.0, 1.0), input_rate_weight=(1.0, 1.0),
                             agent_r=agent_r, half_width=half_width,
                             u_a_rate=10.0, u_steer_rate=4.5, comp_linear=True,
                             drag_coefficient=0.0, slip_coefficient=0.0,
                             rate_constraints=True, name=name)


def joint_constraints_for_algames(scenario):
    """Concatenate per-agent and shared constraints into the joint stage lists ALGAMES
    consumes (the reference MC scripts hand-build exactly this combination,
    ``DGSQP_ALGAMES_monte_carlo_chicane.py:344-352``)."""
    M = scenario.joint_model.n_a
    offs = scenario.joint_model.u_offsets
    N = scenario.N
    shared = scenario.shared_constraints or [None] * (N + 1)

    def make_stage(k):
        fns = [(a, scenario.agent_constraints[a][k]) for a in range(M)
               if scenario.agent_constraints[a] is not None
               and scenario.agent_constraints[a][k] is not None]
        sh = shared[k]
        if not fns and sh is None:
            return None

        # NB: plain closure, no default-arg capture — extra parameters would make the
        # arity probe treat this as a P-parameterized callable
        def stage(x, u, um):
            parts = [jnp.atleast_1d(fn(x, u[offs[a]:offs[a + 1]],
                                       um[offs[a]:offs[a + 1]]))
                     for a, fn in fns]
            if sh is not None:
                parts.append(jnp.atleast_1d(sh(x, u, um)))
            return jnp.concatenate(parts)
        return stage

    def make_term():
        fns = [scenario.agent_constraints[a][N] for a in range(M)
               if scenario.agent_constraints[a] is not None
               and scenario.agent_constraints[a][N] is not None]
        sh = shared[N]
        if not fns and sh is None:
            return None

        def term(x):
            parts = [jnp.atleast_1d(fn(x)) for fn in fns]
            if sh is not None:
                parts.append(jnp.atleast_1d(sh(x)))
            return jnp.concatenate(parts)
        return term

    return [make_stage(k) for k in range(N)] + [make_term()]

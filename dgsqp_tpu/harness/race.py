"""Closed-loop hierarchical racing stack: plant sim + tracking MPC + game planner.

Compact re-implementation of the reference race demo
(``/root/reference/scripts/race/race_main.py`` (624 LoC), ``game_setup_unicycle.py``,
``car{1,2}_tracking_controller_setup.py``):

  * two dynamic-bicycle-combined plants stepped at a fine simulation rate
    (``race_main.py:105-135,586-597``);
  * per-car CA-LTV-MPC raceline trackers at the control rate, with the opponent's predicted
    position entering through per-stage collision-avoidance parameters
    (``car1_tracking_controller_setup.py:56-116``, ``race_main.py:438-456``);
  * a DGSQP game planner on kinematic-unicycle-combined models, triggered when the two cars'
    raceline lookaheads come within interaction range; its converged solution becomes a
    time-parametrized reference that overrides the raceline over the game's s-range
    (``race_main.py:495-578,331-424``).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.dynamics import (DynamicBicycleConfig, DynamicBicycleCombined,
                                KinematicUnicycleCombined, MultiAgentDynamicsModel,
                                MultiAgentModelConfig, UnicycleConfig)
from dgsqp_tpu.dynamics.simulator import DynamicsSimulator
from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.pid import PIDLaneFollower
from dgsqp_tpu.solvers.solver_types import CALTVMPCParams, DGSQPParams, PIDParams
from dgsqp_tpu.tracks.track_lib import get_track
from dgsqp_tpu.types import (BodyAngularVelocity, BodyLinearVelocity, OrientationEuler,
                             ParametricPose, Position, VehicleActuation, VehicleState)


def _centerline_raceline(track, v: float = 1.5, n: int = 400):
    """Synthetic raceline along the centerline at constant speed (used when no recorded
    raceline file is available).  Columns: [x, y, psi, v_long, v_tran, psidot, e_psi, s, e_y]."""
    from dgsqp_tpu.tracks.track_lib import RacelineInterpolator
    L = track.track_length
    s = np.linspace(0, 2 * L, n)
    zeros = np.zeros(n)
    xyp = np.asarray(track.local_to_global(np.stack([s, zeros, zeros], -1)))
    mat = np.stack([xyp[:, 0], xyp[:, 1], xyp[:, 2], np.full(n, v), zeros, zeros,
                    zeros, s, zeros], axis=-1)
    T = s / v
    return RacelineInterpolator(T, mat)


def make_tracker(track, N: int = 20, dt: float = 0.1, obs_r: float = 0.21):
    """Build one car's raceline-tracking CA-LTV-MPC
    (mirrors ``car1_tracking_controller_setup.py``)."""
    L, H = track.track_length, track.half_width
    cfg = DynamicBicycleConfig(dt=dt, model_name='dynamic_bicycle', noise=False,
                               discretization_method='rk4', simple_slip=False,
                               tire_model='pacejka', mass=2.2187, yaw_inertia=0.02723,
                               wheel_friction=0.96,
                               pacejka_b_front=0.99, pacejka_b_rear=0.99,
                               pacejka_c_front=11.04, pacejka_c_rear=11.04)
    model = DynamicBicycleCombined(0.0, cfg, track=track)

    ub = VehicleState(x=Position(x=10, y=10),
                      p=ParametricPose(s=2 * L, x_tran=H, e_psi=100),
                      v=BodyLinearVelocity(v_long=10, v_tran=10),
                      w=BodyAngularVelocity(w_psi=10),
                      u=VehicleActuation(u_a=2.1, u_steer=0.436))
    lb = VehicleState(x=Position(x=-10, y=-10),
                      p=ParametricPose(s=-2 * L, x_tran=-H, e_psi=-100),
                      v=BodyLinearVelocity(v_long=-10, v_tran=-10),
                      w=BodyAngularVelocity(w_psi=-10),
                      u=VehicleActuation(u_a=-2.1, u_steer=-0.436))
    du_ub = VehicleState(u=VehicleActuation(u_a=10.0, u_steer=4.5))
    du_lb = VehicleState(u=VehicleActuation(u_a=-10.0, u_steer=-4.5))

    W = jnp.asarray(np.diag([0, 0, 1, 0, 0, 1, 1, 1]).astype(float))

    def state_stage(q, P, k):
        dq = q - P['q_ref'][k]
        return 0.5 * dq @ W @ dq
    state_stage.stage_indexed = True

    def state_term(q, P, k):
        dq = q - P['q_ref'][k]
        return 0.5 * dq @ W @ dq - 1.0 * q[6]
    state_term.stage_indexed = True

    def input_cost(u):
        return 0.5 * (1e-4 * u[0] ** 2 + 1e-4 * u[1] ** 2)

    def rate_cost(du):
        return 0.5 * (0.01 * du[0] ** 2 + 1.0 * du[1] ** 2)

    def obs_avoid(q, u, P, k):
        d = q[0:2] - P['p_obs'][k]
        return jnp.atleast_1d((2 * obs_r) ** 2 - jnp.dot(d, d))
    obs_avoid.stage_indexed = True
    obs_avoid.n_out = 1

    costs = {'state': [state_stage] * N + [state_term],
             'input': [input_cost] * (N + 1),
             'rate': [rate_cost] * N}
    constraints = {'state_input': [None] + [obs_avoid] * N, 'rate': [None] * N}
    params = CALTVMPCParams(N=N, dt=dt, qp_iters=2, damping=0.75,
                            wrapped_state_idxs=[6], wrapped_state_periods=[L])
    mpc = CA_LTV_MPC(model, costs, constraints,
                     {'qu_ub': ub, 'qu_lb': lb, 'du_ub': du_ub, 'du_lb': du_lb},
                     params, print_method=None)
    return model, mpc


def make_game_planner(track, N: int = 20, dt: float = 0.1, obs_r: float = 0.21):
    """DGSQP planner on kinematic-unicycle-combined models
    (mirrors ``game_setup_unicycle.py``)."""
    H = track.half_width
    models = [KinematicUnicycleCombined(0.0, UnicycleConfig(dt=dt), track=track)
              for _ in range(2)]
    joint = MultiAgentDynamicsModel(0.0, models, MultiAgentModelConfig(dt=dt))

    S1, S2 = 4, 10
    XY1, XY2 = (0, 1), (6, 7)
    obs_d = 2 * obs_r

    def make_cost(own_s, other_s):
        def stage(x, u, um):
            return 0.5 * (0.1 * u[0] ** 2 + 0.1 * u[1] ** 2) \
                + 0.5 * (0.1 * (u[0] - um[0]) ** 2 + 0.1 * (u[1] - um[1]) ** 2)

        def term(x):
            return -1.0 * x[own_s] + 5.0 * jnp.arctan(x[other_s] - x[own_s])
        return (stage, term)

    costs = [make_cost(S1, S2), make_cost(S2, S1)]

    def obs_avoid(x, u, um):
        d0 = x[XY1[0]] - x[XY2[0]]
        d1 = x[XY1[1]] - x[XY2[1]]
        return jnp.array([obs_d ** 2 - (d0 * d0 + d1 * d1)])

    def obs_avoid_term(x):
        d0 = x[XY1[0]] - x[XY2[0]]
        d1 = x[XY1[1]] - x[XY2[1]]
        return jnp.array([obs_d ** 2 - (d0 * d0 + d1 * d1)])

    shared = [None] + [obs_avoid] * (N - 1) + [obs_avoid_term]

    def bound(sign):
        return VehicleState(
            x=Position(x=sign * np.inf, y=sign * np.inf),
            p=ParametricPose(s=sign * np.inf, x_tran=sign * H, e_psi=sign * np.inf),
            e=OrientationEuler(psi=sign * np.inf),
            v=BodyLinearVelocity(v_long=sign * np.inf, v_tran=sign * np.inf),
            w=BodyAngularVelocity(w_psi=sign * np.inf),
            u=VehicleActuation(u_a=sign * 2.0, u_steer=sign * 2.0))

    params = DGSQPParams(N=N, dt=dt, reg=1e-3, nonmono_ls=True, line_search_iters=50,
                         sqp_iters=50, p_tol=1e-3, d_tol=1e-3, beta=0.01, tau=0.5)
    planner = DGSQP(joint, costs, [None, None], shared,
                    {'ub': [bound(1), bound(1)], 'lb': [bound(-1), bound(-1)]},
                    params, print_method=None)
    return joint, planner


@dataclass
class RaceConfig:
    track_name: str = 'L_track_barc'
    control_dt: float = 0.1
    sim_dt: float = 0.01
    mpc_N: int = 20
    game_N: int = 20
    obs_r: float = 0.21
    lookahead_time: float = 1.0
    lookahead_window: int = 10
    n_steps: int = 50
    raceline_speed: float = 1.5
    # recorded raceline (the reference demo tracks data/L_track_barc_raceline.npz,
    # race_main.py:137-151); None falls back to the synthetic centerline, and
    # time_scale slows the recorded line down (reference uses 1.38-1.45)
    raceline_file: Optional[str] = 'L_track_barc_raceline.npz'
    raceline_time_scale: float = 1.4


class RaceStack:
    """Two-car closed-loop race with game-planner interventions."""

    def __init__(self, config: RaceConfig = None, track=None):
        cfg = config or RaceConfig()
        self.cfg = cfg
        self.track = track if track is not None else get_track(cfg.track_name)
        self.raceline = None
        if cfg.raceline_file and track is None:
            # the recorded raceline is only valid on its own track
            from pathlib import Path
            from dgsqp_tpu.tracks.track_lib import load_mpclab_raceline
            path = Path(__file__).parent / 'data' / cfg.raceline_file
            if path.exists():
                self.raceline, _, _ = load_mpclab_raceline(
                    str(path), cfg.track_name, time_scale=cfg.raceline_time_scale)
        if self.raceline is None:
            self.raceline = _centerline_raceline(self.track, v=cfg.raceline_speed)
        self.L = self.track.track_length

        self.models, self.trackers = [], []
        for _ in range(2):
            m, mpc = make_tracker(self.track, N=cfg.mpc_N, dt=cfg.control_dt,
                                  obs_r=cfg.obs_r)
            self.models.append(m)
            self.trackers.append(mpc)
        self.sims = [DynamicsSimulator(0.0, m) for m in self.models]
        self.game_joint, self.planner = make_game_planner(self.track, N=cfg.game_N,
                                                          dt=cfg.control_dt, obs_r=cfg.obs_r)
        self.solve_game = True
        self.game_refs = [None, None]       # (t_grid, q_ref_game (n, 8), s_lim)
        self.history = []
        self.game_log = []

    # ----------------------------------------------------------------- helpers
    def _raceline_ref(self, state, car: int):
        """Per-stage reference states for the tracking MPC (raceline or game override,
        reference ``race_main.py:331-424``)."""
        cfg = self.cfg
        N = cfg.mpc_N
        s = np.mod(state.p.s, self.L)
        refs = np.zeros((N + 1, 8))
        game = self.game_refs[car]
        if game is not None:
            t_grid, q_game, s_lim = game
            if s_lim[0] - 1e-3 <= s <= s_lim[1]:
                t0 = float(np.interp(s, q_game[:, 6], t_grid))
                tt = t0 + cfg.control_dt * np.arange(N + 1)
                for i in range(8):
                    refs[:, i] = np.interp(tt, t_grid, q_game[:, i])
                return refs
            if s > s_lim[1]:
                self.game_refs[car] = None
        t0 = float(self.raceline.s2t(s))
        tt = t0 + cfg.control_dt * np.arange(N + 1)
        cols = self.raceline(tt)
        # raceline columns [x, y, psi, v_long, v_tran, psidot, e_psi, s, e_y]
        # -> model state  [x, y, v_long, v_tran, psidot, e_psi, s, e_y]
        mat = np.stack([np.asarray(c) for c in cols], axis=-1)
        refs[:, 0:2] = mat[:, 0:2]
        refs[:, 2] = mat[:, 3]
        refs[:, 3] = mat[:, 4]
        refs[:, 4] = mat[:, 5]
        refs[:, 5] = mat[:, 6]
        refs[:, 6] = mat[:, 7]
        refs[:, 7] = mat[:, 8]
        return refs

    def _maybe_solve_game(self, states):
        cfg = self.cfg
        if not self.solve_game:
            # re-arm once both cars have exited the game segment (their refs are
            # cleared by _raceline_ref when s passes s_lim) — the reference demo
            # re-enables interaction detection every step a game is not active
            # (race_main.py:495-578); the one-shot version had at most one
            # intervention per race
            if all(ref is None for ref in self.game_refs):
                self.solve_game = True
            else:
                return
        t1 = float(self.raceline.s2t(np.mod(states[0].p.s, self.L)))
        t2 = float(self.raceline.s2t(np.mod(states[1].p.s, self.L)))
        la1 = np.stack([np.asarray(c) for c in self.raceline(
            t1 + cfg.lookahead_time + cfg.control_dt * np.arange(cfg.lookahead_window))],
            axis=-1)
        la2 = np.stack([np.asarray(c) for c in self.raceline(
            t2 + cfg.lookahead_time + cfg.control_dt * np.arange(cfg.lookahead_window))],
            axis=-1)
        d = np.linalg.norm(la1[:, :2] - la2[:, :2], axis=1)
        close = d <= 4 * cfg.obs_r
        free = d >= 2 * cfg.obs_r
        idxs = np.argwhere(close & free)
        if len(idxs) == 0:
            return
        i = int(idxs[0][0])
        # game initial states from the lookahead points
        game_states = []
        for la in (la1, la2):
            st = VehicleState(t=0.0)
            st.x.x, st.x.y = la[i, 0], la[i, 1]
            st.v.v_long = la[i, 3]
            st.p.e_psi, st.p.s, st.p.x_tran = la[i, 6], la[i, 7], la[i, 8]
            game_states.append(st)

        # PID warm start for the unicycle game (Fx, wz inputs ~ 0 hold speed)
        u_ws = np.zeros((cfg.game_N, 4))
        self.planner.set_warm_start(u_ws)
        info = self.planner.solve(game_states)
        self.game_log.append(dict(info={k: v for k, v in info.items()
                                        if k in ('msg', 'num_iters', 'cond')},
                                  idx=i))
        if info['msg'] in ('conv_abs_tol', 'conv_rel_tol'):
            q_game = self.planner.q_pred       # (N+1, 12)
            t_base1 = t1 + cfg.lookahead_time + cfg.control_dt * i
            t_base2 = t2 + cfg.lookahead_time + cfg.control_dt * i
            for car, (blk, t_base) in enumerate([(q_game[:, :6], t_base1),
                                                 (q_game[:, 6:], t_base2)]):
                # unicycle state [x, y, v, epsi, s, ey] -> tracker ref [x, y, vx, vy,
                # psidot, epsi, s, ey]
                q_ref = np.zeros((blk.shape[0], 8))
                q_ref[:, 0:2] = blk[:, 0:2]
                q_ref[:, 2] = blk[:, 2]
                q_ref[:, 5:] = blk[:, 3:]
                t_grid = t_base + cfg.control_dt * np.arange(blk.shape[0])
                self.game_refs[car] = (t_grid, q_ref, (q_ref[0, 6], q_ref[-1, 6]))
            self.solve_game = False

    # --------------------------------------------------------------------- run
    def run(self, initial_states=None, n_steps: Optional[int] = None):
        cfg = self.cfg
        n_steps = n_steps or cfg.n_steps
        if initial_states is None:
            initial_states = []
            for s0, ey0 in [(0.5, 0.2), (1.2, -0.2)]:
                st = VehicleState(t=0.0)
                st.p.s, st.p.x_tran = s0, ey0
                st.v.v_long = cfg.raceline_speed
                self.track.local_to_global_typed(st)
                initial_states.append(st)
        states = initial_states

        for step in range(n_steps):
            # references + opponent predictions
            Ps = []
            for car in range(2):
                other = 1 - car
                q_ref = self._raceline_ref(states[car], car)
                opp_pred = self.trackers[other].q_pred
                if np.allclose(opp_pred, 0):
                    p_obs = np.tile([states[other].x.x, states[other].x.y],
                                    (cfg.mpc_N + 1, 1))
                else:
                    p_obs = opp_pred[:, 0:2]
                Ps.append({'q_ref': jnp.asarray(q_ref), 'p_obs': jnp.asarray(p_obs)})

            for car in range(2):
                self.trackers[car].step(states[car], parameters=Ps[car])

            # game trigger
            self._maybe_solve_game(states)

            # plant simulation at the fine rate
            for car in range(2):
                for _ in range(int(round(cfg.control_dt / cfg.sim_dt))):
                    self.sims[car].step(states[car], T=cfg.sim_dt)

            self.history.append([states[0].copy(), states[1].copy()])
        return self.history

"""Vehicle dynamics models as pure JAX functions.

TPU-native replacement for the reference's CasADi model zoo
(``/root/reference/DGSQP/dynamics/dynamics_models.py``).  Each model defines a continuous-time
ODE ``fc(q, u) -> dq`` in plain ``jax.numpy``; discretization (euler/rk2/rk3/rk4), Jacobians,
and Hessians are derived generically — discretization by composition, derivatives by ``jax``
autodiff (``jacfwd``) instead of CasADi symbolic jacobians + generated C.  Everything is
jit-able and vmap-able; there is no codegen step.

Model-for-model parity map (reference class -> here):
  CasadiIntegrator                    -> IntegratorModel            (dynamics_models.py:240)
  CasadiKinematicUnicycle             -> KinematicUnicycle          (:306)
  CasadiKinematicClUnicycle           -> KinematicClUnicycle        (:392)
  CasadiKinematicUnicycleCombined     -> KinematicUnicycleCombined  (:491)
  CasadiKinematicBicycle              -> KinematicBicycle           (:610)
  CasadiKinematicCLBicycle            -> KinematicCLBicycle         (:748)
  CasadiKinematicCLVelBicycle         -> KinematicCLVelBicycle      (:880)
  CasadiKinematicBicycleCombined      -> KinematicBicycleCombined   (:997)
  CasadiDynamicBicycle                -> DynamicBicycle             (:1410)
  CasadiDynamicCLBicycle              -> DynamicCLBicycle           (:1674)
  CasadiDynamicBicycleCombined        -> DynamicBicycleCombined     (:1945)
"""
from __future__ import annotations

from abc import abstractmethod
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.dynamics.model_types import (DynamicsConfig, DynamicBicycleConfig,
                                            KinematicBicycleConfig, UnicycleConfig)
from dgsqp_tpu.types import VehicleActuation, VehiclePrediction, VehicleState
from dgsqp_tpu.utils.math import hard_abs, smooth_sign


class DynamicsModel:
    """Base dynamics model: continuous ODE + generic discretization + AD derivatives.

    Subclasses set ``n_q``/``n_u`` and implement ``fc(q, u)``.  Replaces the reference's
    ``CasadiDynamicsModel.precompute_model`` machinery (``dynamics_models.py:63-159``).
    """

    n_q: int
    n_u: int
    curvature_model: bool = False

    def __init__(self, t0: float, config: DynamicsConfig, track=None):
        self.t0 = t0
        self.model_config = config
        if config.track_name is not None:
            from dgsqp_tpu.tracks.track_lib import get_track
            self.track = get_track(config.track_name)
        else:
            self.track = track
        self.dt = config.dt
        self.M = config.M
        self.h = self.dt / self.M

        # additive process noise (reference dynamics_models.py:112-122): the discrete map
        # gains fd_noisy(q, u, m) = fd(q, u) + sqrtm(cov) @ m
        self.noise_sqrt = None
        if config.noise:
            if config.noise_cov is None:
                raise RuntimeError('Noise covariance matrix not provided to dynamics model')
            cov = np.asarray(config.noise_cov, dtype=np.float64)
            if cov.ndim == 1:
                cov = np.diag(cov)
            from scipy.linalg import sqrtm
            self.noise_sqrt = np.real(sqrtm(cov))

    # ------------------------------------------------------------ core dynamics
    @abstractmethod
    def fc(self, q, u):
        """Continuous-time dynamics dq/dt = fc(q, u)."""

    def fd(self, q, u, dt: Optional[float] = None):
        """One discrete step with the configured integrator
        (reference ``dynamics_models.py:88-110``)."""
        dt = self.dt if dt is None else dt
        method = self.model_config.discretization_method
        if method == 'euler':
            return q + dt * self.fc(q, u)
        M, h = self.M, dt / self.M
        if method == 'rk4':
            def step(x, _):
                a1 = self.fc(x, u)
                a2 = self.fc(x + (h / 2) * a1, u)
                a3 = self.fc(x + (h / 2) * a2, u)
                a4 = self.fc(x + h * a3, u)
                return x + h * (a1 + 2 * a2 + 2 * a3 + a4) / 6, None
        elif method == 'rk3':
            def step(x, _):
                a1 = h * self.fc(x, u)
                a2 = h * self.fc(x + a1 / 2, u)
                a3 = h * self.fc(x - a1 + 2 * a2, u)
                return x + (a1 + 4 * a2 + a3) / 6, None
        elif method == 'rk2':
            def step(x, _):
                a1 = self.fc(x, u)
                a2 = self.fc(x + h * a1, u)
                return x + h * (a1 + a2) / 2, None
        else:
            raise ValueError(f'Discretization method {method} not recognized')
        out, _ = jax.lax.scan(step, q, None, length=M)
        return out

    def fd_noisy(self, q, u, m):
        """Discrete step with additive process noise sample ``m`` (standard normal)."""
        if self.noise_sqrt is None:
            return self.fd(q, u)
        return self.fd(q, u) + jnp.asarray(self.noise_sqrt) @ m

    # --------------------------------------------------------------- jacobians
    def fA(self, q, u):
        return jax.jacfwd(self.fc, argnums=0)(q, u)

    def fB(self, q, u):
        return jax.jacfwd(self.fc, argnums=1)(q, u)

    def fAd(self, q, u):
        return jax.jacfwd(self.fd, argnums=0)(q, u)

    def fBd(self, q, u):
        return jax.jacfwd(self.fd, argnums=1)(q, u)

    # Per-state-dimension discrete Hessians, matching the reference's fEd/fFd/fGd
    # (``dynamics_models.py:136-144``): Ed[i] = d²fd_i/dq², Fd[i] = d²fd_i/du²,
    # Gd[i] = d²fd_i/(du dq).
    def fEd(self, q, u):
        return jax.jacfwd(jax.jacfwd(self.fd, argnums=0), argnums=0)(q, u)

    def fFd(self, q, u):
        return jax.jacfwd(jax.jacfwd(self.fd, argnums=1), argnums=1)(q, u)

    def fGd(self, q, u):
        return jax.jacfwd(jax.jacfwd(self.fd, argnums=1), argnums=0)(q, u)

    # ----------------------------------------------------------- host-side step
    def step(self, vehicle_state: VehicleState, T: Optional[float] = None):
        """Integrate the noise-free model forward one interval and write back into the state
        (reference ``dynamics_models.py:161-186``).  Uses fine fixed-step RK4 on host."""
        q, u = self.state2qu(vehicle_state)
        dt = self.dt if T is None else T
        n_sub = max(8, self.M)
        h = dt / n_sub
        fc = jax.jit(self.fc)
        qj = jnp.asarray(q, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        uj = jnp.asarray(u, dtype=qj.dtype)
        for _ in range(n_sub):
            a1 = fc(qj, uj)
            a2 = fc(qj + (h / 2) * a1, uj)
            a3 = fc(qj + (h / 2) * a2, uj)
            a4 = fc(qj + h * a3, uj)
            qj = qj + h * (a1 + 2 * a2 + 2 * a3 + a4) / 6
        q_n = np.asarray(qj)
        self.qu2state(vehicle_state, q_n, u)
        vehicle_state.t = (vehicle_state.t or 0.0) + dt
        if self.track is not None:
            if self.curvature_model:
                self.track.local_to_global_typed(vehicle_state)
            else:
                self.track.global_to_local_typed(vehicle_state)

    # ------------------------------------------------------- marshalling hooks
    @abstractmethod
    def state2qu(self, state: VehicleState) -> Tuple[np.ndarray, np.ndarray]:
        ...

    def state2q(self, state: VehicleState) -> np.ndarray:
        return self.state2qu(state)[0]

    def input2u(self, inp: VehicleActuation) -> np.ndarray:
        return np.array([inp.u_a, inp.u_steer])[:self.n_u]

    def u2input(self, inp: VehicleActuation, u: np.ndarray):
        inp.u_a = float(u[0])
        if self.n_u > 1:
            inp.u_steer = float(u[1])
        if self.n_u > 2:
            inp.u_ds = float(u[2])

    @abstractmethod
    def qu2state(self, state: VehicleState, q: Optional[np.ndarray] = None,
                 u: Optional[np.ndarray] = None):
        ...

    def q2state(self, state: VehicleState, q: np.ndarray):
        self.qu2state(state, q, None)

    def qu2prediction(self, prediction: Optional[VehiclePrediction],
                      q: Optional[np.ndarray] = None, u: Optional[np.ndarray] = None):
        if prediction is None:
            prediction = VehiclePrediction()
        if q is not None:
            for name, col in self._pred_q_fields():
                setattr(prediction, name, np.asarray(q[:, col]))
        if u is not None:
            prediction.u_a = np.asarray(u[:, 0])
            if self.n_u > 1:
                prediction.u_steer = np.asarray(u[:, 1])
            if self.n_u > 2:
                prediction.u_ds = np.asarray(u[:, 2])
        return prediction

    def _pred_q_fields(self):
        """(prediction field name, q column) pairs; overridden per model."""
        return []

    def qu2interpolator(self, t0: float, q: np.ndarray, u: Optional[np.ndarray] = None,
                        extrapolate: bool = False):
        """Dense-time interpolator over a predicted trajectory
        (reference ``dynamics_models.py:1859+`` / ``CA_LTV_MPC.get_prediction_interpolator``).

        Returns f(t) -> (q(t), u(t)) by per-channel linear interpolation on the prediction
        grid t0 + k*dt."""
        q = np.asarray(q)
        T = t0 + self.dt * np.arange(q.shape[0])
        u = np.asarray(u) if u is not None else None
        Tu = t0 + self.dt * np.arange(u.shape[0]) if u is not None else None

        def f(t):
            t = np.clip(t, T[0], T[-1]) if not extrapolate else t
            qt = np.stack([np.interp(t, T, q[:, i]) for i in range(q.shape[1])], axis=-1)
            if u is None:
                return qt, None
            tu = np.clip(t, Tu[0], Tu[-1]) if not extrapolate else t
            ut = np.stack([np.interp(tu, Tu, u[:, i]) for i in range(u.shape[1])], axis=-1)
            return qt, ut
        return f


# ============================================================== simple models
class IntegratorModel(DynamicsModel):
    """Single integrator: q=[v], u=[a] (reference ``dynamics_models.py:240-305``)."""

    n_q, n_u = 1, 1

    def fc(self, q, u):
        return jnp.array([u[0]])

    def state2qu(self, state):
        return np.array([state.v.v_long]), np.array([state.u.u_a])

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.v.v_long = float(q[0])
        if u is not None:
            state.u.u_a = float(u[0])

    def _pred_q_fields(self):
        return [('v_long', 0)]


class KinematicUnicycle(DynamicsModel):
    """Global-frame kinematic unicycle: q=[x, y, v, psi], u=[Fx, wz]
    (reference ``dynamics_models.py:306-392``)."""

    n_q, n_u = 4, 2

    def __init__(self, t0, config: UnicycleConfig = None, track=None):
        config = config or UnicycleConfig()
        super().__init__(t0, config, track)
        self.m = config.mass

    def fc(self, q, u):
        x, y, v, psi = q
        Fx, wz = u
        return jnp.array([v * jnp.cos(psi), v * jnp.sin(psi), Fx / self.m, wz])

    def state2qu(self, state):
        return (np.array([state.x.x, state.x.y, state.v.v_long, state.e.psi]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.x.x, state.x.y = float(q[0]), float(q[1])
            state.v.v_long, state.e.psi = float(q[2]), float(q[3])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('x', 0), ('y', 1), ('v_long', 2), ('psi', 3)]


class KinematicClUnicycle(DynamicsModel):
    """Frenet-frame unicycle: q=[v, epsi, s, xtran], u=[ax, wz]
    (reference ``dynamics_models.py:392-491``)."""

    n_q, n_u = 4, 2
    curvature_model = True

    def __init__(self, t0, config: UnicycleConfig = None, track=None):
        config = config or UnicycleConfig()
        super().__init__(t0, config, track)
        self.m = config.mass
        self.c_da = config.damping_coefficient

    def fc(self, q, u):
        v, epsi, s, xtran = q
        ax, wz = u
        c = self.track.curvature(s)
        ds = v * jnp.cos(epsi) / (1 - xtran * c)
        return jnp.array([ax - self.c_da * v / self.m,
                          wz - c * ds,
                          ds,
                          v * jnp.sin(epsi)])

    def state2qu(self, state):
        return (np.array([state.v.v_long, state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.v.v_long, state.p.e_psi = float(q[0]), float(q[1])
            state.p.s, state.p.x_tran = float(q[2]), float(q[3])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('v_long', 0), ('e_psi', 1), ('s', 2), ('x_tran', 3)]


class KinematicUnicycleCombined(DynamicsModel):
    """Global + Frenet unicycle: q=[x, y, v, epsi, s, xtran], u=[Fx, wz]
    (reference ``dynamics_models.py:491-608``).  Duplicating the pose in both frames makes
    collision constraints (global xy) and track-boundary constraints (Frenet ey) both cheap."""

    n_q, n_u = 6, 2
    curvature_model = True

    def __init__(self, t0, config: UnicycleConfig = None, track=None):
        config = config or UnicycleConfig()
        super().__init__(t0, config, track)
        self.m = config.mass
        self.c_da = config.damping_coefficient

    def fc(self, q, u):
        x, y, v, epsi, s, xtran = q
        Fx, wz = u
        c = self.track.curvature(s)
        psi_t = self.track.tangent_angle(s)
        ds = v * jnp.cos(epsi) / (1 - xtran * c)
        return jnp.array([v * jnp.cos(psi_t + epsi),
                          v * jnp.sin(psi_t + epsi),
                          (Fx - self.c_da * v) / self.m,
                          wz - c * ds,
                          ds,
                          v * jnp.sin(epsi)])

    def state2qu(self, state):
        return (np.array([state.x.x, state.x.y, state.v.v_long,
                          state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.x.x, state.x.y, state.v.v_long = float(q[0]), float(q[1]), float(q[2])
            state.p.e_psi, state.p.s, state.p.x_tran = float(q[3]), float(q[4]), float(q[5])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('x', 0), ('y', 1), ('v_long', 2), ('e_psi', 3), ('s', 4), ('x_tran', 5)]


# ======================================================= kinematic bicycles
class _KinematicBicycleBase(DynamicsModel):
    def __init__(self, t0, config: KinematicBicycleConfig = None, track=None):
        config = config or KinematicBicycleConfig()
        super().__init__(t0, config, track)
        self.L_f = config.wheel_dist_front
        self.L_r = config.wheel_dist_rear
        self.c_dr = config.drag_coefficient
        self.c_da = config.damping_coefficient
        self.c_s = config.slip_coefficient
        self.c_r = config.rolling_resistance
        self.p_r = config.rolling_resistance_exponent
        self.m = config.mass

    def beta(self, u_steer):
        """Sideslip angle from steering (reference ``dynamics_models.py:1048``)."""
        L = self.L_f + self.L_r
        return jnp.arctan2(jnp.tan(u_steer) * self.L_r, L)

    def f_ext(self, v, psidot):
        """Drag / damping / rolling-resistance / slip force
        (reference ``dynamics_models.py:1052-1055``)."""
        return (-self.c_da * v
                - self.c_dr * v * hard_abs(v)
                - self.c_r * hard_abs(v) ** self.p_r * smooth_sign(v)
                - self.c_s * psidot ** 2)


class KinematicBicycle(_KinematicBicycleBase):
    """Global-frame kinematic bicycle: q=[x, y, v, psi], u=[a, steer]
    (reference ``dynamics_models.py:610-748``)."""

    n_q, n_u = 4, 2

    def fc(self, q, u):
        x, y, v, psi = q
        u_a, u_s = u
        beta = self.beta(u_s)
        psidot = v / self.L_r * jnp.sin(beta)
        dv = u_a + self.f_ext(v, psidot) / self.m
        return jnp.array([v * jnp.cos(beta + psi), v * jnp.sin(beta + psi), dv, psidot])

    def state2qu(self, state):
        return (np.array([state.x.x, state.x.y, state.v.v_long, state.e.psi]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.x.x, state.x.y = float(q[0]), float(q[1])
            state.v.v_long, state.e.psi = float(q[2]), float(q[3])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('x', 0), ('y', 1), ('v_long', 2), ('psi', 3)]


class KinematicCLBicycle(_KinematicBicycleBase):
    """Frenet-frame kinematic bicycle: q=[v, epsi, s, xtran], u=[a, steer]
    (reference ``dynamics_models.py:748-880``)."""

    n_q, n_u = 4, 2
    curvature_model = True

    def fc(self, q, u):
        v, epsi, s, xtran = q
        u_a, u_s = u
        beta = self.beta(u_s)
        psidot = v * jnp.sin(beta) / self.L_r
        c = self.track.curvature(s)
        ds = v * jnp.cos(beta + epsi) / (1 - xtran * c)
        return jnp.array([u_a + self.f_ext(v, psidot) / self.m,
                          psidot - c * ds,
                          ds,
                          v * jnp.sin(beta + epsi)])

    def state2qu(self, state):
        return (np.array([state.v.v_long, state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.v.v_long, state.p.e_psi = float(q[0]), float(q[1])
            state.p.s, state.p.x_tran = float(q[2]), float(q[3])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('v_long', 0), ('e_psi', 1), ('s', 2), ('x_tran', 3)]


class KinematicCLVelBicycle(_KinematicBicycleBase):
    """Velocity-input Frenet kinematic bicycle: q=[epsi, s, xtran], u=[v, steer]
    (reference ``dynamics_models.py:880-997``)."""

    n_q, n_u = 3, 2
    curvature_model = True

    def fc(self, q, u):
        epsi, s, xtran = q
        u_v, u_s = u
        beta = self.beta(u_s)
        c = self.track.curvature(s)
        ds = u_v * jnp.cos(beta + epsi) / (1 - xtran * c)
        return jnp.array([u_v * jnp.sin(beta) / self.L_r - c * ds,
                          ds,
                          u_v * jnp.sin(beta + epsi)])

    def state2qu(self, state):
        return (np.array([state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.v.v_long, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.p.e_psi, state.p.s, state.p.x_tran = float(q[0]), float(q[1]), float(q[2])
        if u is not None:
            state.v.v_long, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('e_psi', 0), ('s', 1), ('x_tran', 2)]


class KinematicBicycleCombined(_KinematicBicycleBase):
    """Global + Frenet kinematic bicycle: q=[x, y, v, epsi, s, xtran], u=[a, steer].

    The flagship model of the chicane/curve Monte-Carlo studies
    (reference ``dynamics_models.py:997-1150``)."""

    n_q, n_u = 6, 2
    curvature_model = True

    def fc(self, q, u):
        x, y, v, epsi, s, xtran = q
        u_a, u_s = u
        beta = self.beta(u_s)
        psidot = v / self.L_r * jnp.sin(beta)
        c = self.track.curvature(s)
        psi_t = self.track.tangent_angle(s)
        ds = v * jnp.cos(beta + epsi) / (1 - xtran * c)
        return jnp.array([v * jnp.cos(beta + psi_t + epsi),
                          v * jnp.sin(beta + psi_t + epsi),
                          u_a + self.f_ext(v, psidot) / self.m,
                          psidot - c * ds,
                          ds,
                          v * jnp.sin(beta + epsi)])

    def state2qu(self, state):
        return (np.array([state.x.x, state.x.y, state.v.v_long,
                          state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.x.x, state.x.y, state.v.v_long = float(q[0]), float(q[1]), float(q[2])
            state.p.e_psi, state.p.s, state.p.x_tran = float(q[3]), float(q[4]), float(q[5])
            if u is not None:
                state.w.w_psi = float(q[2] / self.L_r * np.sin(
                    np.arctan(np.tan(u[1]) * self.L_f / (self.L_f + self.L_r))))
                state.v.v_tran = state.w.w_psi * self.L_r
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('x', 0), ('y', 1), ('v_long', 2), ('e_psi', 3), ('s', 4), ('x_tran', 5)]


# ========================================================= dynamic bicycles
class _DynamicBicycleBase(DynamicsModel):
    def __init__(self, t0, config: DynamicBicycleConfig = None, track=None):
        config = config or DynamicBicycleConfig()
        super().__init__(t0, config, track)
        self.L_f = config.wheel_dist_front
        self.L_r = config.wheel_dist_rear
        self.m = config.mass
        self.I_z = config.yaw_inertia
        self.g = config.gravity
        self.c_dr = config.drag_coefficient
        self.c_da = config.damping_coefficient
        self.c_r = config.rolling_resistance
        self.p_r = config.rolling_resistance_exponent
        self.mu = config.wheel_friction
        self.tire_model = config.tire_model
        self.drive_wheels = config.drive_wheels
        self.pacejka_Bf = config.pacejka_b_front
        self.pacejka_Br = config.pacejka_b_rear
        self.pacejka_Cf = config.pacejka_c_front
        self.pacejka_Cr = config.pacejka_c_rear
        self.pacejka_Df = config.pacejka_d_front
        self.pacejka_Dr = config.pacejka_d_rear
        self.linear_Bf = config.linear_bf
        self.linear_Br = config.linear_br
        self.simple_slip = config.simple_slip

    def body_accels(self, vx, vy, psidot, u_a, u_s):
        """Slip angles, tire forces, and body-frame accelerations
        (reference ``dynamics_models.py:1739-1780``)."""
        if self.simple_slip:
            alpha_f = -jnp.arctan2(vy + self.L_f * psidot, vx) + u_s
        else:
            alpha_f = -jnp.arctan2(
                (vy + self.L_f * psidot) * jnp.cos(u_s) - vx * jnp.sin(u_s),
                vx * jnp.cos(u_s) + (vy + self.L_f * psidot) * jnp.sin(u_s))
        alpha_r = -jnp.arctan2(vy - self.L_r * psidot, vx)

        if self.tire_model == 'pacejka':
            fyf = self.pacejka_Df * jnp.sin(self.pacejka_Cf * jnp.arctan(self.pacejka_Bf * alpha_f))
            fyr = self.pacejka_Dr * jnp.sin(self.pacejka_Cr * jnp.arctan(self.pacejka_Br * alpha_r))
        elif self.tire_model == 'linear':
            fyf = self.linear_Bf * self.m * self.g * self.L_r / (self.L_f + self.L_r) * alpha_f
            fyr = self.linear_Br * self.m * self.g * self.L_f / (self.L_f + self.L_r) * alpha_r
        else:
            raise ValueError("Tire model must be 'linear' or 'pacejka'")

        F_ext = (-self.c_da * vx - self.c_dr * vx * hard_abs(vx)
                 - self.c_r * hard_abs(vx) ** self.p_r * smooth_sign(vx))

        if self.drive_wheels == 'all':
            ar, af = u_a / 2, u_a / 2
        elif self.drive_wheels == 'rear':
            ar, af = u_a, 0.0
        else:
            raise ValueError("drive_wheels must be 'all' or 'rear'")

        ax = ar + af * jnp.cos(u_s) + (F_ext - fyf * jnp.sin(u_s)) / self.m
        ay = af * jnp.sin(u_s) + (fyf * jnp.cos(u_s) + fyr) / self.m
        alphaz = (self.L_f * fyf * jnp.cos(u_s) - self.L_r * fyr) / self.I_z
        return ax, ay, alphaz


class DynamicBicycle(_DynamicBicycleBase):
    """Global-frame dynamic bicycle: q=[vx, vy, psidot, x, y, psi], u=[a, steer]
    (reference ``dynamics_models.py:1410-1674``)."""

    n_q, n_u = 6, 2

    def fc(self, q, u):
        vx, vy, psidot, x, y, psi = q
        u_a, u_s = u
        ax, ay, alphaz = self.body_accels(vx, vy, psidot, u_a, u_s)
        return jnp.array([ax + psidot * vy,
                          ay - psidot * vx,
                          alphaz,
                          vx * jnp.cos(psi) - vy * jnp.sin(psi),
                          vy * jnp.cos(psi) + vx * jnp.sin(psi),
                          psidot])

    def state2qu(self, state):
        return (np.array([state.v.v_long, state.v.v_tran, state.w.w_psi,
                          state.x.x, state.x.y, state.e.psi]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.v.v_long, state.v.v_tran, state.w.w_psi = float(q[0]), float(q[1]), float(q[2])
            state.x.x, state.x.y, state.e.psi = float(q[3]), float(q[4]), float(q[5])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('v_long', 0), ('v_tran', 1), ('psidot', 2), ('x', 3), ('y', 4), ('psi', 5)]


class DynamicCLBicycle(_DynamicBicycleBase):
    """Frenet-frame dynamic bicycle: q=[vx, vy, psidot, epsi, s, xtran], u=[a, steer]
    (reference ``dynamics_models.py:1674-1945``)."""

    n_q, n_u = 6, 2
    curvature_model = True

    def fc(self, q, u):
        vx, vy, psidot, epsi, s, xtran = q
        u_a, u_s = u
        ax, ay, alphaz = self.body_accels(vx, vy, psidot, u_a, u_s)
        c = self.track.curvature(s)
        ds = (vx * jnp.cos(epsi) - vy * jnp.sin(epsi)) / (1 - xtran * c)
        return jnp.array([ax + psidot * vy,
                          ay - psidot * vx,
                          alphaz,
                          psidot - c * ds,
                          ds,
                          vx * jnp.sin(epsi) + vy * jnp.cos(epsi)])

    def state2qu(self, state):
        return (np.array([state.v.v_long, state.v.v_tran, state.w.w_psi,
                          state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.v.v_long, state.v.v_tran, state.w.w_psi = float(q[0]), float(q[1]), float(q[2])
            state.p.e_psi, state.p.s, state.p.x_tran = float(q[3]), float(q[4]), float(q[5])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('v_long', 0), ('v_tran', 1), ('psidot', 2), ('e_psi', 3), ('s', 4), ('x_tran', 5)]


class DynamicBicycleCombined(_DynamicBicycleBase):
    """Global + Frenet dynamic bicycle: q=[x, y, vx, vy, psidot, epsi, s, xtran]
    (reference ``dynamics_models.py:1945-2181``)."""

    n_q, n_u = 8, 2
    curvature_model = True

    def fc(self, q, u):
        x, y, vx, vy, psidot, epsi, s, xtran = q
        u_a, u_s = u
        ax, ay, alphaz = self.body_accels(vx, vy, psidot, u_a, u_s)
        c = self.track.curvature(s)
        psi_t = self.track.tangent_angle(s)
        ds = (vx * jnp.cos(epsi) - vy * jnp.sin(epsi)) / (1 - xtran * c)
        return jnp.array([vx * jnp.cos(epsi + psi_t) - vy * jnp.sin(epsi + psi_t),
                          vy * jnp.cos(epsi + psi_t) + vx * jnp.sin(epsi + psi_t),
                          ax + psidot * vy,
                          ay - psidot * vx,
                          alphaz,
                          psidot - c * ds,
                          ds,
                          vx * jnp.sin(epsi) + vy * jnp.cos(epsi)])

    def state2qu(self, state):
        return (np.array([state.x.x, state.x.y, state.v.v_long, state.v.v_tran,
                          state.w.w_psi, state.p.e_psi, state.p.s, state.p.x_tran]),
                np.array([state.u.u_a, state.u.u_steer]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.x.x, state.x.y = float(q[0]), float(q[1])
            state.v.v_long, state.v.v_tran, state.w.w_psi = float(q[2]), float(q[3]), float(q[4])
            state.p.e_psi, state.p.s, state.p.x_tran = float(q[5]), float(q[6]), float(q[7])
        if u is not None:
            state.u.u_a, state.u.u_steer = float(u[0]), float(u[1])

    def _pred_q_fields(self):
        return [('x', 0), ('y', 1), ('v_long', 2), ('v_tran', 3), ('psidot', 4),
                ('e_psi', 5), ('s', 6), ('x_tran', 7)]


def get_dynamics_model(name: str, t0: float, config, track=None) -> DynamicsModel:
    """String-keyed factory (reference ``dynamics_models.py:2634-2654``)."""
    registry = {
        'dynamic_bicycle': DynamicBicycle,
        'dynamic_bicycle_cl': DynamicCLBicycle,
        'dynamic_bicycle_combined': DynamicBicycleCombined,
        'kinematic_bicycle': KinematicBicycle,
        'kinematic_bicycle_cl': KinematicCLBicycle,
        'kinematic_bicycle_combined': KinematicBicycleCombined,
        'kinematic_unicycle': KinematicUnicycle,
        'kinematic_unicycle_cl': KinematicClUnicycle,
        'kinematic_unicycle_combined': KinematicUnicycleCombined,
        'integrator': IntegratorModel,
    }
    if name not in registry:
        raise ValueError(f'Unknown dynamics model {name}; available: {sorted(registry)}')
    return registry[name](t0, config, track=track)

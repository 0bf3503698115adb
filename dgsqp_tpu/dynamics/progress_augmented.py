"""Progress-augmented (MPCC-style) vehicle models and their per-iteration approximations.

Re-implementation of ``CasadiKinematicBicycleProgressAugmented`` and
``CasadiDynamicBicycleProgressAugmented``
(``/root/reference/DGSQP/dynamics/dynamics_models.py:1152-1408,2181-2480``): a global-frame
vehicle plus a decoupled arc-length progress state driven by a virtual arc-speed input
``u_ds``.  The "approximate game" replaces exact Frenet quantities with per-SQP-iteration
quadratic contouring/lag cost approximations and linearized track-boundary half-planes,
both evaluated at the previous iterate's trajectory — the machinery behind the
``DGSQP_v2_frenet_approx``/``PATHMCP_frenet_approx`` solvers.

The track's centerline/boundary splines are built once on host (mirroring the reference's
sampled bspline interpolants, ``dynamics_models.py:1232-1271``).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.dynamics.model_types import DynamicBicycleConfig, KinematicBicycleConfig
from dgsqp_tpu.dynamics.models import _DynamicBicycleBase, _KinematicBicycleBase
from dgsqp_tpu.tracks.bspline import BSplineTrack, _Spline1D
from dgsqp_tpu.types import VehiclePrediction, VehicleState


class TrackSplines:
    """Centerline + boundary splines x(s), y(s), xi, yi, xo, yo with derivatives."""

    def __init__(self, track, track_tightening: float = 0.0, n: int = 100):
        if isinstance(track, BSplineTrack):
            self.x, self.y = track.x, track.y
            self.xi, self.yi = track.xi, track.yi
            self.xo, self.yo = track.xo, track.yo
            self.track_length = track.track_length
        else:
            S = np.linspace(0, track.track_length, n)
            w = track.half_width - track_tightening
            zeros = np.zeros(n)
            center = np.asarray(track.local_to_global(np.stack([S, zeros, zeros], -1)))
            inner = np.asarray(track.local_to_global(np.stack([S, np.full(n, w), zeros], -1)))
            outer = np.asarray(track.local_to_global(np.stack([S, np.full(n, -w), zeros], -1)))
            self.x = _Spline1D(S, center[:, 0])
            self.y = _Spline1D(S, center[:, 1])
            self.xi = _Spline1D(S, inner[:, 0])
            self.yi = _Spline1D(S, inner[:, 1])
            self.xo = _Spline1D(S, outer[:, 0])
            self.yo = _Spline1D(S, outer[:, 1])
            self.track_length = track.track_length

    def s_mod(self, s):
        L = self.track_length
        return jnp.mod(jnp.mod(s, L) + L, L)

    def tangent(self, s):
        s = self.s_mod(s)
        return jnp.arctan2(self.y.deriv(s), self.x.deriv(s))


class _ProgressAugmentedMixin:
    """Shared approximation machinery for progress-augmented models (the state layout must
    place global (x, y) at ``pos_idx`` and progress s last; ``n_u`` inputs end with u_ds)."""

    pos_idx = (0, 1)

    def _init_splines(self, track_tightening: float):
        self.splines = TrackSplines(self.track, track_tightening)

    def contouring_lag_errors(self, q, z):
        """(e_contour, e_lag) of position vs the z-interpolated reference point
        (reference ``get_contouring_lag_costs``, ``dynamics_models.py:1274-1290``).
        ``z`` in [-1, 1] interpolates outside -> inside boundary."""
        sp = self.splines
        s = sp.s_mod(q[-1])
        t = sp.tangent(s)
        x_int = sp.xo(s) + (z + 1) / 2 * (sp.xi(s) - sp.xo(s))
        y_int = sp.yo(s) + (z + 1) / 2 * (sp.yi(s) - sp.yo(s))
        dx = q[self.pos_idx[0]] - x_int
        dy = q[self.pos_idx[1]] - y_int
        ec = jnp.sin(t) * dx - jnp.cos(t) * dy
        el = -jnp.cos(t) * dx - jnp.sin(t) * dy
        return ec, el

    def contouring_lag_quad_approx(self, contouring_cost: float, lag_cost: float):
        """Returns f(q_bar, z) -> (Q_e, q_e) such that the Gauss-Newton approximation of the
        contouring/lag cost is ``1/2 q'Q_e q + q_e'q``
        (reference ``get_contouring_lag_costs_quad_approx``, ``dynamics_models.py:1292-1318``)."""
        P_cl = jnp.asarray(np.diag([contouring_cost, lag_cost]))

        def f(q_bar, z):
            e_fn = lambda qq: jnp.stack(self.contouring_lag_errors(qq, z))
            e = e_fn(q_bar)
            Dx_e = jax.jacfwd(e_fn)(q_bar)
            Q_e = Dx_e.T @ P_cl @ Dx_e
            q_e = Dx_e.T @ P_cl @ e - Q_e @ q_bar
            return Q_e, q_e
        return f

    def track_boundary_lin_approx(self):
        """Returns f(q_bar) -> (G (2, n_q), g (2,)) with half-plane constraints
        ``G q + g <= 0`` between the interpolated boundary points at s(q_bar)
        (reference ``get_track_boundary_constraint_lin_approx``,
        ``dynamics_models.py:1320-1340``)."""
        sp = self.splines
        n_q = self.n_q

        def f(q_bar):
            s = sp.s_mod(q_bar[-1])
            xi, yi = sp.xi(s), sp.yi(s)
            xo, yo = sp.xo(s), sp.yo(s)
            n = -(xo - xi)
            d = yo - yi
            G = jnp.zeros((2, n_q))
            G = G.at[0, self.pos_idx[0]].set(n).at[0, self.pos_idx[1]].set(-d)
            G = G.at[1, self.pos_idx[0]].set(-n).at[1, self.pos_idx[1]].set(d)
            g = jnp.stack([-jnp.maximum(n * xi - d * yi, n * xo - d * yo),
                           jnp.minimum(n * xi - d * yi, n * xo - d * yo)])
            return G, g
        return f

    def contouring_lag_cost_exact(self, contouring_cost: float, lag_cost: float):
        """EXACT contouring/lag penalty ``1/2 q_c e_c(q)^2 + 1/2 q_l e_l(q)^2``.

        TPU-native alternative to :meth:`contouring_lag_quad_approx`: the track
        splines are jnp-differentiable, so the solver can differentiate THROUGH the
        geometry instead of freezing a Gauss-Newton quadratic at the previous iterate.
        The frozen-P iteration is a damped fixed point that creeps (~400 iterations to
        stat 1e-3, matching the reference's sqp_iters=500 budget); exact evaluation
        restores ordinary SQP local convergence.  No reference counterpart — CasADi
        would need the linearization inside its symbolic graph.
        """
        def f(q, z):
            ec, el = self.contouring_lag_errors(q, z)
            return 0.5 * contouring_cost * ec ** 2 + 0.5 * lag_cost * el ** 2
        return f

    def track_boundary_constraint_exact(self):
        """EXACT track-boundary half-planes evaluated at the state's own arc position
        (the linearization point of :meth:`track_boundary_lin_approx` moving with q,
        differentiable through s)."""
        f_lin = self.track_boundary_lin_approx()

        def f(q):
            G, g = f_lin(q)
            return G @ q + g
        return f

    def arcspeed_cost(self, magnitude_weight: float, performance_weight: float):
        """u_ds magnitude/progress cost (reference ``get_arcspeed_cost``,
        ``dynamics_models.py:1342-1346``)."""
        def f(u):
            return 0.5 * magnitude_weight * u[-1] ** 2 - performance_weight * u[-1]
        return f


class KinematicBicycleProgressAugmented(_KinematicBicycleBase, _ProgressAugmentedMixin):
    """q = [x, y, v, psi, s], u = [a, steer, u_ds]
    (reference ``dynamics_models.py:1152-1408``)."""

    n_q, n_u = 5, 3

    def __init__(self, t0, config: KinematicBicycleConfig = None, track=None,
                 track_tightening: float = 0.0):
        super().__init__(t0, config or KinematicBicycleConfig(), track)
        self._init_splines(track_tightening)

    def fc(self, q, u):
        x, y, v, psi, s = q
        u_a, u_s, u_ds = u
        beta = self.beta(u_s)
        psidot = v / self.L_r * jnp.sin(beta)
        dv = u_a + self.f_ext(v, psidot) / self.m
        return jnp.array([v * jnp.cos(beta + psi), v * jnp.sin(beta + psi),
                          dv, psidot, u_ds])

    def state2qu(self, state):
        return (np.array([state.x.x, state.x.y, state.v.v_long, state.e.psi, state.p.s]),
                np.array([state.u.u_a, state.u.u_steer, state.u.u_ds]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.x.x, state.x.y = float(q[0]), float(q[1])
            state.v.v_long, state.e.psi, state.p.s = float(q[2]), float(q[3]), float(q[4])
        if u is not None:
            state.u.u_a, state.u.u_steer, state.u.u_ds = float(u[0]), float(u[1]), float(u[2])

    def _pred_q_fields(self):
        return [('x', 0), ('y', 1), ('v_long', 2), ('psi', 3), ('s', 4)]


class DynamicBicycleProgressAugmented(_DynamicBicycleBase, _ProgressAugmentedMixin):
    """q = [vx, vy, psidot, x, y, psi, s], u = [a, steer, u_ds]
    (reference ``dynamics_models.py:2181-2480``)."""

    n_q, n_u = 7, 3
    pos_idx = (3, 4)

    def __init__(self, t0, config: DynamicBicycleConfig = None, track=None,
                 track_tightening: float = 0.0):
        super().__init__(t0, config or DynamicBicycleConfig(), track)
        self._init_splines(track_tightening)

    def fc(self, q, u):
        vx, vy, psidot, x, y, psi, s = q
        u_a, u_s, u_ds = u
        ax, ay, alphaz = self.body_accels(vx, vy, psidot, u_a, u_s)
        return jnp.array([ax + psidot * vy,
                          ay - psidot * vx,
                          alphaz,
                          vx * jnp.cos(psi) - vy * jnp.sin(psi),
                          vy * jnp.cos(psi) + vx * jnp.sin(psi),
                          psidot,
                          u_ds])

    def state2qu(self, state):
        return (np.array([state.v.v_long, state.v.v_tran, state.w.w_psi,
                          state.x.x, state.x.y, state.e.psi, state.p.s]),
                np.array([state.u.u_a, state.u.u_steer, state.u.u_ds]))

    def qu2state(self, state, q=None, u=None):
        if q is not None:
            state.v.v_long, state.v.v_tran, state.w.w_psi = float(q[0]), float(q[1]), float(q[2])
            state.x.x, state.x.y, state.e.psi, state.p.s = \
                float(q[3]), float(q[4]), float(q[5]), float(q[6])
        if u is not None:
            state.u.u_a, state.u.u_steer, state.u.u_ds = float(u[0]), float(u[1]), float(u[2])

    def _pred_q_fields(self):
        return [('v_long', 0), ('v_tran', 1), ('psidot', 2), ('x', 3), ('y', 4),
                ('psi', 5), ('s', 6)]

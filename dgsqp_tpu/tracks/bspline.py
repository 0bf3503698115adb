"""Spline track from xy waypoints, TPU-native.

Replaces ``CasadiBSplineTrack`` (``/root/reference/DGSQP/tracks/casadi_bspline_track.py:11-236``)
which builds CasADi bspline interpolants for the centerline/boundaries and solves the
global->local projection with IPOPT.  Here:

  * construction (host, numpy): cubic-spline fit of x(s), y(s) with arc-length
    reparametrization by dense quadrature (the reference integrates speed with a CasADi
    quadrature, ``casadi_bspline_track.py:31-54``);
  * every query is vectorized jnp: curvature from spline derivatives
    (``:114-134``), tangent from the first derivatives, local<->global closed-form from the
    tangent/normal frame;
  * projection (global->local) is a masked fixed-iteration Newton on the first-order
    optimality of squared distance, seeded from the nearest dense sample — replacing the
    per-point IPOPT NLP (``:73-112``).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def _natural_cubic_coeffs(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Natural cubic spline coefficients: rows [a, b, c, d] per interval,
    y(t) = a + b*dt + c*dt^2 + d*dt^3 with dt = t - x[i]."""
    n = len(x) - 1
    h = np.diff(x)
    # solve for second derivatives (natural: M0 = Mn = 0)
    A = np.zeros((n + 1, n + 1))
    rhs = np.zeros(n + 1)
    A[0, 0] = 1.0
    A[n, n] = 1.0
    for i in range(1, n):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 3 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    c = np.linalg.solve(A, rhs)
    a = y[:-1]
    b = (y[1:] - y[:-1]) / h - h * (2 * c[:-1] + c[1:]) / 3
    d = (c[1:] - c[:-1]) / (3 * h)
    return np.stack([a, b, c[:-1], d], axis=1)


class _Spline1D:
    """Host-built cubic spline with jnp evaluation (value, first, second derivative)."""

    def __init__(self, knots: np.ndarray, values: np.ndarray):
        self.knots = np.asarray(knots, dtype=np.float64)
        self.coeffs = _natural_cubic_coeffs(self.knots, np.asarray(values, np.float64))
        self._k = jnp.asarray(self.knots)
        self._c = jnp.asarray(self.coeffs)

    def _locate(self, s):
        idx = jnp.clip(jnp.searchsorted(self._k, s, side='right') - 1,
                       0, self.coeffs.shape[0] - 1)
        dt = s - self._k[idx]
        return idx, dt

    def __call__(self, s):
        idx, dt = self._locate(s)
        a, b, c, d = (self._c[idx, i] for i in range(4))
        return a + dt * (b + dt * (c + dt * d))

    def deriv(self, s):
        idx, dt = self._locate(s)
        _, b, c, d = (self._c[idx, i] for i in range(4))
        return b + dt * (2 * c + 3 * d * dt)

    def deriv2(self, s):
        idx, dt = self._locate(s)
        c, d = self._c[idx, 2], self._c[idx, 3]
        return 2 * c + 6 * d * dt


class BSplineTrack:
    """Track defined by xy waypoints with per-waypoint left/right widths."""

    def __init__(self, xy_waypoints: np.ndarray, left_width, right_width,
                 slack: float = 2.0, s_waypoints: Optional[np.ndarray] = None,
                 n_quad: int = 2000):
        xy = np.asarray(xy_waypoints, dtype=np.float64)
        left_width = np.broadcast_to(np.asarray(left_width, np.float64), (xy.shape[0],))
        right_width = np.broadcast_to(np.asarray(right_width, np.float64), (xy.shape[0],))
        self.slack = slack

        if s_waypoints is None or len(np.atleast_1d(s_waypoints)) != xy.shape[0]:
            # pass 1: chord-length parametrization
            chord = np.concatenate([[0.0], np.cumsum(np.linalg.norm(np.diff(xy, axis=0),
                                                                    axis=1))])
            sx = _Spline1D(chord, xy[:, 0])
            sy = _Spline1D(chord, xy[:, 1])
            # arc length by dense quadrature (reference casadi_bspline_track.py:31-54)
            tt = np.linspace(0, chord[-1], n_quad)
            speed = np.hypot(np.asarray(sx.deriv(jnp.asarray(tt))),
                             np.asarray(sy.deriv(jnp.asarray(tt))))
            arclen = np.concatenate([[0.0], np.cumsum(0.5 * (speed[1:] + speed[:-1])
                                                      * np.diff(tt))])
            s_waypoints = np.interp(chord, tt, arclen)
        self.s_waypoints = np.asarray(s_waypoints, np.float64)
        self.track_length = float(self.s_waypoints[-1])

        self.x = _Spline1D(self.s_waypoints, xy[:, 0])
        self.y = _Spline1D(self.s_waypoints, xy[:, 1])
        self.left = _Spline1D(self.s_waypoints, left_width)
        self.right = _Spline1D(self.s_waypoints, right_width)
        self.xy_waypoints = xy
        self.circuit = bool(np.linalg.norm(xy[0] - xy[-1]) < 1e-6)
        self.track_width = float(np.min(left_width) + np.min(right_width))
        self.half_width = self.track_width / 2
        self.phase_out = False

        # dense samples for projection seeding
        self._s_grid = jnp.asarray(np.linspace(0, self.track_length, 4 * xy.shape[0]))
        self._xy_grid = jnp.stack([self.x(self._s_grid), self.y(self._s_grid)], axis=-1)

        # boundary splines (reference casadi_bspline_track.py:56-97)
        nx, ny = self._normal_np()
        self.xi = _Spline1D(self.s_waypoints, xy[:, 0] + left_width * nx)
        self.yi = _Spline1D(self.s_waypoints, xy[:, 1] + left_width * ny)
        self.xo = _Spline1D(self.s_waypoints, xy[:, 0] - right_width * nx)
        self.yo = _Spline1D(self.s_waypoints, xy[:, 1] - right_width * ny)

    def _normal_np(self):
        s = jnp.asarray(self.s_waypoints)
        dx = np.asarray(self.x.deriv(s))
        dy = np.asarray(self.y.deriv(s))
        nrm = np.hypot(dx, dy)
        return -dy / nrm, dx / nrm

    # ---------------------------------------------------------------- queries
    def _s_mod(self, s):
        if self.circuit:
            L = self.track_length
            return jnp.mod(jnp.mod(s, L) + L, L)
        return jnp.clip(s, 0.0, self.track_length)

    def curvature(self, s):
        s = self._s_mod(s)
        dx, dy = self.x.deriv(s), self.y.deriv(s)
        ddx, ddy = self.x.deriv2(s), self.y.deriv2(s)
        return (dx * ddy - dy * ddx) / jnp.power(dx * dx + dy * dy, 1.5)

    def tangent_angle(self, s):
        s = self._s_mod(s)
        return jnp.arctan2(self.y.deriv(s), self.x.deriv(s))

    def left_width(self, s):
        return self.left(self._s_mod(s))

    def right_width(self, s):
        return self.right(self._s_mod(s))

    def local_to_global(self, cl_coord):
        cl = jnp.asarray(cl_coord)
        s, ey, epsi = cl[..., 0], cl[..., 1], cl[..., 2]
        s = self._s_mod(s)
        xc, yc = self.x(s), self.y(s)
        psi_t = self.tangent_angle(s)
        x = xc + ey * jnp.cos(psi_t + jnp.pi / 2)
        y = yc + ey * jnp.sin(psi_t + jnp.pi / 2)
        psi = psi_t + epsi
        return jnp.stack([x, y, psi], axis=-1)

    def global_to_local(self, xy_coord, newton_iters: int = 10):
        p = jnp.asarray(xy_coord)
        x, y, psi = p[..., 0], p[..., 1], p[..., 2]
        pos = jnp.stack([x, y], axis=-1)

        # seed from nearest dense sample
        d2 = jnp.sum((pos[..., None, :] - self._xy_grid) ** 2, axis=-1)
        s = self._s_grid[jnp.argmin(d2, axis=-1)]

        # Newton on f(s) = (p - c(s)) . c'(s) = 0
        def body(i, s):
            cx, cy = self.x(s), self.y(s)
            dx, dy = self.x.deriv(s), self.y.deriv(s)
            ddx, ddy = self.x.deriv2(s), self.y.deriv2(s)
            rx, ry = x - cx, y - cy
            f = rx * dx + ry * dy
            fp = -(dx * dx + dy * dy) + rx * ddx + ry * ddy
            s_new = s - f / jnp.where(jnp.abs(fp) > 1e-12, fp, -1.0)
            return self._s_mod(s_new)

        s = jax.lax.fori_loop(0, newton_iters, body, s)
        psi_t = self.tangent_angle(s)
        nx, ny = jnp.cos(psi_t + jnp.pi / 2), jnp.sin(psi_t + jnp.pi / 2)
        ey = (x - self.x(s)) * nx + (y - self.y(s)) * ny
        # wrap to (-pi, pi] with real arithmetic — complex exp/angle is
        # UNIMPLEMENTED on the TPU backend
        d = psi - psi_t
        epsi = jnp.arctan2(jnp.sin(d), jnp.cos(d))
        return jnp.stack([s, ey, epsi], axis=-1)

    # ----------------------------------------------------- host-side adapters
    def local_to_global_typed(self, state) -> int:
        out = np.asarray(self.local_to_global(
            np.array([state.p.s, state.p.x_tran, state.p.e_psi])))
        state.x.x, state.x.y, state.e.psi = float(out[0]), float(out[1]), float(out[2])
        return 0

    def global_to_local_typed(self, state) -> int:
        out = np.asarray(self.global_to_local(
            np.array([state.x.x, state.x.y, state.e.psi])))
        state.p.s, state.p.x_tran, state.p.e_psi = float(out[0]), float(out[1]), float(out[2])
        return 0

    def get_track_segment(self, s_range, resample: Optional[int] = None):
        """Extract a sub-track over [s0, s1].  ``resample`` is a points-per-unit-length
        resolution, matching the reference (``casadi_bspline_track.py:173-194``:
        ``n = resample_resolution * (s1 - s0)``)."""
        s0, s1 = s_range
        s0 = max(s0, float(self.s_waypoints[0]))
        s1 = min(s1, float(self.s_waypoints[-1]))
        if resample:
            n = max(8, int(resample * (s1 - s0)))
        else:
            n = max(8, int((s1 - s0) / (self.track_length / len(self.s_waypoints))))
        s = np.linspace(s0, s1, n)
        sj = jnp.asarray(s)
        xy = np.stack([np.asarray(self.x(sj)), np.asarray(self.y(sj))], axis=-1)
        lw = np.asarray(self.left(sj))
        rw = np.asarray(self.right(sj))
        return BSplineTrack(xy, lw, rw, self.slack, s_waypoints=s - s0)

    def get_track_xy(self, pts_per_dist: float = None):
        n = max(2, int(self.track_length * (pts_per_dist or 2000 / self.track_length)))
        s = jnp.asarray(np.linspace(0, self.track_length - 1e-9, n))
        center = np.stack([np.asarray(self.x(s)), np.asarray(self.y(s))], axis=-1)
        inner = np.stack([np.asarray(self.xi(s)), np.asarray(self.yi(s))], axis=-1)
        outer = np.stack([np.asarray(self.xo(s)), np.asarray(self.yo(s))], axis=-1)
        psi = np.zeros((n, 1))
        return (np.concatenate([center, psi], axis=1),
                np.concatenate([inner, psi], axis=1),
                np.concatenate([outer, psi], axis=1))

    def plot_map(self, ax, pts_per_dist: float = None):
        center, inner, outer = self.get_track_xy(pts_per_dist)
        ax.plot(center[:, 0], center[:, 1], 'k--', linewidth=0.8)
        ax.plot(inner[:, 0], inner[:, 1], 'k-', linewidth=1.0)
        ax.plot(outer[:, 0], outer[:, 1], 'k-', linewidth=1.0)
        ax.set_aspect('equal')
        return ax


# Reference-compatible alias (the reference class name carries "Casadi")
CasadiBSplineTrack = BSplineTrack

"""Race-track geometry, TPU-native.

The reference (``/root/reference/DGSQP/tracks/radius_arclength_track.py``) represents a track
as piecewise straight/constant-curvature segments and builds CasADi ``pw_const``/``pw_lin``
lookup functions plus an IPOPT NLP for global->local projection.  Here the same geometry is
precomputed into plain arrays at construction (host side, numpy) and every query —
curvature(s), tangent(s), local<->global transforms — is a pure, vectorized ``jax.numpy``
function of those arrays: differentiable, jit-able, vmap-able over thousands of game states,
with no generated C or NLP solves anywhere.

Key data structure (mirrors reference ``get_track_key_pts``, ``radius_arclength_track.py:361-408``):
``key_pts[i] = [x, y, psi, cumulative length, segment length, signed curvature]`` where row i
describes the key point at the END of segment i (row 0 is the start pose).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.utils.math import wrap_angle


def _compute_angle(p0, p1, p2):
    """Signed angle between vectors (p1-p0) and (p2-p0).

    Vectorized equivalent of the reference helper (``radius_arclength_track.py:838-846``);
    ``p0``/``p1``/``p2`` are (..., 2) arrays.
    """
    v1 = p1 - p0
    v2 = p2 - p0
    dot = (v1 * v2).sum(-1)
    det = v1[..., 0] * v2[..., 1] - v1[..., 1] * v2[..., 0]
    return jnp.arctan2(det, dot)


class RadiusArclengthTrack:
    """Piecewise straight/arc track defined by ``cl_segs = [[length, radius], ...]``.

    ``radius == 0`` denotes a straight segment; otherwise the signed radius of the arc
    (curvature = 1/radius).  Matches the reference's segment convention
    (``radius_arclength_track.py:374-406``).
    """

    def __init__(self, track_width=None, slack=None, cl_segs=None):
        self.track_width = track_width
        self.slack = slack
        self.cl_segs = np.asarray(cl_segs, dtype=np.float64) if cl_segs is not None else None
        self.n_segs = None
        self.key_pts = None
        self.track_length = None
        self.half_width = None
        self.circuit = False
        self.phase_out = False

    # ------------------------------------------------------------------ setup
    def initialize(self, track_width=None, slack=None, cl_segs=None, init_pos=(0.0, 0.0, 0.0)):
        if track_width is not None:
            self.track_width = track_width
        if slack is not None:
            self.slack = slack
        if cl_segs is not None:
            self.cl_segs = np.asarray(cl_segs, dtype=np.float64)

        self.half_width = self.track_width / 2
        self.n_segs = self.cl_segs.shape[0]
        self.key_pts = self._compute_key_pts(self.cl_segs, init_pos)
        self.track_length = float(self.key_pts[-1, 3])

        if np.isclose(self.key_pts[0, 0], self.key_pts[-1, 0]) and \
           np.isclose(self.key_pts[0, 1], self.key_pts[-1, 1]):
            self.circuit = True

        # Cumulative tangent angle at each key point, NOT wrapped (reference builds the same
        # unwrapped table for its pw_lin tangent lookup, ``radius_arclength_track.py:207-225``).
        seg_l = self.key_pts[:, 4]
        seg_c = self.key_pts[:, 5]
        abs_angs = np.concatenate([[0.0], np.cumsum(seg_l * seg_c)])[1:]
        # abs_angs[j] = total heading change accumulated at key point j (abs_angs[0] == 0).
        self.cum_angle = abs_angs

        # Device copies for the jnp query functions.
        self._kp = jnp.asarray(self.key_pts)
        self._cum_angle = jnp.asarray(self.cum_angle)
        return self

    @staticmethod
    def _compute_key_pts(cl_segs: np.ndarray, init_pos) -> np.ndarray:
        # Pure-numpy host-side construction: no device dispatch at track-build time.
        def np_wrap(t):
            return t + 2 * np.pi if t < -np.pi else (t - 2 * np.pi if t > np.pi else t)

        n_segs = cl_segs.shape[0]
        kp = np.zeros((n_segs + 1, 6))
        kp[0, 0:3] = init_pos
        for i in range(1, n_segs + 1):
            x0, y0, psi0, cum0 = kp[i - 1, 0], kp[i - 1, 1], kp[i - 1, 2], kp[i - 1, 3]
            l, r = cl_segs[i - 1]
            if r == 0:
                psi = psi0
                x = x0 + l * np.cos(psi0)
                y = y0 + l * np.sin(psi0)
                curv = 0.0
            else:
                xc = x0 - r * np.sin(psi0)
                yc = y0 + r * np.cos(psi0)
                theta = l / r
                x = xc + r * np.sin(psi0 + theta)
                y = yc - r * np.cos(psi0 + theta)
                curv = 1.0 / r
                psi = np_wrap(psi0 + theta)
            kp[i] = [x, y, psi, cum0 + l, l, curv]
        return kp

    # ---------------------------------------------------------------- queries
    def _s_mod(self, s):
        L = self.track_length
        return jnp.mod(jnp.mod(s, L) + L, L)

    def _kp_for(self, x):
        # Track tables adopt the query dtype so f32 sessions stay f32 even with x64 enabled.
        return self._kp.astype(jnp.asarray(x).dtype)

    def curvature(self, s):
        """Signed curvature at arc length s (piecewise constant per segment).

        Equivalent of the reference's ``get_curvature_casadi_fn``
        (``radius_arclength_track.py:199-205``); fully vectorized over s.
        """
        s_bar = self._s_mod(s)
        kp = self._kp_for(s)
        # breakpoints are interior cumulative lengths; value i applies on [bp[i-1], bp[i]).
        bp = kp[1:-1, 3]
        idx = jnp.searchsorted(bp, s_bar, side='right')
        return kp[1 + idx, 5]

    def tangent_angle(self, s):
        """Track tangent angle at arc length s (piecewise linear in s; unwrapped).

        Equivalent of ``get_tangent_angle_casadi_fn`` (``radius_arclength_track.py:207-225``).
        """
        s_bar = self._s_mod(s)
        kp = self._kp_for(s)
        return jnp.interp(s_bar, kp[:, 3], self._cum_angle.astype(kp.dtype))

    def left_width(self, s):
        return jnp.full(jnp.shape(s), self.half_width)

    def right_width(self, s):
        return jnp.full(jnp.shape(s), self.half_width)

    def local_to_global(self, cl_coord):
        """(s, e_y, e_psi) -> (x, y, psi).  Vectorized analytic transform
        (reference ``radius_arclength_track.py:752-807``)."""
        cl_coord = jnp.asarray(cl_coord)
        s, e_y, e_psi = cl_coord[..., 0], cl_coord[..., 1], cl_coord[..., 2]
        s = self._s_mod(s)

        _kp = self._kp_for(s)
        cum_l = _kp[:, 3]
        idx = jnp.clip(jnp.searchsorted(cum_l, s, side='right') - 1, 0, self.n_segs - 1)

        x_s, y_s, psi_s = _kp[idx, 0], _kp[idx, 1], _kp[idx, 2]
        x_f, y_f, psi_f = _kp[idx + 1, 0], _kp[idx + 1, 1], _kp[idx + 1, 2]
        curve_f = _kp[idx + 1, 5]
        l = _kp[idx + 1, 4]
        d = s - _kp[idx, 3]

        straight = curve_f == 0

        # --- straight branch
        xs = x_s + (x_f - x_s) * d / l + e_y * jnp.cos(psi_f + jnp.pi / 2)
        ys = y_s + (y_f - y_s) * d / l + e_y * jnp.sin(psi_f + jnp.pi / 2)
        psis = wrap_angle(psi_f + e_psi)

        # --- curved branch (guard 1/curvature against the straight case)
        r = 1.0 / jnp.where(straight, 1.0, curve_f)
        sgn = jnp.where(r >= 0, 1.0, -1.0)
        x_c = x_s + jnp.abs(r) * jnp.cos(psi_s + sgn * jnp.pi / 2)
        y_c = y_s + jnp.abs(r) * jnp.sin(psi_s + sgn * jnp.pi / 2)
        span = d / jnp.abs(r)
        psi_d = wrap_angle(psi_s + sgn * span)
        ang_norm = wrap_angle(psi_s + sgn * jnp.pi / 2)
        sgn_an = jnp.where(ang_norm >= 0, 1.0, -1.0)
        ang = -sgn_an * (jnp.pi - jnp.abs(ang_norm))
        xc = x_c + (jnp.abs(r) - sgn * e_y) * jnp.cos(ang + sgn * span)
        yc = y_c + (jnp.abs(r) - sgn * e_y) * jnp.sin(ang + sgn * span)
        psic = wrap_angle(psi_d + e_psi)

        x = jnp.where(straight, xs, xc)
        y = jnp.where(straight, ys, yc)
        psi = jnp.where(straight, psis, psic)
        return jnp.stack([x, y, psi], axis=-1)

    def global_to_local(self, xy_coord):
        """(x, y, psi) -> (s, e_y, e_psi).

        The reference walks segments sequentially with containment checks
        (``radius_arclength_track.py:644-743``).  Here every segment's candidate projection is
        computed in parallel and the first valid one selected — branch-free and vmap-able.
        """
        xy_coord = jnp.asarray(xy_coord)
        x, y = xy_coord[..., 0], xy_coord[..., 1]
        psi = xy_coord[..., 2][..., None]                        # (..., 1) — broadcast vs segments
        pos = jnp.stack([x, y], axis=-1)[..., None, :]           # (..., 1, 2)

        kp = self._kp_for(xy_coord)
        pos_s = kp[:-1, 0:2]                                     # (n_segs, 2)
        pos_f = kp[1:, 0:2]
        psi_s = kp[:-1, 2]
        curve_f = kp[1:, 5]
        seg_l = kp[1:, 4]
        cum_s = kp[:-1, 3]
        wmax = self.half_width + self.slack

        straight = curve_f == 0

        # --- straight-segment candidates
        ang1 = _compute_angle(pos_s, pos, pos_f)                  # at start corner
        ang2 = _compute_angle(pos_f, pos, pos_s)                  # at end corner
        v = pos - pos_s
        vn = jnp.linalg.norm(v, axis=-1)
        ang = _compute_angle(pos_s, pos_f, pos)
        ey_st = vn * jnp.sin(ang)
        d_st = vn * jnp.cos(ang)
        s_st = cum_s + d_st
        epsi_st = wrap_angle(psi - psi_s)
        ok_st = (jnp.abs(ang1) <= jnp.pi / 2) & (jnp.abs(ang2) <= jnp.pi / 2) & \
                (jnp.abs(ey_st) <= wmax)

        # --- curved-segment candidates
        r = 1.0 / jnp.where(straight, 1.0, curve_f)
        sgn = jnp.where(r >= 0, 1.0, -1.0)
        x_c = pos_s[:, 0] + jnp.abs(r) * jnp.cos(psi_s + sgn * jnp.pi / 2)
        y_c = pos_s[:, 1] + jnp.abs(r) * jnp.sin(psi_s + sgn * jnp.pi / 2)
        center = jnp.stack([x_c, y_c], axis=-1)
        span_ang = seg_l / r
        cur_ang = _compute_angle(center, pos_s, pos)
        vc = pos - center
        vcn = jnp.linalg.norm(vc, axis=-1)
        ey_cv = -sgn * (vcn - jnp.abs(r))
        s_cv = cum_s + jnp.abs(cur_ang) * jnp.abs(r)
        epsi_cv = wrap_angle(psi - (psi_s + cur_ang))
        ok_cv = (jnp.sign(span_ang) == jnp.sign(cur_ang)) & \
                (jnp.abs(span_ang) >= jnp.abs(cur_ang)) & \
                (jnp.abs(ey_cv) <= wmax)

        valid = jnp.where(straight, ok_st, ok_cv)
        s_cand = jnp.where(straight, s_st, s_cv)
        ey_cand = jnp.where(straight, ey_st, ey_cv)
        epsi_cand = jnp.where(straight, epsi_st, epsi_cv)

        # first valid segment wins (reference breaks out of its loop at the first hit)
        first = jnp.argmax(valid, axis=-1)
        s_out = jnp.take_along_axis(s_cand, first[..., None], axis=-1)[..., 0]
        ey_out = jnp.take_along_axis(ey_cand, first[..., None], axis=-1)[..., 0]
        epsi_out = jnp.take_along_axis(epsi_cand, first[..., None], axis=-1)[..., 0]
        return jnp.stack([s_out, ey_out, epsi_out], axis=-1)

    # ----------------------------------------------------- host-side adapters
    def local_to_global_typed(self, state) -> int:
        xyp = np.asarray(self.local_to_global(np.array([state.p.s, state.p.x_tran, state.p.e_psi])))
        state.x.x, state.x.y, state.e.psi = float(xyp[0]), float(xyp[1]), float(xyp[2])
        return 0

    def global_to_local_typed(self, state) -> int:
        sey = np.asarray(self.global_to_local(np.array([state.x.x, state.x.y, state.e.psi])))
        state.p.s, state.p.x_tran, state.p.e_psi = float(sey[0]), float(sey[1]), float(sey[2])
        return 0

    # --------------------------------------------------------------- plotting
    def get_track_xy(self, pts_per_dist: float = None):
        """Sample centerline and boundaries for plotting (host-side numpy)."""
        if pts_per_dist is None:
            pts_per_dist = 2000 / self.track_length
        n = max(2, int(self.track_length * pts_per_dist))
        s = np.linspace(0, self.track_length - 1e-9, n)
        center = np.asarray(self.local_to_global(np.stack([s, np.zeros(n), np.zeros(n)], -1)))
        inner = np.asarray(self.local_to_global(np.stack([s, np.full(n, self.half_width), np.zeros(n)], -1)))
        outer = np.asarray(self.local_to_global(np.stack([s, np.full(n, -self.half_width), np.zeros(n)], -1)))
        return center, inner, outer

    def plot_map(self, ax, pts_per_dist: float = None):
        center, inner, outer = self.get_track_xy(pts_per_dist)
        ax.plot(center[:, 0], center[:, 1], 'k--', linewidth=0.8)
        ax.plot(inner[:, 0], inner[:, 1], 'k-', linewidth=1.0)
        ax.plot(outer[:, 0], outer[:, 1], 'k-', linewidth=1.0)
        ax.set_aspect('equal')
        return ax

    def remove_phase_out(self):
        if self.phase_out:
            self.cl_segs = self.cl_segs[:-1]
            self.phase_out = False
            self.initialize()

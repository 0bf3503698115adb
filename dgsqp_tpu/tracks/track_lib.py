"""Parametric track constructors and .npz track loading.

Mirrors the reference track library (``/root/reference/DGSQP/tracks/track_lib.py:14-122``):
``StraightTrack``/``CurveTrack``/``ChicaneTrack`` are built from ``[length, radius]`` segment
tables; ``get_track`` loads saved tracks by name.  The reference ships two .npz track files
(``L_track_barc``, ``f1_austin_tenth_scale``) which this loader reads directly when available.
"""
from __future__ import annotations

import os

import numpy as np

from dgsqp_tpu.tracks.base import RadiusArclengthTrack


class StraightTrack(RadiusArclengthTrack):
    def __init__(self, length, width, slack, phase_out=False):
        if phase_out:
            cl_segs = np.array([[length, 0.0], [10.0, 0.0]])
        else:
            cl_segs = np.array([[length, 0.0]])
        super().__init__(width, slack, cl_segs)
        self.phase_out = phase_out
        self.initialize()


class CurveTrack(RadiusArclengthTrack):
    def __init__(self, enter_straight_length, curve_length, curve_swept_angle,
                 exit_straight_length, width, slack, phase_out=False, ccw=True):
        s = 1 if ccw else -1
        segs = [[enter_straight_length, 0.0],
                [curve_length, s * curve_length / curve_swept_angle],
                [exit_straight_length, 0.0]]
        if phase_out:
            segs.append([10.0, 0.0])
        super().__init__(width, slack, np.array(segs))
        self.phase_out = phase_out
        self.initialize()


class ChicaneTrack(RadiusArclengthTrack):
    def __init__(self, enter_straight_length, curve1_length, curve1_swept_angle,
                 mid_straight_length, curve2_length, curve2_swept_angle,
                 exit_straight_length, width, slack, phase_out=False, mirror=False):
        if mirror:
            s1, s2 = 1, -1
        else:
            s1, s2 = -1, 1
        segs = [[enter_straight_length, 0.0],
                [curve1_length, s1 * curve1_length / curve1_swept_angle],
                [mid_straight_length, 0.0],
                [curve2_length, s2 * curve2_length / curve2_swept_angle],
                [exit_straight_length, 0.0]]
        if phase_out:
            segs.append([10.0, 0.0])
        super().__init__(width, slack, np.array(segs))
        self.phase_out = phase_out
        self.initialize()


def get_save_folder():
    return os.path.join(os.path.dirname(__file__), 'track_data')


def get_available_tracks():
    folder = get_save_folder()
    if not os.path.isdir(folder):
        return []
    return os.listdir(folder)


def get_track(track_file: str):
    """Load a saved track by name (reference ``track_lib.py:96-122``).

    Supports ``radius_and_arc_length`` .npz files; ``casadi_bspline`` files load through
    :class:`dgsqp_tpu.tracks.bspline.BSplineTrack`.
    """
    if not track_file.endswith('.npz'):
        track_file += '.npz'
    candidates = [os.path.join(get_save_folder(), track_file)]
    # Also look in the reference checkout's track_data if present (read-only data files).
    ref_dir = '/root/reference/DGSQP/tracks/track_data'
    if os.path.isdir(ref_dir):
        candidates.append(os.path.join(ref_dir, track_file))
    path = next((p for p in candidates if os.path.isfile(p)), None)
    if path is None:
        raise ValueError(f'Track {track_file} unavailable; looked in {candidates}')

    data = np.load(path, allow_pickle=True)
    if data['save_mode'] == 'radius_and_arc_length':
        track = RadiusArclengthTrack()
        track.initialize(float(data['track_width']), float(data['slack']), data['cl_segs'])
    elif data['save_mode'] == 'casadi_bspline':
        from dgsqp_tpu.tracks.bspline import BSplineTrack
        track = BSplineTrack(np.asarray(data['xy_waypoints']),
                             np.asarray(data['left_width']),
                             np.asarray(data['right_width']),
                             s_waypoints=np.asarray(data['s_waypoints']))
    else:
        raise NotImplementedError(f"Unknown track save mode {data['save_mode']}")
    return track


class RacelineInterpolator:
    """Time-parametrized raceline: callable t -> state columns, plus s->t lookup.

    TPU-native stand-in for the reference's tuple of CasADi linear interpolants
    (``track_lib.py:124-143``); evaluation is vectorized ``jnp.interp`` per channel.
    Columns: [x, y, psi, v_long, v_tran, psidot, e_psi, s, e_y].
    """

    def __init__(self, T: np.ndarray, mat: np.ndarray):
        self.T = np.asarray(T, dtype=np.float64)
        self.mat = np.asarray(mat, dtype=np.float64)

    def __call__(self, t):
        import jax.numpy as jnp
        t = jnp.asarray(t)
        return [jnp.interp(t, self.T, self.mat[:, i]) for i in range(self.mat.shape[1])]

    def s2t(self, s):
        import jax.numpy as jnp
        return jnp.interp(jnp.asarray(s), self.mat[:, 7], self.T)


def load_mpclab_raceline(file_path, track_name, time_scale: float = 1.0):
    """Load an mpclab .npz raceline and build two-lap interpolators
    (reference ``track_lib.py:124-143``).  Returns (raceline, s2t, raceline_mat)."""
    track = get_track(track_name)
    f = np.load(file_path)
    mat = np.vstack((f['x'], f['y'], f['psi'], f['v_long'] / time_scale,
                     f['v_tran'] / time_scale, f['psidot'] / time_scale,
                     f['e_psi'], f['s'], f['e_y'])).T
    T = f['t'] * time_scale

    mat2 = mat.copy()
    mat2[:, 7] += track.track_length
    T2 = T + T[-1]
    mat_two = np.vstack((mat, mat2[1:]))
    T_two = np.append(T, T2[1:])
    interp = RacelineInterpolator(T_two, mat_two)
    return interp, interp.s2t, mat


def load_tum_raceline(file_path, track_name, tenth_scale: bool = False,
                      time_scale: float = 1.0, segment=None, resample_resolution=None):
    """Load a TUM global-raceline csv (``s;x;y;psi;kappa;v;a``) and convert to local
    coordinates against the named track (reference ``track_lib.py:145-213``)."""
    import csv as _csv

    track = get_track(track_name)
    size_scale = 0.1 if tenth_scale else 1.0
    rows = []
    with open(file_path, 'r') as f:
        for d in _csv.reader(f, delimiter=';'):
            if '#' in d[0]:
                continue
            rows.append([float(v) for v in d])
    rows = np.asarray(rows)
    x = rows[:, 1] * size_scale
    y = rows[:, 2] * size_scale
    psi = rows[:, 3] + np.pi / 2
    v = rows[:, 5] * size_scale / time_scale
    s_raw = list(rows[:, 0] * size_scale)
    # one batched projection instead of a per-row eager Newton solve
    sey = np.asarray(track.global_to_local(np.stack([x, y, psi], axis=-1)))
    s, ey, epsi = sey[:, 0].copy(), sey[:, 1], sey[:, 2]
    # unwrap the arc coordinate across the start/finish line
    for k in range(1, len(s)):
        if s[k] < s[k - 1]:
            s[k:] += track.track_length
            break
    mat = np.stack([x, y, psi, v, np.zeros_like(x), np.zeros_like(x),
                    epsi, s, ey], axis=-1)
    T = [0.0]
    for k in range(len(s_raw) - 1):
        T.append(T[-1] + (s_raw[k + 1] - s_raw[k]) / mat[k, 3])
    T = np.array(T)

    if not resample_resolution:
        resample_resolution = int(len(s_raw) / s_raw[-1])

    if segment:
        interp0 = RacelineInterpolator(T, mat)
        n = int((segment[1] - segment[0]) * resample_resolution)
        Ts = np.interp(np.linspace(segment[0], segment[1], n), mat[:, 7], T)
        T_seg = Ts - Ts[0]
        mat_seg = np.stack([np.interp(Ts, T, mat[:, i]) for i in range(mat.shape[1])], axis=-1)
        mat_seg[:, 7] -= segment[0]
        interp = RacelineInterpolator(T_seg, mat_seg)
        return interp, interp.s2t, mat_seg

    mat2 = mat.copy()
    mat2[:, 7] += track.track_length
    T2 = T + T[-1]
    interp = RacelineInterpolator(np.append(T, T2[1:]), np.vstack((mat, mat2[1:])))
    return interp, interp.s2t, mat

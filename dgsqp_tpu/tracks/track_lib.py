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

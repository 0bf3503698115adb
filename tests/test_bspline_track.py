"""B-spline track tests: circle oracle, round trips, loading the shipped track files."""
import numpy as np
import jax.numpy as jnp
import pytest

from dgsqp_tpu.tracks.bspline import BSplineTrack
from dgsqp_tpu.tracks.track_lib import get_track


@pytest.fixture(scope='module')
def circle():
    R = 5.0
    th = np.linspace(0, 2 * np.pi, 200)
    xy = np.stack([R * np.cos(th), R * np.sin(th)], axis=-1)
    return BSplineTrack(xy, left_width=0.5, right_width=0.5)


def test_circle_arclength_and_curvature(circle):
    R = 5.0
    assert abs(circle.track_length - 2 * np.pi * R) < 0.01
    s = jnp.asarray(np.linspace(1.0, circle.track_length - 1.0, 50))
    k = np.asarray(circle.curvature(s))
    np.testing.assert_allclose(k, 1 / R, rtol=2e-3)


def test_circle_round_trip(circle):
    rng = np.random.default_rng(0)
    s = rng.uniform(1.0, circle.track_length - 1.0, 50)
    ey = rng.uniform(-0.4, 0.4, 50)
    epsi = rng.uniform(-0.3, 0.3, 50)
    cl = np.stack([s, ey, epsi], axis=-1)
    xyp = np.asarray(circle.local_to_global(cl))
    back = np.asarray(circle.global_to_local(xyp))
    np.testing.assert_allclose(back[:, 0], cl[:, 0], atol=2e-3)
    np.testing.assert_allclose(back[:, 1], cl[:, 1], atol=2e-3)


def test_load_shipped_tracks():
    """The reference ships two .npz track files; both must load and answer queries."""
    for name in ['L_track_barc', 'f1_austin_tenth_scale']:
        try:
            track = get_track(name)
        except ValueError:
            pytest.skip('reference track data not present')
        assert track.track_length > 1.0
        out = np.asarray(track.local_to_global(np.array([1.0, 0.0, 0.0])))
        assert np.isfinite(out).all()
        k = float(track.curvature(1.0))
        assert np.isfinite(k)

"""Track geometry tests: round trips, curvature/tangent consistency, known geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.tracks import StraightTrack, CurveTrack, ChicaneTrack


@pytest.fixture(scope='module')
def chicane():
    return ChicaneTrack(enter_straight_length=1, curve1_length=4,
                        curve1_swept_angle=45 * np.pi / 180, mid_straight_length=1,
                        exit_straight_length=5, curve2_length=4,
                        curve2_swept_angle=45 * np.pi / 180, width=2.0, slack=0.8,
                        mirror=False)


def test_straight_track_geometry():
    t = StraightTrack(length=10.0, width=2.0, slack=0.5)
    assert t.track_length == 10.0
    xyp = np.asarray(t.local_to_global(np.array([3.0, 0.5, 0.1])))
    # straight east-bound track starting at origin: x=s, y=e_y, psi=e_psi
    np.testing.assert_allclose(xyp, [3.0, 0.5, 0.1], atol=1e-12)
    sey = np.asarray(t.global_to_local(xyp))
    np.testing.assert_allclose(sey, [3.0, 0.5, 0.1], atol=1e-12)


def test_curve_track_quarter_circle():
    # 90-degree left turn of arc length pi/2 * r with r = 2
    r = 2.0
    arc = np.pi / 2 * r
    t = CurveTrack(enter_straight_length=1.0, curve_length=arc, curve_swept_angle=np.pi / 2,
                   exit_straight_length=1.0, width=2.0, slack=0.5, ccw=True)
    # end of curve: entered at (1,0) heading east, quarter circle left -> center (1, r)
    xyp = np.asarray(t.local_to_global(np.array([1.0 + arc, 0.0, 0.0])))
    np.testing.assert_allclose(xyp, [1.0 + r, r, np.pi / 2], atol=1e-9)
    # curvature on the arc is 1/r, zero on straights
    assert np.isclose(float(t.curvature(0.5)), 0.0)
    assert np.isclose(float(t.curvature(1.0 + arc / 2)), 1 / r)
    assert np.isclose(float(t.curvature(1.0 + arc + 0.5)), 0.0)
    # tangent angle at end of arc is pi/2 and stays there
    assert np.isclose(float(t.tangent_angle(1.0 + arc)), np.pi / 2, atol=1e-9)
    assert np.isclose(float(t.tangent_angle(1.0 + arc + 0.7)), np.pi / 2, atol=1e-9)


def test_chicane_round_trip(chicane):
    rng = np.random.default_rng(0)
    n = 200
    s = rng.uniform(0.05, chicane.track_length - 0.05, n)
    ey = rng.uniform(-0.9, 0.9, n)
    epsi = rng.uniform(-0.5, 0.5, n)
    cl = np.stack([s, ey, epsi], axis=-1)
    xyp = np.asarray(chicane.local_to_global(cl))
    back = np.asarray(chicane.global_to_local(xyp))
    np.testing.assert_allclose(back, cl, atol=1e-6)


def test_chicane_round_trip_other_direction(chicane):
    # global -> local -> global on on-track points
    rng = np.random.default_rng(1)
    n = 100
    s = rng.uniform(0.05, chicane.track_length - 0.05, n)
    ey = rng.uniform(-0.9, 0.9, n)
    cl = np.stack([s, ey, np.zeros(n)], axis=-1)
    xyp = np.asarray(chicane.local_to_global(cl))
    cl2 = np.asarray(chicane.global_to_local(xyp))
    xyp2 = np.asarray(chicane.local_to_global(cl2))
    np.testing.assert_allclose(xyp2, xyp, atol=1e-6)


def test_tangent_matches_centerline_derivative(chicane):
    """tangent_angle(s) must equal the direction of d(centerline)/ds."""
    def center_xy(s):
        out = chicane.local_to_global(jnp.stack([s, jnp.zeros_like(s), jnp.zeros_like(s)], -1))
        return out[..., 0], out[..., 1]

    s = jnp.linspace(0.2, chicane.track_length - 0.2, 50)
    eps = 1e-5
    x1, y1 = center_xy(s + eps)
    x0, y0 = center_xy(s - eps)
    ang_fd = np.arctan2(np.asarray(y1 - y0), np.asarray(x1 - x0))
    ang = np.asarray(chicane.tangent_angle(s))
    # compare modulo 2pi
    d = np.angle(np.exp(1j * (ang - ang_fd)))
    np.testing.assert_allclose(d, 0, atol=1e-4)


def test_curvature_is_jittable_and_vmappable(chicane):
    f = jax.jit(jax.vmap(chicane.curvature))
    s = jnp.linspace(0.0, chicane.track_length, 64)
    k = f(s)
    assert k.shape == (64,)
    # signed curvature: first curve is right-handed (mirror=False => s1=-1)
    assert float(chicane.curvature(3.0)) < 0
    assert float(chicane.curvature(8.0)) > 0


def test_local_to_global_differentiable(chicane):
    g = jax.grad(lambda s: chicane.local_to_global(jnp.array([s, 0.1, 0.0]))[0])
    val = float(g(2.5))
    assert np.isfinite(val)

"""Dynamics model tests: AD Jacobians vs finite differences, rollout sanity, marshalling."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.dynamics import (DynamicBicycleConfig, KinematicBicycleConfig, UnicycleConfig,
                                DynamicCLBicycle, KinematicBicycleCombined, KinematicUnicycle,
                                KinematicUnicycleCombined, MultiAgentDynamicsModel,
                                MultiAgentModelConfig, get_dynamics_model)
from dgsqp_tpu.tracks import ChicaneTrack
from dgsqp_tpu.types import VehicleState


@pytest.fixture(scope='module')
def track():
    return ChicaneTrack(enter_straight_length=1, curve1_length=4,
                        curve1_swept_angle=np.pi / 4, mid_straight_length=1,
                        exit_straight_length=5, curve2_length=4,
                        curve2_swept_angle=np.pi / 4, width=2.0, slack=0.8)


def _fd_jacobian(f, x, eps=1e-6):
    x = np.asarray(x, dtype=float)
    y0 = np.asarray(f(x))
    J = np.zeros((y0.size, x.size))
    for i in range(x.size):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        J[:, i] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
    return J


MODELS = [
    ('kin_bike_combined', lambda tr: KinematicBicycleCombined(
        0.0, KinematicBicycleConfig(dt=0.1, drag_coefficient=0.1, slip_coefficient=0.1), track=tr),
     np.array([0.6, 0.05, 2.3, 0.05, 0.6, 0.04]), np.array([0.5, 0.1])),
    ('kin_unicycle', lambda tr: KinematicUnicycle(0.0, UnicycleConfig(dt=0.1)),
     np.array([0.5, 0.2, 2.0, 0.3]), np.array([1.0, 0.2])),
    ('kin_unicycle_combined', lambda tr: KinematicUnicycleCombined(
        0.0, UnicycleConfig(dt=0.1), track=tr),
     np.array([0.6, 0.05, 2.3, 0.05, 0.6, 0.04]), np.array([1.0, 0.2])),
    ('dyn_bike_cl', lambda tr: DynamicCLBicycle(
        0.0, DynamicBicycleConfig(dt=0.1), track=tr),
     np.array([2.0, 0.1, 0.2, 0.05, 0.6, 0.04]), np.array([0.5, 0.1])),
]


@pytest.mark.parametrize('name,make,q0,u0', MODELS, ids=[m[0] for m in MODELS])
def test_jacobians_match_finite_differences(track, name, make, q0, u0):
    model = make(track)
    A = np.asarray(model.fA(jnp.asarray(q0), jnp.asarray(u0)))
    B = np.asarray(model.fB(jnp.asarray(q0), jnp.asarray(u0)))
    A_fd = _fd_jacobian(lambda q: model.fc(jnp.asarray(q), jnp.asarray(u0)), q0)
    B_fd = _fd_jacobian(lambda u: model.fc(jnp.asarray(q0), jnp.asarray(u)), u0)
    np.testing.assert_allclose(A, A_fd, atol=1e-5)
    np.testing.assert_allclose(B, B_fd, atol=1e-5)


@pytest.mark.parametrize('name,make,q0,u0', MODELS, ids=[m[0] for m in MODELS])
def test_discrete_jacobians(track, name, make, q0, u0):
    model = make(track)
    Ad = np.asarray(model.fAd(jnp.asarray(q0), jnp.asarray(u0)))
    Ad_fd = _fd_jacobian(lambda q: model.fd(jnp.asarray(q), jnp.asarray(u0)), q0)
    np.testing.assert_allclose(Ad, Ad_fd, atol=1e-5)


def test_euler_discretization(track):
    model = KinematicBicycleCombined(0.0, KinematicBicycleConfig(dt=0.1), track=track)
    q = jnp.array([0.5, 0.0, 2.0, 0.0, 0.5, 0.0])
    u = jnp.array([1.0, 0.1])
    expected = q + 0.1 * model.fc(q, u)
    np.testing.assert_allclose(np.asarray(model.fd(q, u)), np.asarray(expected), atol=1e-12)


def test_rk4_matches_fine_euler(track):
    cfg = KinematicBicycleConfig(dt=0.1, discretization_method='rk4', M=4)
    model = KinematicBicycleCombined(0.0, cfg, track=track)
    q = jnp.array([0.5, 0.0, 2.0, 0.0, 0.5, 0.0])
    u = jnp.array([1.0, 0.1])
    q_rk4 = np.asarray(model.fd(q, u))
    # very fine euler as oracle
    n = 10000
    qq, _ = jax.lax.scan(lambda x, _: (x + (0.1 / n) * model.fc(x, u), None), q, None, length=n)
    np.testing.assert_allclose(q_rk4, np.asarray(qq), atol=1e-6)


def test_hessians_shapes(track):
    model = KinematicBicycleCombined(0.0, KinematicBicycleConfig(dt=0.1), track=track)
    q = jnp.array([0.5, 0.0, 2.0, 0.0, 0.5, 0.0])
    u = jnp.array([1.0, 0.1])
    E = model.fEd(q, u)
    F = model.fFd(q, u)
    G = model.fGd(q, u)
    assert E.shape == (6, 6, 6)
    assert F.shape == (6, 2, 2)
    assert G.shape == (6, 2, 6)


def test_multi_agent_concat(track):
    cfg = KinematicBicycleConfig(dt=0.1)
    m1 = KinematicBicycleCombined(0.0, cfg, track=track)
    m2 = KinematicBicycleCombined(0.0, cfg, track=track)
    joint = MultiAgentDynamicsModel(0.0, [m1, m2], MultiAgentModelConfig(dt=0.1))
    assert joint.n_q == 12 and joint.n_u == 4
    q = jnp.arange(12.0) * 0.1 + 0.5
    u = jnp.array([1.0, 0.1, -0.5, -0.1])
    fq = np.asarray(joint.fd(q, u))
    f1 = np.asarray(m1.fd(q[:6], u[:2]))
    f2 = np.asarray(m2.fd(q[6:], u[2:]))
    np.testing.assert_allclose(fq, np.concatenate([f1, f2]), atol=1e-12)


def test_state_marshalling_round_trip(track):
    model = KinematicBicycleCombined(0.0, KinematicBicycleConfig(dt=0.1), track=track)
    st = VehicleState(t=0.0)
    st.x.x, st.x.y, st.v.v_long = 1.0, 2.0, 3.0
    st.p.e_psi, st.p.s, st.p.x_tran = 0.1, 4.0, 0.2
    st.u.u_a, st.u.u_steer = 0.5, 0.05
    q, u = model.state2qu(st)
    st2 = VehicleState(t=0.0)
    model.qu2state(st2, q, u)
    q2, u2 = model.state2qu(st2)
    np.testing.assert_allclose(q, q2)
    np.testing.assert_allclose(u, u2)


def test_factory():
    m = get_dynamics_model('kinematic_unicycle', 0.0, UnicycleConfig(dt=0.1))
    assert isinstance(m, KinematicUnicycle)


def test_step_advances_state(track):
    model = KinematicBicycleCombined(0.0, KinematicBicycleConfig(dt=0.1), track=track)
    st = VehicleState(t=0.0)
    st.p.s, st.p.x_tran, st.v.v_long = 0.5, 0.0, 2.0
    track.local_to_global_typed(st)
    st.u.u_a, st.u.u_steer = 0.0, 0.0
    s0 = st.p.s
    model.step(st)
    assert st.p.s > s0
    assert np.isclose(st.t, 0.1)

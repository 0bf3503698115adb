"""CA-LTV-MPC tests: reference tracking on a unicycle with input/rate bounds."""
import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.dynamics import KinematicUnicycle, UnicycleConfig
from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
from dgsqp_tpu.solvers.solver_types import CALTVMPCParams
from dgsqp_tpu.types import (BodyLinearVelocity, OrientationEuler, Position,
                             VehicleActuation, VehicleState)

N = 10
DT = 0.1


def _make_mpc(target=np.array([1.0, 0.5, 0.0, 0.0])):
    model = KinematicUnicycle(0.0, UnicycleConfig(dt=DT))
    W = jnp.asarray(np.diag([10.0, 10.0, 1.0, 1.0]))
    tgt = jnp.asarray(target)

    def state_cost(q):
        return 0.5 * (q - tgt) @ W @ (q - tgt)

    def input_cost(u):
        return 0.05 * (u[0] ** 2 + u[1] ** 2)

    def rate_cost(du):
        return 0.05 * (du[0] ** 2 + du[1] ** 2)

    costs = {'state': [state_cost] * (N + 1),
             'input': [input_cost] * (N + 1),
             'rate': [rate_cost] * N}
    constraints = {'state_input': [None] * (N + 1), 'rate': [None] * N}

    def bound(v, ua, us):
        st = VehicleState(x=Position(x=np.inf, y=np.inf),
                          e=OrientationEuler(psi=np.inf),
                          v=BodyLinearVelocity(v_long=v),
                          u=VehicleActuation(u_a=ua, u_steer=us))
        return st

    ub = bound(5.0, 3.0, 3.0)
    lb = VehicleState(x=Position(x=-np.inf, y=-np.inf),
                      e=OrientationEuler(psi=-np.inf),
                      v=BodyLinearVelocity(v_long=-5.0),
                      u=VehicleActuation(u_a=-3.0, u_steer=-3.0))
    du_ub = VehicleState(u=VehicleActuation(u_a=10.0 * DT, u_steer=10.0 * DT))
    du_lb = VehicleState(u=VehicleActuation(u_a=-10.0 * DT, u_steer=-10.0 * DT))
    bounds = {'qu_ub': ub, 'qu_lb': lb, 'du_ub': du_ub, 'du_lb': du_lb}

    params = CALTVMPCParams(N=N, dt=DT, qp_iters=3, damping=0.5)
    return model, CA_LTV_MPC(model, costs, constraints, bounds, params, print_method=None)


def test_mpc_solves_and_respects_bounds():
    model, mpc = _make_mpc()
    st = VehicleState(t=0.0)
    st.v.v_long = 0.5
    ok = mpc.solve(st)
    assert ok
    assert np.abs(mpc.u_pred[:, 0]).max() <= 3.0 + 1e-6
    assert np.abs(np.diff(mpc.u_pred[:, 0])).max() <= 10.0 * DT + 1e-5


def test_mpc_closed_loop_reaches_target():
    model, mpc = _make_mpc(target=np.array([1.0, 0.3, 0.0, 0.0]))
    st = VehicleState(t=0.0)
    st.v.v_long = 0.3
    for _ in range(40):
        mpc.step(st)
        model.step(st)
    assert abs(st.x.x - 1.0) < 0.1
    assert abs(st.x.y - 0.3) < 0.1


def test_soft_state_bounds():
    """Soft state bounds (slack + quad/lin penalty) let the QP trade violation for cost
    (reference CA_LTV_MPC.py:446-533)."""
    from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
    from dgsqp_tpu.solvers.solver_types import CALTVMPCParams
    model, _ = _make_mpc()
    W = jnp.asarray(np.diag([10.0, 10.0, 1.0, 1.0]))
    tgt = jnp.asarray([1.0, 0.8, 0.0, 0.0])  # target OUTSIDE the hard y bound

    def state_cost(q):
        return 0.5 * (q - tgt) @ W @ (q - tgt)

    costs = {'state': [state_cost] * (N + 1),
             'input': [lambda u: 0.05 * (u[0] ** 2 + u[1] ** 2)] * (N + 1),
             'rate': [lambda du: 0.05 * (du[0] ** 2 + du[1] ** 2)] * N}
    constraints = {'state_input': [None] * (N + 1), 'rate': [None] * N}

    ub = VehicleState(x=Position(x=np.inf, y=0.5),  # hard-ish bound y <= 0.5
                      e=OrientationEuler(psi=np.inf),
                      v=BodyLinearVelocity(v_long=5.0),
                      u=VehicleActuation(u_a=3.0, u_steer=3.0))
    lb = VehicleState(x=Position(x=-np.inf, y=-0.5),
                      e=OrientationEuler(psi=-np.inf),
                      v=BodyLinearVelocity(v_long=-5.0),
                      u=VehicleActuation(u_a=-3.0, u_steer=-3.0))
    du_ub = VehicleState(u=VehicleActuation(u_a=1.0, u_steer=1.0))
    du_lb = VehicleState(u=VehicleActuation(u_a=-1.0, u_steer=-1.0))
    params = CALTVMPCParams(N=N, dt=DT, qp_iters=2, damping=0.5,
                            soft_state_bound_idxs=[1],  # y is qu index 1
                            soft_state_bound_quad=[50.0],
                            soft_state_bound_lin=[5.0])
    mpc = CA_LTV_MPC(model, costs, constraints,
                     {'qu_ub': ub, 'qu_lb': lb, 'du_ub': du_ub, 'du_lb': du_lb},
                     params, print_method=None)
    st = VehicleState(t=0.0)
    st.v.v_long = 0.5
    ok = mpc.solve(st)
    assert ok
    # soft bound may be violated slightly but not wildly
    assert mpc.q_pred[:, 1].max() < 0.75


def test_riccati_nonlinear_constraints_match_dense():
    """dense vs riccati with a NONLINEAR state_input constraint (obstacle-avoidance
    style, as the race stack's tracker uses) — the Dm/Em nonlinear-row scatter path."""
    from dgsqp_tpu.dynamics import KinematicUnicycle, UnicycleConfig
    from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
    from dgsqp_tpu.solvers.solver_types import CALTVMPCParams

    p_obs = jnp.asarray([0.5, 0.25])
    r_obs = 0.2

    def obs_avoid(q, u):
        d = q[0:2] - p_obs
        return jnp.atleast_1d(r_obs ** 2 - jnp.dot(d, d))
    obs_avoid.n_out = 1

    def build(backend):
        model = KinematicUnicycle(0.0, UnicycleConfig(dt=DT))
        W = jnp.asarray(np.diag([10.0, 10.0, 1.0, 1.0]))
        tgt = jnp.asarray([1.0, 0.5, 0.0, 0.0])
        costs = {'state': [lambda q: 0.5 * (q - tgt) @ W @ (q - tgt)] * (N + 1),
                 'input': [lambda u: 0.05 * (u[0] ** 2 + u[1] ** 2)] * (N + 1),
                 'rate': [lambda du: 0.05 * (du[0] ** 2 + du[1] ** 2)] * N}
        constraints = {'state_input': [None] + [obs_avoid] * N, 'rate': [None] * N}
        ub = VehicleState(x=Position(x=np.inf, y=np.inf),
                          e=OrientationEuler(psi=np.inf),
                          v=BodyLinearVelocity(v_long=5.0),
                          u=VehicleActuation(u_a=3.0, u_steer=3.0))
        lb = VehicleState(x=Position(x=-np.inf, y=-np.inf),
                          e=OrientationEuler(psi=-np.inf),
                          v=BodyLinearVelocity(v_long=-5.0),
                          u=VehicleActuation(u_a=-3.0, u_steer=-3.0))
        du_ub = VehicleState(u=VehicleActuation(u_a=1.0, u_steer=1.0))
        du_lb = VehicleState(u=VehicleActuation(u_a=-1.0, u_steer=-1.0))
        params = CALTVMPCParams(N=N, dt=DT, qp_iters=3, damping=0.5,
                                qp_backend=backend)
        return CA_LTV_MPC(model, costs, constraints,
                          {'qu_ub': ub, 'qu_lb': lb, 'du_ub': du_ub, 'du_lb': du_lb},
                          params, print_method=None)

    preds = {}
    for backend in ('dense', 'riccati'):
        mpc = build(backend)
        st = VehicleState(t=0.0)
        st.v.v_long = 0.5
        assert mpc.solve(st)
        # the linearized obstacle constraint is respected along the prediction
        d2 = ((mpc.q_pred[:, 0] - 0.5) ** 2 + (mpc.q_pred[:, 1] - 0.25) ** 2)
        assert d2.min() > (0.2 - 0.03) ** 2
        preds[backend] = (mpc.u_pred.copy(), mpc.q_pred.copy())
    np.testing.assert_allclose(preds['riccati'][0], preds['dense'][0], atol=3e-4)
    np.testing.assert_allclose(preds['riccati'][1], preds['dense'][1], atol=3e-4)


def test_riccati_soft_constraints_match_dense():
    """With soft state bounds, the riccati backend's slack-as-stage-input construction
    reproduces the dense backend's slack-variable solution."""
    from dgsqp_tpu.solvers.ca_ltv_mpc import CA_LTV_MPC
    from dgsqp_tpu.solvers.solver_types import CALTVMPCParams

    def build(backend):
        model, _ = _make_mpc()
        W = jnp.asarray(np.diag([10.0, 10.0, 1.0, 1.0]))
        tgt = jnp.asarray([1.0, 0.8, 0.0, 0.0])
        costs = {'state': [lambda q: 0.5 * (q - tgt) @ W @ (q - tgt)] * (N + 1),
                 'input': [lambda u: 0.05 * (u[0] ** 2 + u[1] ** 2)] * (N + 1),
                 'rate': [lambda du: 0.05 * (du[0] ** 2 + du[1] ** 2)] * N}
        constraints = {'state_input': [None] * (N + 1), 'rate': [None] * N}
        ub = VehicleState(x=Position(x=np.inf, y=0.5),
                          e=OrientationEuler(psi=np.inf),
                          v=BodyLinearVelocity(v_long=5.0),
                          u=VehicleActuation(u_a=3.0, u_steer=3.0))
        lb = VehicleState(x=Position(x=-np.inf, y=-0.5),
                          e=OrientationEuler(psi=-np.inf),
                          v=BodyLinearVelocity(v_long=-5.0),
                          u=VehicleActuation(u_a=-3.0, u_steer=-3.0))
        du_ub = VehicleState(u=VehicleActuation(u_a=1.0, u_steer=1.0))
        du_lb = VehicleState(u=VehicleActuation(u_a=-1.0, u_steer=-1.0))
        params = CALTVMPCParams(N=N, dt=DT, qp_iters=2, damping=0.5,
                                qp_backend=backend,
                                soft_state_bound_idxs=[1],
                                soft_state_bound_quad=[50.0],
                                soft_state_bound_lin=[5.0])
        return CA_LTV_MPC(model, costs, constraints,
                          {'qu_ub': ub, 'qu_lb': lb, 'du_ub': du_ub, 'du_lb': du_lb},
                          params, print_method=None)

    preds = {}
    for backend in ('dense', 'riccati'):
        mpc = build(backend)
        st = VehicleState(t=0.0)
        st.v.v_long = 0.5
        assert mpc.solve(st)
        assert mpc.q_pred[:, 1].max() < 0.75     # soft bound violated only slightly
        preds[backend] = (mpc.u_pred.copy(), mpc.q_pred.copy())
    np.testing.assert_allclose(preds['riccati'][0], preds['dense'][0], atol=2e-4)
    np.testing.assert_allclose(preds['riccati'][1], preds['dense'][1], atol=2e-4)


def test_riccati_backend_matches_dense():
    """qp_backend='riccati' (stage-structured OCP-QP kernel) reproduces the dense
    backend's MPC solution on the tracking problem with active input bounds."""
    from dgsqp_tpu.dynamics import KinematicUnicycle, UnicycleConfig

    def build(backend):
        model = KinematicUnicycle(0.0, UnicycleConfig(dt=DT))
        W = jnp.asarray(np.diag([10.0, 10.0, 1.0, 1.0]))
        tgt = jnp.asarray([1.0, 0.5, 0.0, 0.0])
        costs = {'state': [lambda q: 0.5 * (q - tgt) @ W @ (q - tgt)] * (N + 1),
                 'input': [lambda u: 0.05 * (u[0] ** 2 + u[1] ** 2)] * (N + 1),
                 'rate': [lambda du: 0.05 * (du[0] ** 2 + du[1] ** 2)] * N}
        constraints = {'state_input': [None] * (N + 1), 'rate': [None] * N}
        ub = VehicleState(x=Position(x=np.inf, y=np.inf),
                          e=OrientationEuler(psi=np.inf),
                          v=BodyLinearVelocity(v_long=5.0),
                          u=VehicleActuation(u_a=3.0, u_steer=3.0))
        lb = VehicleState(x=Position(x=-np.inf, y=-np.inf),
                          e=OrientationEuler(psi=-np.inf),
                          v=BodyLinearVelocity(v_long=-5.0),
                          u=VehicleActuation(u_a=-3.0, u_steer=-3.0))
        du_ub = VehicleState(u=VehicleActuation(u_a=10.0 * DT, u_steer=10.0 * DT))
        du_lb = VehicleState(u=VehicleActuation(u_a=-10.0 * DT, u_steer=-10.0 * DT))
        params = CALTVMPCParams(N=N, dt=DT, qp_iters=3, damping=0.5,
                                qp_backend=backend)
        return CA_LTV_MPC(model, costs, constraints,
                          {'qu_ub': ub, 'qu_lb': lb, 'du_ub': du_ub, 'du_lb': du_lb},
                          params, print_method=None)

    st = VehicleState(t=0.0)
    st.v.v_long = 0.5
    dense = build('dense')
    assert dense.solve(VehicleState(t=0.0, v=st.v))
    st2 = VehicleState(t=0.0)
    st2.v.v_long = 0.5
    ric = build('riccati')
    assert ric.solve(st2)
    np.testing.assert_allclose(ric.u_pred, dense.u_pred, atol=2e-4)
    np.testing.assert_allclose(ric.q_pred, dense.q_pred, atol=2e-4)
    # the du rate bound binds initially (both backends agree on the active set)
    assert np.abs(ric.du_pred).max() <= 10.0 * DT + 1e-6

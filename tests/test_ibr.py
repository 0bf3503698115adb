"""IBR tests: best-response fixed point is a Nash equilibrium on the integrator game."""
import pytest
import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.dynamics import IntegratorModel, DynamicsConfig, MultiAgentDynamicsModel
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.ibr import IBR
from dgsqp_tpu.solvers.solver_types import DGSQPParams, IBRParams
from dgsqp_tpu.types import VehicleState

N = 5
DT = 0.1


def _game(gamma=0.1):
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 50.0 * (x[0] - 0.5) ** 2 + gamma * x[0] * x[1]

    def term_1(x):
        return 50.0 * (x[1] - 0.5) ** 2 + gamma * x[0] * x[1]

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    bounds = {'ub': [ub, ub.copy()], 'lb': [lb, lb.copy()]}
    costs = [(stage, term_0), (stage, term_1)]
    return joint, costs, bounds


def test_ibr_converges_to_nash():
    joint, costs, bounds = _game()
    ibr = IBR(joint, costs, [None, None], None, bounds,
              IBRParams(N=N, dt=DT, ibr_iters=20, p_tol=1e-7, d_tol=1e-7),
              print_method=None)
    ibr.set_warm_start(np.zeros((N, 2)))
    info = ibr.solve([VehicleState(), VehicleState()])
    assert info['status'], info

    joint2, costs2, bounds2 = _game()
    sq = DGSQP(joint2, costs2, [None, None], None, bounds2,
               DGSQPParams(N=N, dt=DT, reg=0.0, p_tol=1e-8, d_tol=1e-8),
               print_method=None)
    sq_info = sq.solve([VehicleState(), VehicleState()])
    assert sq_info['status']
    np.testing.assert_allclose(info['u_sol'], sq_info['u_sol'], atol=1e-4)


def test_single_sweep_runs():
    joint, costs, bounds = _game()
    ibr = IBR(joint, costs, [None, None], None, bounds,
              IBRParams(N=N, dt=DT, ibr_iters=1), print_method=None)
    ibr.set_warm_start(np.zeros((N, 2)))
    info = ibr.solve([VehicleState(), VehicleState()])
    assert np.isfinite(info['u_sol']).all()
    assert np.abs(info['u_sol']).max() > 0  # moved off the zero start


def test_ps_ibr_runs():
    joint, costs, bounds = _game(gamma=0.3)
    from dgsqp_tpu.solvers.solver_types import IBRParams
    ibr = IBR(joint, costs, [None, None], None, bounds,
              IBRParams(N=N, dt=DT, ibr_iters=5, use_ps=True, p_tol=1e-6, d_tol=1e-6),
              print_method=None)
    ibr.set_warm_start(np.zeros((N, 2)))
    info = ibr.solve([VehicleState(), VehicleState()])
    assert np.isfinite(info['u_sol']).all()
    assert np.abs(info['u_sol']).max() > 0


@pytest.mark.slow
def test_ps_sensitivities_match_finite_differences():
    """The BR-KKT implicit-function sensitivities (reference IBR.py:642-657) predict the
    opponent's exact re-solved best response to first order — with an ACTIVE constraint,
    which the round-1 cost-only simplification got wrong."""
    import jax

    # agent 1 tracks a target but a shared terminal constraint x0+x1 <= 0.6 binds
    joint, costs, bounds = _game(gamma=0.0)

    def shared_term(x):
        return jnp.array([x[0] + x[1] - 0.6])

    shared_list = [None] * N + [shared_term]
    ibr = IBR(joint, costs, [None, None], shared_list, bounds,
              IBRParams(N=N, dt=DT, ibr_iters=8, br_sqp_iters=30,
                        p_tol=1e-9, d_tol=1e-9), print_method=None)
    dtype = ibr.dtype
    x0 = jnp.zeros(joint.n_q, dtype)
    up = jnp.zeros(joint.n_u, dtype)

    # settle at the (constrained) BR fixed point first
    u = jnp.zeros(ibr.problem.n_dec, dtype)
    for _ in range(6):
        for a in range(ibr.M):
            u = ibr._solve_br(a, u, x0, up, None)
    g = ibr.problem.eval_constraints(u, x0, up, None)
    assert float(g.max()) > -1e-3, 'terminal shared constraint should be active'

    # sensitivity of agent 1 (opponent) wrt agent 0's inputs at the fixed point
    sens = ibr._response_sensitivities(0, u, x0, up, None)
    S = np.asarray(sens[1])

    # finite difference: perturb agent 0's first input, re-solve agent 1's BR exactly
    s00, s01 = ibr.ua_slices[0]
    s10, s11 = ibr.ua_slices[1]
    eps = 1e-4
    du = jnp.zeros(ibr.problem.n_dec, dtype).at[s00].set(eps)
    u_plus = ibr._solve_br(1, u + du, x0, up, None)
    u_minus = ibr._solve_br(1, u - du, x0, up, None)
    fd = np.asarray((u_plus - u_minus)[s10:s11]) / (2 * eps)
    pred = S[:, 0]
    assert np.abs(fd).max() > 1e-3, 'opponent must actually respond'
    np.testing.assert_allclose(pred, fd, atol=5e-3 + 0.05 * np.abs(fd).max())

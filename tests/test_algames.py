"""ALGAMES baseline tests: KKT certification and cross-solver agreement with DGSQP.

Cross-solver equilibrium agreement is the reference's own de-facto correctness check
(``scripts/DGSQP_ALGAMES_monte_carlo_chicane.py:488-499`` feeds identical games to both).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.dynamics import IntegratorModel, DynamicsConfig, MultiAgentDynamicsModel
from dgsqp_tpu.solvers.algames import ALGAMES
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.solver_types import ALGAMESParams, DGSQPParams
from dgsqp_tpu.types import VehicleState

N = 5
DT = 0.1


def _game(gamma=0.3, w_term=100.0):
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * w_term * (x[0] - 1.0) ** 2 + gamma * x[0] * x[1]

    def term_1(x):
        return 0.5 * w_term * (x[1] - 1.0) ** 2 + gamma * x[0] * x[1]

    def shared(x, u, um):
        return jnp.array([x[0] + x[1] - 1.0])

    def shared_term(x):
        return jnp.array([x[0] + x[1] - 1.0])

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    bounds = {'ub': [ub, ub.copy()], 'lb': [lb, lb.copy()]}
    costs = [(stage, term_0), (stage, term_1)]
    shared_list = [None] + [shared] * (N - 1) + [shared_term]
    return joint, costs, shared_list, bounds


def test_algames_converges_and_satisfies_kkt():
    joint, costs, shared_list, bounds = _game()
    params = ALGAMESParams(N=N, dt=DT, outer_iters=50, newton_iters=50,
                           line_search_iters=50, ineq_tol=1e-6, eq_tol=1e-6, opt_tol=1e-6,
                           rho=1.0, gamma=10.0, rho_max=1e7, beta=0.01, tau=0.5,
                           q_reg=1e-3, u_reg=1e-3)
    solver = ALGAMES(joint, costs, shared_list, bounds, params, print_method=None)
    solver.set_warm_start(np.zeros((N + 1, 2)), np.zeros((N, 2)))
    st1, st2 = VehicleState(), VehicleState()
    info = solver.solve([st1, st2])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info
    assert info['cond']['p_feas'] < 1e-6
    assert info['cond']['stat'] < 1e-6


@pytest.mark.slow
def test_algames_matches_dgsqp_equilibrium():
    joint, costs, shared_list, bounds = _game()
    al_params = ALGAMESParams(N=N, dt=DT, outer_iters=50, newton_iters=50,
                              line_search_iters=50, ineq_tol=1e-8, eq_tol=1e-8,
                              opt_tol=1e-8, rho=1.0, gamma=10.0, beta=0.01, tau=0.5,
                              q_reg=1e-3, u_reg=1e-3)
    al = ALGAMES(joint, costs, shared_list, bounds, al_params, print_method=None)
    al.set_warm_start(np.zeros((N + 1, 2)), np.zeros((N, 2)))
    st1, st2 = VehicleState(), VehicleState()
    al_info = al.solve([st1, st2])
    assert al_info['status'], al_info

    # fresh joint model (agent constraint split): same game for DGSQP
    joint2, costs2, shared_list2, bounds2 = _game()
    sq_params = DGSQPParams(N=N, dt=DT, reg=0.0, p_tol=1e-8, d_tol=1e-8,
                            sqp_iters=50, nonmono_ls=False)
    sq = DGSQP(joint2, costs2, [None, None], shared_list2, bounds2, sq_params,
               print_method=None)
    sq_info = sq.solve([VehicleState(), VehicleState()])
    assert sq_info['status'], sq_info

    # same equilibrium input sequences (ALGAMES u is stage-ordered (N, n_u))
    u_al = al_info['u_sol']                      # (N, 2) stage-ordered
    u_sq = np.asarray(sq.problem.u_to_stage(jnp.asarray(sq_info['u_sol'])))
    np.testing.assert_allclose(u_al, u_sq, atol=1e-5)


def test_algames_traced_matches_untraced():
    """The per-outer-iteration trace records the same terminal state as the plain solve
    and captures monotone iteration counts (ALGAMES analog of DGSQP.solve_batch_traced)."""
    joint, costs, shared_list, bounds = _game()
    params = ALGAMESParams(N=N, dt=DT, outer_iters=30, newton_iters=50,
                           line_search_iters=50, ineq_tol=1e-6, eq_tol=1e-6, opt_tol=1e-6,
                           rho=1.0, gamma=10.0, rho_max=1e7, beta=0.01, tau=0.5,
                           q_reg=1e-3, u_reg=1e-3)
    solver = ALGAMES(joint, costs, shared_list, bounds, params, print_method=None)
    B = 2
    q_ws = jnp.zeros((B, N + 1, 2))
    u_ws = jnp.zeros((B, N, 2))
    x0 = jnp.zeros((B, 2))
    u_prev = jnp.zeros((B, 2))
    res, trace = solver.solve_batch_traced(q_ws, u_ws, x0, u_prev)
    assert trace['status'].shape == (B, 30)
    # terminal trace row equals the result
    np.testing.assert_array_equal(np.asarray(trace['status'][:, -1]),
                                  np.asarray(res.status))
    np.testing.assert_allclose(np.asarray(trace['stat'][:, -1]),
                               np.asarray(res.stat), rtol=1e-12)
    assert np.all(np.asarray(res.status) == 1), np.asarray(res.status)
    # iteration counter freezes after convergence (frozen games repeat terminal rows)
    i_tr = np.asarray(trace['i'])
    assert np.all(np.diff(i_tr, axis=1) >= 0)
    np.testing.assert_array_equal(i_tr[:, -1], np.asarray(res.iters))

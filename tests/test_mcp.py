"""MCP baseline tests: KKT certification and agreement with DGSQP (PATH-parity stand-in)."""
import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.dynamics import IntegratorModel, DynamicsConfig, MultiAgentDynamicsModel
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.mcp import PATHMCP
from dgsqp_tpu.solvers.solver_types import DGSQPParams, PATHMCPParams
from dgsqp_tpu.types import VehicleState

N = 5
DT = 0.1


def _game():
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 50.0 * (x[0] - 1.0) ** 2 + 0.3 * x[0] * x[1]

    def term_1(x):
        return 50.0 * (x[1] - 1.0) ** 2 + 0.3 * x[0] * x[1]

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


def test_mcp_solves_and_satisfies_kkt():
    joint, costs, shared_list, bounds = _game()
    solver = PATHMCP(joint, costs, [None, None], shared_list, bounds,
                     PATHMCPParams(N=N, dt=DT, tol=1e-9), print_method=None)
    info = solver.solve([VehicleState(), VehicleState()])
    assert info['msg'] == 'MCP_Solved', info
    assert info['cond']['p_feas'] < 1e-7
    assert info['cond']['comp'] < 1e-7
    assert info['cond']['stat'] < 1e-7
    # duals nonnegative
    assert (info['l_sol'] >= -1e-9).all()


def test_mcp_josephy_solves_and_satisfies_kkt():
    # the oracle configuration's first phase: subproblem-exact Josephy-Newton with the
    # residual watchdog and perturbed proximal restarts
    joint, costs, shared_list, bounds = _game()
    solver = PATHMCP(joint, costs, [None, None], shared_list, bounds,
                     PATHMCPParams(N=N, dt=DT, tol=1e-7, method='josephy',
                                   line_search_iters=8, max_iters=60),
                     print_method=None)
    info = solver.solve([VehicleState(), VehicleState()])
    assert info['msg'] == 'MCP_Solved', info
    assert info['cond']['p_feas'] < 1e-6
    assert info['cond']['comp'] < 1e-6
    assert info['cond']['stat'] < 1e-6
    assert (info['l_sol'] >= -1e-9).all()


def test_mcp_matches_dgsqp():
    joint, costs, shared_list, bounds = _game()
    mcp = PATHMCP(joint, costs, [None, None], shared_list, bounds,
                  PATHMCPParams(N=N, dt=DT, tol=1e-10), print_method=None)
    mcp_info = mcp.solve([VehicleState(), VehicleState()])
    assert mcp_info['status']

    joint2, costs2, shared_list2, bounds2 = _game()
    sq = DGSQP(joint2, costs2, [None, None], shared_list2, bounds2,
               DGSQPParams(N=N, dt=DT, reg=0.0, p_tol=1e-8, d_tol=1e-8, sqp_iters=50),
               print_method=None)
    sq_info = sq.solve([VehicleState(), VehicleState()])
    assert sq_info['status']

    np.testing.assert_allclose(mcp_info['u_sol'], sq_info['u_sol'], atol=1e-5)

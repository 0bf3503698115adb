"""Cross-solver GNE agreement on a REAL racing game (short horizon for CI).

The strongest correctness evidence available without the reference binaries: two independent
algorithms (condensed SQP vs full-space augmented-Lagrangian Newton) agreeing on the
equilibrium of the same chicane duel — the reference's own validation strategy
(``DGSQP_ALGAMES_monte_carlo_chicane.py:488-499``).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
from dgsqp_tpu.harness.scenarios import build_chicane_scenario
from dgsqp_tpu.solvers.algames import ALGAMES
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.solver_types import ALGAMESParams, DGSQPParams
from dgsqp_tpu.types import VehicleState


@pytest.mark.slow
def test_chicane_dgsqp_vs_algames():
    N = 5
    sc = build_chicane_scenario(N=N, theta_deg=45.0)
    x0, u_ws, _, _ = sample_duel_initial_conditions(sc, 1, seed=0)

    sq = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints, sc.shared_constraints,
               sc.bounds, DGSQPParams(N=N, dt=sc.dt, reg=1e-3, nonmono_ls=True,
                                      sqp_iters=50, p_tol=1e-6, d_tol=1e-6,
                                      beta=0.01, tau=0.5), print_method=None)
    up = jnp.zeros(4)
    u0 = sq.problem.stage_to_u(jnp.asarray(u_ws[0]))
    l0 = sq.problem.dual_warm_start(u0, jnp.asarray(x0[0]), up)
    res = sq._solve_jit(u0, l0, jnp.asarray(x0[0]), up, None)
    assert int(res.status) in (1, 2)

    # ALGAMES needs joint constraints: combine agent rate constraints + shared obstacle
    def joint_stage_0(x, u, um):
        r1 = sc.agent_constraints[0][0](x, u[:2], um[:2])
        r2 = sc.agent_constraints[1][0](x, u[2:], um[2:])
        return jnp.concatenate([r1, r2])

    def joint_stage(x, u, um):
        r = joint_stage_0(x, u, um)
        obs = sc.shared_constraints[1](x, u, um)
        return jnp.concatenate([r, obs])

    joint_constrs = [joint_stage_0] + [joint_stage] * (N - 1) + [sc.shared_constraints[N]]

    sc2 = build_chicane_scenario(N=N, theta_deg=45.0)
    al = ALGAMES(sc2.joint_model, sc2.costs, joint_constrs, sc2.bounds,
                 ALGAMESParams(N=N, dt=sc.dt, outer_iters=50, newton_iters=50,
                               line_search_iters=50, ineq_tol=1e-6, eq_tol=1e-6,
                               opt_tol=1e-6, rho=1.0, gamma=10.0, beta=0.01, tau=0.5,
                               q_reg=1e-3, u_reg=1e-3), print_method=None)
    # warm start from the PID rollout
    q_ws = np.asarray(sq.problem.rollout(u0, jnp.asarray(x0[0])))
    al.set_warm_start(q_ws, np.asarray(u_ws[0]))
    states = [VehicleState(), VehicleState()]
    sc.joint_model.qu2state(states, np.asarray(x0[0]), np.zeros(4))
    al_info = al.solve(states)
    assert al_info['status'], al_info

    u_sq = np.asarray(sq.problem.u_to_stage(res.u))
    np.testing.assert_allclose(al_info['u_sol'], u_sq, atol=2e-3)

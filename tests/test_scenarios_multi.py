"""Merge and M-agent scenario E2E tests (shortened horizons for CI compile time)."""
import numpy as np
import jax.numpy as jnp
import pytest

from dgsqp_tpu.harness.samplers import (sample_agents_initial_conditions,
                                        sample_merge_initial_conditions)
from dgsqp_tpu.harness.scenarios import build_agents_scenario, build_merge_scenario
from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL
from dgsqp_tpu.solvers.solver_types import DGSQPParams


@pytest.mark.slow
def test_merge_scenario_solves():
    sc = build_merge_scenario(N=6)
    x0, u_ws, _, _ = sample_merge_initial_conditions(sc, 2, seed=1)
    params = DGSQPParams(N=sc.N, dt=sc.dt, reg=0.0, merit_function='stat_l1',
                         nonmono_ls=True, line_search_iters=50, sqp_iters=50,
                         p_tol=1e-3, d_tol=1e-3, beta=0.01, tau=0.5)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints, sc.shared_constraints,
                   sc.bounds, params, print_method=None)
    up = jnp.zeros(6)
    n_conv = 0
    for i in range(2):
        u0 = solver.problem.stage_to_u(jnp.asarray(u_ws[i]))
        l0 = solver.problem.dual_warm_start(u0, jnp.asarray(x0[i]), up)
        res = solver._solve_jit(u0, l0, jnp.asarray(x0[i]), up, None)
        if int(res.status) in (CONV_ABS, CONV_REL):
            n_conv += 1
            # lane constraints respected: straight-lane cars stay in [r, lw - r]
            x = np.asarray(solver.problem.rollout(res.u, jnp.asarray(x0[i])))
            assert (x[1:, 1] <= 0.3 - 0.1 + 1e-4).all()
            assert (x[1:, 1] >= 0.1 - 1e-4).all()
    assert n_conv >= 1


@pytest.mark.slow
def test_agents_scenario_three_players():
    sc = build_agents_scenario(M=3, N=5, theta_deg=90.0)
    assert sc.joint_model.n_q == 18 and sc.joint_model.n_u == 6
    x0, u_ws, v_ref, lat_ref = sample_agents_initial_conditions(sc, 2, seed=0)
    params = DGSQPParams(N=sc.N, dt=sc.dt, reg=1e-3, nonmono_ls=False,
                         line_search_iters=50, sqp_iters=50, p_tol=1e-3, d_tol=1e-3,
                         beta=0.01, tau=0.5)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints, sc.shared_constraints,
                   sc.bounds, params, print_method=None)
    up = jnp.zeros(6)
    n_conv = 0
    for i in range(2):
        u0 = solver.problem.stage_to_u(jnp.asarray(u_ws[i]))
        l0 = solver.problem.dual_warm_start(u0, jnp.asarray(x0[i]), up)
        res = solver._solve_jit(u0, l0, jnp.asarray(x0[i]), up, None)
        if int(res.status) in (CONV_ABS, CONV_REL):
            n_conv += 1
            x = np.asarray(solver.problem.rollout(res.u, jnp.asarray(x0[i])))
            for a in range(3):
                for b in range(a + 1, 3):
                    d = np.linalg.norm(x[1:, 6 * a:6 * a + 2] - x[1:, 6 * b:6 * b + 2],
                                       axis=1)
                    assert (d >= sc.obs_d - 1e-4).all()
    assert n_conv >= 1

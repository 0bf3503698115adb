"""End-to-end test: the BASELINE config-1 chicane duel solved to convergence.

Mirrors one seed of ``scripts/DGSQP_ALGAMES_monte_carlo_chicane.py`` at a shortened horizon
(compile-time control in CI); the full N=25 configuration runs in ``bench.py``.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions
from dgsqp_tpu.harness.scenarios import build_chicane_scenario
from dgsqp_tpu.harness.warm_start import duel_warm_start
from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL
from dgsqp_tpu.solvers.solver_types import DGSQPParams


@pytest.fixture(scope='module')
def scenario():
    return build_chicane_scenario(N=5, theta_deg=45.0)


@pytest.fixture(scope='module')
def samples(scenario):
    return sample_duel_initial_conditions(scenario, 3, seed=0)


def test_sampler_geometry(scenario, samples):
    x0, u_ws, v_ref, lat_ref = samples
    assert x0.shape == (3, 12)
    # both agents on track
    assert (np.abs(x0[:, 5]) <= scenario.half_width).all()
    assert (np.abs(x0[:, 11]) <= scenario.half_width).all()
    # initial separation >= obs_d (sampled at 1.2*obs_d ring in Frenet coords)
    d = np.linalg.norm(x0[:, 0:2] - x0[:, 6:8], axis=1)
    assert (d > scenario.obs_d * 0.8).all()


def test_warm_start_no_collision(scenario, samples):
    x0, u_ws, v_ref, lat_ref = samples
    _, q_ws, collision = duel_warm_start(scenario, jnp.asarray(x0[0]),
                                         jnp.asarray(v_ref[0]), jnp.asarray(lat_ref[0]))
    assert not bool(collision)
    # warm start input within bounds
    assert np.abs(np.asarray(u_ws[0])[:, [0, 2]]).max() <= scenario.input_ub[0] + 1e-9
    assert np.abs(np.asarray(u_ws[0])[:, [1, 3]]).max() <= scenario.input_ub[1] + 1e-9


@pytest.mark.slow
def test_chicane_solve_converges(scenario, samples):
    x0, u_ws, v_ref, lat_ref = samples
    params = DGSQPParams(N=scenario.N, dt=scenario.dt, reg=1e-3, nonmono_ls=False,
                         line_search_iters=50, sqp_iters=50, p_tol=1e-3, d_tol=1e-3,
                         beta=0.01, tau=0.5)
    solver = DGSQP(scenario.joint_model, scenario.costs, scenario.agent_constraints,
                   scenario.shared_constraints, scenario.bounds, params, print_method=None)
    up = jnp.zeros(4)
    n_conv = 0
    for i in range(3):
        u0 = solver.problem.stage_to_u(jnp.asarray(u_ws[i]))
        l0 = solver.problem.dual_warm_start(u0, jnp.asarray(x0[i]), up)
        res = solver._solve_jit(u0, l0, jnp.asarray(x0[i]), up, None)
        if int(res.status) in (CONV_ABS, CONV_REL):
            n_conv += 1
            assert float(res.p_feas) < 1e-3
            assert float(res.comp) < 1e-3
            assert float(res.stat) < 1e-3
            # solution respects collision avoidance along the rollout
            x = np.asarray(solver.problem.rollout(res.u, jnp.asarray(x0[i])))
            d = np.linalg.norm(x[1:, 0:2] - x[1:, 6:8], axis=1)
            assert (d >= scenario.obs_d - 1e-4).all()
    assert n_conv >= 2, f'only {n_conv}/3 converged'

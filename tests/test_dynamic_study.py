"""Exact dynamic-bicycle study (journal "dynamic study") wiring tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.harness.dynamic_study import (dynamic_warm_start,
                                             sample_dynamic_duel_initial_conditions)
from dgsqp_tpu.harness.scenarios import build_dynamic_duel


def test_dynamic_sampler_and_warm_start():
    sc = build_dynamic_duel(N=6)
    x0, u_ws, v_ref, ey_ref = sample_dynamic_duel_initial_conditions(sc, 4, seed=0)
    assert x0.shape == (4, 16)
    assert u_ws.shape == (4, 6, 4)
    assert np.all(np.isfinite(x0)) and np.all(np.isfinite(u_ws))
    # on-track laterals, forward speeds near the raceline
    H = sc.half_width
    assert np.all(np.abs(x0[:, 7]) <= H) and np.all(np.abs(x0[:, 15]) <= H)
    assert np.all(x0[:, 2] > 0) and np.all(x0[:, 10] > 0)
    # warm-start rollouts stay collision-free at the constraint radius
    _, q_ws, col = jax.vmap(lambda q, v, e: dynamic_warm_start(sc, q, v, e))(
        jnp.asarray(x0), jnp.asarray(v_ref), jnp.asarray(ey_ref))
    assert not np.any(np.asarray(col))


@pytest.mark.slow
def test_dynamic_duel_derivatives_finite():
    """GameProblem condensed derivatives through the Pacejka dynamics are finite."""
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.solver_types import DGSQPParams

    sc = build_dynamic_duel(N=4)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                   sc.shared_constraints, sc.bounds,
                   DGSQPParams(N=sc.N, dt=sc.dt, sqp_iters=3), print_method=None)
    x0, u_ws, _, _ = sample_dynamic_duel_initial_conditions(sc, 2, seed=1)
    dtype = solver.dtype
    u0 = jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype))
    up = jnp.zeros((2, sc.joint_model.n_u), dtype)
    l0 = jax.vmap(lambda u, x, p: solver.problem.dual_warm_start(u, x, p))(
        u0, jnp.asarray(x0, dtype), up)
    Q, q, G, g, x = jax.vmap(
        lambda u, l, xx, pp: solver.problem.evaluate(u, l, xx, pp))(
        u0, l0, jnp.asarray(x0, dtype), up)
    for a in (Q, q, G, g, x):
        assert np.all(np.isfinite(np.asarray(a)))


@pytest.mark.slow
def test_dynamic_duel_solves():
    """A short-horizon dynamic duel reaches a KKT point (journal study smoke)."""
    from dgsqp_tpu.harness.mc_study import run_mc_study
    from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
    from dgsqp_tpu.solvers.solver_types import DGSQPV2Params

    sc = build_dynamic_duel(N=8)
    params = DGSQPV2Params(N=sc.N, dt=sc.dt, reg=1e2, reg_decay=0.95, nms=True,
                           sqp_iters=100, p_tol=1e-3, d_tol=1e-3)
    res = run_mc_study(sc, solver_params=params, num_samples=4, seed=0,
                       solver_cls=DGSQPV2)
    conv = np.isin(res.statuses, (1, 2))
    assert conv.sum() >= 2, dict(statuses=res.statuses.tolist())


@pytest.mark.slow
def test_dynamic_approximate_duel_solves():
    """Approximate (PA) DYNAMIC game (reference
    approximate_dynamic_game_dynamic.py): scenario builds, the PA sampler
    converts exact-combined draws to the PA layout, and the frenet-approx v2
    solver makes progress to a feasible point on a small instance."""
    from dgsqp_tpu.harness.dynamic_study import sample_dynamic_pa_initial_conditions
    from dgsqp_tpu.harness.scenarios import build_dynamic_approximate_duel
    from dgsqp_tpu.harness.warm_start import seed_virtual_rate_prev
    from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
    from dgsqp_tpu.solvers.solver_types import DGSQPV2Params

    N = 5
    sc = build_dynamic_approximate_duel(N=N)
    x0, u_ws, _, _ = sample_dynamic_pa_initial_conditions(sc, 2, seed=0)
    assert x0.shape == (2, 14) and u_ws.shape == (2, N, 6)
    # progress states transferred and arc-speed channel is a sane progress rate
    assert (x0[:, 6] >= 0).all() and (u_ws[:, :, 2] > 0.5).all()

    params = DGSQPV2Params(N=N, dt=sc.dt, sqp_iters=60, p_tol=1e-3, d_tol=1e-3,
                           approximation_eval='exact', reg=1.0, reg_decay=1.0,
                           nms=True, nms_frequency=1, nms_memory_size=10,
                           nms_initial_step_size_factor=0.0,
                           conv_scaled_stat=True, conv_method='ns')
    solver = DGSQPV2FrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                 sc.shared_constraints, sc.bounds, params,
                                 print_method=None)
    u0 = solver.problem.stage_to_u(jnp.asarray(u_ws[0], solver.dtype))
    x0j = jnp.asarray(x0[0], solver.dtype)
    up = seed_virtual_rate_prev(jnp.zeros((1, 6), solver.dtype),
                                jnp.asarray(u_ws[:1, 0, :], solver.dtype),
                                sc.joint_model)[0]
    l0 = solver.problem.dual_warm_start(u0, x0j, up, None)
    res = solver._solve_jit(u0, l0, x0j, up, None)
    assert int(res.status) in (1, 2), (int(res.status), float(res.stat))
    assert float(res.p_feas) < 1e-3

"""DGSQP v2 (NMS) tests: convergence + agreement with v1 on the integrator game."""
import pytest
import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.dynamics import IntegratorModel, DynamicsConfig, MultiAgentDynamicsModel
from dgsqp_tpu.solvers.dgsqp import DGSQP
from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
from dgsqp_tpu.solvers.solver_types import DGSQPParams, DGSQPV2Params
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


def test_v2_nms_converges():
    joint, costs, shared_list, bounds = _game()
    # heavy initial regularization with a fast decay: exercises several full NMS
    # m-step cycles (reg 1e2 -> ~1 over the first m-steps) and still converges
    # under the reference-faithful checkpoint semantics.  A SLOW decay (0.95)
    # with this interior start is a known reference crawl mode (zero constraint
    # violation makes the merit the pure KKT residual, and heavily-damped QP
    # steps are ascent directions for it — see test_v2_nms_reg_crawl_terminates).
    params = DGSQPV2Params(N=N, dt=DT, reg=1e2, reg_decay=0.5, nms=True,
                           nms_frequency=5, nms_memory_size=3, sqp_iters=200,
                           p_tol=1e-7, d_tol=1e-7, merit_decrease=0.01)
    solver = DGSQPV2(joint, costs, [None, None], shared_list, bounds, params,
                     print_method=None)
    info = solver.solve([VehicleState(), VehicleState()])
    assert info['msg'] == 'conv_abs_tol', info
    assert info['cond']['p_feas'] < 1e-7
    assert info['cond']['stat'] < 1e-7


def test_v2_nms_reg_crawl_terminates():
    """Reference crawl mode: huge reg + slow decay from an interior start makes
    every QP step an ascent direction for the residual merit, so the m-step
    watchdog rejects excursions and the checkpoint line search (Armijo at the
    checkpoint with its own step/mu — reference DGSQP_v2.py:537-545 +
    load_checkpoint) accepts only the tau^(W-1) fallback step.  The solver must
    terminate benignly via the relative-tolerance test rather than deadlock,
    diverge, or report a QP failure."""
    joint, costs, shared_list, bounds = _game()
    params = DGSQPV2Params(N=N, dt=DT, reg=1e2, reg_decay=0.95, nms=True,
                           nms_frequency=2, nms_memory_size=3, sqp_iters=200,
                           p_tol=1e-7, d_tol=1e-7, merit_decrease=0.01)
    solver = DGSQPV2(joint, costs, [None, None], shared_list, bounds, params,
                     print_method=None)
    info = solver.solve([VehicleState(), VehicleState()])
    assert info['msg'] == 'conv_rel_tol', info
    assert info['cond']['p_feas'] < 1e-7
    assert info['cond']['stat'] < 1e2       # bounded, no divergence


def test_v2_matches_v1():
    joint, costs, shared_list, bounds = _game()
    v2 = DGSQPV2(joint, costs, [None, None], shared_list, bounds,
                 DGSQPV2Params(N=N, dt=DT, reg=1e1, nms=True, sqp_iters=200,
                               p_tol=1e-8, d_tol=1e-8), print_method=None)
    v2_info = v2.solve([VehicleState(), VehicleState()])
    assert v2_info['status'], v2_info

    joint1, costs1, shared_list1, bounds1 = _game()
    v1 = DGSQP(joint1, costs1, [None, None], shared_list1, bounds1,
               DGSQPParams(N=N, dt=DT, reg=0.0, p_tol=1e-8, d_tol=1e-8),
               print_method=None)
    v1_info = v1.solve([VehicleState(), VehicleState()])
    assert v1_info['status']
    np.testing.assert_allclose(v2_info['u_sol'], v1_info['u_sol'], atol=1e-5)


@pytest.mark.slow
def test_v2_chunked_compacted_matches_whole():
    """solve_batch_chunked (host compaction driver) reproduces the single-program
    while-loop batch solve — statuses and solutions identical per game."""
    import jax

    joint, costs, shared_list, bounds = _game()
    params = DGSQPV2Params(N=N, dt=DT, reg=1e1, nms=True, sqp_iters=200,
                           p_tol=1e-7, d_tol=1e-7)
    solver = DGSQPV2(joint, costs, [None, None], shared_list, bounds, params,
                     print_method=None)
    B = 24  # non-power-of-two to exercise bucket padding
    rng = np.random.default_rng(3)
    dtype = solver.dtype
    u0 = jnp.asarray(rng.normal(0, 0.1, (B, solver.n_dec)), dtype)
    x0 = jnp.asarray(rng.normal(0, 0.3, (B, solver.n_q)), dtype)
    up = jnp.zeros((B, solver.n_u), dtype)
    l0 = jax.jit(jax.vmap(lambda u, x, p: solver.problem.dual_warm_start(u, x, p)))(
        u0, x0, up)

    res_whole = solver._solve_batch_jit(u0, l0, x0, up, None)
    solver._compact_min_bucket = 4
    res_chunk = solver.solve_batch_chunked(u0, l0, x0, up, chunk_iters=8)

    np.testing.assert_array_equal(np.asarray(res_whole.status),
                                  np.asarray(res_chunk.status))
    np.testing.assert_allclose(np.asarray(res_whole.u), np.asarray(res_chunk.u),
                               rtol=0, atol=1e-12)


def test_v2_non_nms_mode():
    joint, costs, shared_list, bounds = _game()
    solver = DGSQPV2(joint, costs, [None, None], shared_list, bounds,
                     DGSQPV2Params(N=N, dt=DT, reg=1.0, nms=False, sqp_iters=200,
                                   p_tol=1e-6, d_tol=1e-6,
                                   merit_decrease_condition='armijo'),
                     print_method=None)
    info = solver.solve([VehicleState(), VehicleState()])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info


def test_v2_sum_obj_merit():
    """merit_function='sum_obj_l1' (reference DGSQP_v2.py:1161-1164) converges."""
    joint, costs, shared_list, bounds = _game()
    solver = DGSQPV2(joint, costs, [None, None], shared_list, bounds,
                     DGSQPV2Params(N=N, dt=DT, reg=1e1, nms=True, sqp_iters=200,
                                   p_tol=1e-6, d_tol=1e-6,
                                   merit_function='sum_obj_l1',
                                   merit_decrease_condition='armijo'),
                     print_method=None)
    info = solver.solve([VehicleState(), VehicleState()])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info

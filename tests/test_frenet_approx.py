"""Approximate-game (frenet-approx) solver test: PA duel converges and stays on track."""
import pytest
import numpy as np
import jax.numpy as jnp

from dgsqp_tpu.harness.scenarios import build_approximate_duel
from dgsqp_tpu.solvers.dgsqp_v2_frenet import DGSQPV2FrenetApprox
from dgsqp_tpu.solvers.solver_types import DGSQPV2Params

N = 5


@pytest.mark.slow
def test_frenet_approx_converges():
    sc = build_approximate_duel(N=N)
    params = DGSQPV2Params(N=N, dt=sc.dt, reg=1e1, reg_decay=0.95, nms=True,
                           nms_frequency=5, nms_memory_size=3, sqp_iters=100,
                           p_tol=1e-3, d_tol=1e-3, approximation_eval='always')
    solver = DGSQPV2FrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                 sc.shared_constraints, sc.bounds, params,
                                 print_method=None)
    # both cars start on the first straight, staggered
    x0 = jnp.asarray([0.3, 0.2, 1.5, 0.0, 0.3,
                      0.9, -0.2, 1.5, 0.0, 0.9])
    up = jnp.zeros(6)
    u0 = jnp.zeros(solver.n_dec)
    l0 = jnp.zeros(solver.n_c)
    res = solver._solve_jit(u0, l0, x0, up, None)
    assert int(res.status) in (1, 2), (int(res.status), float(res.stat), float(res.p_feas))
    # trajectory stays within the linearized track boundaries (i.e. inside the track)
    x = np.asarray(solver.problem.rollout(res.u, x0))
    from dgsqp_tpu.tracks.base import RadiusArclengthTrack
    for a, off in [(0, 0), (1, 5)]:
        xy = np.stack([x[1:, off], x[1:, off + 1],
                       np.zeros(x.shape[0] - 1)], axis=-1)
        sey = np.asarray(sc.track.global_to_local(xy))
        assert (np.abs(sey[:, 1]) <= sc.half_width + 5e-2).all()
    # progress increases for both
    assert x[-1, 4] > x[0, 4]
    assert x[-1, 9] > x[0, 9]


@pytest.mark.slow
def test_frenet_exact_mode_converges():
    """``approximation_eval='exact'`` (differentiate through the track geometry, no
    frozen-P pytree) + the Newton-Schulz PSD projection: the measured-best MPCC
    operating point (docs/approx_convergence.md part 2) converges conv_abs on the
    small duel.  (The indefinite ``conv_method='none'`` kernel fails its QP at the
    second iterate of this game — see test_frenet_exact_indefinite_terminates.)"""
    sc = build_approximate_duel(N=N)
    params = DGSQPV2Params(N=N, dt=sc.dt, reg=1.0, reg_decay=1.0, nms=True,
                           nms_frequency=1, nms_memory_size=10,
                           nms_initial_step_size_factor=0.0, sqp_iters=100,
                           p_tol=1e-3, d_tol=1e-3, approximation_eval='exact',
                           conv_method='ns')
    solver = DGSQPV2FrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                 sc.shared_constraints, sc.bounds, params,
                                 print_method=None)
    assert solver._approx_update is None     # exact mode carries no parameter pytree
    x0 = jnp.asarray([0.3, 0.2, 1.5, 0.0, 0.3,
                      0.9, -0.2, 1.5, 0.0, 0.9])
    up = jnp.zeros(6)
    u0 = jnp.zeros(solver.n_dec)
    l0 = jnp.zeros(solver.n_c)
    res = solver._solve_jit(u0, l0, x0, up, None)
    assert int(res.status) == 1, (int(res.status), float(res.stat), float(res.p_feas))
    assert int(res.iters) < 60
    x = np.asarray(solver.problem.rollout(res.u, x0))
    for a, off in [(0, 0), (1, 5)]:
        xy = np.stack([x[1:, off], x[1:, off + 1],
                       np.zeros(x.shape[0] - 1)], axis=-1)
        sey = np.asarray(sc.track.global_to_local(xy))
        assert (np.abs(sey[:, 1]) <= sc.half_width + 5e-2).all()


@pytest.mark.slow
def test_frenet_exact_indefinite_terminates():
    """The indefinite (``conv_method='none'``) kernel fails its QP at this game's
    second iterate; the reference-faithful recovery (m-step from the last
    CONSISTENT checkpoint record, whose full step reproduces the current point)
    must terminate benignly via the relative-tolerance exit instead of diverging
    or thrashing on a mismatched (point, step) pair."""
    sc = build_approximate_duel(N=N)
    params = DGSQPV2Params(N=N, dt=sc.dt, reg=1.0, reg_decay=1.0, nms=True,
                           nms_frequency=1, nms_memory_size=10,
                           nms_initial_step_size_factor=0.0, sqp_iters=100,
                           p_tol=1e-3, d_tol=1e-3, approximation_eval='exact',
                           conv_method='none')
    solver = DGSQPV2FrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                 sc.shared_constraints, sc.bounds, params,
                                 print_method=None)
    x0 = jnp.asarray([0.3, 0.2, 1.5, 0.0, 0.3,
                      0.9, -0.2, 1.5, 0.0, 0.9])
    res = solver._solve_jit(jnp.zeros(solver.n_dec), jnp.zeros(solver.n_c),
                            x0, jnp.zeros(6), None)
    assert int(res.status) in (2, 4), (int(res.status), float(res.stat))
    assert float(res.p_feas) < 1e-3
    assert np.isfinite(float(res.stat))


@pytest.mark.slow
def test_mcp_frenet_approx_converges():
    """The approximate-game MCP oracle (PATHMCPFrenetApprox) solves the PA duel to its
    own sharp-residual tolerance, with the MPCC linearization recomputed at every
    evaluation point (reference PATHMCP_frenet_approx.py `_evaluate_mpcc` semantics)."""
    from dgsqp_tpu.solvers.mcp import PATHMCPFrenetApprox, SOLVED
    from dgsqp_tpu.solvers.solver_types import PATHMCPParams

    sc = build_approximate_duel(N=N)
    solver = PATHMCPFrenetApprox(sc.joint_model, sc.costs, sc.agent_constraints,
                                 sc.shared_constraints, sc.bounds,
                                 PATHMCPParams(N=N, dt=sc.dt, tol=1e-6,
                                               method='hybrid', max_iters=100),
                                 print_method=None)
    x0 = jnp.asarray([0.3, 0.2, 1.5, 0.0, 0.3,
                      0.9, -0.2, 1.5, 0.0, 0.9])
    up = jnp.zeros(6)
    u0 = jnp.zeros(solver.n_dec)
    l0 = jnp.zeros(solver.n_c)
    res = solver._solve_jit(u0, l0, x0, up, None)
    assert int(res.status) == SOLVED, (int(res.status), float(res.res))
    # the KKT conditions of the (self-consistently re-linearized) approximate game hold
    assert float(res.p_feas) < 1e-5
    assert float(res.stat) < 1e-4


def test_pa_sampler_warm_start():
    """The duel sampler detects progress-augmented scenarios and produces PA-layout
    initial states + 3-channel warm starts with the arc-speed channel appended
    (reference comparison_study_barc/warm_start.py:79-121)."""
    from dgsqp_tpu.harness.samplers import sample_duel_initial_conditions

    sc = build_approximate_duel(N=N)
    x0, u_ws, v_ref, lat_ref = sample_duel_initial_conditions(sc, 4, seed=0)
    assert x0.shape == (4, 10)          # [x, y, v, psi, s] x 2 agents
    assert u_ws.shape == (4, N, 6)      # [a, steer, u_ds] x 2 agents
    # the virtual arc-speed channel tracks the PID rollout's progress rate
    assert np.all(u_ws[:, :, 2] > 0) and np.all(u_ws[:, :, 5] > 0)
    assert np.all(u_ws[:, :, 2] < 5.0)
    # PA initial state is consistent with the sampled Frenet pose: s matches and the
    # global heading equals the track tangent (e_psi=0 at the start)
    for i in range(4):
        tan1 = float(sc.track.tangent_angle(x0[i, 4]))
        assert abs(x0[i, 3] - tan1) < 1e-9

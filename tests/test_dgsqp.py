"""DGSQP solver tests: analytic LQ-game oracle, KKT certification, symmetry, batching."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.dynamics import IntegratorModel, DynamicsConfig, MultiAgentDynamicsModel
from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL
from dgsqp_tpu.solvers.solver_types import DGSQPParams
from dgsqp_tpu.types import VehicleState

N = 5
DT = 0.1


def _integrator_game(gamma=0.2, u_lim=50.0, coupled_constraint=False, w_term=1.0):
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * w_term * (x[0] - 1.0) ** 2 + gamma * x[0] * x[1]

    def term_1(x):
        return 0.5 * w_term * (x[1] - 1.0) ** 2 + gamma * x[0] * x[1]

    shared = None
    if coupled_constraint:
        def sh(x, u, um):
            return jnp.array([x[0] + x[1] - 1.0])   # combined progress cap

        def sh_term(x):
            return jnp.array([x[0] + x[1] - 1.0])
        shared = [None] + [sh] * (N - 1) + [sh_term]

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = u_lim
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -u_lim
    bounds = {'ub': [ub, ub], 'lb': [lb, lb]}

    params = DGSQPParams(N=N, dt=DT, reg=0.0, p_tol=1e-8, d_tol=1e-8,
                         sqp_iters=50, nonmono_ls=False, verbose=False)
    return DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], shared,
                 bounds, params, print_method=None)


def test_lq_game_matches_linear_solve():
    """Unconstrained LQ game: the KKT stationarity map is affine, so the open-loop Nash
    equilibrium solves one linear system.  DGSQP must land on it."""
    solver = _integrator_game(gamma=0.2)
    x0 = jnp.array([0.0, 0.0])
    up = jnp.zeros(2)
    # affine stationarity: F(u) = A u + b
    u_zero = jnp.zeros(2 * N)
    b = solver.problem.stationarity(u_zero, jnp.zeros(solver.n_c), x0, up)
    A = jax.jacfwd(lambda uu: solver.problem.stationarity(uu, jnp.zeros(solver.n_c), x0, up))(u_zero)
    u_star = np.linalg.solve(np.asarray(A), -np.asarray(b))

    st1, st2 = VehicleState(), VehicleState()
    st1.v.v_long = 0.0; st2.v.v_long = 0.0
    info = solver.solve([st1, st2])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info
    np.testing.assert_allclose(info['u_sol'], u_star, atol=1e-6)


def test_constrained_game_kkt_certificate():
    """With an active coupled constraint the returned point must satisfy the GNE KKT
    conditions: stationarity, primal feasibility, complementarity."""
    solver = _integrator_game(gamma=0.0, coupled_constraint=True, w_term=100.0)
    st1, st2 = VehicleState(), VehicleState()
    st1.v.v_long = 0.0; st2.v.v_long = 0.0
    info = solver.solve([st1, st2])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info
    assert info['cond']['p_feas'] < 1e-6
    assert info['cond']['comp'] < 1e-6
    assert info['cond']['stat'] < 1e-6
    # the shared constraint x0+x1 <= 1 must bind (both agents want x=1)
    x0 = jnp.array([0.0, 0.0])
    xf = np.asarray(solver.problem.rollout(jnp.asarray(info['u_sol']), x0))[-1]
    assert xf[0] + xf[1] <= 1.0 + 1e-6
    assert xf[0] + xf[1] > 0.9  # constraint approximately active


def test_symmetric_game_symmetric_solution():
    solver = _integrator_game(gamma=0.3, coupled_constraint=True, w_term=100.0)
    st1, st2 = VehicleState(), VehicleState()
    st1.v.v_long = 0.0; st2.v.v_long = 0.0
    info = solver.solve([st1, st2])
    u = info['u_sol']
    np.testing.assert_allclose(u[:N], u[N:], atol=1e-5)


def test_active_input_bound():
    solver = _integrator_game(gamma=0.0, u_lim=0.05, w_term=100.0)
    st1, st2 = VehicleState(), VehicleState()
    info = solver.solve([st1, st2])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info
    assert np.max(np.abs(info['u_sol'])) <= 0.05 + 1e-7


def test_batched_solve_matches_individual():
    solver = _integrator_game(gamma=0.2, coupled_constraint=True)
    up = jnp.zeros(2)
    rng = np.random.default_rng(0)
    B = 4
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solver.n_c))
    ups = jnp.zeros((B, 2))
    res_b = solver._solve_batch_jit(u0, l0, x0s, ups, None)
    for i in range(B):
        res_i = solver._solve_jit(u0[i], l0[i], x0s[i], up, None)
        assert int(res_b.status[i]) == int(res_i.status)
        np.testing.assert_allclose(np.asarray(res_b.u[i]), np.asarray(res_i.u), atol=1e-7)


def test_watchdog_mode_runs():
    """nonmono_ls=True (the flagship configuration) must still converge."""
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * (x[0] - 1.0) ** 2 + 0.5 * jnp.tanh(x[0] - x[1])

    def term_1(x):
        return 0.5 * (x[1] - 1.0) ** 2 + 0.5 * jnp.tanh(x[1] - x[0])

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-6, d_tol=1e-6,
                         sqp_iters=50, nonmono_ls=True, beta=0.01, tau=0.5)
    solver = DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], None,
                   {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)
    st1, st2 = VehicleState(), VehicleState()
    info = solver.solve([st1, st2])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info
    assert info['cond']['stat'] < 1e-6


def test_bfgs_hessian_approximation():
    """hessian_approximation='bfgs' (reference DGSQP.py:535-557) converges on the LQ game."""
    solver = _integrator_game(gamma=0.2)
    solver_bfgs = DGSQP(solver.joint_dynamics, solver.problem.costs,
                        [None, None], None,
                        {'ub': [VehicleState(v=__import__('dgsqp_tpu.types', fromlist=['BodyLinearVelocity']).BodyLinearVelocity(v_long=np.inf),
                                             u=__import__('dgsqp_tpu.types', fromlist=['VehicleActuation']).VehicleActuation(u_a=50.0)) for _ in range(2)],
                         'lb': [VehicleState(v=__import__('dgsqp_tpu.types', fromlist=['BodyLinearVelocity']).BodyLinearVelocity(v_long=-np.inf),
                                             u=__import__('dgsqp_tpu.types', fromlist=['VehicleActuation']).VehicleActuation(u_a=-50.0)) for _ in range(2)]},
                        DGSQPParams(N=N, dt=DT, reg=1e-6, p_tol=1e-7, d_tol=1e-7,
                                    sqp_iters=100, hessian_approximation='bfgs'),
                        print_method=None)
    info = solver_bfgs.solve([VehicleState(), VehicleState()])
    assert info['msg'] in ('conv_abs_tol', 'conv_rel_tol'), info
    assert info['cond']['stat'] < 1e-6


def test_chunked_batch_matches_while_loop():
    """Chunked host-loop execution must produce the same results as the single while_loop."""
    solver = _integrator_game(gamma=0.2, coupled_constraint=True)
    rng = np.random.default_rng(3)
    B = 4
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solver.n_c))
    ups = jnp.zeros((B, 2))
    res_w = solver._solve_batch_jit(u0, l0, x0s, ups, None)
    res_c = solver.solve_batch_chunked(u0, l0, x0s, ups, chunk_iters=3)
    np.testing.assert_array_equal(np.asarray(res_w.status), np.asarray(res_c.status))
    np.testing.assert_allclose(np.asarray(res_w.u), np.asarray(res_c.u), atol=1e-10)
    np.testing.assert_array_equal(np.asarray(res_w.iters), np.asarray(res_c.iters))


def test_flat_execution_matches_nested():
    """The flattened round machine must make the same decisions as the nested
    SQP+watchdog formulation (same statuses, same solutions)."""
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * 100.0 * (x[0] - 1.0) ** 2 + 0.3 * x[0] * x[1]

    def term_1(x):
        return 0.5 * 100.0 * (x[1] - 1.0) ** 2 + 0.3 * x[0] * x[1]

    def sh(x, u, um):
        return jnp.array([x[0] + x[1] - 1.0])

    def sh_term(x):
        return jnp.array([x[0] + x[1] - 1.0])

    shared = [None] + [sh] * (N - 1) + [sh_term]
    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    bounds = {'ub': [ub, ub], 'lb': [lb, lb]}
    costs = [(stage, term_0), (stage, term_1)]

    solvers = {}
    for mode in ('flat', 'nested'):
        params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-6, d_tol=1e-6,
                             sqp_iters=50, nonmono_ls=True, beta=0.01, tau=0.5,
                             execution=mode)
        solvers[mode] = DGSQP(joint, costs, [None, None], shared, bounds, params,
                              print_method=None)

    rng = np.random.default_rng(3)
    B = 6
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solvers['flat'].n_c))
    ups = jnp.zeros((B, 2))
    res_f = solvers['flat']._solve_batch_jit(u0, l0, x0s, ups, None)
    res_n = solvers['nested']._solve_batch_jit(u0, l0, x0s, ups, None)
    assert np.array_equal(np.asarray(res_f.status), np.asarray(res_n.status)), \
        (np.asarray(res_f.status), np.asarray(res_n.status))
    np.testing.assert_array_equal(np.asarray(res_f.iters), np.asarray(res_n.iters))
    np.testing.assert_allclose(np.asarray(res_f.u), np.asarray(res_n.u), atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_f.qp_solves), np.asarray(res_n.qp_solves))


def test_flat_chunked_matches_flat_while():
    solver = _integrator_game(gamma=0.2, coupled_constraint=True)
    solver.params.nonmono_ls = True
    solver.params.execution = 'flat'
    rng = np.random.default_rng(5)
    B = 4
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solver.n_c))
    ups = jnp.zeros((B, 2))
    res_w = jax.jit(jax.vmap(solver._solve_core))(u0, l0, x0s, ups, None)
    res_c = solver.solve_batch_chunked(u0, l0, x0s, ups)
    assert np.array_equal(np.asarray(res_w.status), np.asarray(res_c.status))
    np.testing.assert_allclose(np.asarray(res_w.u), np.asarray(res_c.u), atol=0, rtol=0)


def test_flat_compaction_matches_uncompacted():
    """Batch compaction (harvest finished games, continue stragglers in a smaller
    batch) must not change any game's result."""
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * 100.0 * (x[0] - 1.0) ** 2 + 0.5 * jnp.tanh(x[0] - x[1])

    def term_1(x):
        return 0.5 * 100.0 * (x[1] - 1.0) ** 2 + 0.5 * jnp.tanh(x[1] - x[0])

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-8, d_tol=1e-8,
                         sqp_iters=50, nonmono_ls=True, beta=0.01, tau=0.5)
    solver = DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], None,
                   {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)
    solver._compact_min_bucket = 2

    rng = np.random.default_rng(11)
    B = 8
    x0s = jnp.asarray(rng.uniform(-2.0, 2.0, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solver.n_c))
    ups = jnp.zeros((B, 2))
    res_ref = jax.jit(jax.vmap(solver._solve_core))(u0, l0, x0s, ups, None)
    res_c = solver.solve_batch_chunked(u0, l0, x0s, ups, chunk_iters=1)
    assert np.array_equal(np.asarray(res_ref.status), np.asarray(res_c.status))
    np.testing.assert_allclose(np.asarray(res_ref.u), np.asarray(res_c.u),
                               atol=1e-12)
    batches = [h['batch'] for h in solver.last_chunk_history]
    assert batches[0] == B
    # compact=False (remote-tunnel configuration) keeps the fixed layout and gives
    # the identical answer
    res_nc = solver.solve_batch_chunked(u0, l0, x0s, ups, chunk_iters=1,
                                        compact=False)
    assert np.array_equal(np.asarray(res_ref.status), np.asarray(res_nc.status))
    np.testing.assert_allclose(np.asarray(res_ref.u), np.asarray(res_nc.u),
                               atol=1e-12)
    assert all(h['batch'] == B for h in solver.last_chunk_history)


def test_flat_compaction_spmd_matches_single_device():
    """Mesh-sharded batches compact too: the straggler bucket is re-sharded over the
    mesh (chunked.py) and every game's status/solution matches the single-device run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * 100.0 * (x[0] - 1.0) ** 2 + 0.5 * jnp.tanh(x[0] - x[1])

    def term_1(x):
        return 0.5 * 100.0 * (x[1] - 1.0) ** 2 + 0.5 * jnp.tanh(x[1] - x[0])

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-8, d_tol=1e-8,
                         sqp_iters=50, nonmono_ls=True, beta=0.01, tau=0.5)
    solver = DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], None,
                   {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)
    solver._compact_min_bucket = 2

    n_dev = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=('games',))
    sharding = NamedSharding(mesh, P('games'))

    rng = np.random.default_rng(11)
    B = 4 * n_dev
    # heterogeneous difficulty: most games start near the (1,1) target and finish in
    # the first chunk; a few start far away and straggle, forcing a compaction
    x0_easy = rng.uniform(0.9, 1.1, (B - 4, 2))
    x0_hard = rng.uniform(-30.0, -20.0, (4, 2))
    x0s = jnp.asarray(np.concatenate([x0_easy, x0_hard]))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solver.n_c))
    ups = jnp.zeros((B, 2))
    res_1dev = solver.solve_batch_chunked(u0, l0, x0s, ups, chunk_iters=1)
    hist_1dev = solver.last_chunk_history

    args_sh = [jax.device_put(a, sharding) for a in (u0, l0, x0s, ups)]
    res_spmd = solver.solve_batch_chunked(*args_sh, chunk_iters=1)
    hist_spmd = solver.last_chunk_history

    assert np.array_equal(np.asarray(res_1dev.status), np.asarray(res_spmd.status))
    np.testing.assert_allclose(np.asarray(res_1dev.u), np.asarray(res_spmd.u),
                               atol=1e-10)
    assert hist_spmd[0]['batch'] == B == hist_1dev[0]['batch']


def test_stall_escape_terminates_plateaued_games():
    """stall_its ends games whose stationarity has plateaued (status 'stalled') long
    before the iteration budget, in both the nested and flat execution paths; games
    that converge normally are untouched."""
    from dgsqp_tpu.solvers.dgsqp import STALLED

    def build(execution, stall_its, infeasible):
        m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        joint = MultiAgentDynamicsModel(0.0, [m1, m2])

        def stage(x, u, um):
            return 0.5 * u[0] ** 2

        def term_0(x):
            return 0.5 * (x[0] - 1.0) ** 2 + 0.2 * jnp.tanh(x[0] * x[1])

        def term_1(x):
            return 0.5 * (x[1] - 1.0) ** 2 + 0.2 * jnp.tanh(x[0] * x[1])

        shared = None
        if infeasible:
            # x0+x1 <= 1 AND x0+x1 >= 1.5: no feasible point => p_feas plateaus and
            # the game can never converge — the stall signature of a GNE-less instance
            def sh(x, u, um):
                return jnp.array([x[0] + x[1] - 1.0, 1.5 - x[0] - x[1]])
            shared = [None] + [sh] * (N - 1) + [None]

        ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 50.0
        lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -50.0
        params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-8, d_tol=1e-8,
                             sqp_iters=200, nonmono_ls=True, beta=0.01, tau=0.5,
                             execution=execution, stall_its=stall_its)
        return DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], shared,
                     {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)

    # infeasible game => the KKT residuals plateau and the escape fires
    for execution in ('nested', 'flat'):
        solver = build(execution, stall_its=5, infeasible=True)
        res = jax.jit(solver._solve_core)(jnp.zeros(solver.n_dec),
                                          jnp.zeros(solver.n_c),
                                          jnp.asarray([0.0, 0.0]),
                                          jnp.zeros(solver.n_u), None)
        assert int(res.status) == STALLED, (execution, int(res.status))
        assert int(res.iters) < 60

    # a normally-converging game is unaffected by the escape
    solver = build('flat', stall_its=5, infeasible=False)
    res = jax.jit(solver._solve_core)(jnp.zeros(solver.n_dec), jnp.zeros(solver.n_c),
                                      jnp.asarray([0.0, 0.0]), jnp.zeros(solver.n_u),
                                      None)
    assert int(res.status) in (CONV_ABS, CONV_REL)


def test_qp_warm_start_reaches_same_equilibrium():
    """qp_warm_start=True (cross-round IPM warm start) must land on the same KKT point
    as cold starts — the QP solutions are identical to solver tolerance, only the IPM
    iteration counts differ."""
    results = {}
    for ws in (False, True):
        m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        joint = MultiAgentDynamicsModel(0.0, [m1, m2])

        def stage(x, u, um):
            return 0.5 * u[0] ** 2

        def term_0(x):
            return 0.5 * 100.0 * (x[0] - 1.0) ** 2 + 0.5 * jnp.tanh(x[0] - x[1])

        def term_1(x):
            return 0.5 * 100.0 * (x[1] - 1.0) ** 2 + 0.5 * jnp.tanh(x[1] - x[0])

        ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
        lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
        params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-8, d_tol=1e-8,
                             sqp_iters=50, nonmono_ls=True, beta=0.01, tau=0.5,
                             qp_warm_start=ws)
        solver = DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], None,
                       {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)
        assert solver._use_flat()
        res = jax.jit(solver._solve_core)(jnp.zeros(solver.n_dec),
                                          jnp.zeros(solver.n_c),
                                          jnp.asarray([-1.5, 0.8]),
                                          jnp.zeros(solver.n_u), None)
        assert int(res.status) in (CONV_ABS, CONV_REL), (ws, int(res.status))
        results[ws] = np.asarray(res.u)
    np.testing.assert_allclose(results[True], results[False], atol=1e-5)


def test_chunked_driver_compacts_spmd_batches():
    """run_chunked_compacted with mesh-sharded inputs: staggered finishers shrink the
    live bucket (in mesh-size multiples) and every game's payload is harvested back to
    its original slot."""
    from collections import namedtuple
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from dgsqp_tpu.solvers.chunked import run_chunked_compacted

    C = namedtuple('C', ['status', 'ticks', 'payload'])
    n_dev = min(8, jax.device_count())
    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=('games',))
    sharding = NamedSharding(mesh, P('games'))
    B = 4 * n_dev

    # game i finishes after ticks0[i] chunks; payload echoes x0 so reassembly is checkable
    ticks0 = np.array([1 + 3 * (i % 3) + (7 if i % 11 == 0 else 0) for i in range(B)])
    x0 = np.arange(B, dtype=np.float64)[:, None] * np.ones((1, 3))
    up = np.zeros((B, 2))

    def chunk_fn(c, x, u_p):
        running = c.status == 0     # finished games freeze (as the solver bodies do)
        ticks = jnp.where(running, c.ticks - 1, c.ticks)
        payload = jnp.where(running[:, None], c.payload + x[:, :1], c.payload)
        status = jnp.where(ticks <= 0, 1, 0).astype(jnp.int32)
        return C(status, ticks, payload)

    carry = C(status=jnp.zeros(B, jnp.int32), ticks=jnp.asarray(ticks0),
              payload=jnp.zeros((B, 1)))
    carry = jax.device_put(carry, sharding)
    x0_d = jax.device_put(jnp.asarray(x0), sharding)
    up_d = jax.device_put(jnp.asarray(up), sharding)

    final, history = run_chunked_compacted(
        carry, x0_d, up_d, chunk_fn, final_fn=lambda c, x, u_p: c,
        running_status=0, max_chunks=50, min_bucket=2)

    # every game ran exactly ticks0 chunks: payload = ticks0 * x0[:, 0]
    np.testing.assert_allclose(np.asarray(final.payload[:, 0]),
                               ticks0 * x0[:, 0], atol=0)
    assert (np.asarray(final.status) == 1).all()
    batches = [h['batch'] for h in history]
    assert batches[0] == B
    assert min(batches) < B                     # it really compacted
    assert all(b % n_dev == 0 for b in batches)  # mesh-divisible buckets


def test_chunked_driver_device_results_merge():
    """The single-device driver merges finalized results (gather + where, no large
    scatters) back into original batch order across staggered compactions."""
    from collections import namedtuple
    from dgsqp_tpu.solvers.chunked import run_chunked_compacted

    C = namedtuple('C', ['status', 'ticks', 'payload'])
    B = 32
    ticks0 = np.array([1 + 3 * (i % 3) + (7 if i % 11 == 0 else 0) for i in range(B)])
    x0 = np.arange(B, dtype=np.float64)[:, None] * np.ones((1, 3))
    up = np.zeros((B, 2))

    def chunk_fn(c, x, u_p):
        running = c.status == 0
        ticks = jnp.where(running, c.ticks - 1, c.ticks)
        payload = jnp.where(running[:, None], c.payload + x[:, :1], c.payload)
        status = jnp.where(ticks <= 0, 1, 0).astype(jnp.int32)
        return C(status, ticks, payload)

    def final_fn(c, x, u_p):
        # results are a REDUCED view of the carry (as the solver finalizers are)
        return dict(status=c.status, out=c.payload[:, 0] + u_p[:, 0])

    carry = C(status=jnp.zeros(B, jnp.int32), ticks=jnp.asarray(ticks0),
              payload=jnp.zeros((B, 1)))
    res, history = run_chunked_compacted(
        carry, jnp.asarray(x0), jnp.asarray(up), chunk_fn, final_fn=final_fn,
        running_status=0, max_chunks=50, min_bucket=2)

    np.testing.assert_allclose(np.asarray(res['out']), ticks0 * x0[:, 0], atol=0)
    assert (np.asarray(res['status']) == 1).all()
    batches = [h['batch'] for h in history]
    assert batches[0] == B and min(batches) < B


def test_retry_cascade_rescues_failures():
    """solve_with_retries must merge retry-solver successes into the primary result."""
    from dgsqp_tpu.harness.mc_study import solve_with_retries
    from dgsqp_tpu.solvers.dgsqp import CONV_ABS, CONV_REL, MAX_IT

    def build(iters):
        m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        joint = MultiAgentDynamicsModel(0.0, [m1, m2])

        def stage(x, u, um):
            return 0.5 * u[0] ** 2

        def term_0(x):
            return 0.5 * 100.0 * (x[0] - 1.0) ** 2 + 0.2 * x[0] * x[1]

        def term_1(x):
            return 0.5 * 100.0 * (x[1] - 1.0) ** 2 + 0.2 * x[0] * x[1]

        ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 50.0
        lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -50.0
        params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-9, d_tol=1e-9,
                             sqp_iters=iters, nonmono_ls=True, beta=0.01, tau=0.5)
        return DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], None,
                     {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)

    weak = build(1)      # one iteration: cannot reach 1e-9 tolerances
    strong = build(50)
    rng = np.random.default_rng(7)
    B = 4
    x0s = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, weak.n_c))
    ups = jnp.zeros((B, 2))

    res_weak = weak.solve_batch_chunked(u0, l0, x0s, ups)
    assert not np.isin(np.asarray(res_weak.status), (CONV_ABS,)).all()
    res = solve_with_retries(weak, [strong], u0, l0, x0s, ups)
    assert np.isin(np.asarray(res.status), (CONV_ABS,)).all(), np.asarray(res.status)


def test_newton_schulz_psd_projection():
    """Matmul-only PSD projection must agree with eigenvalue clipping to its accuracy."""
    from dgsqp_tpu.utils.math import nearest_pd, nearest_pd_ns
    rng = np.random.default_rng(0)
    for n in (10, 40):
        A = jnp.asarray(rng.normal(size=(n, n)))
        A = A + 2.0 * jnp.eye(n) - 1.0 * jnp.diag(jnp.arange(n) % 3 == 0)
        P_ref = nearest_pd(A)
        P_ns = nearest_pd_ns(A)
        s_ns = np.linalg.eigvalsh(np.asarray(P_ns))
        assert s_ns.min() > -1e-6, s_ns.min()
        scale = np.linalg.norm(np.asarray(P_ref))
        err = np.linalg.norm(np.asarray(P_ns - P_ref)) / scale
        assert err < 2e-2, err
        # equilibrated variant: a valid convexification (PSD), and near-exact on a
        # mixed-scale nearly-PSD Hessian where the plain iteration's safety shift
        # turns into an O(1) phantom regularizer (the MPCC-game failure mode)
        P_eq = nearest_pd_ns(A, equilibrate=True)
        s_eq = np.linalg.eigvalsh(np.asarray(P_eq))
        assert s_eq.min() > -1e-6, s_eq.min()
    d = jnp.asarray(np.concatenate([np.full(5, 1e3), np.ones(15)]))
    R = jnp.asarray(rng.normal(size=(20, 20)))
    A = jnp.diag(d) + 0.05 * jnp.sqrt(d[:, None] * d[None, :]) * (R + R.T)
    P_ref = nearest_pd(A)
    P_eq = nearest_pd_ns(A, iters=20, safety=1e-4, equilibrate=True)
    err_eq = np.linalg.norm(np.asarray(P_eq - P_ref)) / np.linalg.norm(np.asarray(P_ref))
    err_pl = np.linalg.norm(np.asarray(nearest_pd_ns(A) - P_ref)) \
        / np.linalg.norm(np.asarray(P_ref))
    assert err_eq < 1e-2, err_eq
    assert err_eq < err_pl, (err_eq, err_pl)


def test_traced_solve_records_conditioning():
    """solve_batch_traced with record_conds captures per-iteration cond(Q)/cond(G)
    (reference DGSQP_v2.py:262-264) alongside the IterationData-style quantities."""
    solver = _integrator_game(gamma=0.2)
    B, T = 3, 6
    u0 = jnp.zeros((B, solver.n_dec))
    l0 = jnp.zeros((B, solver.n_c))
    x0 = jnp.asarray(np.random.default_rng(1).normal(0, 0.3, (B, 2)))
    up = jnp.zeros((B, solver.n_u))
    res, trace = solver.solve_batch_traced(u0, l0, x0, up, num_iters=T,
                                           record_conds=True)
    assert trace['cond_Q'].shape == (B, T)
    assert trace['cond_G'].shape == (B, T)
    assert np.isfinite(np.asarray(trace['cond_Q'])).all()
    assert (np.asarray(trace['cond_Q']) >= 1.0 - 1e-9).all()
    assert (np.asarray(trace['stat'])[:, -1] <= np.asarray(trace['stat'])[:, 0]).all()


def test_perturbed_retry_recovers_failures():
    """solve_with_retries(perturb_sigmas=...): games the primary budget fails are
    re-solved from a perturbed warm start (+ recomputed duals) on a compacted
    sub-batch; wins merge in place, already-converged games stay byte-identical
    (reference analogue: resample-on-failure, monte_carlo_main.py:98-100)."""
    from dgsqp_tpu.harness.mc_study import solve_with_retries

    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    def stage(x, u, um):
        return 0.5 * u[0] ** 2

    def term_0(x):
        return 0.5 * 100.0 * (x[0] - 1.0) ** 2 + 0.5 * jnp.tanh(x[0] - x[1])

    def term_1(x):
        return 0.5 * 100.0 * (x[1] - 1.0) ** 2 + 0.5 * jnp.tanh(x[1] - x[0])

    ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
    lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
    # starve the iteration budget so some games exit max_it on the first pass
    params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-8, d_tol=1e-8,
                         sqp_iters=3, nonmono_ls=True, beta=0.01, tau=0.5)
    solver = DGSQP(joint, [(stage, term_0), (stage, term_1)], [None, None], None,
                   {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)
    solver._compact_min_bucket = 2

    rng = np.random.default_rng(3)
    B = 8
    x0s = jnp.asarray(rng.uniform(-3.0, 3.0, (B, 2)))
    u0 = jnp.zeros((B, 2 * N))
    l0 = jnp.zeros((B, solver.n_c))
    ups = jnp.zeros((B, 2))
    res0 = solver.solve_batch_chunked(u0, l0, x0s, ups, chunk_iters=1)
    st0 = np.asarray(res0.status)
    assert (st0 != 1).any(), 'primary pass must leave failures for this test'

    res = solve_with_retries(solver, (), u0, l0, x0s, ups,
                             perturb_sigmas=(0.3, 0.6), seed=5,
                             chunk_iters=1, res=res0)
    st = np.asarray(res.status)
    # monotone merge: no previously-converged game lost, its payload untouched
    conv0 = st0 == 1
    assert (st[conv0] == 1).all()
    np.testing.assert_array_equal(np.asarray(res.u)[conv0],
                                  np.asarray(res0.u)[conv0])
    assert (st == 1).sum() >= (st0 == 1).sum()

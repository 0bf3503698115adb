"""QP kernel tests: analytic solutions, KKT residuals, batching, dual correctness."""
import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.qp import solve_qp, solve_qp_batch


def _rand_qp(rng, n, m, active_frac=0.5):
    """Generate a QP with known solution via its KKT conditions."""
    M_ = rng.standard_normal((n, n))
    Q = M_ @ M_.T + n * np.eye(n)
    x_star = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    # choose an active set small enough that LICQ holds (unique duals)
    n_act = min(int(m * active_frac), n - 2)
    act = np.zeros(m, dtype=bool)
    act[rng.choice(m, size=n_act, replace=False)] = True
    lam_star = np.where(act, rng.random(m) + 0.1, 0.0)
    slack = np.where(act, 0.0, rng.random(m) + 0.1)
    b = A @ x_star + slack
    q = -(Q @ x_star + A.T @ lam_star)
    return Q, q, A, b, x_star, lam_star


def test_unconstrained():
    rng = np.random.default_rng(0)
    n = 8
    M_ = rng.standard_normal((n, n))
    Q = M_ @ M_.T + n * np.eye(n)
    q = rng.standard_normal(n)
    sol = solve_qp(jnp.asarray(Q), jnp.asarray(q), jnp.zeros((0, n)), jnp.zeros((0,)))
    np.testing.assert_allclose(np.asarray(sol.x), np.linalg.solve(Q, -q), atol=1e-8)


def test_simple_box():
    # min 1/2 x^2 - 2x s.t. x <= 1  -> x* = 1, lam* = -(x*-2) = 1
    Q = jnp.array([[1.0]])
    q = jnp.array([-2.0])
    A = jnp.array([[1.0]])
    b = jnp.array([1.0])
    sol = solve_qp(Q, q, A, b)
    assert bool(sol.ok)
    np.testing.assert_allclose(float(sol.x[0]), 1.0, atol=1e-7)
    np.testing.assert_allclose(float(sol.lam[0]), 1.0, atol=1e-6)


def test_random_qps_match_kkt_solution():
    rng = np.random.default_rng(1)
    for i in range(10):
        n, m = 20, 35
        Q, q, A, b, x_star, lam_star = _rand_qp(rng, n, m)
        sol = solve_qp(jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b))
        assert bool(sol.ok), f'instance {i} failed, res={float(sol.res)}'
        np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sol.lam), lam_star, atol=2e-4)


def test_batched():
    rng = np.random.default_rng(2)
    B, n, m = 16, 12, 20
    Qs, qs, As, bs, xs, lams = [], [], [], [], [], []
    for _ in range(B):
        Q, q, A, b, x_star, lam_star = _rand_qp(rng, n, m)
        Qs.append(Q); qs.append(q); As.append(A); bs.append(b); xs.append(x_star); lams.append(lam_star)
    sol = solve_qp_batch(jnp.asarray(np.stack(Qs)), jnp.asarray(np.stack(qs)),
                         jnp.asarray(np.stack(As)), jnp.asarray(np.stack(bs)))
    assert bool(jnp.all(sol.ok))
    np.testing.assert_allclose(np.asarray(sol.x), np.stack(xs), atol=2e-4)
    np.testing.assert_allclose(np.asarray(sol.lam), np.stack(lams), atol=2e-4)


def test_infeasible_start_negative_b():
    # x = 0 infeasible (b < 0): min 1/2 x'x s.t. -x <= -1 (i.e. x >= 1)
    Q = jnp.eye(2)
    q = jnp.zeros(2)
    A = -jnp.eye(2)
    b = -jnp.ones(2)
    sol = solve_qp(Q, q, A, b)
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.x), np.ones(2), atol=1e-7)
    np.testing.assert_allclose(np.asarray(sol.lam), np.ones(2), atol=1e-6)


def test_degenerate_redundant_rows():
    # duplicated constraints (rank-deficient A) still solve
    Q = jnp.eye(2)
    q = jnp.array([-1.0, -1.0])
    A = jnp.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    b = jnp.array([0.5, 0.5, 0.5])
    sol = solve_qp(Q, q, A, b)
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.x), [0.5, 0.5], atol=1e-6)
    # dual split across duplicated rows must still sum to the true multiplier
    np.testing.assert_allclose(float(sol.lam[0] + sol.lam[1]), 0.5, atol=1e-5)


def test_float32_convergence():
    rng = np.random.default_rng(3)
    Q, q, A, b, x_star, lam_star = _rand_qp(rng, 16, 24)
    sol = solve_qp(jnp.asarray(Q, jnp.float32), jnp.asarray(q, jnp.float32),
                   jnp.asarray(A, jnp.float32), jnp.asarray(b, jnp.float32), tol=1e-6)
    np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-3)


def test_elastic_qp_handles_infeasible():
    # x <= -1 and x >= 1 is infeasible; elastic mode returns a compromise
    from dgsqp_tpu.solvers.qp import solve_elastic_qp
    Q = jnp.eye(1)
    q = jnp.zeros(1)
    A = jnp.array([[1.0], [-1.0]])
    b = jnp.array([-1.0, -1.0])
    sol = solve_elastic_qp(Q, q, A, b, eta=10.0, rho=10.0)
    assert bool(sol.ok)
    assert np.isfinite(float(sol.x[0]))
    assert abs(float(sol.x[0])) < 1.5


def test_indefinite_qp_finds_kkt_point():
    """indefinite=True solves a nonconvex box QP to a first-order KKT point (the
    reference's IPOPT/CPLEX OptimalityTarget=2 role — stationary + feasible +
    complementary, not necessarily the global minimizer): for
    min 1/2(x1^2 - x2^2) + 0.3 x1 + 0.1 x2 on [-1,1]^2 the interior stationary point
    reached from the central cold start is x = (-0.3, 0.1)."""
    from dgsqp_tpu.solvers.qp import solve_qp
    Q = jnp.diag(jnp.asarray([1.0, -1.0]))
    q = jnp.asarray([0.3, 0.1])
    A = jnp.asarray([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    b = jnp.ones(4)
    sol = solve_qp(Q, q, A, b, tol=1e-10, indefinite=True)
    assert bool(sol.ok)
    # KKT certificate on the returned point
    r_d = Q @ sol.x + q + A.T @ sol.lam
    assert float(jnp.abs(r_d).max()) < 1e-6           # stationarity
    assert float((A @ sol.x - b).max()) < 1e-8         # feasibility
    assert float(jnp.abs(sol.lam * (A @ sol.x - b)).max()) < 1e-6  # complementarity
    np.testing.assert_allclose(np.asarray(sol.x), [-0.3, 0.1], atol=1e-6)


def test_dgsqp_conv_method_none_converges():
    """conv_method='none' (exact indefinite Hessian + nonconvex QP kernel) still solves
    the integrator game to the same equilibrium as the convexified default."""
    from dgsqp_tpu.dynamics import (IntegratorModel, DynamicsConfig,
                                    MultiAgentDynamicsModel)
    from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL
    from dgsqp_tpu.solvers.solver_types import DGSQPParams
    from dgsqp_tpu.types import VehicleState

    N, DT = 5, 0.1
    sols = {}
    for method in ('eigh', 'none'):
        m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
        joint = MultiAgentDynamicsModel(0.0, [m1, m2])
        stage = lambda x, u, um: 0.5 * u[0] ** 2
        term0 = lambda x: 50.0 * (x[0] - 1.0) ** 2 + 0.3 * jnp.tanh(x[0] * x[1])
        term1 = lambda x: 50.0 * (x[1] - 1.0) ** 2 + 0.3 * jnp.tanh(x[0] * x[1])
        ub = VehicleState(); ub.v.v_long = np.inf; ub.u.u_a = 5.0
        lb = VehicleState(); lb.v.v_long = -np.inf; lb.u.u_a = -5.0
        params = DGSQPParams(N=N, dt=DT, reg=1e-3, p_tol=1e-8, d_tol=1e-8,
                             sqp_iters=60, nonmono_ls=True, conv_method=method)
        solver = DGSQP(joint, [(stage, term0), (stage, term1)], [None, None], None,
                       {'ub': [ub, ub], 'lb': [lb, lb]}, params, print_method=None)
        res = jax.jit(solver._solve_core)(jnp.zeros(solver.n_dec),
                                          jnp.zeros(solver.n_c),
                                          jnp.asarray([0.0, 0.0]),
                                          jnp.zeros(solver.n_u), None)
        assert int(res.status) in (CONV_ABS, CONV_REL), (method, int(res.status))
        sols[method] = np.asarray(res.u)
    np.testing.assert_allclose(sols['none'], sols['eigh'], atol=1e-6)


def test_box_split_matches_dense_kernel():
    """solve_qp(box=...) folds single-nonzero rows into the normal matrix as a diagonal
    update; the result must match the dense kernel (same math, different assembly)."""
    rng = np.random.default_rng(7)
    n, m_gen, n_box = 20, 25, 12
    Q, q, A_gen, b_gen, x_star, _ = _rand_qp(rng, n, m_gen)
    # synthetic box rows: +-1 entries on random columns, anchored at the feasible
    # point x_star (slack 0 on half the rows -> tight, loose on the rest) so the
    # combined problem stays feasible even when a column draws both signs
    cols = rng.choice(n, size=n_box, replace=True)
    signs = rng.choice([-1.0, 1.0], size=n_box)
    A_box = np.zeros((n_box, n))
    A_box[np.arange(n_box), cols] = signs
    slack = np.where(rng.random(n_box) < 0.5, 0.0, rng.random(n_box) + 0.1)
    b_box = A_box @ x_star + slack
    A = np.vstack([A_box, A_gen])
    b = np.concatenate([b_box, b_gen])
    box = (tuple(range(n_box)), tuple(int(c) for c in cols))

    dense = solve_qp(jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b))
    split = solve_qp(jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b),
                     box=box)
    assert bool(dense.ok) and bool(split.ok)
    np.testing.assert_allclose(np.asarray(split.x), np.asarray(dense.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(split.lam), np.asarray(dense.lam), atol=1e-5)


def test_pair_split_matches_dense_kernel():
    """solve_qp(pairs=...) folds exact-negation row pairs into one GEMM row; the result
    must match the dense kernel (same math, different assembly)."""
    rng = np.random.default_rng(11)
    n, m_gen, n_pair = 18, 20, 7
    Q, q, A_gen, b_gen, x_star, _ = _rand_qp(rng, n, m_gen)
    # pair rows: A_m = -A_p exactly; bounds anchored at x_star (tight ub on some rows,
    # loose lb) so the combined problem is feasible with a mix of active/inactive rows
    A_p = rng.standard_normal((n_pair, n))
    ub_slack = np.where(rng.random(n_pair) < 0.5, 0.0, rng.random(n_pair) + 0.1)
    b_p = A_p @ x_star + ub_slack
    b_m = -(A_p @ x_star) + rng.random(n_pair) + 0.1
    A = np.vstack([A_gen, A_p, -A_p])
    b = np.concatenate([b_gen, b_p, b_m])
    pairs = (tuple(range(m_gen, m_gen + n_pair)),
             tuple(range(m_gen + n_pair, m_gen + 2 * n_pair)))

    dense = solve_qp(jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b))
    split = solve_qp(jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b),
                     pairs=pairs)
    assert bool(dense.ok) and bool(split.ok)
    np.testing.assert_allclose(np.asarray(split.x), np.asarray(dense.x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(split.lam), np.asarray(dense.lam), atol=1e-5)


def test_game_problem_input_box_structure():
    """input_box_structure rows are exactly the single-nonzero +-1 rows of the numeric
    G at the declared columns, and the split solver matches the dense one end-to-end."""
    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    from dgsqp_tpu.harness.bench_setup import build_bench_solver, build_bench_batch
    from dgsqp_tpu.solvers.dgsqp import DGSQP
    from dgsqp_tpu.solvers.solver_types import DGSQPParams

    sc = build_chicane_scenario(N=6, theta_deg=45.0)
    params = DGSQPParams(N=sc.N, dt=sc.dt, reg=1e-3, nonmono_ls=True, sqp_iters=25,
                         p_tol=1e-3, d_tol=1e-3, qp_box_split=True)
    solver = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                   sc.shared_constraints, sc.bounds, params, print_method=None)
    rows, cols = solver.problem.input_box_structure()
    assert len(rows) > 0
    rows_p, rows_m = solver.problem.state_pair_structure()
    assert len(rows_p) > 0

    u0, l0, x0, up = build_bench_batch(sc, solver, 2, seed=3)
    _, G, _ = jax.vmap(lambda u, l, x, p: solver._eval_lite(u, l, x, p, None))(
        u0, l0, x0, up)
    G0 = np.asarray(G[0])
    rows_a = np.asarray(rows)
    cols_a = np.asarray(cols)
    np.testing.assert_allclose(np.abs(G0[rows_a, cols_a]), 1.0, atol=1e-10)
    masked = G0[rows_a].copy()
    masked[np.arange(len(rows_a)), cols_a] = 0.0
    np.testing.assert_allclose(masked, 0.0, atol=1e-10)

    # the declared state pairs are exact negations in the numeric G, and disjoint
    # from the box rows
    np.testing.assert_allclose(G0[np.asarray(rows_p)], -G0[np.asarray(rows_m)],
                               atol=1e-10)
    assert np.max(np.abs(G0[np.asarray(rows_p)])) > 0.0
    assert not (set(rows_p) | set(rows_m)) & set(rows)

    # end-to-end: box-split solve matches the dense solve on this batch
    params_d = params.copy()
    params_d.qp_box_split = False
    solver_d = DGSQP(sc.joint_model, sc.costs, sc.agent_constraints,
                     sc.shared_constraints, sc.bounds, params_d, print_method=None)
    res_s = solver._solve_batch_jit(u0, l0, x0, up, None)
    res_d = solver_d._solve_batch_jit(u0, l0, x0, up, None)
    np.testing.assert_array_equal(np.asarray(res_s.status), np.asarray(res_d.status))
    np.testing.assert_allclose(np.asarray(res_s.u), np.asarray(res_d.u),
                               rtol=1e-6, atol=1e-7)


def test_gondzio_correctors_match_and_save_iterations():
    """correctors=k converges to the same KKT point, never in more iterations, and
    strictly fewer summed over a set of instances (the point of the feature)."""
    rng = np.random.default_rng(7)
    it0_sum = it2_sum = 0
    for i in range(8):
        n, m = 30, 90
        Q, q, A, b, x_star, lam_star = _rand_qp(rng, n, m)
        args = (jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b))
        s0 = solve_qp(*args)
        s2 = solve_qp(*args, correctors=2)
        assert bool(s2.ok), f'instance {i} failed, res={float(s2.res)}'
        np.testing.assert_allclose(np.asarray(s2.x), x_star, atol=2e-4)
        np.testing.assert_allclose(np.asarray(s2.lam), lam_star, atol=2e-4)
        # polish-free: the IPM point itself still certifies at its own tolerance
        s2_raw = solve_qp(*args, polish_iters=0, correctors=2)
        np.testing.assert_allclose(np.asarray(s2_raw.x), x_star, atol=1e-3)
        assert int(s2.iters) <= int(s0.iters)
        it0_sum += int(s0.iters)
        it2_sum += int(s2.iters)
    assert it2_sum < it0_sum, (it0_sum, it2_sum)


def test_gondzio_correctors_with_box_split_and_warm():
    """correctors compose with the structured-row fold and warm starts."""
    rng = np.random.default_rng(8)
    n, m = 12, 30
    Q, q, A, b, x_star, lam_star = _rand_qp(rng, n, m)
    # make rows 0..3 single-nonzero (input-box-like) without changing the solution
    box_rows = np.array([0, 1, 2, 3])
    box_cols = np.array([0, 1, 2, 1])
    A[box_rows] = 0.0
    A[box_rows, box_cols] = 1.0
    b[box_rows] = np.abs(x_star[box_cols]) + 1.0  # inactive, keeps x_star optimal
    lam_star[box_rows] = 0.0
    q = -(Q @ x_star + A.T @ lam_star)
    args = (jnp.asarray(Q), jnp.asarray(q), jnp.asarray(A), jnp.asarray(b))
    ref = solve_qp(*args)
    sol = solve_qp(*args, correctors=2,
                   box=(tuple(box_rows.tolist()), tuple(box_cols.tolist())))
    assert bool(sol.ok)
    np.testing.assert_allclose(np.asarray(sol.x), np.asarray(ref.x), atol=1e-6)
    warm_sol = solve_qp(*args, correctors=2, warm=(ref.lam, ref.t),
                        box=(tuple(box_rows.tolist()), tuple(box_cols.tolist())))
    assert bool(warm_sol.ok)
    np.testing.assert_allclose(np.asarray(warm_sol.x), np.asarray(ref.x), atol=1e-6)
    assert int(warm_sol.iters) <= int(sol.iters)

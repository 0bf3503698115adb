"""Game-problem assembly tests: condensed q/G/g/Q vs finite differences on a small game."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dgsqp_tpu.dynamics import IntegratorModel, DynamicsConfig, MultiAgentDynamicsModel
from dgsqp_tpu.solvers.game_problem import GameProblem
from dgsqp_tpu.types import VehicleState

N = 3
DT = 0.1


@pytest.fixture(scope='module')
def problem():
    m1 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    m2 = IntegratorModel(0.0, DynamicsConfig(dt=DT))
    joint = MultiAgentDynamicsModel(0.0, [m1, m2])

    # agent costs: effort + nonlinear coupling on terminal speeds
    def stage_0(x, u, um):
        return 0.5 * u[0] ** 2 + 0.1 * (u[0] - um[0]) ** 2

    def term_0(x):
        return -x[0] + 0.5 * jnp.tanh(x[0] - x[1])

    def stage_1(x, u, um):
        return 0.5 * u[0] ** 2 + 0.1 * (u[0] - um[0]) ** 2

    def term_1(x):
        return -x[1] + 0.5 * jnp.tanh(x[1] - x[0])

    # shared constraint: combined speed cap (nonlinear)
    def shared(x, u, um):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 25.0])

    def shared_term(x):
        return jnp.array([x[0] ** 2 + x[1] ** 2 - 25.0])

    ub = VehicleState(); ub.v.v_long = 10.0; ub.u.u_a = 2.0
    lb = VehicleState(); lb.v.v_long = -10.0; lb.u.u_a = -2.0
    bounds = {'ub': [ub, ub], 'lb': [lb, lb]}

    return GameProblem(joint,
                       costs=[(stage_0, term_0), (stage_1, term_1)],
                       agent_constraints=[None, None],
                       shared_constraints=([None] + [shared] * (N - 1) + [shared_term]),
                       bounds=bounds, N=N)


def _fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=float)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (float(f(xp)) - float(f(xm))) / (2 * eps)
    return g


def _fd_jac(f, x, eps=1e-6):
    x = np.asarray(x, dtype=float)
    y0 = np.asarray(f(x))
    J = np.zeros((y0.size, x.size))
    for i in range(x.size):
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        J[:, i] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
    return J


def test_layout_counts(problem):
    # k=0: no shared, box 2 per agent (ua ub+lb) -> 4; k=1,2: shared 1 + (2 + state 2)*2 = 9
    # terminal: shared 1 + state box 2 per agent = 5
    assert problem.n_c[0] == 4
    assert problem.n_c[1] == 9 and problem.n_c[2] == 9
    assert problem.n_c[N] == 5
    assert problem.n_c_total == 27
    assert problem.n_dec == N * 2


def test_rollout(problem):
    x0 = jnp.array([1.0, 2.0])
    u = jnp.arange(6.0) * 0.1  # agent-stacked
    x = np.asarray(problem.rollout(u, x0))
    # agent 1 rollout: v_{k+1} = v_k + dt*u_k with u = [0.0, 0.1, 0.2]
    np.testing.assert_allclose(x[:, 0], [1.0, 1.0, 1.01, 1.03], atol=1e-12)
    np.testing.assert_allclose(x[:, 1], [2.0, 2.03, 2.07, 2.12], atol=1e-12)


def test_q_matches_fd(problem):
    x0 = jnp.array([1.0, 2.0])
    up = jnp.array([0.05, -0.05])
    u = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, 6))
    q = np.asarray(problem.eval_q(u, x0, up))
    q_fd = np.concatenate([
        _fd_grad(lambda uu: problem.agent_cost(0, jnp.asarray(uu), x0, up), np.asarray(u))[:3],
        _fd_grad(lambda uu: problem.agent_cost(1, jnp.asarray(uu), x0, up), np.asarray(u))[3:],
    ])
    np.testing.assert_allclose(q, q_fd, atol=1e-6)


def test_G_matches_fd(problem):
    x0 = jnp.array([1.0, 2.0])
    up = jnp.array([0.05, -0.05])
    u = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, 6))
    _, G, g, _ = problem.evaluate(u, None, x0, up, hessian=False)
    G_fd = _fd_jac(lambda uu: problem.eval_constraints(jnp.asarray(uu), x0, up), np.asarray(u))
    np.testing.assert_allclose(np.asarray(G), G_fd, atol=1e-6)


@pytest.mark.slow
def test_Q_matches_fd_of_stationarity(problem):
    x0 = jnp.array([1.0, 2.0])
    up = jnp.array([0.05, -0.05])
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.uniform(-1, 1, 6))
    l = jnp.asarray(rng.uniform(0, 1, problem.n_c_total))
    Q, q, G, g, _ = problem.evaluate(u, l, x0, up, hessian=True)
    # stationarity value must equal q + G'l
    F = np.asarray(problem.stationarity(u, l, x0, up))
    np.testing.assert_allclose(F, np.asarray(q) + np.asarray(G).T @ np.asarray(l), atol=1e-10)
    Q_fd = _fd_jac(lambda uu: problem.stationarity(jnp.asarray(uu), l, x0, up), np.asarray(u))
    np.testing.assert_allclose(np.asarray(Q), Q_fd, atol=1e-5)


def test_constraint_order_box_rows(problem):
    """Box rows must appear in reference order and with reference signs."""
    x0 = jnp.array([1.0, 2.0])
    up = jnp.zeros(2)
    u = jnp.asarray([3.0, 0.0, 0.0, -3.0, 0.0, 0.0])  # agent1 u_0 = 3 > ub=2; agent2 u_0 = -3 < lb
    g = np.asarray(problem.eval_constraints(u, x0, up))
    # stage 0 layout: [a1_ub, a1_lb, a2_ub, a2_lb]
    assert np.isclose(g[0], 3.0 - 2.0)     # u - ub
    assert np.isclose(g[1], -2.0 - 3.0)    # lb - u
    assert np.isclose(g[2], -3.0 - 2.0)
    assert np.isclose(g[3], -2.0 + 3.0)


def test_dual_warm_start_nonnegative(problem):
    x0 = jnp.array([1.0, 2.0])
    up = jnp.zeros(2)
    u = jnp.zeros(6)
    l0 = np.asarray(problem.dual_warm_start(u, x0, up))
    assert l0.shape == (problem.n_c_total,)
    assert (l0 >= 0).all()


def test_evaluate_dp_matches_ad(problem):
    """evaluate_dp (stagewise-GEMM assembly) reproduces evaluate (whole-trajectory AD)
    exactly: Q, q, G, g on a game with shared nonlinear + box constraints, rate costs,
    and terminal couplings."""
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(0.0, 0.5, problem.n_dec))
    lam = jnp.asarray(rng.uniform(0.0, 1.0, problem.n_c_total))
    x0 = jnp.asarray([0.3, -0.2])
    up = jnp.asarray(rng.normal(0.0, 0.1, problem.n_u))

    Q1, q1, G1, g1, x1 = jax.jit(lambda *a: problem.evaluate(*a, hessian=True))(
        u, lam, x0, up, None)
    Q2, q2, G2, g2, x2 = jax.jit(lambda *a: problem.evaluate_dp(*a, hessian=True))(
        u, lam, x0, up, None)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G1), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Q2), np.asarray(Q1), atol=1e-9)


def test_evaluate_dp_matches_ad_chicane():
    """Same DP-vs-AD equality on the flagship chicane game (kinematic bicycles, shared
    collision constraint, agent rate constraints, competitive costs) at N=6."""
    from dgsqp_tpu.harness.scenarios import build_chicane_scenario
    sc = build_chicane_scenario(N=6, theta_deg=45.0)
    problem = GameProblem(sc.joint_model, sc.costs, sc.agent_constraints,
                          sc.shared_constraints, sc.bounds, sc.N)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(0.0, 0.2, problem.n_dec))
    lam = jnp.asarray(rng.uniform(0.0, 0.5, problem.n_c_total))
    x0 = jnp.asarray([0.5, 0.0, 2.0, 0.0, 0.5, 0.0, 1.5, 0.3, 2.2, 0.0, 1.5, 0.3])
    up = jnp.zeros(problem.n_u)

    Q1, q1, G1, g1, _ = jax.jit(lambda *a: problem.evaluate(*a, hessian=True))(
        u, lam, x0, up, None)
    Q2, q2, G2, g2, _ = jax.jit(lambda *a: problem.evaluate_dp(*a, hessian=True))(
        u, lam, x0, up, None)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-11)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(G2), np.asarray(G1), atol=1e-9)
    np.testing.assert_allclose(np.asarray(Q2), np.asarray(Q1), atol=1e-7)


def test_evaluate_dp_two_separate_jits(problem):
    """Regression: the first evaluate_dp call may happen INSIDE a jit trace (the chunked
    driver's round body); the cached selector plan must not capture tracers, or the
    second, separately-jitted call dies with UnexpectedTracerError."""
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.normal(0.0, 0.5, problem.n_dec))
    lam = jnp.asarray(rng.uniform(0.0, 1.0, problem.n_c_total))
    x0 = jnp.asarray([0.3, -0.2])
    up = jnp.zeros(problem.n_u)

    problem.__dict__.pop('_dp_sel', None)   # force the plan build inside the first trace
    r1 = jax.jit(lambda *a: problem.evaluate_dp(*a, hessian=True))(u, lam, x0, up, None)
    r2 = jax.jit(lambda uu: problem.evaluate_dp(uu, lam, x0, up, None, hessian=True))(u)
    np.testing.assert_allclose(np.asarray(r2[0]), np.asarray(r1[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r2[3]), np.asarray(r1[3]), atol=1e-12)

"""Riccati OCP-QP kernel vs the dense eq-QP on the same randomly generated problem."""
import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.solvers.ocp_qp import solve_ocp_qp, _lqr_solve
from dgsqp_tpu.solvers.qp import solve_eq_qp

N, NX, NV, MI = 6, 4, 2, 6


def _problem(seed=0, active=True):
    rng = np.random.default_rng(seed)
    A = 0.9 * np.stack([np.eye(NX) + 0.1 * rng.normal(size=(NX, NX)) for _ in range(N)])
    B = rng.normal(size=(N, NX, NV))
    g = 0.1 * rng.normal(size=(N, NX))
    Qx = np.stack([np.eye(NX) for _ in range(N + 1)])
    Rv = np.stack([0.5 * np.eye(NV) for _ in range(N)])
    S = 0.1 * rng.normal(size=(N, NV, NX))
    qx = rng.normal(size=(N + 1, NX))
    rv = 0.1 * rng.normal(size=(N, NV))
    # box-ish inequalities: generous input boxes (control authority) + state boxes from
    # stage 2 on, tight enough to activate if requested but reachable from x0
    state_lim = 0.6 if active else 50.0
    input_lim = 2.5 if active else 50.0
    D = np.zeros((N + 1, MI, NX))
    E = np.zeros((N + 1, MI, NV))
    b = np.ones((N + 1, MI))
    for k in range(N + 1):
        if k > 1:     # stages 0/1 can't generally reach a tight state box from x0
            D[k, 0, 0], b[k, 0] = 1.0, state_lim
            D[k, 1, 0], b[k, 1] = -1.0, state_lim
        if k < N:
            E[k, 2, 0], b[k, 2] = 1.0, input_lim
            E[k, 3, 0], b[k, 3] = -1.0, input_lim
            E[k, 4, 1], b[k, 4] = 1.0, input_lim
            E[k, 5, 1], b[k, 5] = -1.0, input_lim
    x0 = 0.8 * rng.normal(size=NX)
    return tuple(map(jnp.asarray, (A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0)))


def _dense_equivalent(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0):
    """Assemble the same QP densely: z = [x_0..x_N, v_0..v_{N-1}]."""
    n = (N + 1) * NX + N * NV
    xi = lambda k: slice(k * NX, (k + 1) * NX)
    vi = lambda k: slice((N + 1) * NX + k * NV, (N + 1) * NX + (k + 1) * NV)
    H = np.zeros((n, n))
    h = np.zeros(n)
    for k in range(N + 1):
        H[xi(k), xi(k)] += Qx[k]
        h[xi(k)] += qx[k]
    for k in range(N):
        H[vi(k), vi(k)] += Rv[k]
        H[vi(k), xi(k)] += S[k]
        H[xi(k), vi(k)] += np.asarray(S[k]).T
        h[vi(k)] += rv[k]
    Eq = np.zeros((NX + N * NX, n))
    d = np.zeros(NX + N * NX)
    Eq[:NX, xi(0)] = np.eye(NX)
    d[:NX] = x0
    for k in range(N):
        r = slice(NX + k * NX, NX + (k + 1) * NX)
        Eq[r, xi(k + 1)] = np.eye(NX)
        Eq[r, xi(k)] = -np.asarray(A[k])
        Eq[r, vi(k)] = -np.asarray(B[k])
        d[r] = g[k]
    rows = []
    rhs = []
    for k in range(N + 1):
        blk = np.zeros((MI, n))
        blk[:, xi(k)] = D[k]
        if k < N:
            blk[:, vi(k)] = E[k]
        rows.append(blk)
        rhs.append(np.asarray(b[k]))
    return (jnp.asarray(H), jnp.asarray(h), jnp.asarray(np.concatenate(rows)),
            jnp.asarray(np.concatenate(rhs)), jnp.asarray(Eq), jnp.asarray(d))


def test_lqr_solve_matches_kkt():
    """Unconstrained Riccati solve satisfies the equality-KKT conditions."""
    A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0 = _problem(seed=1)
    x, v = _lqr_solve(A, B, g, Qx, S, Rv, qx, rv, x0)
    # dynamics consistency
    for k in range(N):
        np.testing.assert_allclose(np.asarray(x[k + 1]),
                                   np.asarray(A[k] @ x[k] + B[k] @ v[k] + g[k]),
                                   atol=1e-9)
    # compare against the dense equality-constrained solve
    H, h, A_in, b_in, Eq, d = _dense_equivalent(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0)
    n = h.shape[0]
    KKT = jnp.block([[H, Eq.T], [Eq, jnp.zeros((Eq.shape[0], Eq.shape[0]))]])
    sol = jnp.linalg.solve(KKT, jnp.concatenate([-h, d]))
    z = np.asarray(sol[:n])
    x_d = z[:(N + 1) * NX].reshape(N + 1, NX)
    v_d = z[(N + 1) * NX:].reshape(N, NV)
    np.testing.assert_allclose(np.asarray(x), x_d, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v), v_d, atol=1e-7)


def test_ocp_qp_kkt_with_active_constraints():
    """Riccati IPM reaches a verified KKT point of an instance with ACTIVE constraints
    (checked against the densely assembled problem data — stationarity on the dynamics
    null space, primal feasibility, complementarity)."""
    A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0 = _problem(seed=2, active=True)
    sol = solve_ocp_qp(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0, tol=1e-10)
    assert bool(sol.ok), (float(sol.res), int(sol.iters))

    H, h, A_in, b_in, Eq, d = _dense_equivalent(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0)
    z = np.concatenate([np.asarray(sol.x).ravel(), np.asarray(sol.v).ravel()])
    lam = np.asarray(sol.lam).ravel()
    # primal feasibility
    assert np.abs(np.asarray(Eq) @ z - np.asarray(d)).max() < 1e-8
    gap = np.asarray(A_in) @ z - np.asarray(b_in)
    assert gap.max() < 1e-6
    # complementarity + dual feasibility
    assert (lam >= 0).all()
    assert np.abs(lam * gap).max() < 1e-5
    # stationarity on the null space of the dynamics constraints
    grad = np.asarray(H) @ z + np.asarray(h) + np.asarray(A_in).T @ lam
    Z = np.linalg.svd(np.asarray(Eq))[2].T[:, Eq.shape[0]:]
    assert np.linalg.norm(Z.T @ grad, ord=np.inf) < 1e-5
    # at least one inequality is genuinely active
    assert gap.max() > -1e-4


def test_ocp_qp_matches_dense_moderate():
    """On a moderately constrained instance both the Riccati and the dense eq-QP
    converge; their solutions agree."""
    A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0 = _problem(seed=5, active=False)
    # shrink boxes just enough to stay feasible but meaningful
    b = jnp.where(b >= 50.0, 8.0, b)
    sol = solve_ocp_qp(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0, tol=1e-10)
    assert bool(sol.ok)
    H, h, A_in, b_in, Eq, d = _dense_equivalent(A, B, g, Qx, S, Rv, qx, rv, D, E, b, x0)
    dense = solve_eq_qp(H, h, A_in, b_in, Eq, d, tol=1e-10)
    assert bool(dense.ok)
    n = h.shape[0]
    x_d = np.asarray(dense.x[:(N + 1) * NX]).reshape(N + 1, NX)
    v_d = np.asarray(dense.x[(N + 1) * NX:n]).reshape(N, NV)
    np.testing.assert_allclose(np.asarray(sol.x), x_d, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sol.v), v_d, atol=1e-5)


def test_ocp_qp_batched_vmap():
    probs = [_problem(seed=s) for s in (3, 4)]
    batched = tuple(jnp.stack([p[i] for p in probs]) for i in range(12))
    sols = jax.vmap(lambda *a: solve_ocp_qp(*a, tol=1e-9))(*batched)
    assert bool(np.asarray(sols.ok).all())
    for i, p in enumerate(probs):
        single = solve_ocp_qp(*p, tol=1e-9)
        np.testing.assert_allclose(np.asarray(sols.v[i]), np.asarray(single.v),
                                   atol=1e-6)

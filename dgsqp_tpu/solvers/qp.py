"""Batched dense inequality-constrained QP solver (primal-dual interior point).

TPU-native replacement for the reference's CPU QP backends (OSQP/qpOASES/CPLEX/qrqp invoked
through ``ca.conic`` — ``/root/reference/DGSQP/solvers/DGSQP.py:182-266``).  Solves

    min_x  1/2 x'Qx + q'x   s.t.  A x <= b

returning both the primal solution and the inequality duals ``lam >= 0`` (the algorithm
consumes the duals: step direction, merit function, complementarity all depend on them —
matching OSQP's ``lam_a`` sign convention with ``uba = b``).

Method: Mehrotra predictor-corrector with a reduced normal-equations Newton system
``(Q + A' diag(lam/t) A) dx = rhs`` factorized by Cholesky.  Everything is fixed-shape and
jit/vmap friendly: a ``lax.while_loop`` with per-instance convergence masking runs until every
batched instance converges or the iteration cap is hit.  Under ``vmap`` the linear algebra
becomes batched matmuls/Cholesky on the MXU — the unit of throughput is the game batch.

The problem sizes here (n ~ 100 primal, m ~ 300-600 duals for 2-4 agent games) are far below
MXU tile sizes individually; all parallelism comes from batching, which is exactly how the
framework runs Monte-Carlo sweeps.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dgsqp_tpu.ops.linalg_pallas import cho_solve as _pallas_cho_solve
from dgsqp_tpu.ops.linalg_pallas import cholesky as _pallas_cholesky


class QPSolution(NamedTuple):
    x: jnp.ndarray        # (n,) primal
    lam: jnp.ndarray      # (m,) inequality duals >= 0
    t: jnp.ndarray        # (m,) slacks > 0
    ok: jnp.ndarray       # () bool — converged to tolerance
    iters: jnp.ndarray    # () int
    res: jnp.ndarray      # () float — final max KKT residual


class _IPMState(NamedTuple):
    x: jnp.ndarray
    lam: jnp.ndarray
    t: jnp.ndarray
    it: jnp.ndarray
    done: jnp.ndarray
    res: jnp.ndarray


def _step_length(z, dz, frac=0.99):
    """Largest alpha in (0, 1] with z + alpha*dz >= (1-frac)*... standard fraction-to-boundary."""
    neg = dz < 0
    ratios = jnp.where(neg, -z / jnp.where(neg, dz, -1.0), jnp.inf)
    return jnp.minimum(1.0, frac * jnp.min(ratios))


def _ruiz_equilibrate(Q, A, E=None, iters: int = 3):
    """Ruiz equilibration of the KKT block matrix [[Q, A', E'], [A, 0, 0], [E, 0, 0]].

    Returns diagonal scalings ``(d_x, e_a)`` (plus ``e_e`` when an equality block ``E``
    is given) with the scaled data ``Qs = Dx Q Dx``, ``As = Ea A Dx``, ``Es = Ee E Dx``
    having ~unit row/col inf-norms — the same conditioning treatment OSQP applies
    before its ADMM (critical for float32 on TPU).
    """
    n = Q.shape[-1]
    blocks = [A] + ([E] if E is not None else [])
    e_rs = [jnp.ones(Bk.shape[-2], Q.dtype) for Bk in blocks]
    d_x = jnp.ones(n, Q.dtype)
    for _ in range(iters):
        Qs = Q * d_x[:, None] * d_x[None, :]
        col_norm = jnp.max(jnp.abs(Qs), axis=0)
        for Bk, e_r in zip(blocks, e_rs):
            if Bk.shape[-2]:
                col_norm = jnp.maximum(
                    col_norm, jnp.max(jnp.abs(Bk * e_r[:, None] * d_x[None, :]), axis=0))
        d_x = d_x / jnp.sqrt(jnp.maximum(col_norm, 1e-8))
        for i, (Bk, e_r) in enumerate(zip(blocks, e_rs)):
            if Bk.shape[-2]:
                rn = jnp.max(jnp.abs(Bk * e_r[:, None] * d_x[None, :]), axis=1)
                # all-zero rows get NO scaling — the 1e-8 guard would otherwise compound
                # to e_r ~ 1e12 over the sweeps, inflating the scaled rhs and wrecking
                # the IPM's relative stopping test.
                e_rs[i] = e_r / jnp.where(rn == 0, 1.0, jnp.sqrt(jnp.maximum(rn, 1e-8)))
    # OSQP-style safety clamp on the cumulative scalings
    out = [jnp.clip(d_x, 1e-6, 1e6)] + [jnp.clip(e, 1e-6, 1e6) for e in e_rs]
    return tuple(out)


@partial(jax.jit, static_argnames=('max_iters', 'scale', 'polish_iters', 'indefinite',
                                   'box', 'pairs', 'correctors'))
def solve_qp(Q, q, A, b, tol: float = 1e-8, max_iters: int = 50,
             scale: bool = True, polish_iters: int = 4, warm=None,
             indefinite: bool = False, box=None, pairs=None,
             correctors: int = 0) -> QPSolution:
    """Solve one QP instance.  ``vmap`` over leading axes of (Q, q, A, b) for batches.

    ``Q`` must be symmetric positive definite (the SQP layer guarantees this via
    ``regularized_convexification`` — the reference's ``_nearestPD`` + reg*I treatment,
    ``DGSQP.py:232-239``).  With ``scale=True`` the problem is Ruiz-equilibrated first and
    the solution/duals unscaled on return.

    ``warm``: optional ``(lam0, t0)`` pair — e.g. the previous SQP iteration's QP duals
    and slacks.  They are shifted toward the central path (Gondzio-style
    ``max(., delta)``) so warm starts stay strictly interior; SQP subproblems change
    slowly between iterations, so this typically saves half the IPM iterations.

    ``indefinite=True`` accepts a (symmetric) indefinite ``Q`` — the reference's
    IPOPT/CPLEX ``OptimalityTarget=2`` nonconvex-QP path (``DGSQP.py:204-228``): the
    Newton systems use a Levenberg-shifted LU factorization instead of Cholesky and the
    iteration converges to a KKT point (not necessarily a global minimizer); the
    active-set polish is skipped (its Schur machinery needs ``Q`` PD on the active
    nullspace).

    ``box``: optional static ``(rows, cols)`` int tuples marking rows of ``A`` that are
    structurally single-nonzero (e.g. input-box constraints — 200 of the chicane's 525
    rows; ``GameProblem.input_box_structure``).  Such rows contribute ``d_i A[r,c]^2``
    to the diagonal of the IPM normal matrix, so the per-iteration ``(A' D A)`` GEMM —
    ~85% of the IPM's FLOPs — runs on the general rows only, with the box rows folded
    in by a scatter-add.  Mathematically identical to ``box=None``.

    ``pairs``: optional static ``(rows_plus, rows_minus)`` int tuples marking row pairs
    with ``A[rows_minus[i]] == c_i * A[rows_plus[i]]`` for some scalar ``c_i`` (exact
    negations ``c_i = -1`` before scaling — e.g. state upper/lower bound rows, which are
    ``±Du_x``; ``GameProblem.state_pair_structure``).  Each pair contributes
    ``(d_p + c_i^2 d_m) a a'`` to the normal matrix, so only one GEMM row per pair is
    needed; ``c_i^2`` is recovered from row norms, which keeps the fold exact under the
    Ruiz row scaling.  Mathematically identical to ``pairs=None``.

    ``correctors``: number of Gondzio centrality correctors per iteration (0 = plain
    Mehrotra).  Each reuses the iteration's factorization, so its cost is one
    back-substitution + matvecs, while the longer steps cut total iterations — i.e.
    whole normal-matrix GEMMs and Cholesky factorizations.  Same fixed point: the
    converged solution is unchanged, only the path to it shortens.
    """
    n = q.shape[-1]
    m = b.shape[-1]
    dtype = q.dtype

    if m == 0:
        # Unconstrained: single Newton solve.
        L = jnp.linalg.cholesky(Q)
        x = -jax.scipy.linalg.cho_solve((L, True), q)
        return QPSolution(x, jnp.zeros((0,), dtype), jnp.zeros((0,), dtype),
                          jnp.asarray(True), jnp.asarray(0), jnp.asarray(0.0, dtype))

    # Degenerate (near-)zero rows — AD of padded/inactive constraints produces rows at
    # rounding-noise norm (~1e-13).  Such a row is vacuous over any realistic step, but Ruiz
    # equilibration magnifies it to a unit-norm garbage constraint (and with b == 0 the IPM's
    # d = lam/t becomes indeterminate as both -> 0).  Zero the row and lift b to unit scale:
    # the feasible set and the duals (lam_i = 0) are unchanged.  Rows with b < 0 are left
    # alone — they encode genuine infeasibility and must be allowed to fail.
    row_norm = jnp.max(jnp.abs(A), axis=1)
    eps_row = (1e-10 if dtype == jnp.float64 else 1e-5) * jnp.maximum(1.0, jnp.max(row_norm))
    degen = (row_norm <= eps_row) & (b >= 0)
    A = jnp.where(degen[:, None], 0.0, A)
    b = jnp.where(degen, jnp.maximum(b, 1.0), b)

    if scale:
        d_x, e_r = _ruiz_equilibrate(Q, A)[:2]
        Qs = Q * d_x[:, None] * d_x[None, :]
        As = A * e_r[:, None] * d_x[None, :]
        qs = q * d_x
        bs = b * e_r
        warm_s = None if warm is None else (warm[0] / e_r, warm[1] * e_r)
        inner = solve_qp(Qs, qs, As, bs, tol, max_iters, scale=False,
                         polish_iters=polish_iters, warm=warm_s,
                         indefinite=indefinite, box=box, pairs=pairs,
                         correctors=correctors)
        x = inner.x * d_x
        lam = inner.lam * e_r
        # re-certify on the ORIGINAL data (the scaled residual is not the true one)
        r_d = Q @ x + q + A.T @ lam
        r_p = jnp.maximum(A @ x - b, 0.0)
        comp = jnp.abs(lam * (A @ x - b))
        res = jnp.maximum(jnp.max(jnp.abs(r_d)),
                          jnp.maximum(jnp.max(r_p), jnp.max(comp)))
        sc = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)), jnp.max(jnp.abs(b)))
        ok = (res < 1e4 * tol * sc) & jnp.isfinite(res)
        # slacks consistent with the RETURNED (possibly polished) x, not the IPM
        # iterate — warm-start consumers need a coherent (lam, t) pair
        t_out = jnp.maximum(b - A @ x, 1e-14 if dtype == jnp.float64 else 1e-7)
        return QPSolution(x, lam, t_out, ok, inner.iters, res)

    eps_floor = 1e-14 if dtype == jnp.float64 else 1e-7
    d_cap = 1e14 if dtype == jnp.float64 else 1e7

    if box is not None or pairs is not None:
        # Split structured rows out of the normal-equation GEMM.  Box rows (single
        # nonzero A[r,c]) add d_r * A[r,c]^2 to K[c,c]; pair rows (A[m] = c*A[p])
        # collapse to one GEMM row with weight d_p + c^2 d_m, where c^2 is taken from
        # row norms so the fold stays exact under Ruiz row scaling.  The rows are
        # PERMUTED once here into [general, pair+, pair-, box] order and the whole IPM
        # (and polish) runs in permuted space — every per-iteration selection is then a
        # static slice, and the box diagonal update is a one-hot matmul + diag add:
        # no gathers or matrix scatters inside the hot loop.  Duals/slacks are
        # unpermuted on return.
        _box_rows = np.asarray(box[0] if box else (), dtype=int)
        _box_cols = np.asarray(box[1] if box else (), dtype=int)
        _p_rows = np.asarray(pairs[0] if pairs else (), dtype=int)
        _m_rows = np.asarray(pairs[1] if pairs else (), dtype=int)
        _gen_rows = np.setdiff1d(
            np.arange(m), np.concatenate([_box_rows, _p_rows, _m_rows]))
        _perm = np.concatenate([_gen_rows, _p_rows, _m_rows, _box_rows])
        _inv = np.argsort(_perm)
        ng, npair, nbox = len(_gen_rows), len(_p_rows), len(_box_rows)
        A = A[_perm]
        b = b[_perm]
        if warm is not None:
            warm = (warm[0][_perm], warm[1][_perm])
        A_e = A[:ng + npair]
        _box_v2 = A[ng + 2 * npair:][np.arange(nbox), _box_cols] ** 2
        _pair_c2 = (jnp.sum(A[ng + npair:ng + 2 * npair] ** 2, axis=-1)
                    / jnp.maximum(jnp.sum(A[ng:ng + npair] ** 2, axis=-1), 1e-30))
        _S_onehot = np.zeros((n, nbox), dtype=np.float64)
        _S_onehot[_box_cols, np.arange(nbox)] = 1.0
        _S_onehot = jnp.asarray(_S_onehot, dtype)

        def _normal_matrix(d):
            w = jnp.concatenate(
                [d[:ng], d[ng:ng + npair] + _pair_c2 * d[ng + npair:ng + 2 * npair]])
            K = Q + (A_e.T * w) @ A_e
            if nbox:
                K = K + jnp.diag(_S_onehot @ (d[ng + 2 * npair:] * _box_v2))
            return K

        def _unperm(v):
            return v[_inv]
    else:
        def _normal_matrix(d):
            return Q + (A.T * d) @ A

        def _unperm(v):
            return v

    def residuals(x, lam, t):
        r_d = Q @ x + q + A.T @ lam
        r_p = A @ x + t - b
        mu = jnp.dot(t, lam) / m
        return r_d, r_p, mu

    def body(st: _IPMState) -> _IPMState:
        x, lam, t = st.x, st.lam, st.t
        r_d, r_p, mu = residuals(x, lam, t)

        d = jnp.clip(lam / jnp.maximum(t, eps_floor), 0.0, d_cap)
        K = _normal_matrix(d)
        if indefinite:
            # indefinite Q: Levenberg-shifted LU instead of Cholesky — converges to a
            # KKT point of the nonconvex QP (reference CPLEX OptimalityTarget=2 role)
            K = K + 1e-8 * (1.0 + jnp.max(jnp.abs(K))) * jnp.eye(n, dtype=dtype)
            lu_and_piv = jax.scipy.linalg.lu_factor(K)

            def ksolve(rhs):
                return jax.scipy.linalg.lu_solve(lu_and_piv, rhs)
        else:
            # Levenberg guard keeps the factorization alive in ill-conditioned corners.
            K = K + 1e-12 * jnp.trace(K) / n * jnp.eye(n, dtype=dtype)
            # batch-dispatched to the lanes-batched Pallas kernels under vmap on TPU
            L = _pallas_cholesky(K)

            def ksolve(rhs):
                return _pallas_cho_solve(L, rhs)

        def newton(r_c):
            # (Q + A'DA) dx = -r_d - A' (d * r_p - r_c / t)
            rhs = -r_d - A.T @ (d * r_p - r_c / t)
            dx = ksolve(rhs)
            dlam = d * (A @ dx + r_p) - r_c / t
            dt = -(r_c + t * dlam) / lam
            return dx, dlam, dt

        # predictor (affine scaling)
        r_c_aff = t * lam
        dx_a, dlam_a, dt_a = newton(r_c_aff)
        a_p = _step_length(t, dt_a)
        a_d = _step_length(lam, dlam_a)
        mu_aff = jnp.dot(t + a_p * dt_a, lam + a_d * dlam_a) / m
        sigma = (mu_aff / (mu + 1e-300)) ** 3

        # corrector
        r_c = t * lam + dt_a * dlam_a - sigma * mu * jnp.ones(m, dtype)
        dx, dlam, dt = newton(r_c)
        alpha = jnp.minimum(_step_length(t, dt), _step_length(lam, dlam))

        # Gondzio multiple centrality correctors: reuse the SAME factorization (one
        # back-substitution + matvecs each) to push the trial point's pairwise products
        # t_i*lam_i into the central-path box [0.1, 10]*sigma*mu, which typically
        # lengthens the step.  Every IPM iteration saved skips a normal-matrix GEMM and
        # a Cholesky; a corrector costs neither.  A candidate is accepted only if it
        # lengthens the step materially; rejected lanes keep the Mehrotra direction.
        mu_t = sigma * mu
        for _k in range(correctors):
            a_try = jnp.minimum(alpha + 0.1, 1.0)
            v = (t + a_try * dt) * (lam + a_try * dlam)
            r_c_g = r_c + (v - jnp.clip(v, 0.1 * mu_t, 10.0 * mu_t))
            dx_c, dlam_c, dt_c = newton(r_c_g)
            a_c = jnp.minimum(_step_length(t, dt_c), _step_length(lam, dlam_c))
            accept = a_c > alpha + 0.01
            dx = jnp.where(accept, dx_c, dx)
            dlam = jnp.where(accept, dlam_c, dlam)
            dt = jnp.where(accept, dt_c, dt)
            r_c = jnp.where(accept, r_c_g, r_c)
            alpha = jnp.where(accept, a_c, alpha)

        x_n = x + alpha * dx
        lam_n = jnp.maximum(lam + alpha * dlam, eps_floor)
        t_n = jnp.maximum(t + alpha * dt, eps_floor)

        r_d_n, r_p_n, mu_n = residuals(x_n, lam_n, t_n)
        scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)), jnp.max(jnp.abs(b)))
        res = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(r_d_n)), jnp.max(jnp.abs(r_p_n))), mu_n)
        done = (res < tol * scale) | ~jnp.isfinite(res)
        # freeze iterates on non-finite steps (treat as failed, keep last good values)
        bad = ~jnp.isfinite(jnp.max(jnp.abs(x_n)) + jnp.max(jnp.abs(lam_n)))
        x_n = jnp.where(bad, x, x_n)
        lam_n = jnp.where(bad, lam, lam_n)
        t_n = jnp.where(bad, t, t_n)
        return _IPMState(x_n, lam_n, t_n, st.it + 1, done | bad, res)

    def cond(st: _IPMState):
        return (~st.done) & (st.it < max_iters)

    x0 = jnp.zeros(n, dtype)
    if warm is not None:
        # central-path shift keeps the warm point strictly interior
        delta_w = jnp.asarray(0.1, dtype)
        lam0 = jnp.maximum(warm[0], delta_w)
        t0 = jnp.maximum(warm[1], delta_w)
    else:
        # infeasible-but-interior start: slacks/duals at unit scale relative to b
        t0 = jnp.maximum(1.0, jnp.abs(b))
        lam0 = jnp.ones(m, dtype)
    st0 = _IPMState(x0, lam0, t0, jnp.asarray(0), jnp.asarray(False), jnp.asarray(jnp.inf, dtype))
    st = jax.lax.while_loop(cond, body, st0)

    if indefinite or polish_iters == 0:
        # no active-set polish (its Schur machinery needs Q PD); certify the IPM point
        r_d, r_p, mu = residuals(st.x, st.lam, st.t)
        res = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(r_d)), jnp.max(jnp.abs(r_p))), mu)
        sc = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)), jnp.max(jnp.abs(b)))
        ok = (res < 1e4 * tol * sc) & jnp.isfinite(res)
        t_out = jnp.maximum(b - A @ st.x, eps_floor)
        return QPSolution(st.x, _unperm(st.lam), _unperm(t_out), ok, st.it, res)

    # ---- polish: exact solves on candidate active sets (OSQP-style).
    # Recovers high-accuracy primal AND dual without driving the IPM to tiny mu; the SQP
    # layer consumes the duals directly, so their quality matters.  In reduced precision the
    # IPM can break down before lam/t separate cleanly, so two candidate identifications are
    # tried (dual-dominance lam > t, and small-slack t < sqrt(mu)-scale) and the best
    # certified solution wins.
    neg_tol = 1e-9 if dtype == jnp.float64 else 1e-4 * (1.0 + jnp.max(jnp.abs(st.lam)))

    def certify(x_p, lam_p):
        r_d_p = Q @ x_p + q + A.T @ lam_p
        r_p_p = jnp.maximum(A @ x_p - b, 0.0)
        comp_p = jnp.abs(lam_p * (A @ x_p - b))
        res_p = jnp.maximum(jnp.max(jnp.abs(r_d_p)),
                            jnp.maximum(jnp.max(r_p_p), jnp.max(comp_p)))
        ok_p = jnp.isfinite(res_p) & (jnp.min(lam_p) > -neg_tol)
        return jnp.where(ok_p, res_p, jnp.inf)

    r_d, r_p, mu = residuals(st.x, st.lam, st.t)
    res0 = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(r_d)), jnp.max(jnp.abs(r_p))), mu)

    # Primal-dual active-set (PDAS) refinement: the IPM's identification (lam > t) can be
    # off by several rows when reduced precision stops it early.  PDAS fixed-point updates
    # act <- {i : lam_i + c*(A x - b)_i > 0} converge in a handful of KKT solves and repair
    # the identification; the best certified candidate wins.
    #
    # Cost control: only the top-K most-active rows (by lam - t) can ever be active (under
    # LICQ at most n rows are), so the polish KKT is built on that K-row subset — the QR
    # factors an (n+K) system instead of (n+m).
    # Candidate score: dual dominance (lam - t) OR primal violation at the IPM point — if the
    # IPM broke down early its (lam, t) are unreliable, but violated rows MUST be candidates
    # or the polish can never restore feasibility on them.
    # Active sets at these game QPs are small (measured p50 ~ 10, max ~ 30 rows of 525 on
    # the chicane suite), so the candidate pool can be far below n; a missed row only makes
    # the polish candidate fail certification, falling back to the IPM iterate.
    K = int(min(m, max(48, n // 2 + 14)))
    score = jnp.maximum(st.lam - st.t, A @ st.x - b)
    _, cand = jax.lax.top_k(score, K)
    A_k = A[cand]
    b_k = b[cand]
    # Mosaic memref slices must be 8-aligned on the sublane dim: pad the candidate
    # block to the next multiple of 8 with always-inactive rows (0'x <= 1, scattered
    # to the out-of-range sentinel index m and dropped) — the PDAS mask keeps them
    # inactive (A_k x - b_k = -1 < 0) so the arithmetic is unchanged (first hit: the
    # approximate-game QP, K = 89)
    pad = -(-K // 8) * 8 - K
    act0 = (st.lam[cand] > st.t[cand]).astype(dtype)
    if pad:
        A_k = jnp.concatenate([A_k, jnp.zeros((pad, A_k.shape[1]), dtype)], axis=0)
        b_k = jnp.concatenate([b_k, jnp.ones((pad,), dtype)], axis=0)
        cand = jnp.concatenate([cand, jnp.full((pad,), m, cand.dtype)])
        act0 = jnp.concatenate([act0, jnp.zeros((pad,), dtype)])
        K = K + pad

    # ---- Schur-complement PDAS machinery.  The expensive pieces are hoisted OUT of the
    # PDAS loop: chol(Q) and Y = Q^-1 A_k' are active-set independent, so each iteration
    # only re-masks the K x K Schur complement S = A_k Y and refactors THAT (a 64x64
    # Cholesky on the lanes-batched Pallas kernel) — versus the old scheme's QR of the
    # full (n+K)^2 KKT per iteration (~23 ms vs ~1 ms per iteration at batch 256).
    # In f32 the Schur solve alone leaves kappa(Q)*eps ~ 1e-2 dual noise; two rounds of
    # iterative refinement through the FULL KKT residual contract it to certification
    # accuracy, and the certify-best guard falls back to the IPM iterate if not.
    # Mirrors OSQP's polish=True that the reference enables (DGSQP.py:186).
    Lq = _pallas_cholesky(Q)
    Y = _pallas_cho_solve(Lq, A_k.T)                    # (n, K)
    S_full = A_k @ Y                                    # (K, K)
    xq = _pallas_cho_solve(Lq, -q)
    r0 = A_k @ xq
    delta = 1e-12 if dtype == jnp.float64 else 1e-7
    eyeK = jnp.eye(K, dtype=dtype)

    def pdas_step(_, carry):
        act_k, best_x, best_lam, best_res = carry
        a = act_k
        Sm = a[:, None] * a[None, :] * S_full + (1.0 - a) * eyeK \
            + delta * a * eyeK
        Ls = _pallas_cholesky(Sm)
        lam_k = _pallas_cho_solve(Ls, a * (r0 - b_k))
        x_c = xq - Y @ (a * lam_k)
        # full-KKT iterative refinement (cheap: triangular solves + matvecs).
        # Defects: e1 = -(Q x + q + A'(a lam)), e2 = -(A x - b) on active rows;
        # block elimination gives Sm dlam = a*(A w - e2) with w = Q^-1 e1.
        for _r in range(2):
            e1 = -q - Q @ x_c - A_k.T @ (a * lam_k)
            w = _pallas_cho_solve(Lq, e1)
            rhs = a * (A_k @ w + A_k @ x_c - b_k)
            dlam = _pallas_cho_solve(Ls, rhs)
            x_c = x_c + w - Y @ (a * dlam)
            lam_k = lam_k + dlam
        lam_c = jnp.zeros(m, dtype).at[cand].set(a * lam_k, mode='drop')
        res_c = certify(x_c, lam_c)
        better = res_c < best_res
        best_x = jnp.where(better, x_c, best_x)
        best_lam = jnp.where(better, jnp.maximum(lam_c, 0.0), best_lam)
        best_res = jnp.where(better, res_c, best_res)
        viol_k = A_k @ x_c - b_k
        act_k = (a * lam_k + viol_k > 0).astype(dtype)
        return act_k, best_x, best_lam, best_res

    _, x, lam, res = jax.lax.fori_loop(
        0, polish_iters, pdas_step, (act0, st.x, st.lam, res0))

    scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)), jnp.max(jnp.abs(b)))
    ok = (res < 1e4 * tol * scale) & jnp.isfinite(res)
    t_out = jnp.maximum(b - A @ x, eps_floor)
    return QPSolution(x, _unperm(lam), _unperm(t_out), ok, st.it, res)


def solve_qp_batch(Q, q, A, b, tol: float = 1e-8, max_iters: int = 50) -> QPSolution:
    """Batched entry point: leading batch axis on every argument."""
    return jax.vmap(lambda Qi, qi, Ai, bi: solve_qp(Qi, qi, Ai, bi, tol, max_iters))(Q, q, A, b)


class EqQPSolution(NamedTuple):
    x: jnp.ndarray
    lam: jnp.ndarray      # inequality duals >= 0
    nu: jnp.ndarray       # equality duals
    ok: jnp.ndarray
    iters: jnp.ndarray
    res: jnp.ndarray


@partial(jax.jit, static_argnames=('max_iters', 'scale'))
def solve_eq_qp(Q, q, A, b, E, d, tol: float = 1e-8, max_iters: int = 50,
                scale: bool = True) -> EqQPSolution:
    """Solve  min 1/2 x'Qx + q'x  s.t.  Ex = d,  Ax <= b.

    Same Mehrotra IPM as :func:`solve_qp` with the equality block handled by a Schur
    complement on the reduced normal matrix (two Cholesky factorizations per iteration).
    Used by the LTV-MPC subproblems whose linearized dynamics are equality constraints
    (reference ``CA_LTV_MPC.py:554-634`` solves the same structure through OSQP/HPIPM).
    With ``scale=True`` the data is Ruiz-equilibrated first (column scaling from the
    [Q; A; E] stack, separate row scalings for A and E) and the solution/duals are
    unscaled on return — the float32 conditioning treatment the inequality kernel gets.
    """
    n = q.shape[-1]
    m = b.shape[-1]
    me = d.shape[-1]
    dtype = q.dtype

    if scale:
        d_x, e_a, e_e = _ruiz_equilibrate(Q, A, E)
        inner = solve_eq_qp(Q * d_x[:, None] * d_x[None, :], q * d_x,
                            A * e_a[:, None] * d_x[None, :], b * e_a,
                            E * e_e[:, None] * d_x[None, :], d * e_e,
                            tol, max_iters, scale=False)
        x = inner.x * d_x
        lam = inner.lam * e_a
        nu = inner.nu * e_e
        # re-certify on the ORIGINAL data
        r_d = Q @ x + q + A.T @ lam + E.T @ nu
        r_p = jnp.maximum(A @ x - b, 0.0) if m else jnp.zeros(0, dtype)
        r_e = E @ x - d
        comp = jnp.abs(lam * (A @ x - b)) if m else jnp.zeros(0, dtype)
        res = jnp.maximum(jnp.max(jnp.abs(r_d)),
                          jnp.maximum(jnp.max(r_p, initial=0.0),
                                      jnp.maximum(jnp.max(jnp.abs(r_e), initial=0.0),
                                                  jnp.max(comp, initial=0.0))))
        sc = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)),
                               jnp.maximum(jnp.max(jnp.abs(b), initial=0.0),
                                           jnp.max(jnp.abs(d), initial=0.0)))
        ok = (res < 1e4 * tol * sc) & jnp.isfinite(res)
        return EqQPSolution(x, lam, nu, ok, inner.iters, res)

    def residuals(x, lam, nu, t):
        r_d = Q @ x + q + A.T @ lam + E.T @ nu
        r_p = A @ x + t - b
        r_e = E @ x - d
        mu = jnp.dot(t, lam) / max(m, 1)
        return r_d, r_p, r_e, mu

    class S(NamedTuple):
        x: jnp.ndarray
        lam: jnp.ndarray
        nu: jnp.ndarray
        t: jnp.ndarray
        it: jnp.ndarray
        done: jnp.ndarray
        res: jnp.ndarray

    def body(st: S) -> S:
        x, lam, nu, t = st.x, st.lam, st.nu, st.t
        r_d, r_p, r_e, mu = residuals(x, lam, nu, t)

        dd = lam / t
        K = Q + (A.T * dd) @ A
        K = K + 1e-12 * jnp.trace(K) / n * jnp.eye(n, dtype=dtype)
        L = jnp.linalg.cholesky(K)

        Kinv_Et = jax.scipy.linalg.cho_solve((L, True), E.T)
        Schur = E @ Kinv_Et + 1e-12 * jnp.eye(me, dtype=dtype)
        Ls = jnp.linalg.cholesky(Schur)

        def newton(r_c):
            r1 = -r_d - A.T @ (dd * r_p - r_c / t)
            w = jax.scipy.linalg.cho_solve((L, True), r1)
            rhs_nu = E @ w + r_e
            dnu = jax.scipy.linalg.cho_solve((Ls, True), rhs_nu)
            dx = w - Kinv_Et @ dnu
            dlam = dd * (A @ dx + r_p) - r_c / t
            dt = -(r_c + t * dlam) / lam
            return dx, dlam, dnu, dt

        r_c_aff = t * lam
        dx_a, dlam_a, dnu_a, dt_a = newton(r_c_aff)
        a_p = _step_length(t, dt_a)
        a_d = _step_length(lam, dlam_a)
        mu_aff = jnp.dot(t + a_p * dt_a, lam + a_d * dlam_a) / max(m, 1)
        sigma = (mu_aff / (mu + 1e-300)) ** 3

        r_c = t * lam + dt_a * dlam_a - sigma * mu * jnp.ones(m, dtype)
        dx, dlam, dnu, dt = newton(r_c)
        alpha = jnp.minimum(_step_length(t, dt), _step_length(lam, dlam))

        x_n = x + alpha * dx
        lam_n = lam + alpha * dlam
        nu_n = nu + alpha * dnu
        t_n = t + alpha * dt

        r_d2, r_p2, r_e2, mu2 = residuals(x_n, lam_n, nu_n, t_n)
        scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)),
                                  jnp.maximum(jnp.max(jnp.abs(b), initial=0.0),
                                              jnp.max(jnp.abs(d), initial=0.0)))
        res = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(r_d2)),
                                      jnp.max(jnp.abs(r_p2), initial=0.0)),
                          jnp.maximum(jnp.max(jnp.abs(r_e2), initial=0.0), mu2))
        done = (res < tol * scale) | ~jnp.isfinite(res)
        bad = ~jnp.isfinite(jnp.max(jnp.abs(x_n)) + jnp.max(jnp.abs(lam_n), initial=0.0))
        x_n = jnp.where(bad, x, x_n)
        lam_n = jnp.where(bad, lam, lam_n)
        nu_n = jnp.where(bad, nu, nu_n)
        t_n = jnp.where(bad, t, t_n)
        return S(x_n, lam_n, nu_n, t_n, st.it + 1, done | bad, res)

    def cond(st: S):
        return (~st.done) & (st.it < max_iters)

    st0 = S(jnp.zeros(n, dtype), jnp.ones(m, dtype), jnp.zeros(me, dtype),
            jnp.maximum(1.0, jnp.abs(b)), jnp.asarray(0), jnp.asarray(False),
            jnp.asarray(jnp.inf, dtype))
    st = jax.lax.while_loop(cond, body, st0)

    r_d, r_p, r_e, mu = residuals(st.x, st.lam, st.nu, st.t)
    scale = 1.0 + jnp.maximum(jnp.max(jnp.abs(q)),
                              jnp.maximum(jnp.max(jnp.abs(b), initial=0.0),
                                          jnp.max(jnp.abs(d), initial=0.0)))
    res = jnp.maximum(jnp.maximum(jnp.max(jnp.abs(r_d)),
                                  jnp.max(jnp.abs(r_p), initial=0.0)),
                      jnp.maximum(jnp.max(jnp.abs(r_e), initial=0.0), mu))
    ok = (res < 1e4 * tol * scale) & jnp.isfinite(res)
    return EqQPSolution(st.x, st.lam, st.nu, ok, st.it, res)


def solve_elastic_qp(Q, q, A, b, eta: float = 1e3, rho: float = 1e3,
                     tol: float = 1e-8, max_iters: int = 50) -> QPSolution:
    """Elastic-mode QP: always-feasible relaxation with slack penalties.

        min 1/2 x'Qx + q'x + eta*1's + rho/2 s's   s.t.  Ax - s <= b,  s >= 0

    Parity item for the reference's elastic-mode machinery, which builds exactly these
    augmented (Qem, qem, Gem, gem) matrices plus a second conic solver but never wires
    them into the solve loop (``DGSQP_v2.py:195-197,1169-1191``).  Matching that, no
    solver here calls it from the hot path either (a batched ``lax.cond`` retry would
    execute for the whole vmap batch); it is exposed for host-side retry cascades and
    offline triage of ``qp_fail`` games.  Duals returned are those of the original rows.
    """
    n = q.shape[-1]
    m = b.shape[-1]
    dtype = q.dtype
    Z = jnp.zeros((n, m), dtype)
    Qem = jnp.block([[Q, Z], [Z.T, rho * jnp.eye(m, dtype=dtype)]])
    qem = jnp.concatenate([q, eta * jnp.ones(m, dtype)])
    Aem = jnp.block([[A, -jnp.eye(m, dtype=dtype)],
                     [jnp.zeros((m, n), dtype), -jnp.eye(m, dtype=dtype)]])
    bem = jnp.concatenate([b, jnp.zeros(m, dtype)])
    sol = solve_qp(Qem, qem, Aem, bem, tol=tol, max_iters=max_iters)
    return QPSolution(sol.x[:n], sol.lam[:m], sol.t[:m], sol.ok, sol.iters, sol.res)

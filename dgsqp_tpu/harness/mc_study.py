"""Monte-Carlo study runner: the batched, sharded equivalent of the reference harness.

The reference runs MC studies as sequential Python loops dispatched by shell scripts, one
solve at a time, pickling one result per sample
(``scripts/comparison_study_barc/monte_carlo_main.py:8-124``, ``run_kinematic_study.sh``).
Here one call samples all initial conditions, warm-starts them in a single vmap, and solves
the whole batch in lockstep on however many devices are visible — the throughput axis the
framework is built around.  ``analyze_results`` reproduces ``analyze_data.py:36-105``'s
statistics (success rate, solve-time stats over converged samples, iteration counts).
"""
from __future__ import annotations

import json
import pickle
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from dgsqp_tpu.harness.samplers import (sample_agents_initial_conditions,
                                        sample_duel_initial_conditions,
                                        sample_merge_initial_conditions)
from dgsqp_tpu.parallel.mesh import games_mesh, pad_to_multiple, sharded_batch_solve
from dgsqp_tpu.solvers.dgsqp import DGSQP, CONV_ABS, CONV_REL, STATUS_MSG
from dgsqp_tpu.solvers.dgsqp_v2 import DGSQPV2
from dgsqp_tpu.solvers.solver_types import DGSQPParams, DGSQPV2Params


@dataclass
class MCResults:
    scenario: str
    solver: str
    num_samples: int
    statuses: np.ndarray
    iters: np.ndarray
    qp_solves: np.ndarray
    p_feas: np.ndarray
    comp: np.ndarray
    stat: np.ndarray
    u_sol: np.ndarray
    x0: np.ndarray
    wall_time_s: float
    compile_time_s: float
    # self-describing run metadata (platform, dtype, solver params + hash, git rev,
    # seed) — an artifact must prove what produced it, not rely on directory naming
    provenance: Optional[dict] = None


def run_provenance(solver, seed=None, extra: Optional[dict] = None) -> dict:
    """Metadata stamped into every ``MCResults``: platform/dtype/params/git rev."""
    import hashlib
    params = getattr(solver, 'params', None)
    try:
        pdict = {k: (v if isinstance(v, (int, float, str, bool, type(None)))
                     else str(v)) for k, v in asdict(params).items()}
    except Exception:
        pdict = {}
    phash = hashlib.sha256(json.dumps(pdict, sort_keys=True).encode()).hexdigest()[:12]
    try:
        import subprocess
        rev = subprocess.run(['git', 'rev-parse', '--short', 'HEAD'],
                             capture_output=True, text=True,
                             cwd=Path(__file__).resolve().parent).stdout.strip() or None
    except Exception:
        rev = None
    prov = dict(platform=jax.devices()[0].platform,
                dtype=np.dtype(getattr(solver, 'dtype', np.float32)).name,
                x64=bool(jax.config.jax_enable_x64),
                solver_class=type(solver).__name__,
                params=pdict, params_hash=phash, git_rev=rev, seed=seed,
                jax_version=jax.__version__)
    if extra:
        prov.update(extra)
    return prov


def _sample(scenario, num_samples, seed):
    if scenario.name.startswith('merge'):
        return sample_merge_initial_conditions(scenario, num_samples, seed=seed)
    if scenario.name.startswith('agents'):
        return sample_agents_initial_conditions(scenario, num_samples, seed=seed)
    if scenario.name.startswith('dynamic_approx'):
        from dgsqp_tpu.harness.dynamic_study import sample_dynamic_pa_initial_conditions
        return sample_dynamic_pa_initial_conditions(scenario, num_samples, seed=seed)
    if scenario.name.startswith('dynamic'):
        from dgsqp_tpu.harness.dynamic_study import sample_dynamic_duel_initial_conditions
        return sample_dynamic_duel_initial_conditions(scenario, num_samples, seed=seed)
    return sample_duel_initial_conditions(scenario, num_samples, seed=seed)


def _u_perturb_scale(problem, dtype):
    """Per-flat-dim perturbation scale: half the input box width (1.0 where free)."""
    parts = []
    for a in range(problem.M):
        s = 0.5 * (np.asarray(problem.input_ub[a], np.float64)
                   - np.asarray(problem.input_lb[a], np.float64))
        s = np.where(np.isfinite(s), s, 1.0)
        parts.append(np.tile(s, problem.N))
    return jnp.asarray(np.concatenate(parts), dtype)


def solve_with_retries(solver, retry_solvers, u0, l0, x0, up,
                       perturb_sigmas=(), seed: int = 0, chunk_iters=None,
                       res=None):
    """Batched solve with a retry cascade over alternative configurations and/or
    perturbed warm-start restarts.

    Games the primary configuration fails (any status but conv_abs) are re-solved by
    each retry solver in turn — the batched analogue of the reference's practice of
    sweeping solver configurations over the same samples and reporting the best
    (``DGSQP_monte_carlo_ablation.py:166-199``); converged retries are merged into the
    result in place.  ``perturb_sigmas`` additionally re-solves the remaining failures
    with the SAME solver from a perturbed warm start (``u0 + sigma * box_scale *
    N(0,1)`` + recomputed dual warm start) — the batched analogue of the reference's
    resample-on-failure (``comparison_study_barc/monte_carlo_main.py:98-100``) and of
    PATH's perturbed proximal restarts.  Retries run on compacted power-of-two
    sub-batches, so their cost scales with the failure count, not the original batch.
    ``res`` (optional): an already-computed primary result to retry from.
    """
    import jax as _jax
    kw = {} if chunk_iters is None else dict(chunk_iters=chunk_iters)
    if res is None:
        res = solver.solve_batch_chunked(u0, l0, x0, up, **kw)
    specs = [(rslv, None) for rslv in retry_solvers or ()]
    specs += [(solver, float(s)) for s in perturb_sigmas]
    if not specs:
        return res
    try:
        dev = list(u0.devices())[0]
    except Exception:
        dev = None
    st = np.array(np.asarray(res.status))
    out = {f: np.array(np.asarray(getattr(res, f))) for f in res._fields}
    rng = np.random.default_rng(seed)
    scale = None
    for rslv, sigma in specs:
        fail = np.where(st != CONV_ABS)[0]
        if fail.size == 0:
            break
        n_pad = max(16, 1 << (fail.size - 1).bit_length())
        pad = np.concatenate([fail, np.repeat(fail[:1], n_pad - fail.size)])

        def sub(a):
            s = jnp.asarray(np.asarray(a)[pad])
            return _jax.device_put(s, dev) if dev is not None else s

        u0_s, l0_s, x0_s, up_s = sub(u0), sub(l0), sub(x0), sub(up)
        if sigma is not None:
            if scale is None:
                scale = _u_perturb_scale(rslv.problem, rslv.dtype)
            noise = jnp.asarray(
                rng.standard_normal((n_pad, int(scale.shape[0]))), rslv.dtype)
            u0_s = u0_s + sigma * scale * noise
            if dev is not None:
                u0_s = _jax.device_put(u0_s, dev)
            if not hasattr(rslv, '_retry_dws_jit'):
                def _dws(u, x, p):
                    Pv = rslv._approx_update(u, x) \
                        if getattr(rslv, '_approx_update', None) is not None else None
                    return rslv.problem.dual_warm_start(u, x, p, P=Pv)
                rslv._retry_dws_jit = _jax.jit(_jax.vmap(_dws))
            l0_s = rslv._retry_dws_jit(u0_s, x0_s, up_s)

        r2 = rslv.solve_batch_chunked(u0_s, l0_s, x0_s, up_s, **kw)
        st2 = np.asarray(r2.status)[:fail.size]
        win = np.where(st2 == CONV_ABS)[0]
        if win.size:
            for f in res._fields:
                out[f][fail[win]] = np.asarray(getattr(r2, f))[:fail.size][win]
            st[fail[win]] = CONV_ABS
    return type(res)(**{f: jnp.asarray(v) for f, v in out.items()})


def run_mc_study(scenario, solver_params=None, num_samples: int = 200, seed: int = 0,
                 solver_cls=DGSQP, n_devices: Optional[int] = None,
                 solver=None, ibr_ws: bool = False,
                 dgsqp_ws_iters: int = 0) -> MCResults:
    """Run one Monte-Carlo configuration end to end, batched over all samples.

    ``ibr_ws=True`` refines the PID warm start with one batched IBR (Gauss-Seidel
    best-response) sweep before the main solve — the reference comp study's
    ``ibr_ws`` path (``DGSQP_comp_monte_carlo.py:451-468``, ``ibr_iters=1``).

    ``dgsqp_ws_iters=K`` (oracle runs only) warm-starts the solver from a K-iteration
    DGSQP prefix (primal AND duals) — the "DGSQP-style dual warm start" configuration
    for the PATH-role MCP baseline.  The oracle still certifies convergence with its
    own KKT residuals from there; only the starting point is shared, as in the
    reference study where every solver departs from the identical PID+IBR warm start.
    """
    if solver is None:
        if solver_params is None:
            solver_params = DGSQPParams(N=scenario.N, dt=scenario.dt, reg=1e-3,
                                        nonmono_ls=True, line_search_iters=50,
                                        sqp_iters=50, p_tol=1e-3, d_tol=1e-3,
                                        beta=0.01, tau=0.5)
        solver = solver_cls(scenario.joint_model, scenario.costs,
                            scenario.agent_constraints, scenario.shared_constraints,
                            scenario.bounds, solver_params, print_method=None)
    dtype = solver.dtype

    x0, u_ws, _, _ = _sample(scenario, num_samples, seed)
    u0 = np.asarray(jax.vmap(solver.problem.stage_to_u)(jnp.asarray(u_ws, dtype)))
    up = np.zeros((num_samples, scenario.joint_model.n_u), dtype=np.asarray(u0).dtype)
    from dgsqp_tpu.harness.warm_start import seed_virtual_rate_prev
    up = np.asarray(seed_virtual_rate_prev(up, jnp.asarray(u_ws, dtype)[:, 0, :],
                                           scenario.joint_model))
    if ibr_ws:
        from dgsqp_tpu.solvers.ibr import IBR
        from dgsqp_tpu.solvers.solver_types import IBRParams
        ibr = IBR(scenario.joint_model, scenario.costs, scenario.agent_constraints,
                  scenario.shared_constraints, scenario.bounds,
                  IBRParams(N=scenario.N, dt=scenario.dt, ibr_iters=1,
                            p_tol=1e-3, d_tol=1e-3), print_method=None)
        u0 = np.asarray(jax.jit(jax.vmap(
            lambda u, x, p: ibr._solve_core(u, x, p, None).u))(
            jnp.asarray(u0), jnp.asarray(x0, dtype), jnp.asarray(up)))
    def _dws(u, x, p):
        # approximate-game solvers need their parameter pytree (contouring/boundary
        # linearizations) built from the warm start before any constraint evaluate
        Pv = solver._approx_update(u, x) \
            if getattr(solver, '_approx_update', None) is not None else None
        return solver.problem.dual_warm_start(u, x, p, P=Pv)
    l0 = np.asarray(jax.jit(jax.vmap(_dws))(
        jnp.asarray(u0), jnp.asarray(x0, dtype), jnp.asarray(up)))
    if dgsqp_ws_iters > 0 and not isinstance(solver, DGSQP):
        pre_params = DGSQPParams(N=scenario.N, dt=scenario.dt, reg=1e-3,
                                 nonmono_ls=True, line_search_iters=50,
                                 sqp_iters=int(dgsqp_ws_iters),
                                 p_tol=1e-3, d_tol=1e-3, beta=0.01, tau=0.5)
        pre = DGSQP(scenario.joint_model, scenario.costs, scenario.agent_constraints,
                    scenario.shared_constraints, scenario.bounds, pre_params,
                    print_method=None)
        pre_res = pre.solve_batch_chunked(jnp.asarray(u0, pre.dtype),
                                          jnp.asarray(l0, pre.dtype),
                                          jnp.asarray(x0, pre.dtype),
                                          jnp.asarray(up, pre.dtype))
        u0 = np.asarray(pre_res.u, dtype=np.asarray(u0).dtype)
        l0 = np.maximum(np.asarray(pre_res.l, dtype=np.asarray(l0).dtype), 0.0)

    mesh = games_mesh(n_devices)
    n_dev = mesh.devices.size
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P('games'))
    args = []
    for a in (u0, l0, x0.astype(np.asarray(u0).dtype), up):
        padded, orig = pad_to_multiple(np.asarray(a), n_dev)
        args.append(jax.device_put(jnp.asarray(padded), sharding))

    # chunked execution: short device programs (watchdog-safe), SPMD over the games axis.
    # Solvers without a chunked path (e.g. the MCP baseline) fall back to one whole-solve
    # program per batch.
    if hasattr(solver, 'solve_batch_chunked'):
        batch_solve = lambda: solver.solve_batch_chunked(*args)
    else:
        batch_solve = lambda: solver._solve_batch_jit(*args, None)
    t0 = time.time()
    res = batch_solve()
    jax.block_until_ready(res)
    first = time.time() - t0

    t0 = time.time()
    res = batch_solve()
    jax.block_until_ready(res)
    solve_time = time.time() - t0

    B = num_samples
    return MCResults(scenario=scenario.name, solver=type(solver).__name__,
                     num_samples=B,
                     statuses=np.asarray(res.status)[:B],
                     iters=np.asarray(res.iters)[:B],
                     qp_solves=np.asarray(getattr(res, 'qp_solves', res.iters))[:B],
                     p_feas=np.asarray(res.p_feas)[:B],
                     comp=np.asarray(res.comp)[:B],
                     stat=np.asarray(res.stat)[:B],
                     u_sol=np.asarray(res.u)[:B],
                     x0=np.asarray(x0),
                     wall_time_s=solve_time,
                     compile_time_s=first - solve_time,
                     provenance=run_provenance(
                         solver, seed=seed,
                         extra=dict(ibr_ws=bool(ibr_ws),
                                    dgsqp_ws_iters=int(dgsqp_ws_iters))))


def run_mc_study_algames(scenario, params=None, num_samples: int = 200,
                         seed: int = 0) -> MCResults:
    """Batched ALGAMES Monte-Carlo run on the same samples as the DGSQP studies
    (reference runs both solvers per trial, ``DGSQP_ALGAMES_monte_carlo_chicane.py:479-506``).
    """
    from dgsqp_tpu.harness.scenarios import joint_constraints_for_algames
    from dgsqp_tpu.solvers.algames import ALGAMES
    from dgsqp_tpu.solvers.solver_types import ALGAMESParams

    if params is None:
        params = ALGAMESParams(N=scenario.N, dt=scenario.dt, outer_iters=50,
                               newton_iters=50, line_search_iters=50,
                               ineq_tol=1e-3, eq_tol=1e-3, opt_tol=1e-3, rho=1.0,
                               gamma=10.0, beta=0.01, tau=0.5, q_reg=1e-3, u_reg=1e-3)
    solver = ALGAMES(scenario.joint_model, scenario.costs,
                     joint_constraints_for_algames(scenario), scenario.bounds,
                     params, print_method=None)
    dtype = solver.dtype

    x0, u_ws, _, _ = _sample(scenario, num_samples, seed)
    x0 = jnp.asarray(x0, dtype)
    u_ws = jnp.asarray(u_ws, dtype)
    # state warm start: roll the warm-start inputs through the joint dynamics
    def rollout(u_seq, x):
        def step(q, u_k):
            q_n = scenario.joint_model.fd(q, u_k)
            return q_n, q_n
        _, qs = jax.lax.scan(step, x, u_seq)
        return jnp.concatenate([x[None], qs], axis=0)

    q_ws = jax.jit(jax.vmap(rollout))(u_ws, x0)
    up = jnp.zeros((num_samples, scenario.joint_model.n_u), dtype)

    t0 = time.time()
    res = solver.solve_batch_chunked(q_ws, u_ws, x0, up)
    jax.block_until_ready(res)
    first = time.time() - t0
    t0 = time.time()
    res = solver.solve_batch_chunked(q_ws, u_ws, x0, up)
    jax.block_until_ready(res)
    solve_time = time.time() - t0

    B = num_samples
    flat_u = np.asarray(res.u).reshape(B, -1)
    return MCResults(scenario=scenario.name, solver='ALGAMES', num_samples=B,
                     statuses=np.asarray(res.status), iters=np.asarray(res.iters),
                     qp_solves=np.asarray(res.newton_solves),
                     p_feas=np.asarray(res.p_feas), comp=np.asarray(res.comp),
                     stat=np.asarray(res.stat), u_sol=flat_u, x0=np.asarray(x0),
                     wall_time_s=solve_time, compile_time_s=first - solve_time,
                     provenance=run_provenance(solver, seed=seed))


def analyze_results(results: MCResults) -> dict:
    """Success-rate and timing statistics (reference ``analyze_data.py:59-86``)."""
    conv = np.isin(results.statuses, (CONV_ABS, CONV_REL))
    out = dict(
        scenario=results.scenario,
        solver=results.solver,
        total=int(results.num_samples),
        converged=int(conv.sum()),
        success_rate=float(conv.mean()) if results.num_samples else 0.0,
        solves_per_s=results.num_samples / results.wall_time_s,
        mean_iters=float(results.iters[conv].mean()) if conv.any() else float('nan'),
        max_iters=int(results.iters.max()) if results.num_samples else 0,
        mean_qp_solves=float(results.qp_solves[conv].mean()) if conv.any() else float('nan'),
        status_counts={STATUS_MSG.get(int(s), str(s)): int((results.statuses == s).sum())
                       for s in np.unique(results.statuses)},
        feas_violation_max=float(np.max(results.p_feas)) if results.num_samples else 0.0,
    )
    prov = getattr(results, 'provenance', None)
    if prov:
        out['provenance'] = {k: prov[k] for k in
                             ('platform', 'dtype', 'x64', 'solver_class',
                              'params_hash', 'git_rev', 'seed') if k in prov}
        # tolerance-semantics knobs surfaced at top level so a reader can tell a
        # scaled-KKT run from a reference-absolute one without digging into params
        p = prov.get('params', {})
        for k in ('conv_scaled_stat', 'approximation_eval', 'p_tol', 'd_tol'):
            if k in p:
                out['provenance'][k] = p[k]
    return out


def save_results(results: MCResults, path):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, 'wb') as f:
        pickle.dump(results, f)
    with open(path.with_suffix('.json'), 'w') as f:
        json.dump(analyze_results(results), f, indent=2)

"""GNE-compare analyzer tests (reference ``analyze_data_gne_compare.py`` semantics)."""
import numpy as np

from dgsqp_tpu.harness.analysis import gne_compare, stage_inputs
from dgsqp_tpu.harness.mc_study import MCResults


def _mk_results(u_sol, statuses):
    B = u_sol.shape[0]
    z = np.zeros(B)
    return MCResults(scenario='t', solver='s', num_samples=B,
                     statuses=np.asarray(statuses), iters=z, qp_solves=z,
                     p_feas=z, comp=z, stat=z, u_sol=u_sol,
                     x0=np.zeros((B, 4)), wall_time_s=1.0, compile_time_s=0.0)


def test_stage_inputs_agent_flat_round_trip():
    N, n1, n2 = 3, 2, 2
    rng = np.random.default_rng(0)
    stage = rng.normal(size=(4, N, n1 + n2))
    flat = np.concatenate([stage[:, :, :n1].reshape(4, -1),
                           stage[:, :, n1:].reshape(4, -1)], axis=1)
    np.testing.assert_allclose(stage_inputs(flat, N, [n1, n2], 'agent_flat'), stage)
    np.testing.assert_allclose(stage_inputs(stage.reshape(4, -1), N, [n1, n2], 'stage'),
                               stage)


def test_gne_compare_nmse_and_match():
    N, num_ua = 4, [2, 2]
    rng = np.random.default_rng(1)
    stage = rng.normal(size=(6, N, 4))
    flat = np.concatenate([stage[:, :, :2].reshape(6, -1),
                           stage[:, :, 2:].reshape(6, -1)], axis=1)
    # b: identical except sample 2 perturbed hugely at stage 1, sample 5 not converged
    stage_b = stage.copy()
    stage_b[2, 1, 0] += 10.0
    flat_b = np.concatenate([stage_b[:, :, :2].reshape(6, -1),
                             stage_b[:, :, 2:].reshape(6, -1)], axis=1)
    res_a = _mk_results(flat, [1, 1, 1, 1, 1, 1])
    res_b = _mk_results(flat_b, [1, 1, 1, 1, 1, 5])

    scale = [2.0, 0.436, 2.0, 0.436]
    rep = gne_compare(res_a, res_b, N=N, num_ua=num_ua, input_scale=scale,
                      match_tol=0.1)
    assert rep['both_converged'] == 5
    assert rep['match'] == 4                       # sample 2 disagrees, sample 5 skipped
    assert rep['match_rate_of_both'] == 0.8
    # reference NMSE formula check on the perturbed sample
    nmse_2 = np.linalg.norm((stage[2] - stage_b[2]) / np.asarray(scale)) / N
    assert abs(rep['nmse_max'] - nmse_2) < 1e-12
    assert rep['first_disagreement_stage'] == {2: 1}
    # identical samples give zero NMSE
    assert rep['nmse_min'] == 0.0


def test_gne_compare_cross_formulation_columns():
    """Exact (2 inputs/agent) vs progress-augmented (3 inputs/agent) comparisons keep
    only shared channels (reference analyze_data_gne_compare.py:160-162)."""
    N = 2
    rng = np.random.default_rng(2)
    exact = rng.normal(size=(3, N, 4))
    pa = np.concatenate([exact[:, :, :2], rng.normal(size=(3, N, 1)),
                         exact[:, :, 2:], rng.normal(size=(3, N, 1))], axis=2)
    flat_e = np.concatenate([exact[:, :, :2].reshape(3, -1),
                             exact[:, :, 2:].reshape(3, -1)], axis=1)
    flat_pa = np.concatenate([pa[:, :, :3].reshape(3, -1),
                              pa[:, :, 3:].reshape(3, -1)], axis=1)
    res_e = _mk_results(flat_e, [1, 1, 1])
    res_pa = _mk_results(flat_pa, [1, 1, 1])
    # the PA side has a third (arc-speed) channel per agent; select the shared ones
    rep = gne_compare(res_e, res_pa, N=N, num_ua=[2, 2], num_ua_b=[3, 3],
                      keep_cols_b=[0, 1, 3, 4], match_tol=1e-9)
    assert rep['match'] == 3 and rep['nmse_max'] == 0.0

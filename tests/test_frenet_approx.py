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

"""Closed-loop race stack test: short run on a small synthetic track (CI-sized)."""
import numpy as np
import pytest

from dgsqp_tpu.harness.race import RaceConfig, RaceStack
from dgsqp_tpu.tracks import CurveTrack


@pytest.mark.slow
def test_race_multi_intervention_real_raceline():
    """The game planner re-arms after the cars exit a game segment: a longer race on the
    shipped L_track_barc raceline must produce MULTIPLE converged interventions
    (reference re-plans every time racelines re-converge, race_main.py:495-578).
    Measured: 5 converged interventions in 80 steps (this config, CPU f64)."""
    cfg = RaceConfig(control_dt=0.1, sim_dt=0.02, mpc_N=8, game_N=8,
                     lookahead_time=0.4, lookahead_window=5, n_steps=80)
    stack = RaceStack(cfg)
    # the recorded raceline must actually have loaded (not the synthetic fallback)
    assert stack.raceline.mat[:, 3].std() > 0.05, 'expected a varying-speed raceline'
    stack.run()
    conv = [g for g in stack.game_log
            if g['info']['msg'] in ('conv_abs_tol', 'conv_rel_tol')]
    assert len(conv) >= 2, stack.game_log


@pytest.mark.slow
def test_race_stack_runs():
    track = CurveTrack(enter_straight_length=4, curve_length=6,
                       curve_swept_angle=np.pi / 2, exit_straight_length=6,
                       width=2.0, slack=0.8)
    cfg = RaceConfig(control_dt=0.1, sim_dt=0.02, mpc_N=8, game_N=8,
                     lookahead_time=0.4, lookahead_window=5, n_steps=5,
                     raceline_speed=1.2)
    stack = RaceStack(cfg, track=track)
    hist = stack.run()
    assert len(hist) == 5
    # cars advance along the track and stay inside the boundaries
    for car in range(2):
        s0 = hist[0][car].p.s
        s1 = hist[-1][car].p.s
        assert s1 > s0
        for snap in hist:
            assert abs(snap[car].p.x_tran) <= track.half_width + 0.3

"""Closed-loop race stack test: short run on a small synthetic track (CI-sized)."""
import numpy as np
import pytest

from dgsqp_tpu.harness.race import RaceConfig, RaceStack
from dgsqp_tpu.tracks import CurveTrack


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

#!/usr/bin/env python3
"""Closed-loop two-car race demo CLI.

TPU-native counterpart of the reference's race entry point
(``/root/reference/scripts/race/race_main.py:289-597`` + ``generate_video.py``):
two cars track a raceline with CA-LTV-MPC while a DGSQP game planner computes
interaction maneuvers; writes the trajectory plot and (optionally) a video.

Examples:
    python scripts/race_main.py --steps 100 --out results/race
    python scripts/race_main.py --steps 200 --video --track L_track_barc
    DGSQP_PLATFORM=cpu python scripts/race_main.py --steps 20   # CPU smoke
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--track', default='L_track_barc')
    ap.add_argument('--steps', type=int, default=100)
    ap.add_argument('--mpc_N', type=int, default=20)
    ap.add_argument('--game_N', type=int, default=20)
    ap.add_argument('--dt', type=float, default=0.1)
    ap.add_argument('--raceline_speed', type=float, default=1.5)
    ap.add_argument('--out', default='results/race')
    ap.add_argument('--video', action='store_true',
                    help='render an mp4/gif of the race (reference generate_video.py)')
    ap.add_argument('--fps', type=int, default=10)
    args = ap.parse_args()

    import jax
    if os.environ.get('DGSQP_PLATFORM'):
        jax.config.update('jax_platforms', os.environ['DGSQP_PLATFORM'])
    jax.config.update('jax_default_matmul_precision', 'highest')

    from dgsqp_tpu.harness.race import RaceConfig, RaceStack
    from dgsqp_tpu.harness.plotting import plot_race_history, render_race_video

    cfg = RaceConfig(track_name=args.track, control_dt=args.dt,
                     mpc_N=args.mpc_N, game_N=args.game_N,
                     n_steps=args.steps, raceline_speed=args.raceline_speed)
    stack = RaceStack(cfg)
    t0 = time.time()
    history = stack.run()
    wall = time.time() - t0

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    plot_race_history(history, track=stack.track,
                      save_path=str(out / 'race_trajectories.png'))
    summary = {
        'steps': len(history),
        'wall_s': round(wall, 2),
        'steps_per_s': round(len(history) / wall, 3),
        'game_solves': len(stack.game_log),
        'final_s': [float(history[-1][car].p.s) for car in range(2)],
    }
    (out / 'race_summary.json').write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    if args.video:
        render_race_video(history, stack.track, str(out / 'race.mp4'), fps=args.fps)
        print(f'video: {out / "race.mp4"}')


if __name__ == '__main__':
    main()

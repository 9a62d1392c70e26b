#!/usr/bin/env python3
"""Heuristic landing demo — the TPU-native analogue of the reference's
top-level lander.py.

Runs the constant-thrust heuristic (MOTORVAL=1.625e-2, lander.py:21) on
Lander-v0, optionally saving a reference-format CSV trajectory, an MP4
movie, or displaying the 3D matplotlib animation.  Unlike the reference —
which steps the sim on a worker thread while matplotlib animates the shared
mutable pose (rendering/__init__.py:149,237-240) — the simulation here runs
to completion as one jitted rollout and the renderer replays the recorded
trajectory, so there is no data race and no real-time pacing in the sim.

Usage:
  python lander_demo.py                      # animate the landing
  python lander_demo.py --save traj.csv      # save CSV (copter-plot format)
  python lander_demo.py --movie              # save movie.mp4
  python lander_demo.py --nodisplay          # headless: just print stats
  python lander_demo.py --random --seed 7    # random motor values
"""

import argparse
from argparse import ArgumentDefaultsHelpFormatter

import numpy as np

import jax
import jax.numpy as jnp

import gym_copter_tpu as gct
from gym_copter_tpu.render.csvlog import write_csv

MOTORVAL = 1.625e-2  # reference lander.py:21


def parse_view_angles(view):
    return tuple(int(s) for s in view.split(','))


def main():
    parser = argparse.ArgumentParser(
        formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument('--save', dest='csvfilename',
                        help='Save trajectory in CSV file')
    parser.add_argument('--movie', action='store_true',
                        help='Save movie in an MP4 file')
    parser.add_argument('--view', default='30,120',
                        help='Elevation, azimuth for view perspective')
    parser.add_argument('--random', action='store_true',
                        help='Use random motor values for comparison')
    parser.add_argument('--seed', type=int, default=0, help='Random seed')
    parser.add_argument('--nodisplay', action='store_true',
                        help='Run headless (no rendering)')
    args = parser.parse_args()

    env = gct.make('Lander-v0', num_envs=1, seed=args.seed)
    dt = env.params.task.dt
    state, obs = env.reset()

    # Pre-script the action sequence, then run the whole episode as ONE
    # compiled rollout — no per-step host round-trips (the reference's
    # python loop at 100 Hz becomes a single lax.scan).
    T = env.params.task.max_steps + 1
    rng = np.random.default_rng(args.seed)
    if args.random:
        actions = MOTORVAL * rng.standard_normal((T, 4)).astype(np.float32)
    else:
        actions = MOTORVAL * np.ones((T, 4), np.float32)
    first_obs = obs
    state, traj = env.run_episode(state, jnp.asarray(actions)[:, :, None])

    done = np.asarray(traj.done[:, 0])
    end = int(done.argmax()) + 1 if done.any() else T
    rewards = np.asarray(traj.reward[:end, 0])
    # trajectory obs: initial obs + per-step obs (which are post-reset on
    # done steps, so stop at `end`)
    obs_log = np.concatenate(
        [np.asarray(first_obs).T, np.asarray(traj.obs[:end - 1, :, 0])])
    act_log = actions[:end]
    pose_log = np.asarray(traj.x[:end, (0, 2, 4, 6, 8, 10), 0])

    total_reward = 0.0
    for step in range(end):
        total_reward += float(rewards[step])
        print('steps =  %04d    total_reward = %+0.2f'
              % (step + 1, total_reward))

    if args.csvfilename:
        write_csv(args.csvfilename, dt * np.arange(len(obs_log)),
                  np.clip(act_log, 0, 1), obs_log,
                  ['X', 'dX', 'Y', 'dY', 'Z', 'dZ',
                   'Phi', 'dPhi', 'Theta', 'dTheta'])
        print('saved', args.csvfilename)

    if not args.nodisplay or args.movie:
        from gym_copter_tpu.render.threed import ThreeDLanderRenderer
        renderer = ThreeDLanderRenderer(
            viewangles=parse_view_angles(args.view),
            target_radius=env.params.reward.target_radius)
        renderer.play(pose_log, fps=int(round(1 / dt)),
                      outfile='movie.mp4' if args.movie else None,
                      show=not args.nodisplay)


if __name__ == '__main__':
    main()

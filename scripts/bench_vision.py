#!/usr/bin/env python3
"""Batched-vision benchmark on the real chip (VERDICT r3 item 7).

sensors/vision.py claims the analytic inverse-warp camera "vmaps over
thousands of environments"; this records the evidence: env-steps/s for a
full VisualCopterEnv rollout (physics step + per-step image batch, images
consumed on-device by a jitted reduction so the camera work cannot be
dead-code-eliminated) at 1024 and 4096 envs, res 16 (the reference wrapper
resolution, attic/gym_copter/envs/lander.py:103) and res 64, plus the DVS
event-camera variant at res 16.

Timing is the same tunnel-aware differential method as bench.py.

Usage:  python scripts/bench_vision.py [--out docs/bench_vision.json]
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gym_copter_tpu as gct
from gym_copter_tpu.envs.visual import VisualCopterEnv, VisualState
from gym_copter_tpu.sensors.vision import DVS, VisionSensor
from gym_copter_tpu.utils import profiling


def bench_config(num_envs: int, res: int, dvs: bool, reps: int = 6):
    env = gct.make('Lander3D-v0', num_envs=num_envs, seed=0)
    sensor = DVS(res=res) if dvs else VisionSensor(res=res)
    venv = VisualCopterEnv(env, dvs=dvs, sensor=sensor)
    action = jnp.full((4, num_envs), 1.625e-2, jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def rollout(state: VisualState, num_steps):
        def step_fn(carry, _):
            state, acc = carry
            state, ts, img = venv.step(state, action)
            # consume the image on-device: pixel sum keeps the camera live
            return (state, acc + img.sum() + ts.reward.sum()), None

        (state, acc), _ = jax.lax.scan(step_fn, (state, 0.0), None,
                                       length=num_steps)
        return state, acc

    state0, _ = venv.reset()

    def run(n):
        _, acc = rollout(state0, n)
        return float(acc)                        # forced host sync

    # scan length is a static arg -> two compiles; differential cancels
    # tunnel latency exactly as in bench.py.  Windows are sized so the
    # marginal workload is >= ~0.5 s — the round-4 window (200 steps,
    # ~8 ms marginal at 100M env-steps/s) was inside the tunnel's ~50 ms
    # jitter and produced spreads up to 1.3e11% (VERDICT r4 weak #2).
    if jax.default_backend() == 'tpu':
        # target >= ~0.6 s marginal work per rep at the measured rates
        # (~100M env-steps/s at res 16, ~32M at res 64)
        per_env_budget = 60_000_000 // num_envs
        t_hi = per_env_budget // 4 if res >= 64 else per_env_budget
        t_lo = t_hi // 15
        min_marg = 0.05
    else:
        t_lo, t_hi, min_marg = 50, 250, 0.0
    res_ = profiling.differential_steps_per_sec(
        run, t_lo, t_hi, batch=num_envs, reps=reps,
        min_marginal_s=min_marg)
    return {
        'env_steps_per_sec': res_['steps_per_sec'],
        'images_per_sec': res_['steps_per_sec'],  # one image per env-step
        'spread_pct': res_['spread_pct'],
        'rejected_samples': res_['rejected'],
        'us_per_batched_step': res_['ns_per_iter'] / 1e3,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='docs/bench_vision.json')
    p.add_argument('--reps', type=int, default=6)
    args = p.parse_args()

    results = {'backend': jax.default_backend(), 'env': 'Lander3D-v0',
               'configs': []}
    for num_envs, res, dvs in ((1024, 16, False), (4096, 16, False),
                               (1024, 64, False), (1024, 16, True)):
        label = f'{num_envs}envs_res{res}' + ('_dvs' if dvs else '')
        print(f'benchmarking {label} ...', flush=True)
        r = bench_config(num_envs, res, dvs, reps=args.reps)
        r.update({'num_envs': num_envs, 'res': res, 'dvs': dvs,
                  'label': label})
        results['configs'].append(r)
        print(json.dumps(r, indent=1), flush=True)

    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()

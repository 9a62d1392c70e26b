#!/usr/bin/env python3
"""Training-path benchmarks on the real chip (VERDICT round-2 item 3).

Measures and records, as docs/bench_train.json:
  * fused PPO exploration rollout (ops/pallas_actor.fused_training_rollout)
    vs the XLA `lax.scan` rollout — env-steps/s and µs per 4096-env step;
  * fused policy-eval (ops/pallas_policy.fused_policy_eval) vs the scan
    `make_eval_fn` path — env-steps/s;
  * end-to-end PPO updates/s, fused vs scan rollout mode.

These are the numbers PARITY.md's training-path claims must cite; the file
is a recorded, reproducible artifact rather than prose.  Timing is the same
differential method as bench.py (tunnel-aware, forced host reads).

Usage:  python scripts/bench_train.py [--out docs/bench_train.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_copter_tpu.utils import profiling
from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.learn import ppo

B = 4096
ROLLOUT = 128


def bench_exploration_rollout(params, spec, cfg, net, state, reps=6):
    """Fused actor kernel vs scan: T=128 exploration rollout, B=4096."""
    from gym_copter_tpu.control.heuristics import hover_motor_value
    from gym_copter_tpu.ops.pallas_actor import fused_training_rollout

    hover = float(hover_motor_value(params))
    env_ids = jnp.arange(B, dtype=jnp.int32)
    base_key = jax.random.PRNGKey(0)

    @jax.jit
    def scan_once(net, state, seed):
        def step_fn(carry, _):
            env_state, obs, key = carry
            key, sub = jax.random.split(key)
            mean, log_std, value = ppo._policy(net, obs, cfg)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                sub, mean.shape, mean.dtype)
            env_state, ts = base.step(env_state, hover * (1.0 + action),
                                      base_key, env_ids, params, spec)
            return (env_state, ts.obs, key), ts.reward

        obs = base._get_obs(state.dyn.x, state.steps, params, spec)
        (_, _, _), rewards = jax.lax.scan(
            step_fn, (state, obs, jax.random.fold_in(base_key, seed)), None,
            length=ROLLOUT)
        return rewards.sum()

    def run_scan(n):
        total = 0.0
        for i in range(n // ROLLOUT):
            total += float(scan_once(net, state, i))
        return total

    def run_fused(n):
        total = 0.0
        for i in range(n // ROLLOUT):
            traj, _ = fused_training_rollout(
                net, state, ROLLOUT, params, spec, obs_scale=cfg.obs_scale,
                action_bias=cfg.init_action_bias, hover=hover, seed=i)
            total += float(traj.reward[0, 0])
        return total

    lo, hi = 10 * ROLLOUT, 60 * ROLLOUT
    fused = profiling.differential_steps_per_sec(run_fused, lo, hi, batch=B,
                                                 reps=reps)
    scan = profiling.differential_steps_per_sec(run_scan, lo, hi, batch=B,
                                                reps=reps)
    return {
        'fused_env_steps_per_sec': fused['steps_per_sec'],
        'scan_env_steps_per_sec': scan['steps_per_sec'],
        'fused_us_per_4096env_step': 1e6 * B / fused['steps_per_sec'],
        'scan_us_per_4096env_step': 1e6 * B / scan['steps_per_sec'],
        'speedup': fused['steps_per_sec'] / scan['steps_per_sec'],
    }


def bench_policy_eval(params, spec, cfg, net, reps=6):
    """Fused eval kernel vs make_eval_fn: 999-step deterministic episode."""
    from gym_copter_tpu.ops.pallas_policy import make_fused_eval_fn

    n_steps = 999
    fused_eval = make_fused_eval_fn(params, spec, cfg, num_envs=B,
                                    num_steps=n_steps)
    scan_eval = ppo.make_eval_fn(params, spec, cfg, num_envs=B,
                                 num_steps=n_steps)

    def run_fused(n):
        total = 0.0
        for _ in range(n // n_steps):
            total += float(fused_eval(net)[0])
        return total

    def run_scan(n):
        total = 0.0
        for _ in range(n // n_steps):
            total += float(scan_eval(net)[0])
        return total

    # metric parity sanity (bit-identical metric is the kernel's contract)
    f, s = float(fused_eval(net)[0]), float(scan_eval(net)[0])
    assert abs(f - s) < 1e-3 * max(1.0, abs(s)), (f, s)

    lo, hi = 5 * n_steps, 30 * n_steps
    fused = profiling.differential_steps_per_sec(run_fused, lo, hi, batch=B,
                                                 reps=reps)
    scan = profiling.differential_steps_per_sec(run_scan, lo, hi, batch=B,
                                                reps=reps)
    return {
        'fused_env_steps_per_sec': fused['steps_per_sec'],
        'scan_env_steps_per_sec': scan['steps_per_sec'],
        'speedup': fused['steps_per_sec'] / scan['steps_per_sec'],
    }


def bench_ppo_update(params, spec, cfg, reps=8):
    """End-to-end jitted PPO train step (rollout+GAE+4 epochs), per mode.
    MEDIAN of the differential samples — a min over noisy tunnel-timed
    differentials systematically underestimates (one slow t_lo sample
    produced a fictitious 67 ms scan reading during development)."""
    import statistics

    out = {}
    for mode in ('fused', 'scan'):
        if mode == 'fused' and jax.default_backend() != 'tpu':
            continue
        key = jax.random.PRNGKey(0)
        env_ids = jnp.arange(B, dtype=jnp.int32)
        train_step, opt = ppo.make_train_step(
            params, spec, cfg, jax.random.PRNGKey(1), env_ids,
            rollout_mode=mode)
        ts = ppo.init_train_state(key, params, spec, cfg, B, opt)
        step = jax.jit(train_step, donate_argnums=0)
        ts, m = step(ts)
        ts, m = step(ts)  # warm (donation settles on the 2nd call)
        float(m['reward_per_step'])
        n_lo, n_hi = 3, 13
        times = []
        for _ in range(reps):
            for n in (n_lo, n_hi):
                t0 = time.perf_counter()
                for _ in range(n):
                    ts, m = step(ts)
                float(m['reward_per_step'])               # forced host sync
                if n == n_lo:
                    t_lo = time.perf_counter() - t0
                else:
                    times.append(((time.perf_counter() - t0) - t_lo)
                                 / (n_hi - n_lo))
        per_update = statistics.median(times)
        out[mode] = {
            'seconds_per_update': per_update,
            'updates_per_sec': 1.0 / per_update,
            'env_steps_per_sec': B * ROLLOUT / per_update,
        }
    if 'fused' in out and 'scan' in out:
        out['fused_vs_scan_speedup'] = (out['scan']['seconds_per_update']
                                        / out['fused']['seconds_per_update'])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='docs/bench_train.json')
    args = p.parse_args()

    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    cfg = ppo.PPOConfig(rollout_steps=ROLLOUT, hidden=128)
    net = ppo.init_params(jax.random.PRNGKey(2), spec.obs_size,
                          spec.action_size, cfg)
    env_ids = jnp.arange(B, dtype=jnp.int32)
    state, _ = base.reset(jax.random.PRNGKey(0), env_ids,
                          jnp.zeros(B, jnp.int32), params, spec)

    results = {'backend': jax.default_backend(), 'batch': B,
               'rollout_steps': ROLLOUT, 'hidden': cfg.hidden}
    print('benchmarking exploration rollout ...', flush=True)
    results['exploration_rollout'] = bench_exploration_rollout(
        params, spec, cfg, net, state)
    print(json.dumps(results['exploration_rollout'], indent=1), flush=True)
    print('benchmarking policy eval ...', flush=True)
    results['policy_eval'] = bench_policy_eval(params, spec, cfg, net)
    print(json.dumps(results['policy_eval'], indent=1), flush=True)
    print('benchmarking end-to-end PPO update ...', flush=True)
    results['ppo_update'] = bench_ppo_update(params, spec, cfg)
    print(json.dumps(results['ppo_update'], indent=1), flush=True)

    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()

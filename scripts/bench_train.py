#!/usr/bin/env python3
"""Training-path benchmark on the real chip (VERDICT r3 items 2+3).

Measures and records, as docs/bench_train.json:
  * the end-to-end jitted PPO train step (rollout + GAE + 4 epochs x 4
    minibatches) — seconds/update, updates/s, env-steps/s;
  * the phase breakdown: exploration rollout alone and the update phase
    alone, under both minibatch-shuffle modes — `element` (the pre-round-4
    per-element permutation gather) and `block` (the round-4 block shuffle,
    PPOConfig.shuffle_block) — quantifying the gather fix;
  * the update-speed criterion vs the recorded round-3 baseline
    (0.1074 s/update at batch 4096, docs/bench_train.json@r3).

History note: rounds 2-3 also benchmarked two Pallas training kernels here
(fused exploration rollout, fused policy eval).  Both lost to the XLA scan
(0.81x / 0.46x, r3 artifact) and were retired in round 4: after the block-
shuffle fix the scan rollout is ~5 ms of a ~23 ms update, so even an
infinitely fast kernel could not reach the 1.5x end-to-end bar (Amdahl) —
see PARITY.md "Policy-in-kernel".  The physics-only rollout kernel
(ops/pallas_rollout.py, the bench.py headline) is unaffected.

Timing is the same tunnel-aware differential method as bench.py (forced
host reads; median over reps).

Usage:  python scripts/bench_train.py [--out docs/bench_train.json]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.learn import ppo

B = 4096
ROLLOUT = 128
R3_SECONDS_PER_UPDATE = 0.1074  # scan mode, r3 artifact (same B/T/hidden)


def timeit(fn, reps=8, n_lo=3, n_hi=13):
    """Differential timing: fn(n) runs the op n times then host-syncs."""
    fn(2)  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(n_hi)
        t_hi = time.perf_counter() - t0
        times.append((t_hi - t_lo) / (n_hi - n_lo))
    return statistics.median(times)


def bench_train_step(params, spec, cfg):
    env_ids = jnp.arange(B, dtype=jnp.int32)
    train_step, opt = ppo.make_train_step(params, spec, cfg,
                                          jax.random.PRNGKey(1), env_ids)
    ts0 = ppo.init_train_state(jax.random.PRNGKey(0), params, spec, cfg, B,
                               opt)
    step = jax.jit(train_step)
    state = {'ts': ts0}

    def run(n):
        t = state['ts']
        for _ in range(n):
            t, m = step(t)
        float(m['reward_per_step'])
        state['ts'] = t

    per_update = timeit(run)
    return {
        'seconds_per_update': per_update,
        'updates_per_sec': 1.0 / per_update,
        'env_steps_per_sec': B * ROLLOUT / per_update,
    }


def bench_rollout(params, spec, cfg, net, state):
    from gym_copter_tpu.control.heuristics import hover_motor_value

    hover = float(hover_motor_value(params))
    env_ids = jnp.arange(B, dtype=jnp.int32)
    base_key = jax.random.PRNGKey(0)

    @jax.jit
    def rollout(net, state, key):
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
        _, rewards = jax.lax.scan(step_fn, (state, obs, key), None,
                                  length=ROLLOUT)
        return rewards.sum()

    def run(n):
        for i in range(n):
            r = rollout(net, state, jax.random.fold_in(base_key, i))
        float(r)

    per_rollout = timeit(run)
    return {
        'seconds_per_rollout': per_rollout,
        'env_steps_per_sec': B * ROLLOUT / per_rollout,
        'us_per_4096env_step': 1e6 * per_rollout / ROLLOUT,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='docs/bench_train.json')
    args = p.parse_args()

    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    env_ids = jnp.arange(B, dtype=jnp.int32)
    state, _ = base.reset(jax.random.PRNGKey(0), env_ids,
                          jnp.zeros(B, jnp.int32), params, spec)

    results = {'backend': jax.default_backend(), 'batch': B,
               'rollout_steps': ROLLOUT, 'hidden': 128}

    # minibatches pinned to 4 to stay comparable with the r3/r4 entries of
    # this benchmark; the production recipe at 4096 envs resolves to 16
    # (ppo.scaled_minibatches) and is measured separately below
    cfg_block = ppo.PPOConfig(rollout_steps=ROLLOUT, hidden=128,
                              minibatches=4)
    cfg_elem = cfg_block._replace(shuffle_block=1)
    cfg_prod = ppo.resolve_minibatches(
        cfg_block._replace(minibatches=None), B)
    net = ppo.init_params(jax.random.PRNGKey(2), spec.obs_size,
                          spec.action_size, cfg_block)

    print('benchmarking exploration rollout (scan) ...', flush=True)
    results['exploration_rollout'] = bench_rollout(params, spec, cfg_block,
                                                   net, state)
    print(json.dumps(results['exploration_rollout'], indent=1), flush=True)

    print('benchmarking end-to-end PPO update (block shuffle) ...',
          flush=True)
    results['ppo_update'] = bench_train_step(params, spec, cfg_block)
    print(json.dumps(results['ppo_update'], indent=1), flush=True)

    print('benchmarking end-to-end PPO update (production recipe, '
          'minibatches=16) ...', flush=True)
    results['ppo_update_production'] = bench_train_step(params, spec,
                                                        cfg_prod)
    print(json.dumps(results['ppo_update_production'], indent=1), flush=True)

    print('benchmarking end-to-end PPO update (element shuffle, '
          'pre-r4 semantics) ...', flush=True)
    results['ppo_update_element_shuffle'] = bench_train_step(params, spec,
                                                             cfg_elem)
    print(json.dumps(results['ppo_update_element_shuffle'], indent=1),
          flush=True)

    cur = results['ppo_update']['seconds_per_update']
    results['block_vs_element_speedup'] = (
        results['ppo_update_element_shuffle']['seconds_per_update'] / cur)
    results['speedup_vs_r3_baseline'] = R3_SECONDS_PER_UPDATE / cur
    results['rollout_share_of_update'] = (
        results['exploration_rollout']['seconds_per_rollout'] / cur)
    print(json.dumps({k: results[k] for k in
                      ('block_vs_element_speedup', 'speedup_vs_r3_baseline',
                       'rollout_share_of_update')}, indent=1), flush=True)

    with open(args.out, 'w') as f:
        json.dump(results, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()

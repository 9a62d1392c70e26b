#!/usr/bin/env python3
"""Fused-rollout throughput vs env-batch size on one chip.

The headline bench (bench.py) pins B=4096 (BASELINE.json's metric); this
sweep records how per-chip throughput scales with the batch — the
capacity-planning curve for choosing envs/chip on a pod.  Same
trustworthy-window methodology: the marginal differential workload is
held at ~4G env-steps (~0.55 s at 7G env-steps/s) for every batch size
by scaling the step windows inversely with B.

Usage:  python scripts/bench_batch_sweep.py [--out docs/bench_batch_sweep.json]
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.ops import pallas_rollout as pr
from gym_copter_tpu.utils import profiling

MARGINAL_ENV_STEPS = 4_000_000_000


def bench_batch(b: int, reps: int = 8):
    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    env_ids = jnp.arange(b, dtype=jnp.int32)
    state, _ = base.reset(jax.random.PRNGKey(0), env_ids,
                          jnp.zeros(b, jnp.int32), params, spec)
    action = jnp.full((4, b), 1.625e-2, jnp.float32)

    def run(num_steps):
        _, tot = pr.fused_rollout(state, action, num_steps, params, spec,
                                  seed=0)
        return float(tot['reward_sum'][0])

    t_marg = MARGINAL_ENV_STEPS // b
    t_lo = max(1000, t_marg // 10)
    res = profiling.differential_steps_per_sec(
        run, t_lo, t_lo + t_marg, batch=b, reps=reps, min_marginal_s=0.05)
    return {
        'num_envs': b,
        'env_steps_per_sec': res['steps_per_sec'],
        'spread_pct': res['spread_pct'],
        'rejected_samples': res['rejected'],
        'ns_per_env_step': res['ns_per_iter'] / b if res['steps_per_sec']
        else None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default='docs/bench_batch_sweep.json')
    p.add_argument('--batches', type=int, nargs='+',
                   default=[1024, 2048, 4096, 8192, 16384, 32768])
    args = p.parse_args()
    assert jax.default_backend() == 'tpu', 'sweep runs on the real chip'

    rows = []
    for b in args.batches:
        r = bench_batch(b)
        rows.append(r)
        print(json.dumps(r), flush=True)
    out = {'backend': 'tpu', 'env': 'Lander3D-v0',
           'metric': 'fused_rollout env-steps/s vs batch, one chip',
           'rows': rows}
    with open(args.out, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', args.out)


if __name__ == '__main__':
    main()

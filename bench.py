#!/usr/bin/env python3
"""Headline benchmark: env-steps/s at 4096 batched Lander3D envs on one chip.

This is BASELINE.json's metric ("env-steps/s/chip at 4096 batched Lander3D
envs").  The reference has no speed baseline (single env, 100 Hz real-time
paced — see BASELINE.md), so vs_baseline is reported against the north-star
target of 10M env-steps/s per host: vs_baseline = value / 1e7.

The measured path is the fused Pallas rollout kernel
(gym_copter_tpu/ops/pallas_rollout.py): the whole T-step auto-resetting
rollout runs as ONE kernel with the batch state pinned in VMEM.  Where the
kernel family doesn't apply (non-TPU backends), the XLA `lax.scan` path is
measured instead.

Timing is differential — t(T_hi) - t(T_lo) over the extra steps — with a
per-rep host transfer of the result.  On this rig the TPU is reached through
a tunnel whose `block_until_ready` acks dispatch before completion, so
naive timing both under-counts (no completion wait) and over-counts (fixed
tunnel round-trip latency); the differential with forced host reads cancels
both.  Sanity: the kernel's per-env episode counts are checked against the
XLA path before timing.

Regression gate: per-rep variance is reported (spread_pct) and the result
is compared against the last entry of docs/bench_history.json — a drop of
more than 5% beyond the measured noise prints a WARNING to stderr (the
round-3 headline drifted 7.33G -> 7.04G with nothing watching).  The new
measurement is appended to the history file.

Prints exactly one JSON line (stdout):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "spread_pct": N, "vs_last_pct": N}
"""

import datetime
import json
import os
import sys

import jax
import jax.numpy as jnp

from gym_copter_tpu.utils import profiling
from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.ops import pallas_rollout as pr

NORTH_STAR = 1.0e7  # env-steps/s per host (BASELINE.json north_star)

B = 4096
T_LO, T_HI = 20_000, 120_000
REPS = 8


def main():
    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(B, dtype=jnp.int32)
    state, _ = base.reset(key, env_ids, jnp.zeros(B, jnp.int32), params, spec)
    action = jnp.full((4, B), 1.625e-2, jnp.float32)  # demo heuristic thrust

    on_tpu = jax.default_backend() == 'tpu'

    def rollout(st, num_steps, seed):
        if on_tpu:
            return pr.fused_rollout(st, action, num_steps, params, spec,
                                    seed=seed)
        return pr.scan_rollout(st, action, key, env_ids, num_steps, params,
                               spec)

    # correctness sanity: fused episode counts == XLA-path episode counts
    if on_tpu:
        _, ft = rollout(state, 10_000, 0)
        _, st_ = pr.scan_rollout(state, action, key, env_ids, 10_000, params,
                                 spec)
        f_eps = float(jnp.mean(ft['episodes']))
        s_eps = float(jnp.mean(st_['episodes']))
        assert abs(f_eps - s_eps) < 0.5, (f_eps, s_eps)

    def run(num_steps):
        _, tot = rollout(state, num_steps, 0)
        return float(tot['reward_sum'][0])              # forced host sync

    res = profiling.differential_steps_per_sec(run, T_LO, T_HI, batch=B,
                                               reps=REPS)
    steps_per_sec = res['steps_per_sec']

    # regression gate vs the last recorded run (docs/bench_history.json)
    hist_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'docs', 'bench_history.json')
    history = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            history = json.load(f)
    vs_last_pct = None
    if history:
        last = history[-1]['value']
        vs_last_pct = (steps_per_sec - last) / last * 100.0
        # warn when the drop exceeds the measured noise plus the 5% gate
        if vs_last_pct < -(5.0 + res['spread_pct']):
            print(f'WARNING: headline bench regressed {vs_last_pct:.1f}% vs '
                  f'last recorded run ({last:.3g} env-steps/s) — beyond the '
                  f'{res["spread_pct"]:.1f}% measured spread + 5% gate',
                  file=sys.stderr)
    history.append({
        'date': datetime.datetime.now(datetime.timezone.utc)
                .strftime('%Y-%m-%dT%H:%M:%SZ'),
        'value': round(steps_per_sec),
        'spread_pct': round(res['spread_pct'], 2),
        'samples': [round(s) for s in res['samples']],
        'backend': jax.default_backend(),
    })
    os.makedirs(os.path.dirname(hist_path), exist_ok=True)
    with open(hist_path, 'w') as f:
        json.dump(history, f, indent=1)

    out = {
        'metric': 'lander3d_env_steps_per_sec_4096envs_1chip',
        'value': round(steps_per_sec),
        'unit': 'env-steps/s',
        'vs_baseline': round(steps_per_sec / NORTH_STAR, 3),
        'spread_pct': round(res['spread_pct'], 2),
    }
    if vs_last_pct is not None:
        out['vs_last_pct'] = round(vs_last_pct, 2)
    print(json.dumps(out))


if __name__ == '__main__':
    main()

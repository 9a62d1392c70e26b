#!/usr/bin/env python3
"""Headline benchmark: env-steps/s at 4096 batched Lander3D envs on one chip.

This is BASELINE.json's metric ("env-steps/s/chip at 4096 batched Lander3D
envs").  The reference has no speed baseline (single env, 100 Hz real-time
paced — see BASELINE.md), so vs_baseline is reported against the north-star
target of 10M env-steps/s per host: vs_baseline = value / 1e7.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks

NORTH_STAR = 1.0e7  # env-steps/s per host (BASELINE.json north_star)

B = 4096
T = 10_000
REPS = 5


def main():
    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(B, dtype=jnp.int32)

    state, _ = base.reset(key, env_ids, jnp.zeros(B, jnp.int32), params, spec)
    action = jnp.full((4, B), 1.625e-2, jnp.float32)  # demo heuristic thrust

    @jax.jit
    def run(state, action):
        """T auto-resetting env steps as one scan; returns summed rewards so
        nothing can be dead-code eliminated."""

        def body(carry, _):
            st, acc = carry
            st, ts = base.step(st, action, key, env_ids, params, spec)
            return (st, acc + ts.reward), None

        (state, acc), _ = jax.lax.scan(
            body, (state, jnp.zeros(B, jnp.float32)), None, length=T)
        return state, acc

    # compile + warm up
    state_w, acc = run(state, action)
    jax.block_until_ready(acc)

    t0 = time.perf_counter()
    st = state
    for _ in range(REPS):
        st, acc = run(st, action)
    jax.block_until_ready(acc)
    dt = (time.perf_counter() - t0) / REPS

    steps_per_sec = B * T / dt
    print(json.dumps({
        'metric': 'lander3d_env_steps_per_sec_4096envs_1chip',
        'value': round(steps_per_sec),
        'unit': 'env-steps/s',
        'vs_baseline': round(steps_per_sec / NORTH_STAR, 3),
    }))


if __name__ == '__main__':
    main()

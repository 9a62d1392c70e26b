"""Fused policy-eval kernel vs the XLA `make_eval_fn` path.

The fused kernel must reproduce the PPO evaluation metric (per-env return
until first done, learn/ppo.py:254-284) bit-exactly: trajectories are
identical up to each env's first termination, and rewards after it are
masked out of the metric in both paths, so in-kernel zero-kick resets vs
the XLA path's random resets cannot leak into the comparison.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams, TaskParams
from gym_copter_tpu.envs import tasks
from gym_copter_tpu.learn import ppo
from gym_copter_tpu.ops import pallas_policy as pp

B = 128


def _setup(spec, max_steps=80):
    env_params = EnvParams(vehicle=vehicles.DJI_PHANTOM,
                           task=TaskParams(max_steps=max_steps))
    cfg = ppo.PPOConfig(hidden=32)
    params = ppo.init_params(jax.random.PRNGKey(7), spec.obs_size,
                             spec.action_size, cfg)
    return env_params, cfg, params


@pytest.mark.parametrize('spec_name', ['LANDER_3D', 'HOVER_3D'])
def test_fused_eval_matches_xla_eval(spec_name):
    spec = getattr(tasks, spec_name)
    env_params, cfg, params = _setup(spec)

    xla_eval = ppo.make_eval_fn(env_params, spec, cfg, num_envs=B,
                                num_steps=150, seed=5)
    fused_eval = pp.make_fused_eval_fn(env_params, spec, cfg, num_envs=B,
                                       num_steps=150, seed=5, interpret=True)
    _, xla_tot = xla_eval(params)
    _, fused_tot = fused_eval(params)
    np.testing.assert_allclose(np.asarray(fused_tot), np.asarray(xla_tot),
                               rtol=1e-6, atol=1e-4)


def test_fused_eval_exactness_lander():
    """With a single hidden layer and identical ops the totals should in
    fact be bit-identical on the same backend, not merely close."""
    spec = tasks.LANDER_3D
    env_params, cfg, params = _setup(spec, max_steps=60)
    xla_eval = ppo.make_eval_fn(env_params, spec, cfg, num_envs=B,
                                num_steps=100, seed=9)
    fused_eval = pp.make_fused_eval_fn(env_params, spec, cfg, num_envs=B,
                                       num_steps=100, seed=9, interpret=True)
    _, xla_tot = xla_eval(params)
    _, fused_tot = fused_eval(params)
    np.testing.assert_array_equal(np.asarray(fused_tot), np.asarray(xla_tot))


def test_trained_like_policy_hovers():
    """A hand-built 'hover' actor (zero weights, bias that cancels
    init_action_bias -> mean 0 -> exact hover thrust) must survive longer
    than the motors-off init policy."""
    spec = tasks.HOVER_3D
    env_params, cfg, params = _setup(spec, max_steps=200)
    hover_actor = [
        {'w': jnp.zeros_like(l['w']),
         'b': jnp.full_like(l['b'], 0.0 if i < 2 else -cfg.init_action_bias)}
        for i, l in enumerate(params['actor'])]
    fused_eval = pp.make_fused_eval_fn(env_params, spec, cfg, num_envs=B,
                                       num_steps=250, seed=1, interpret=True)
    hover_mean = float(fused_eval({'actor': hover_actor})[0])
    init_mean = float(fused_eval(params)[0])
    assert hover_mean > init_mean
    assert hover_mean > 150.0  # survives to the 200-step cap mostly


def test_unsupported_spec_raises():
    spec = tasks.TARGET
    env_params, cfg, params = _setup(tasks.LANDER_3D)
    with pytest.raises(ValueError):
        pp.make_fused_eval_fn(env_params, spec, cfg, num_envs=B,
                              num_steps=10, interpret=True)(params)

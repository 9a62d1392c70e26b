"""Checkpoint/resume: a restored training job must continue bit-exactly."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import tasks
from gym_copter_tpu.learn import ppo
from gym_copter_tpu.utils import checkpoint

PARAMS = EnvParams(vehicle=vehicles.DJI_PHANTOM)


@pytest.mark.parametrize('fmt', ['npz', 'orbax'])
def test_train_resume_bit_exact(tmp_path, fmt):
    spec = tasks.HOVER_3D
    cfg = ppo.PPOConfig(rollout_steps=8, minibatches=2, epochs=2, hidden=16)
    base_key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(8, dtype=jnp.int32)
    train_step, optimizer = ppo.make_train_step(PARAMS, spec, cfg, base_key,
                                                env_ids)
    step = jax.jit(train_step)

    ts = ppo.init_train_state(jax.random.PRNGKey(1), PARAMS, spec, cfg, 8,
                              optimizer)
    ts, _ = step(ts)
    ts, _ = step(ts)

    path = str(tmp_path / ('ckpt.npz' if fmt == 'npz' else 'ckpt'))
    checkpoint.save(path, ts)

    # continue original
    ts_cont, m_cont = step(ts)

    # restore and continue
    ts_restored = checkpoint.restore(path, ts)
    np.testing.assert_array_equal(np.asarray(ts.params['actor'][0]['w']),
                                  np.asarray(ts_restored.params['actor'][0]['w']))
    ts_resumed, m_res = step(ts_restored)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ts_cont.params, ts_resumed.params)
    np.testing.assert_array_equal(np.asarray(ts_cont.env_state.dyn.x),
                                  np.asarray(ts_resumed.env_state.dyn.x))
    assert float(m_cont['reward_per_step']) == float(m_res['reward_per_step'])

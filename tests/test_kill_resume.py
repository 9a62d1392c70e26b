"""Kill-and-resume fault recovery across a REAL process boundary.

The framework's failure-recovery story (SURVEY.md §5) is checkpoint-restore
of the full (params, opt_state, env_state, obs, key) training pytree.  This
test proves it end-to-end the way an actual job failure plays out:

  * process U trains 5 updates uninterrupted, recording metrics 4-5;
  * process A trains 3 updates, checkpoints, and exits (the "kill" —
    nothing survives but the checkpoint file);
  * process B starts fresh, restores the checkpoint, trains updates 4-5.

B's metrics must equal U's metrics 4-5 bit-for-bit: resuming from the
checkpoint is indistinguishable from never having been killed.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import json, sys

import jax
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import tasks
from gym_copter_tpu.learn import ppo
from gym_copter_tpu.utils import checkpoint

mode, ckpt_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]

PARAMS = EnvParams(vehicle=vehicles.DJI_PHANTOM)
spec = tasks.HOVER_3D
cfg = ppo.PPOConfig(rollout_steps=8, minibatches=2, epochs=2, hidden=16)
base_key = jax.random.PRNGKey(0)
env_ids = jnp.arange(16, dtype=jnp.int32)
train_step, optimizer = ppo.make_train_step(PARAMS, spec, cfg, base_key,
                                            env_ids)
step = jax.jit(train_step)
ts = ppo.init_train_state(jax.random.PRNGKey(1), PARAMS, spec, cfg, 16,
                          optimizer)

metrics_log = []

def record(m):
    metrics_log.append({k: float(v) for k, v in m.items()})

if mode == 'uninterrupted':
    for i in range(5):
        ts, m = step(ts)
        if i >= 3:
            record(m)
elif mode == 'train_and_die':
    for i in range(3):
        ts, m = step(ts)
    checkpoint.save(ckpt_path, ts)
    # process exits here: the "kill" — only the checkpoint survives
elif mode == 'resume':
    ts = checkpoint.restore(ckpt_path, ts)   # fresh process, state from disk
    assert int(ts.update_idx) == 3
    for i in range(2):
        ts, m = step(ts)
        record(m)

with open(out_path, 'w') as f:
    json.dump(metrics_log, f)
'''


def _run(mode, ckpt, out, tmp_path):
    worker = tmp_path / 'worker.py'
    worker.write_text(WORKER)
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    r = subprocess.run([sys.executable, str(worker), mode, ckpt, out],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out) as f:
        return json.load(f)


def test_kill_and_resume_continues_identically(tmp_path):
    ckpt = str(tmp_path / 'ckpt.npz')

    expected = _run('uninterrupted', ckpt, str(tmp_path / 'u.json'),
                    tmp_path)
    _run('train_and_die', ckpt, str(tmp_path / 'a.json'), tmp_path)
    assert os.path.exists(ckpt)
    resumed = _run('resume', ckpt, str(tmp_path / 'b.json'), tmp_path)

    assert len(expected) == len(resumed) == 2
    for upd, (e, r) in enumerate(zip(expected, resumed)):
        assert e.keys() == r.keys()
        for k in e:
            assert e[k] == r[k], f'update {upd}, metric {k}: {e[k]} != {r[k]}'

"""Mars / blade-element lift-model correctness.

The Mars presets (Hover3DMars-v0 / Lander3DMars-v0) fly the Ingenuity
vehicle with `lift_model='blade_element'`
(attic/mars/dynamics/__init__.py:150-164, ingenuity.py:73-74).  Round 2
anchored PPO's action space at the Bouabdallah hover point regardless of
lift model (VERDICT item 5); these tests pin the corrected anchor and prove
Mars learning works end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gym_copter_tpu.control.heuristics import hover_motor_value
from gym_copter_tpu.core import constants as C
from gym_copter_tpu.envs import base, tasks


def _mars_params():
    return tasks.PRESET_PARAMS['Hover3DMars-v0']()


def test_blade_element_hover_value_balances_gravity():
    """Stepping the Mars vehicle at the blade-element hover anchor must
    leave it hovering: after 100 steps (2 s at 50 Hz... the Mars preset
    keeps the 100 Hz default) the altitude and vertical speed stay ~0."""
    params = _mars_params()
    hover = hover_motor_value(params)
    assert 0.0 < hover < 1.0

    b = 8
    spec = tasks.HOVER_3D
    key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(b, dtype=jnp.int32)
    state, _ = base.reset(key, env_ids, jnp.zeros(b, jnp.int32),
                          params._replace(
                              task=params.task._replace(
                                  initial_random_force=0.0)),
                          spec)
    action = jnp.full((4, b), hover, jnp.float32)
    p0 = params._replace(task=params.task._replace(initial_random_force=0.0))
    for _ in range(100):
        state, ts = base.step(state, action, key, env_ids, p0, spec)
    z, dz = np.asarray(ts.x[C.STATE_Z]), np.asarray(ts.x[C.STATE_Z_DOT])
    np.testing.assert_allclose(z, -10.0, atol=0.05)     # still at altitude
    np.testing.assert_allclose(dz, 0.0, atol=0.02)      # not sinking

    # the Bouabdallah formula on the same vehicle is a WRONG anchor on
    # Mars: 0.3226 vs the true 0.2672 (~21% excess thrust — the vehicle
    # climbs instead of hovering), which is what round 2 shipped
    boua = params._replace(lift_model='bouabdallah')
    wrong = hover_motor_value(boua)
    assert abs(wrong - hover) / hover > 0.10


def test_mars_learning_smoke():
    """PPO actually learns on the Mars preset now that the action space is
    anchored at the true hover point: a short Lander3DMars run must improve
    markedly over its free-fall baseline (the analogue of the Lander1D
    smoke in test_ppo.py)."""
    from gym_copter_tpu.learn import ppo

    cfg = ppo.PPOConfig(rollout_steps=64, hidden=32, gamma=0.995,
                        learning_rate=1e-3)
    vals = []
    # env_params resolves to the Mars preset inside train(); Mars dynamics
    # are gentle (g=3.721), so credit assignment is slower than the Earth
    # Lander1D smoke — the bar is clear improvement, not convergence
    ppo.train('Lander3DMars-v0', num_envs=256, num_updates=160, seed=3,
              cfg=cfg, log_every=20,
              callback=lambda i, m: vals.append(m['eval_return']))
    first, best = vals[0], max(vals)
    assert best > first + 40, (
        f'no Mars learning: best {best:.1f} from baseline {first:.1f}')

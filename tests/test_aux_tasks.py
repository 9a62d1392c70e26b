"""Behavioral tests for the auxiliary attic tasks: AltHold, Takeoff,
Distance, Target (SURVEY.md §2.2)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gym_copter_tpu.core import constants as C, vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.control.heuristics import hover_motor_value
from gym_copter_tpu.envs import base, tasks

PARAMS = EnvParams(vehicle=vehicles.DJI_PHANTOM)
HOVER = hover_motor_value(PARAMS)


def run(spec, action_fn, T, B=2):
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(B, dtype=jnp.int32)
    state, obs = base.reset(key, ids, jnp.zeros(B, jnp.int32), PARAMS, spec,
                            dtype=jnp.float64)
    step = jax.jit(functools.partial(base.step, base_key=key, env_ids=ids,
                                     params=PARAMS, spec=spec))
    rows = []
    for t in range(T):
        state, ts = step(state, action_fn(t, B))
        rows.append((np.asarray(ts.obs), float(ts.reward[0]),
                     bool(ts.done[0]), np.asarray(ts.x)))
    return state, obs, rows


def test_althold_starts_on_target_and_rewards_hold():
    """Starts at the 10 m hold target; obs is positive ENU altitude; +1
    while within tolerance, 0 outside."""
    spec = tasks.ALTHOLD
    # rescaled: hover motor value m = (1+a)/2 -> a = 2m-1
    a_hover = 2 * HOVER - 1

    def act(t, B):
        return jnp.full((1, B), a_hover, jnp.float64)

    state, obs0, rows = run(spec, act, 30)
    assert float(obs0[0, 0]) == 10.0          # positive altitude (ENU)
    assert rows[0][1] == 1.0                   # on target -> +1
    assert not any(r[2] for r in rows)         # never terminates

    def act_full(t, B):                        # full thrust: leaves band
        return jnp.full((1, B), 1.0, jnp.float64)

    state, _, rows = run(spec, act_full, 300)
    assert rows[0][1] == 1.0
    assert rows[-1][1] == 0.0                  # rocketed out of tolerance
    alt = rows[-1][0][0, 0]
    assert alt > 11.0


def test_takeoff_climbs_toward_target():
    """Grounded start; hover+ thrust climbs; shaping delta accumulates to
    ~ -(|alt-5|) - (-|0-5|) ~ +5 as altitude approaches the 5 m target."""
    spec = tasks.TAKEOFF

    def act(t, B):
        return jnp.full((4, B), HOVER * 1.05, jnp.float64)

    state, obs0, rows = run(spec, act, 400)
    assert float(obs0[4, 0]) == 0.0            # grounded (z slot)
    total = sum(r[1] for r in rows)
    alt = -rows[-1][3][C.STATE_Z, 0]
    assert alt > 1.0, alt                      # actually took off
    assert total > 0.5, total                  # shaping rewarded the climb
    assert not any(r[2] for r in rows)


def test_takeoff_zero_action_stays_grounded():
    spec = tasks.TAKEOFF

    def act(t, B):
        return jnp.zeros((4, B), jnp.float64)

    state, _, rows = run(spec, act, 20)
    assert all(r[1] == 0.0 for r in rows)      # no shaping change
    np.testing.assert_array_equal(rows[-1][3][C.STATE_Z], 0.0)


def test_distance_rewards_moving_away():
    """Pitch-forward-ish asymmetric thrust increases sqrt(x^2+y^2);
    the shaping delta must be positive overall."""
    spec = tasks.DISTANCE

    def act(t, B):
        # climb first, then pitch by differential thrust
        m = np.full((4, 1), HOVER * 1.1)
        if t > 100:
            m = np.array([[1.15], [1.05], [1.15], [1.05]]) * HOVER
        return jnp.asarray(np.repeat(m, B, axis=1))

    state, _, rows = run(spec, act, 400)
    total = sum(r[1] for r in rows)
    dist = np.sqrt(rows[-1][3][C.STATE_X, 0] ** 2
                   + rows[-1][3][C.STATE_Y, 0] ** 2)
    assert dist > 0.1, dist
    np.testing.assert_allclose(total, dist, rtol=1e-6)  # telescoping sum


def test_target_obs_has_circling_target():
    spec = tasks.TARGET
    a_hover = 2 * HOVER - 1

    def act(t, B):
        return jnp.full((4, B), a_hover, jnp.float64)

    state, obs0, rows = run(spec, act, 5)
    assert obs0.shape[0] == 15
    # reset obs: theta=0 -> target at (10, 0, 10)
    np.testing.assert_allclose(np.asarray(obs0[12:, 0]), [10.0, 0.0, 10.0])
    # n-th step obs: theta = 0.0025*(n-1)  (target.py:44-47)
    for n, row in enumerate(rows, start=1):
        theta = 0.0025 * (n - 1)
        np.testing.assert_allclose(
            row[0][12:, 0],
            [10 * np.cos(theta), 10 * np.sin(theta), 10.0], rtol=1e-9)
        assert row[1] == 0.0                    # reward stubbed


def test_target_crash_terminates():
    spec = tasks.TARGET

    def act(t, B):
        # moderate climb then motors off -> free-fall crash (dz > 1 at
        # impact).  rescale01: motor m = (1+a)/2, so a = 2m-1.
        v = (2 * 0.02 - 1) if t < 100 else -1.0
        return jnp.full((4, B), v, jnp.float64)

    state, _, rows = run(spec, act, 400)
    assert any(r[2] for r in rows), 'crash must terminate'

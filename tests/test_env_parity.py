"""Golden parity of the full task layer (step/reset/reward/termination)
against the float64 oracle, for every Lander/Hover variant.

Checks per step: observation, reward, done flag, and status — including the
auto-reset boundary semantics (fresh obs returned on done steps).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_copter_tpu.core import constants as C
from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.compat.numpy_oracle import OracleEnv
from gym_copter_tpu.envs import base, tasks

PARAMS = EnvParams(vehicle=vehicles.DJI_PHANTOM)

ORACLE_MOTOR_MAPS = {
    1: lambda m: [m[0]] * 4,
    2: lambda m: [m[0], m[1], m[1], m[0]],
    3: lambda m: [m[0] - m[1] - m[2], m[0] + m[1] + m[2],
                  m[0] + m[1] - m[2], m[0] - m[1] + m[2]],
    4: lambda m: m,
}

VARIANTS = [
    (tasks.LANDER_1D, 'lander'),
    (tasks.LANDER_2D, 'lander'),
    (tasks.LANDER_3D, 'lander'),
    (tasks.HOVER_1D, 'hover'),
    (tasks.HOVER_2D, 'hover'),
    (tasks.HOVER_3D, 'hover'),
]


def make_oracle(spec):
    return OracleEnv(PARAMS, task_kind=spec.kind,
                     obs_indices=spec.obs_indices,
                     action_size=spec.action_size,
                     motor_map=ORACLE_MOTOR_MAPS[spec.action_size])


@functools.lru_cache(maxsize=None)
def jitted_step(spec):
    base_key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(1, dtype=jnp.int32)
    return jax.jit(functools.partial(base.step, base_key=base_key,
                                     env_ids=env_ids, params=PARAMS,
                                     spec=spec))


@pytest.mark.parametrize('spec,kind', VARIANTS)
def test_variant_trajectory_parity(spec, kind):
    """Same injected reset force, same scripted actions -> same trajectory,
    rewards, and done flags until the episode ends."""
    rng = np.random.default_rng(hash(spec.name) % 2**31)
    force = np.zeros(6)
    force[:3] = rng.uniform(-30, 30, 3)

    oracle = make_oracle(spec)
    o_obs, _ = oracle.reset(perturb_force=force)

    state, j_obs = base.reset(
        jax.random.PRNGKey(0), jnp.arange(1, dtype=jnp.int32),
        jnp.zeros(1, jnp.int32), PARAMS, spec,
        perturb_force=force[:, None], dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(j_obs[:, 0]), o_obs,
                               rtol=1e-12, atol=1e-12)

    step_fn = jitted_step(spec)
    actions = rng.uniform(0, 0.05, (400, spec.action_size))
    for t in range(400):
        o_obs, o_rew, o_done, _, _ = oracle.step(actions[t])
        state, ts = step_fn(state, jnp.asarray(actions[t][:, None]))
        assert bool(ts.done[0]) == bool(o_done), f'{spec.name} step {t}'
        np.testing.assert_allclose(float(ts.reward[0]), o_rew,
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f'{spec.name} step {t}')
        if o_done:
            break
        np.testing.assert_allclose(np.asarray(ts.obs[:, 0]), o_obs,
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f'{spec.name} step {t}')


def test_lander3d_constant_thrust_lands_with_bonus():
    """The shipped demo heuristic (constant MOTORVAL=1.625e-2 on all four
    motors, lander.py:21,42) must land near the target and collect the
    +100 inside-radius bonus under a mild perturbation."""
    spec = tasks.LANDER_3D
    force = np.array([5.0, -4.0, 8.0, 0, 0, 0])
    state, obs = base.reset(
        jax.random.PRNGKey(0), jnp.arange(1, dtype=jnp.int32),
        jnp.zeros(1, jnp.int32), PARAMS, spec,
        perturb_force=force[:, None], dtype=jnp.float64)
    step_fn = jitted_step(spec)
    action = jnp.full((4, 1), 1.625e-2, jnp.float64)
    total = 0.0
    for t in range(1000):
        state, ts = step_fn(state, action)
        total += float(ts.reward[0])
        if bool(ts.done[0]):
            break
    assert bool(ts.done[0]), 'episode must terminate'
    assert total > 50, f'safe landing should score well, got {total}'


def test_autoreset_restarts_episode():
    """After done, the carried state must be a fresh episode: steps=1,
    airborne at initial altitude, new pending perturbation."""
    spec = tasks.LANDER_3D
    step_fn = jitted_step(spec)
    state, _ = base.reset(
        jax.random.PRNGKey(0), jnp.arange(1, dtype=jnp.int32),
        jnp.zeros(1, jnp.int32), PARAMS, spec, dtype=jnp.float64)
    action = jnp.full((4, 1), 1.625e-2, jnp.float64)
    for t in range(1500):
        state, ts = step_fn(state, action)
        if bool(ts.done[0]):
            break
    assert bool(ts.done[0])
    assert int(state.steps[0]) == 1
    assert int(state.episode[0]) == 1
    assert int(state.dyn.status[0]) == C.STATUS_AIRBORNE
    np.testing.assert_allclose(float(state.dyn.x[C.STATE_Z, 0]),
                               -PARAMS.task.initial_altitude)
    assert np.any(np.asarray(state.dyn.perturb[:3, 0]) != 0)


def test_hover_reward_is_one_per_step():
    spec = tasks.HOVER_3D
    step_fn = jitted_step(spec)
    state, _ = base.reset(
        jax.random.PRNGKey(0), jnp.arange(1, dtype=jnp.int32),
        jnp.zeros(1, jnp.int32), PARAMS, spec,
        perturb_force=np.zeros((6, 1)), dtype=jnp.float64)
    # hover thrust ~ sqrt(M*g / (4*B)) scaled: just check a few steps aloft
    action = jnp.full((4, 1), 1.66e-2, jnp.float64)
    for _ in range(50):
        state, ts = step_fn(state, action)
        assert float(ts.reward[0]) == 1.0
        assert not bool(ts.done[0])


def test_out_of_bounds_penalty_subtracts():
    """OOB subtracts 100 from the shaped reward; tilt replaces it with -100
    (task.py:111-118)."""
    spec = tasks.LANDER_3D
    step_fn = jitted_step(spec)
    # hurl the copter sideways so it exits the 10 m bounds
    force = np.array([400.0, 0.0, -50.0, 0, 0, 0])
    state, _ = base.reset(
        jax.random.PRNGKey(0), jnp.arange(1, dtype=jnp.int32),
        jnp.zeros(1, jnp.int32), PARAMS, spec,
        perturb_force=force[:, None], dtype=jnp.float64)
    oracle = make_oracle(spec)
    oracle.reset(perturb_force=force)
    action = np.full(4, 1.625e-2)
    for t in range(1000):
        o_obs, o_rew, o_done, _, _ = oracle.step(action)
        state, ts = step_fn(state, jnp.asarray(action[:, None]))
        np.testing.assert_allclose(float(ts.reward[0]), o_rew,
                                   rtol=1e-9, atol=1e-9)
        assert bool(ts.done[0]) == bool(o_done)
        if o_done:
            break
    assert o_done and o_rew < -50  # the -100 OOB penalty dominated


def test_float64_bit_equality_deterministic_regime():
    """The BASELINE tightened claim (VERDICT round 1 item 5): with an
    injected perturbation and scripted actions, the float64 JAX step equals
    the float64 oracle BIT-FOR-BIT over a full episode — `assert_array_equal`,
    no tolerance.  (The oracle, in turn, is bit-exact vs the actual
    reference: test_reference_crosscheck.py.)  On done steps the JAX obs
    belongs to the auto-reset episode, so the pre-reset state is checked
    through `ts.x` instead."""
    spec = tasks.LANDER_3D
    force = np.array([5.0, -12.0, 3.0, 0.0, 0.0, 0.0])

    oracle = OracleEnv(PARAMS)
    o_obs, _ = oracle.reset(perturb_force=force)

    key = jax.random.PRNGKey(0)
    ids = jnp.arange(1, dtype=jnp.int32)
    state, j_obs = base.reset(key, ids, jnp.zeros(1, jnp.int32), PARAMS,
                              spec, perturb_force=force[:, None],
                              dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(j_obs[:, 0]), o_obs)

    rng = np.random.default_rng(0)
    done = False
    for t in range(1000):
        action = rng.uniform(0, 0.05, 4)
        o_obs, o_rew, o_done, _, _ = oracle.step(action)
        state, ts = base.step(state, jnp.asarray(action[:, None]), key, ids,
                              PARAMS, spec)
        assert bool(ts.done[0]) == o_done, f'step {t}'
        jax_obs = np.asarray(ts.x[:, 0])[np.asarray(spec.obs_indices)]
        np.testing.assert_array_equal(jax_obs, o_obs, err_msg=f'step {t}')
        assert float(ts.reward[0]) == float(o_rew), f'step {t}'
        if o_done:
            done = True
            break
    assert done, 'episode must terminate within 1000 steps'

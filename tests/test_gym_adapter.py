"""End-to-end tests of the Gymnasium adapter — the front door for every
external learner the reference supported (NEAT/TD3 drive the env through
gym.make: attic/neat/config/lander2d:20-22, attic/drl/3dtest.py:62-105).

Covers: API conformance (gymnasium's own checker) for every registered id,
the legacy-seeding bit-replay claim against the actual reference, the
visual wrapper, `set_altitude`, and a scripted external-style learner loop
through `gymnasium.make`.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

import gymnasium as gym

from gym_copter_tpu.compat.gym_adapter import (GymCopterEnv,
                                               GymCopterVisualEnv)
from gym_copter_tpu.envs import tasks

REFERENCE = '/root/reference'

ALL_IDS = sorted(tasks.ALL_TASKS)


# ---------------------------------------------------------------------------
# API conformance
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('name', ALL_IDS)
def test_check_env_conformance(name):
    """gymnasium's env checker over every registered id (spaces, reset/step
    signatures, determinism of spaces, dtype contracts)."""
    from gymnasium.utils.env_checker import check_env
    env = gym.make(f'GymCopterTpu/{name}').unwrapped
    check_env(env, skip_render_check=True)
    env.close()


def test_gymnasium_make_random_agent_episode():
    """A third-party-style random-agent loop through gymnasium.make — the
    exact usage pattern of the reference's external learners
    (attic/drl/3dtest.py:62-105)."""
    env = gym.make('GymCopterTpu/Lander-v0')
    obs, info = env.reset(seed=7)
    assert obs.shape == (10,) and obs.dtype == np.float32
    total, steps = 0.0, 0
    done = False
    while not done and steps < 1200:
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        total += float(reward)
        done = terminated or truncated
        steps += 1
    assert done, 'episode must terminate under the registry step cap'
    env.close()


def test_external_style_learner_loop():
    """A minimal scripted 'learner' (hill-climbing over a constant motor
    value) running multiple episodes through the adapter, as an external
    framework would."""
    env = GymCopterEnv('Lander1D-v0')

    def run_episode(motor):
        obs, _ = env.reset()
        total = 0.0
        for _ in range(500):
            obs, r, term, trunc, _ = env.step(np.array([motor], np.float32))
            total += r
            if term or trunc:
                break
        return total

    best_motor, best_ret = 0.0, -np.inf
    for motor in (0.0, 1.2e-2, 1.625e-2, 2.0e-2):
        ret = run_episode(motor)
        if ret > best_ret:
            best_motor, best_ret = motor, ret
    # braking thrust near the hover value must beat free fall
    assert best_motor != 0.0
    env.close()


# ---------------------------------------------------------------------------
# Legacy seeding: bit-replay of the reference's trajectories
# ---------------------------------------------------------------------------

@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'gym_copter')),
    reason='reference checkout not available')
@pytest.mark.parametrize('seed', [3, 99])
def test_legacy_seeding_replays_reference_lander(seed):
    """`legacy_seeding=True` + float64 replays the reference Lander
    trajectory for the same seed: float32 observations bit-identical at
    every step, same termination step, rewards equal to <=1 ULP in float64
    (XLA's CPU backend may contract mul+add chains into FMAs, so the
    float64 reward arithmetic can differ from numpy's in the last bit; the
    numpy oracle — not the JAX engine — is the bit-for-bit twin, see
    test_reference_crosscheck.py)."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from gym_copter.envs.lander import Lander

    ref = Lander()
    ours = GymCopterEnv('Lander-v0', legacy_seeding=True, dtype=jnp.float64)

    np.random.seed(seed)
    ref_obs, _ = ref.reset()
    our_obs, _ = ours.reset(seed=seed)
    np.testing.assert_array_equal(our_obs, np.asarray(ref_obs))

    rng = np.random.default_rng(seed)
    for t in range(1000):
        action = (np.full(4, 1.625e-2) if t % 2 == 0
                  else rng.uniform(0, 0.05, 4))
        ref_obs, ref_rew, ref_done, _, _ = ref.step(action)
        our_obs, our_rew, our_done, _, _ = ours.step(action)
        assert our_done == ref_done, f'step {t}'
        if our_done:
            break  # on done the adapter obs belongs to the fresh episode
        np.testing.assert_array_equal(our_obs, np.asarray(ref_obs),
                                      err_msg=f'step {t}')
        np.testing.assert_allclose(float(our_rew), float(ref_rew),
                                   rtol=1e-12, atol=1e-13,
                                   err_msg=f'step {t}')
    assert ref_done


# ---------------------------------------------------------------------------
# set_altitude / visual wrapper
# ---------------------------------------------------------------------------

def test_set_altitude_changes_start_pose_without_rejit():
    env = GymCopterEnv('Lander-v0')
    obs, _ = env.reset(perturb=False)
    assert obs[4] == pytest.approx(-10.0)      # NED z at default 10 m

    handle_before = env._env                   # same jitted handle reused
    env.set_altitude(25.0)
    obs, _ = env.reset(perturb=False)
    assert obs[4] == pytest.approx(-25.0)
    assert env._env is handle_before


def test_visual_env_produces_images():
    env = GymCopterVisualEnv('Lander-v0', res=16)
    env.reset(perturb=False)
    frames = []
    for _ in range(5):
        _, _, term, _, _ = env.step(np.full(4, 1.625e-2, np.float32))
        assert env.image.shape == (16, 16)
        frames.append(env.image.copy())
        if term:
            break
    assert any(f.any() for f in frames), 'pad must be visible from 10 m'
    env.close()


def test_visual_env_dvs_events():
    env = GymCopterVisualEnv('Lander-v0', dvs=True, res=16)
    env.reset(perturb=False)
    env.step(np.zeros(4, np.float32))          # first frame: no events
    assert not env.image.any()
    for _ in range(30):                        # free fall -> pad grows
        _, _, term, _, _ = env.step(np.zeros(4, np.float32))
        if term:
            break
    assert set(np.unique(env.image)).issubset({-1.0, 0.0, 1.0})
    env.close()


def test_registry_ids_all_resolve():
    for name in ALL_IDS:
        assert f'GymCopterTpu/{name}' in gym.registry


def test_step_returns_terminal_observation():
    """Gymnasium contract: on the done step, step() must return the
    TERMINAL observation (reference task.py:133), not the auto-reset next
    episode's.  Free-fall the deterministic simple lander into a crash and
    check the returned obs against the terminal pose."""
    from gym_copter_tpu.compat.gym_adapter import GymCopterEnv
    env = GymCopterEnv('Lander3DSimple-v0')
    obs, _ = env.reset(seed=0)
    start_z = float(obs[4])
    for _ in range(600):
        obs, _, done, _, _ = env.step(np.array([-1.0, 0.0, 0.0]))
        if done:
            break
    assert done, 'free fall should crash'
    # terminal obs reflects the finished step's state (same as env.pose),
    # not the fresh start altitude
    np.testing.assert_allclose(float(obs[4]), float(env.pose[2]), rtol=1e-6)
    assert abs(float(obs[4]) - start_z) > 1.0, (
        'done-step obs must not be the auto-reset start state')
    env.close()

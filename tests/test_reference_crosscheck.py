"""Validate the numpy oracle against the *actual* reference implementation.

This is the root of the parity chain: the JAX engine is tested against the
oracle (test_dynamics_parity / test_env_parity), and the oracle is tested
here against simondlevy/gym-copter itself, executed from /root/reference.
Skipped automatically when the reference checkout is not present (e.g. on a
user machine); the oracle-vs-JAX tests still run everywhere.

Uses the reference's own global-np.random seeding (task.py:71-75,199-202),
so the perturbation byte streams — and therefore entire trajectories — must
agree bit-for-bit in float64.
"""

import os
import sys

import numpy as np
import pytest

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.compat.numpy_oracle import OracleEnv

REFERENCE = '/root/reference'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, 'gym_copter')),
    reason='reference checkout not available')


def make_reference_lander():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from gym_copter.envs.lander import Lander
    return Lander()


@pytest.mark.parametrize('seed', [0, 7, 123])
def test_oracle_matches_reference_lander3d(seed):
    ref = make_reference_lander()
    ours = OracleEnv(EnvParams(vehicle=vehicles.DJI_PHANTOM))

    np.random.seed(seed)
    ref_obs, _ = ref.reset()
    np.random.seed(seed)
    our_obs, _ = ours.reset()
    np.testing.assert_array_equal(np.asarray(our_obs, np.float32),
                                  np.asarray(ref_obs))

    rng = np.random.default_rng(seed)
    for t in range(1000):
        action = (np.full(4, 1.625e-2) if t % 2 == 0
                  else rng.uniform(0, 0.05, 4))
        ref_obs, ref_rew, ref_done, _, _ = ref.step(action)
        our_obs, our_rew, our_done, _, _ = ours.step(action)
        assert our_done == ref_done, f'step {t}'
        np.testing.assert_array_equal(
            np.asarray(our_obs, np.float32), np.asarray(ref_obs),
            err_msg=f'step {t}')
        assert float(our_rew) == float(ref_rew), f'step {t}'
        if ref_done:
            break
    assert ref_done, 'episode should terminate within 1000 steps'

"""Frame-conversion / accessor utility surface of the dynamics core.

The reference declares `_inertialToBody`, `_bodyToInertial`,
`_eulerToQuaternion`, `getState`, and `getTime` as API of its Dynamics class
(gym_copter/dynamics/__init__.py:199-221, 304-337) even though its own env
flow never calls them.  The batched equivalents live in core/dynamics.py;
here they are crosschecked against the *actual* reference implementation
(executed from /root/reference) and property-tested for rotation-matrix
consistency.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from gym_copter_tpu.core import dynamics

REFERENCE = '/root/reference'

have_reference = os.path.isdir(os.path.join(REFERENCE, 'gym_copter'))


def _reference_dynamics_class():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from gym_copter.dynamics import Dynamics
    return Dynamics


def _random_angles_and_vectors(seed, n):
    rng = np.random.RandomState(seed)
    angles = rng.uniform(-np.pi, np.pi, size=(3, n))
    vecs = rng.uniform(-10, 10, size=(3, n))
    return angles, vecs


@pytest.mark.skipif(not have_reference, reason='reference checkout absent')
@pytest.mark.parametrize('seed', [0, 42])
def test_inertial_to_body_matches_reference(seed):
    Dynamics = _reference_dynamics_class()
    angles, vecs = _random_angles_and_vectors(seed, 16)
    ours = np.asarray(dynamics.inertial_to_body(
        jnp.asarray(vecs), jnp.asarray(angles[0]), jnp.asarray(angles[1]),
        jnp.asarray(angles[2])))
    for i in range(angles.shape[1]):
        ref = Dynamics._inertialToBody(vecs[:, i], angles[:, i])
        np.testing.assert_allclose(ours[:, i], ref, rtol=2e-5, atol=1e-5)


@pytest.mark.skipif(not have_reference, reason='reference checkout absent')
@pytest.mark.parametrize('seed', [1, 99])
def test_body_to_inertial_matches_reference(seed):
    Dynamics = _reference_dynamics_class()
    angles, vecs = _random_angles_and_vectors(seed, 16)
    ours = np.asarray(dynamics.body_to_inertial(
        jnp.asarray(vecs), jnp.asarray(angles[0]), jnp.asarray(angles[1]),
        jnp.asarray(angles[2])))
    for i in range(angles.shape[1]):
        # the reference signature takes (body, rotation, inertial) but the
        # third argument is unused (:314-328) — it returns np.dot(R, body)
        ref = Dynamics._bodyToInertial(vecs[:, i], angles[:, i], None)
        np.testing.assert_allclose(ours[:, i], ref, rtol=2e-5, atol=1e-5)


@pytest.mark.skipif(not have_reference, reason='reference checkout absent')
@pytest.mark.parametrize('seed', [2, 77])
def test_euler_to_quaternion_matches_reference(seed):
    Dynamics = _reference_dynamics_class()
    angles, _ = _random_angles_and_vectors(seed, 16)
    ours = np.asarray(dynamics.euler_to_quaternion(
        jnp.asarray(angles[0]), jnp.asarray(angles[1]),
        jnp.asarray(angles[2])))
    for i in range(angles.shape[1]):
        ref = np.asarray(
            Dynamics._eulerToQuaternion(angles[:, i])).reshape(4)
        np.testing.assert_allclose(ours[:, i], ref, rtol=2e-5, atol=1e-6)


def test_rotation_round_trip_and_consistency():
    """body_to_inertial is the inverse of inertial_to_body (the rotation is
    orthonormal), and body_z_to_inertial — the optimized column used by the
    physics step — agrees with the full body_to_inertial on (0, 0, z)."""
    angles, vecs = _random_angles_and_vectors(5, 64)
    phi, theta, psi = (jnp.asarray(a) for a in angles)
    v = jnp.asarray(vecs)
    body = dynamics.inertial_to_body(v, phi, theta, psi)
    back = dynamics.body_to_inertial(body, phi, theta, psi)
    np.testing.assert_allclose(np.asarray(back), vecs, rtol=1e-4, atol=1e-4)

    z = v[2]
    zx, zy, zz = dynamics.body_z_to_inertial(z, phi, theta, psi)
    full = dynamics.body_to_inertial(
        jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z]),
        phi, theta, psi)
    np.testing.assert_allclose(np.asarray(jnp.stack([zx, zy, zz])),
                               np.asarray(full), rtol=1e-5, atol=1e-5)


def test_quaternion_unit_norm():
    angles, _ = _random_angles_and_vectors(6, 64)
    q = dynamics.euler_to_quaternion(*(jnp.asarray(a) for a in angles))
    np.testing.assert_allclose(np.asarray(jnp.sum(q * q, axis=0)),
                               np.ones(64), rtol=1e-5)


def test_state_dict_and_time_accessors():
    """`state_dict` mirrors Dynamics.getState's key order (:199-207);
    `get_time` is ticks*dt and must NOT advance on the touchdown
    early-return step (:177 vs :219-221)."""
    from gym_copter_tpu.core import vehicles
    from gym_copter_tpu.core.types import EnvParams

    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    x0 = np.zeros((12, 3), np.float32)
    x0[4] = -10.0  # airborne
    st = dynamics.init_state(jnp.asarray(x0))
    d = dynamics.state_dict(st)
    assert list(d.keys()) == ['x', 'dx', 'y', 'dy', 'z', 'dz',
                              'phi', 'dphi', 'theta', 'dtheta',
                              'psi', 'dpsi']
    np.testing.assert_allclose(np.asarray(d['z']), x0[4])
    assert np.all(np.asarray(dynamics.get_time(st, 0.01)) == 0.0)

    motors = jnp.full((4, 3), 0.6, jnp.float32)
    st1 = dynamics.step(st, motors, params.vehicle, params.world, 0.01)
    np.testing.assert_allclose(np.asarray(dynamics.get_time(st1, 0.01)),
                               0.01, rtol=1e-6)

    # touchdown: z > 0 and descending -> early return, clock frozen
    xt = np.zeros((12, 3), np.float32)
    xt[4], xt[5] = 0.5, 0.5
    st_td = dynamics.init_state(jnp.asarray(xt))._replace(
        status=jnp.full((3,), 3, jnp.int32))  # force AIRBORNE
    st_td1 = dynamics.step(st_td, motors, params.vehicle, params.world, 0.01)
    assert np.all(np.asarray(dynamics.get_time(st_td1, 0.01)) == 0.0)

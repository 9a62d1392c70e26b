"""Golden parity: branchless JAX dynamics vs the float64 branchy oracle.

Covers SURVEY.md §2.4's parity traps: the status machine (including the
touchdown early-return that skips integration, keeps the perturbation, and
freezes the clock), the perturbation double-count, and the Eq.12 sign
quirks.  States are exercised across all four statuses with randomized
inputs; agreement is required to ~ULP in float64 and exact for statuses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_copter_tpu.core import constants as C
from gym_copter_tpu.core import dynamics, vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.compat.numpy_oracle import OracleDynamics

PARAMS = EnvParams(vehicle=vehicles.DJI_PHANTOM)
DT = PARAMS.task.dt


def run_oracle(x0, forces, motor_seq):
    d = OracleDynamics(PARAMS)
    d.set_state(x0)
    d.apply_force(forces)
    xs, statuses, ticks = [], [], []
    for m in motor_seq:
        d.step(m)
        xs.append(d.x.copy())
        statuses.append(d.status)
        ticks.append(d.ticks)
    return np.array(xs), np.array(statuses), np.array(ticks)


@jax.jit
def _scan_steps(ds, motors):
    def body(ds, m):
        ds = dynamics.step(ds, m, PARAMS.vehicle, PARAMS.world, DT)
        return ds, (ds.x, ds.status, ds.ticks)

    return jax.lax.scan(body, ds, motors)


def run_jax(x0, forces, motor_seq):
    ds = dynamics.init_state(jnp.asarray(x0), dtype=jnp.float64)
    ds = dynamics.perturb(ds, jnp.asarray(forces), PARAMS.vehicle)
    motors = jnp.asarray(np.array(motor_seq), jnp.float64)
    _, (xs, statuses, ticks) = _scan_steps(ds, motors)
    return np.asarray(xs), np.asarray(statuses), np.asarray(ticks)


def assert_trajectories_match(x0, forces, motor_seq):
    ox, os_, ot = run_oracle(x0, forces, motor_seq)
    jx, js, jt = run_jax(x0, forces, motor_seq)
    np.testing.assert_array_equal(js, os_)
    np.testing.assert_array_equal(jt, ot)
    np.testing.assert_allclose(jx, ox, rtol=1e-12, atol=1e-12)


def test_hover_flight_parity():
    """Constant near-hover thrust from altitude 10, with a random kick."""
    x0 = np.zeros(12)
    x0[C.STATE_Z] = -10.0
    forces = np.array([12.3, -7.7, 21.0, 0, 0, 0])
    motors = [np.full(4, 1.625e-2)] * 400  # lander.py:21 MOTORVAL
    assert_trajectories_match(x0, forces, motors)


def test_random_motor_parity():
    rng = np.random.default_rng(42)
    x0 = np.zeros(12)
    x0[C.STATE_Z] = -10.0
    forces = rng.uniform(-30, 30, 6)
    motors = list(rng.uniform(0, 0.05, (300, 4)))
    assert_trajectories_match(x0, forces, motors)


def test_touchdown_and_leveling_sequence():
    """Gentle descent to touchdown: AIRBORNE -> LEVELING -> LANDED, with the
    early-return step (no integration, no perturb clear, frozen clock)."""
    x0 = np.zeros(12)
    x0[C.STATE_Z] = -0.05
    x0[C.STATE_Z_DOT] = 0.5   # descending slowly (NED: +dz is down)
    x0[C.STATE_PHI] = 0.1
    motors = [np.full(4, 1.0e-2)] * 40
    assert_trajectories_match(x0, np.zeros(6), motors)
    # end state must be LANDED with zeroed roll/pitch
    jx, js, _ = run_jax(x0, np.zeros(6), motors)
    assert js[-1] == C.STATUS_LANDED
    assert jx[-1][C.STATE_PHI] == 0.0 and jx[-1][C.STATE_THETA] == 0.0


@pytest.mark.parametrize('mode', ['fast_dz', 'fast_dy', 'tilted'])
def test_crash_classification(mode):
    """Each crash criterion (dz > 1, |dy| > 2, |phi| > pi/4) — using the
    reference's axis-labeling quirk (dynamics/__init__.py:165-170)."""
    x0 = np.zeros(12)
    x0[C.STATE_Z] = -0.01
    x0[C.STATE_Z_DOT] = 0.5
    if mode == 'fast_dz':
        x0[C.STATE_Z_DOT] = 3.0
    elif mode == 'fast_dy':
        x0[C.STATE_Y_DOT] = 2.5
    else:
        x0[C.STATE_PHI] = 1.0
    motors = [np.zeros(4)] * 10
    assert_trajectories_match(x0, np.zeros(6), motors)
    _, js, _ = run_jax(x0, np.zeros(6), motors)
    assert js[-1] == C.STATUS_CRASHED


def test_landed_takeoff_same_step():
    """LANDED -> AIRBORNE promotion integrates on the same call (the
    reference's `elif` runs on the *updated* status, dynamics :147-159)."""
    x0 = np.zeros(12)  # on ground, z = 0 -> LANDED
    motors = [np.full(4, 0.5)] * 5  # strong thrust: immediate takeoff
    assert_trajectories_match(x0, np.zeros(6), motors)
    jx, js, _ = run_jax(x0, np.zeros(6), motors)
    assert js[0] == C.STATUS_AIRBORNE
    assert jx[0][C.STATE_Z_DOT] != 0.0  # integrated on the promotion step


def test_landed_insufficient_thrust_stays_put():
    x0 = np.zeros(12)
    motors = [np.full(4, 1e-4)] * 5  # not enough to overcome gravity
    jx, js, _ = run_jax(x0, np.zeros(6), motors)
    assert (js == C.STATUS_LANDED).all()
    np.testing.assert_array_equal(jx[-1], x0)


def test_perturb_double_count_magnitude():
    """One airborne step from rest with a pure force perturbation and zero
    thrust: dz picks up dt * (g + 2 * F/M) — the double-count quirk."""
    x0 = np.zeros(12)
    x0[C.STATE_Z] = -10.0
    f = np.array([0.0, 0.0, 13.8, 0, 0, 0])
    jx, _, _ = run_jax(x0, f, [np.zeros(4)])
    expected_dz = DT * (C.EARTH_G + 2 * 13.8 / PARAMS.vehicle.M)
    np.testing.assert_allclose(jx[0][C.STATE_Z_DOT], expected_dz, rtol=1e-12)


def test_batch_polymorphism():
    """The same dynamics code must produce identical results for (12,) and
    (12, B) layouts — the batched path IS the single path."""
    rng = np.random.default_rng(7)
    B = 16
    x0s = rng.normal(0, 1, (B, 12))
    x0s[:, C.STATE_Z] -= 5.0
    forces = rng.uniform(-30, 30, (B, 6))
    motors = rng.uniform(0, 0.05, (20, B, 4))

    # batched run
    ds = dynamics.init_state(jnp.asarray(x0s.T), dtype=jnp.float64)
    ds = dynamics.perturb(ds, jnp.asarray(forces.T), PARAMS.vehicle)
    for t in range(20):
        ds = dynamics.step(ds, jnp.asarray(motors[t].T), PARAMS.vehicle,
                           PARAMS.world, DT)

    # per-env scalar runs
    for i in range(B):
        d1 = dynamics.init_state(jnp.asarray(x0s[i]), dtype=jnp.float64)
        d1 = dynamics.perturb(d1, jnp.asarray(forces[i]), PARAMS.vehicle)
        for t in range(20):
            d1 = dynamics.step(d1, jnp.asarray(motors[t, i]), PARAMS.vehicle,
                               PARAMS.world, DT)
        np.testing.assert_allclose(np.asarray(ds.x[:, i]), np.asarray(d1.x),
                                   rtol=1e-12, atol=1e-12)
        assert int(ds.status[i]) == int(d1.status)


def test_mars_blade_element_parity():
    """The attic mars variant: blade-element lift, Mars world params, live
    Omega gyroscopic terms (attic/mars/dynamics/__init__.py:135-164,
    280-289) — JAX vs oracle."""
    from gym_copter_tpu.core.types import EnvParams
    mars = EnvParams(vehicle=vehicles.INGENUITY, world=vehicles.MARS,
                     lift_model='blade_element')
    rng = np.random.default_rng(3)
    x0 = np.zeros(12)
    x0[C.STATE_Z] = -10.0
    forces = rng.uniform(-5, 5, 6)
    motors = rng.uniform(0.3, 0.7, (200, 4))

    d = OracleDynamics(mars)
    d.set_state(x0)
    d.apply_force(forces)
    oxs = []
    for m in motors:
        d.step(m)
        oxs.append(d.x.copy())
    oxs = np.array(oxs)

    @jax.jit
    def scan(ds, ms):
        def body(ds, m):
            ds = dynamics.step(ds, m, mars.vehicle, mars.world, mars.task.dt,
                               lift_model='blade_element')
            return ds, ds.x
        return jax.lax.scan(body, ds, ms)

    ds = dynamics.init_state(jnp.asarray(x0), dtype=jnp.float64)
    ds = dynamics.perturb(ds, jnp.asarray(forces), mars.vehicle)
    _, jxs = scan(ds, jnp.asarray(motors))
    np.testing.assert_allclose(np.asarray(jxs), oxs, rtol=1e-10, atol=1e-10)


def test_mars_gravity_weaker_descent():
    """Free fall accelerates ~2.6x slower on Mars."""
    from gym_copter_tpu.core.types import EnvParams
    mars = EnvParams(vehicle=vehicles.INGENUITY, world=vehicles.MARS,
                     lift_model='blade_element')
    x0 = np.zeros(12); x0[C.STATE_Z] = -10.0
    ds = dynamics.init_state(jnp.asarray(x0), dtype=jnp.float64)
    for _ in range(10):
        ds = dynamics.step(ds, jnp.zeros(4), mars.vehicle, mars.world,
                           0.01, lift_model='blade_element')
    np.testing.assert_allclose(float(ds.x[C.STATE_Z_DOT]),
                               10 * 0.01 * C.MARS_G, rtol=1e-12)

"""PID stack: scalar-oracle parity and end-to-end expert-landing behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_copter_tpu.control import heuristics, pid
from gym_copter_tpu.core import constants as C, vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks


class ScalarPid:
    """Straight transcription of the reference accumulator semantics
    (attic/mars/pidcontrollers/__init__.py:12-73) as a test oracle."""

    def __init__(self, kp, ki, kd, windup_max=0.2):
        self.kp, self.ki, self.kd, self.windup = kp, ki, kd, windup_max
        self.error_i = 0.0
        self.last_error = 0.0
        self.d1 = 0.0
        self.d2 = 0.0

    def compute(self, target, actual):
        error = target - actual
        out = error * self.kp
        if self.ki > 0:
            self.error_i = min(max(self.error_i + error, -self.windup),
                               self.windup)
            out += self.error_i * self.ki
        if self.kd > 0:
            delta = error - self.last_error
            out += (self.d1 + self.d2 + delta) * self.kd
            self.d2 = self.d1
            self.d1 = delta
            self.last_error = error
        return out


def test_pid_compute_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    gains = pid.PidGains(kp=0.7, ki=1.3, kd=0.4, windup_max=0.2)
    oracle = ScalarPid(0.7, 1.3, 0.4)
    state = pid.pid_init(1, jnp.float64)
    for _ in range(100):
        target, actual = rng.normal(size=2)
        state, demand = pid.pid_compute(
            state, gains, jnp.full((1,), target), jnp.full((1,), actual))
        expected = oracle.compute(target, actual)
        np.testing.assert_allclose(float(demand[0]), expected, rtol=1e-12)


def test_angular_velocity_reset_on_fast_rotation():
    """errorI and lastError reset above 40 deg/s; smoothing window kept
    (reference :60-64, 141-146)."""
    oracle = ScalarPid(1.0, 0.0, 1.0, windup_max=6.0)
    state = pid.pid_init(1, jnp.float64)
    seq = [0.1, 0.3, 0.9, 0.2, 0.05]  # 0.9 rad/s > 40 deg/s triggers reset
    for v in seq:
        if abs(v) > np.radians(40):
            oracle.error_i = 0.0
            oracle.last_error = 0.0
        expected = oracle.compute(0.0, v)
        state, demand = pid.angular_velocity(state, jnp.full((1,), v))
        np.testing.assert_allclose(float(demand[0]), expected, rtol=1e-12)


def test_altitude_hold_demand_sign():
    """Below target altitude the controller must demand climb (positive)."""
    state = pid.setpoint_init(1, jnp.float64)
    state, demand = pid.altitude_hold(state, jnp.full((1,), -2.0),
                                      jnp.zeros((1,)))  # at 2 m, target 5 m
    assert float(demand[0]) > 0


def test_lander3d_pid_reaches_pad():
    """The reference expert policy (SURVEY.md §3.5), with the mixer output
    scaled for the active vehicle's hover throttle, must bring the copter
    down to the pad (|z| < 1 m, within the 2 m target radius) and score
    near the learning targets (~300, attic/drl/Makefile:2-5).  The descent
    law z*1.15+dz*1.33 approaches the ground asymptotically, so episodes
    may end by max_steps hovering at the pad rather than by touchdown."""
    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    B = 8
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(B, dtype=jnp.int32)
    state, obs = base.reset(key, ids, jnp.zeros(B, jnp.int32), params, spec,
                            dtype=jnp.float64)
    pol_state, policy = heuristics.lander3d_pid(B, jnp.float64, params=params)

    @jax.jit
    def run(state, pol_state, obs):
        def body(carry, _):
            st, ps, obs, total, done_seen, end_x = carry
            ps, action = policy(ps, obs)
            st, ts = base.step(st, action, key, ids, params, spec)
            first_done = ts.done & ~done_seen
            end_x = jnp.where(first_done, ts.x, end_x)
            total = total + jnp.where(done_seen, 0.0, ts.reward)
            return (st, ps, ts.obs, total, done_seen | ts.done, end_x), None

        init = (state, pol_state, obs, jnp.zeros(B, jnp.float64),
                jnp.zeros(B, bool), jnp.zeros((12, B), jnp.float64))
        (st, ps, obs, total, done_seen, end_x), _ = jax.lax.scan(
            body, init, None, length=1000)
        return total, done_seen, end_x

    total, done_seen, end_x = run(state, pol_state, obs)
    assert bool(done_seen.all()), 'all envs must finish an episode'
    on_pad = ((jnp.abs(end_x[C.STATE_Z]) < 1.0)
              & (jnp.sqrt(end_x[C.STATE_X] ** 2
                          + end_x[C.STATE_Y] ** 2) < 2.0))
    assert int(on_pad.sum()) >= 6, np.asarray(end_x)
    assert float(jnp.median(total)) > 150, np.asarray(total)


def test_hover3d_pid_survives_full_horizon():
    """Hover expert: +1/step, so surviving the horizon scores ~max_steps."""
    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.HOVER_3D
    B = 4
    key = jax.random.PRNGKey(1)
    ids = jnp.arange(B, dtype=jnp.int32)
    state, obs = base.reset(key, ids, jnp.zeros(B, jnp.int32), params, spec,
                            dtype=jnp.float64)
    pol_state, policy = heuristics.hover3d_pid(B, jnp.float64, params=params)

    @jax.jit
    def run(state, pol_state, obs):
        def body(carry, _):
            st, ps, obs, total, done_seen = carry
            ps, action = policy(ps, obs)
            st, ts = base.step(st, action, key, ids, params, spec)
            total = total + jnp.where(done_seen, 0.0, ts.reward)
            return (st, ps, ts.obs, total, done_seen | ts.done), None

        init = (state, pol_state, obs, jnp.zeros(B, jnp.float64),
                jnp.zeros(B, bool))
        (st, ps, obs, total, done_seen), _ = jax.lax.scan(
            body, init, None, length=999)
        return total, done_seen

    total, done_seen = run(state, pol_state, obs)
    assert float(jnp.median(total)) > 900, np.asarray(total)

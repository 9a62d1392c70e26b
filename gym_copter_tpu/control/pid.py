"""Batched, pure-functional PID controllers.

Functional JAX twin of the reference PID stack
(attic/mars/pidcontrollers/__init__.py): the mutable accumulators
(integral, last error, two-sample D smoothing window) become a PidState
pytree of (B,) arrays threaded through the policy, so an entire batch of
expert controllers runs in lockstep inside the jitted rollout.

Semantics preserved:
  * windup clamp on the accumulated integral (:42-46);
  * 3-sample derivative smoothing (deltaError1 + deltaError2 + deltaError)
    (:49-57);
  * Ki>0 / Kd>0 "optimization" branches (static Python conditionals here —
    gains are compile-time constants) (:40,50);
  * cascaded position->velocity set-point controller with a pure-P outer
    loop (:76-91);
  * AltitudeHold NED negation (:100-103), Descent's stateless z/dz blend
    (:113-124), AngularVelocity's integral reset on fast rotation — which
    zeroes errorI and lastError but NOT the smoothing window (:60-64,
    127-146).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class PidState(NamedTuple):
    """Accumulated controller state, one lane per environment."""

    error_i: jnp.ndarray
    last_error: jnp.ndarray
    delta_error1: jnp.ndarray
    delta_error2: jnp.ndarray


def pid_init(batch: int, dtype=jnp.float32) -> PidState:
    z = jnp.zeros((batch,), dtype)
    return PidState(z, z, z, z)


class PidGains(NamedTuple):
    kp: float
    ki: float
    kd: float
    windup_max: float = 0.2


def pid_compute(state: PidState, gains: PidGains, target, actual):
    """One controller update; returns (new_state, demand)."""
    error = target - actual
    demand = error * gains.kp

    error_i = state.error_i
    if gains.ki > 0:
        error_i = jnp.clip(state.error_i + error,
                           -gains.windup_max, gains.windup_max)
        demand = demand + error_i * gains.ki

    last_error, d1, d2 = state.last_error, state.delta_error1, state.delta_error2
    if gains.kd > 0:
        delta_error = error - state.last_error
        demand = demand + (d1 + d2 + delta_error) * gains.kd
        d2 = d1
        d1 = delta_error
        last_error = error

    return PidState(error_i, last_error, d1, d2), demand


# ---------------------------------------------------------------------------
# Cascaded set-point controller: outer pure-P position loop feeding a
# velocity PID (reference :76-91).

class SetPointState(NamedTuple):
    vel: PidState


def setpoint_init(batch: int, dtype=jnp.float32) -> SetPointState:
    return SetPointState(pid_init(batch, dtype))


def setpoint_compute(state: SetPointState, gains: PidGains, target, x, dx):
    target_velocity = target - x  # posPid is P-only with Kp=1 (:80,88)
    vel, demand = pid_compute(state.vel, gains, target_velocity, dx)
    return SetPointState(vel), demand


# -- concrete controllers with the reference's default gains ---------------

ALTITUDE_HOLD_GAINS = PidGains(kp=0.2, ki=3.0, kd=0.0)       # :96-98
ALTITUDE_HOLD_TARGET = 5.0

POSITION_HOLD_GAINS = PidGains(kp=0.00001, ki=0.1, kd=4.0)   # :108-110
POSITION_HOLD_TARGET = 0.0

DESCENT_KP = 1.15                                            # :115
DESCENT_KD = 1.33

ANGULAR_VELOCITY_GAINS = PidGains(kp=1.0, ki=0.0, kd=1.0, windup_max=6.0)
ANGULAR_VELOCITY_BIG = math.radians(40.0)                    # :129-139


def altitude_hold(state: SetPointState, z, dz, target=ALTITUDE_HOLD_TARGET):
    """NED negation then set-point cascade (:100-103)."""
    return setpoint_compute(state, ALTITUDE_HOLD_GAINS, target, -z, -dz)


def position_hold(state: SetPointState, x, dx):
    return setpoint_compute(state, POSITION_HOLD_GAINS,
                            POSITION_HOLD_TARGET, x, dx)


def descent(z, dz):
    """Stateless descent demand z*1.15 + dz*1.33 (:121-124)."""
    return z * DESCENT_KP + dz * DESCENT_KD


def angular_velocity(state: PidState, angvel):
    """Rate damping toward zero; resets errorI/lastError (only) when the
    rotation rate exceeds 40 deg/s (:60-64, 141-146)."""
    fast = jnp.abs(angvel) > ANGULAR_VELOCITY_BIG
    zero = jnp.zeros_like(state.error_i)
    state = state._replace(
        error_i=jnp.where(fast, zero, state.error_i),
        last_error=jnp.where(fast, zero, state.last_error),
    )
    return pid_compute(state, ANGULAR_VELOCITY_GAINS,
                       jnp.zeros_like(angvel), angvel)

"""Batched expert policies: the reference's heuristic demos as pure
functions compatible with `CopterEnv.rollout`.

Each factory returns (init_policy_state, policy_fn) where
policy_fn(policy_state, obs) -> (policy_state', action) with obs
features-first (obs_dim, B) and action (action_size, B).

Sources:
  * constant-thrust landing: lander.py:21,42 (MOTORVAL on all motors);
  * Lander1D: descent PID (attic/heuristic/lander1d.py:14-20);
  * Lander2D: position + descent -> [h-p, h+p] (attic/heuristic/lander2d.py:15-25);
  * Lander3D: rate+position PIDs + descent -> 4-motor mixer
    [t-r-p, t+r+p, t+r-p, t-r+p] (attic/mars/lander3d.py:64-87);
  * Lander3DSimple: PD expert in the 3-demand (throttle, roll, pitch)
    space (attic/gym_copter/envs/simple_lander3d.py:186-211);
  * Hover1D: altitude-hold PID (attic/heuristic/hover1d.py:15-22);
  * Hover2D: rate+position+altitude -> [h-phi, h+phi]
    (attic/heuristic/hover2d.py:17-30);
  * Hover3D: adds yaw rate, mixer [t-r-p-y, t+r+p-y, t+r-p+y, t-r+p+y]
    (attic/heuristic/hover.py:19-48).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from gym_copter_tpu.control import pid
from gym_copter_tpu.core.types import EnvParams

MOTORVAL = 1.625e-2  # reference lander.py:21


def hover_motor_value(params: EnvParams) -> float:
    """Motor value at which total thrust balances gravity, under the
    vehicle's configured lift law (params.lift_model).

    'bouabdallah' (active dynamics): 4*B*omega^2 = M*g
    (gym_copter/dynamics/__init__.py:124).  For the active DJI Phantom
    (B=5e-3) this is ~0.0166, matching the demo MOTORVAL=1.625e-2
    (lander.py:21); for the attic vehicle (B=5e-6) it is ~0.52.

    'blade_element' (attic mars variant): per-motor lift is
    0.5*rho*S*C_L*(omega*L/2)^2 with S = 0.05*L*4
    (attic/mars/dynamics/__init__.py:150-164), so hover solves
    4*0.5*rho*S*C_L*(omega*L/2)^2 = M*g.  Using the Bouabdallah formula
    here would anchor the PPO action space at a wrong hover point on the
    Mars presets (VERDICT round-2 item 5)."""
    vp, g = params.vehicle, params.world.g
    if params.lift_model == 'blade_element':
        s_area = 0.05 * vp.L * 4.0
        coef = 0.5 * params.world.rho * s_area * vp.C_L * (vp.L / 2.0) ** 2
        omega_hover = math.sqrt(vp.M * g / (4.0 * coef))
    else:
        omega_hover = math.sqrt(vp.M * g / (4.0 * vp.B))
    return omega_hover * 30.0 / (math.pi * vp.maxrpm)


def _mixer_scale(params: Optional[EnvParams]) -> float:
    """The attic PID experts were tuned for a vehicle whose hover throttle
    is ~0.5 (t=(demand+1)/2 maps zero demand to half throttle,
    attic/mars/lander3d.py:85).  Scaling the mixer output by
    hover_throttle/0.5 preserves the reference formulas exactly on that
    vehicle (scale~1.05) and generalizes them to any vehicle params."""
    if params is None:
        return 1.0
    return hover_motor_value(params) / 0.5


def constant_thrust(action_size: int, batch: int, value: float = MOTORVAL,
                    dtype=jnp.float32):
    """The shipped demo heuristic: the same constant on every motor."""
    act = jnp.full((action_size, batch), value, dtype)

    def policy_fn(state, obs):
        return state, act

    return None, policy_fn


def lander1d_pid(batch: int, dtype=jnp.float32, params=None):
    s = _mixer_scale(params)

    def policy_fn(state, obs):
        z, dz = obs[0], obs[1]
        return state, pid.descent(z, dz)[None, :] * s

    return None, policy_fn


def lander2d_pid(batch: int, dtype=jnp.float32, params=None):
    s = _mixer_scale(params)
    init = pid.setpoint_init(batch, dtype)

    def policy_fn(state, obs):
        y, dy, z, dz = obs[0], obs[1], obs[2], obs[3]
        state, pos_todo = pid.position_hold(state, y, dy)
        hover_todo = pid.descent(z, dz)
        return state, jnp.stack([hover_todo - pos_todo,
                                 hover_todo + pos_todo]) * s

    return init, policy_fn


class Lander3DPidState(NamedTuple):
    phi_rate: pid.PidState
    theta_rate: pid.PidState
    x_pos: pid.SetPointState
    y_pos: pid.SetPointState


def lander3d_pid(batch: int, dtype=jnp.float32, params=None):
    """The reference "expert policy" (SURVEY.md §3.5)."""
    s = _mixer_scale(params)
    init = Lander3DPidState(
        phi_rate=pid.pid_init(batch, dtype),
        theta_rate=pid.pid_init(batch, dtype),
        x_pos=pid.setpoint_init(batch, dtype),
        y_pos=pid.setpoint_init(batch, dtype),
    )

    def policy_fn(state, obs):
        x, dx, y, dy, z, dz = obs[0], obs[1], obs[2], obs[3], obs[4], obs[5]
        dphi, dtheta = obs[7], obs[9]

        phi_rate, phi_rate_todo = pid.angular_velocity(state.phi_rate, dphi)
        x_pos, y_pos_todo = pid.position_hold(state.x_pos, y, dy)
        phi_todo = phi_rate_todo + y_pos_todo

        theta_rate, theta_rate_todo = pid.angular_velocity(
            state.theta_rate, -dtheta)
        y_pos, x_pos_todo = pid.position_hold(state.y_pos, x, dx)
        theta_todo = theta_rate_todo + x_pos_todo

        descent_todo = pid.descent(z, dz)

        t = (descent_todo + 1) / 2
        r, p = phi_todo, theta_todo
        action = jnp.stack([t - r - p, t + r + p,
                            t + r - p, t - r + p]) * s
        new_state = Lander3DPidState(phi_rate, theta_rate, x_pos, y_pos)
        return new_state, action

    return init, policy_fn


def lander3d_simple_pid(batch: int, dtype=jnp.float32, params=None):
    """The attic simple lander's PD expert: angle targets proportional to
    horizontal position/velocity, PD on angle error, vertical PD mapped to
    [0,1] throttle via the +0.5 bias (simple_lander3d.py:186-211).  Acts in
    the 3-demand (throttle, roll, pitch) space — batched, stateless."""
    A, B = 0.05, 0.06          # angle target        (simple_lander3d.py:189-190)
    C, D, E = 0.025, 0.05, 0.4  # angle PD            (:193-195)
    F, G = 1.15, 1.33          # vertical PD         (:198-199)

    def policy_fn(state, obs):
        x, dx, y, dy, z, dz = (obs[i] for i in range(6))
        phi, dphi, theta, dtheta = obs[6], obs[7], obs[8], obs[9]
        phi_targ = y * A + dy * B
        phi_todo = (phi - phi_targ) * C + phi * D - dphi * E
        theta_targ = x * A + dx * B
        theta_todo = -(theta + theta_targ) * C - theta * D + dtheta * E
        hover_todo = z * F + dz * G
        return state, jnp.stack([hover_todo + 0.5, phi_todo, theta_todo])

    return None, policy_fn


def hover1d_pid(batch: int, dtype=jnp.float32,
                target=pid.ALTITUDE_HOLD_TARGET, params=None):
    s = _mixer_scale(params)
    init = pid.setpoint_init(batch, dtype)

    def policy_fn(state, obs):
        z, dz = obs[0], obs[1]
        state, demand = pid.altitude_hold(state, z, dz, target)
        return state, demand[None, :] * s

    return init, policy_fn


class Hover2DPidState(NamedTuple):
    rate: pid.PidState
    pos: pid.SetPointState
    alt: pid.SetPointState


def hover2d_pid(batch: int, dtype=jnp.float32,
                target=pid.ALTITUDE_HOLD_TARGET, params=None):
    s = _mixer_scale(params)
    init = Hover2DPidState(
        rate=pid.pid_init(batch, dtype),
        pos=pid.setpoint_init(batch, dtype),
        alt=pid.setpoint_init(batch, dtype),
    )

    def policy_fn(state, obs):
        y, dy, z, dz, _phi, dphi = (obs[i] for i in range(6))
        rate, rate_todo = pid.angular_velocity(state.rate, dphi)
        pos, pos_todo = pid.position_hold(state.pos, y, dy)
        phi_todo = rate_todo + pos_todo
        alt, hover_todo = pid.altitude_hold(state.alt, z, dz, target)
        action = jnp.stack([hover_todo - phi_todo,
                            hover_todo + phi_todo]) * s
        return Hover2DPidState(rate, pos, alt), action

    return init, policy_fn


class Hover3DPidState(NamedTuple):
    roll_rate: pid.PidState
    pitch_rate: pid.PidState
    yaw_rate: pid.PidState
    x_pos: pid.SetPointState
    y_pos: pid.SetPointState
    alt: pid.SetPointState


def hover3d_pid(batch: int, dtype=jnp.float32,
                target=pid.ALTITUDE_HOLD_TARGET, params=None):
    s = _mixer_scale(params)
    init = Hover3DPidState(
        roll_rate=pid.pid_init(batch, dtype),
        pitch_rate=pid.pid_init(batch, dtype),
        yaw_rate=pid.pid_init(batch, dtype),
        x_pos=pid.setpoint_init(batch, dtype),
        y_pos=pid.setpoint_init(batch, dtype),
        alt=pid.setpoint_init(batch, dtype),
    )

    def policy_fn(state, obs):
        x, dx, y, dy, z, dz = (obs[i] for i in range(6))
        dphi, dtheta, dpsi = obs[7], obs[9], obs[11]

        roll_rate, roll_rate_todo = pid.angular_velocity(state.roll_rate, dphi)
        x_pos, y_pos_todo = pid.position_hold(state.x_pos, y, dy)

        pitch_rate, pitch_rate_todo = pid.angular_velocity(
            state.pitch_rate, -dtheta)
        y_pos, x_pos_todo = pid.position_hold(state.y_pos, x, dx)

        roll_todo = roll_rate_todo + y_pos_todo
        pitch_todo = pitch_rate_todo + x_pos_todo
        yaw_rate, yaw_todo = pid.angular_velocity(state.yaw_rate, -dpsi)

        alt, hover_todo = pid.altitude_hold(state.alt, z, dz, target)

        t = (hover_todo + 1) / 2
        r, p, yw = roll_todo, pitch_todo, yaw_todo
        action = jnp.stack([t - r - p - yw, t + r + p - yw,
                            t + r - p + yw, t - r + p + yw]) * s
        new_state = Hover3DPidState(roll_rate, pitch_rate, yaw_rate,
                                    x_pos, y_pos, alt)
        return new_state, action

    return init, policy_fn


PID_POLICIES = {
    'Lander1D-v0': lander1d_pid,
    'Lander2D-v0': lander2d_pid,
    'Lander3D-v0': lander3d_pid,
    'Lander-v0': lander3d_pid,
    'Lander3DSimple-v0': lander3d_simple_pid,
    'Hover1D-v0': hover1d_pid,
    'Hover2D-v0': hover2d_pid,
    'Hover3D-v0': hover3d_pid,
}

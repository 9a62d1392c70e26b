"""Fused multi-step rollout as a single Pallas TPU kernel.

The batched env step (envs/base.py) is ~150 VPU flops per environment — far
too little work to amortize a per-step HBM round-trip.  Under `lax.scan` XLA
compiles the rollout into a while loop whose carry (the whole EnvState) is
materialized between iterations; at 4096 envs that is ~0.5 MB of HBM traffic
per simulated step and the rollout is bandwidth/latency-bound, not
compute-bound.

This kernel runs the WHOLE T-step rollout inside one `pallas_call`: the
batch state lives in VMEM/vector registers for all T steps and only the
final state plus per-env aggregates (reward sum, episodes completed) are
written back to HBM.  Physics semantics are identical to
`core/dynamics.step` + `envs/base._raw_step` + auto-reset (which themselves
mirror the reference `Dynamics.setMotors` / `_Task.step`,
gym_copter/dynamics/__init__.py:114-197 and gym_copter/envs/task.py:77-137),
including every parity quirk documented in SURVEY.md §2.4 — the op order of
each arithmetic expression is kept identical to envs/base.py so the state
trajectory is bit-exact against the XLA path on the same backend.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * Batch layout: B envs are viewed as (R, 128) with R = B // 128 — full
    (8, 128) VPU tiles, no padding waste.  Each of the 12 state components
    is carried as its own (R, 128) array, so the fori_loop carry never
    needs a relayout.
  * Actions are constant across the rollout (the demo-heuristic / bench
    regime), so the Eq.6 motor mix (thrust + torques) is precomputed on the
    host side of the kernel boundary once, not 10,000 times.
  * Auto-reset randomness (the reset wind kick, task.py:177-188) is a
    counter-based hash of (global env id, episode index, salt) — the
    in-kernel analogue of the XLA path's
    `fold_in(fold_in(base_key, env_id), episode)` stream (envs/base.py
    `_initial_forces`).  Because the hash depends only on GLOBAL per-env
    values carried with the state (never on lane position, batch size,
    launch count, or a per-shard PRNG), trajectories are bit-identical
    across any sharding layout — the same layout-independence contract the
    XLA path guarantees (envs/base.py:16-19) — and interpret-mode (CPU)
    runs produce the same kicks bit-for-bit as compiled TPU runs.  The
    hash stream itself differs from the XLA threefry stream, so
    fused-vs-scan bit-parity tests run with `initial_random_force == 0`.

Supported task space (assertion-checked): 'lander' and 'hover' kinds with
'standard' termination — the headline Lander/Hover 1D/2D/3D family.  Other
kinds fall back to `scan_rollout`, the XLA path.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_copter_tpu.core import constants as C
from gym_copter_tpu.core.dynamics import DynamicsState
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base
from gym_copter_tpu.envs.base import EnvState, TaskSpec

LANES = 128


def _motor_mix(action, params: EnvParams, spec: TaskSpec, dtype):
    """Replicates the action->motors4 path of envs/base._raw_step (clip /
    rescale, then the task mix matrix), then the Eq.6 thrust/torque terms.
    Returns per-env (bz, u2ix, u3iy, u4iz, omega), all (B,)."""
    action = jnp.asarray(action, dtype)
    if spec.action_mode == 'clip01':
        motors = jnp.clip(action, 0.0, 1.0)
    elif spec.action_mode == 'rescale01':
        motors = (1.0 + action) / 2.0
    elif spec.action_mode == 'demand3':
        # throttle clipped to [0,1] pre-mix, signed roll/pitch
        # (simple_lander3d.py:84-87)
        motors = action.at[0].set(jnp.clip(action[0], 0.0, 1.0))
    else:
        motors = action
    mix = jnp.asarray(spec.mix_matrix, dtype)
    m4 = mix @ motors  # (4, B)
    if spec.action_mode == 'demand3':
        # the MIXED motor values are clipped to [0,1] (simple_lander3d.py:99)
        m4 = jnp.clip(m4, 0.0, 1.0)
    return motor_mix_terms(m4, params, dtype)


def motor_mix_terms(m4, params: EnvParams, dtype):
    """Eq.6 motor speeds -> thrust/torque accelerations, with the exact op
    order of core/dynamics.step:120-135.  m4 is (4, B) mixed motor values;
    returns (bz, u2ix, u3iy, u4iz, omega) = (-U1/M, U2/Ix, U3/Iy, U4/Iz,
    rotor disturbance), each (B,).  Pure jnp, usable inside kernels."""
    vp = params.vehicle
    omegas = m4 * vp.maxrpm * math.pi / 30.0
    o2 = omegas * omegas
    if params.lift_model == 'blade_element':
        velocity = omegas * (vp.L / 2.0)
        s_area = 0.05 * vp.L * 4.0
        lift = 0.5 * params.world.rho * s_area * vp.C_L * (velocity * velocity)
        U1 = lift[0] + lift[1] + lift[2] + lift[3]
        U2 = (lift[1] + lift[2]) - (lift[0] + lift[3])
        U3 = (lift[1] + lift[3]) - (lift[0] + lift[2])
        U4 = vp.D * ((o2[0] + o2[1]) - (o2[2] + o2[3]))
        omega = (omegas[0] + omegas[1]) - (omegas[2] + omegas[3])
    else:
        U1 = vp.B * (o2[0] + o2[1] + o2[2] + o2[3])
        U2 = vp.L * vp.B * ((o2[1] + o2[2]) - (o2[0] + o2[3]))
        U3 = vp.L * vp.B * ((o2[1] + o2[3]) - (o2[0] + o2[2]))
        U4 = vp.D * ((o2[0] + o2[1]) - (o2[2] + o2[3]))
        omega = jnp.zeros_like(U1)
    return -U1 / vp.M, U2 / vp.Ix, U3 / vp.Iy, U4 / vp.Iz, omega


def _i32(c) -> jnp.int32:
    """A uint32 constant as its int32 two's-complement twin (Mosaic has no
    native uint32 lanes; int32 wrapping arithmetic is bit-identical)."""
    return jnp.int32(np.int32(np.uint32(c)))


# per-axis salts decorrelating the three kick components
_KICK_AXIS = (0x2545F491, 0x63173B93, 0x1B56C4E9)


def _kick_u01(eid, ep, salt, axis_salt, dtype):
    """Counter-based uniform in [0, 1): murmur3-fmix32-style avalanche of
    (global env id, episode index, salt, axis).  Pure int32 arithmetic with
    logical shifts — wrapping int32 mul/xor/shr is bit-identical to uint32
    math, so the XLA interpreter (CPU tests) and Mosaic (TPU) produce the
    SAME bits, and the value depends only on globally-meaningful inputs
    (layout independence).  Quality is validated by the moment/uniformity
    test in tests/test_pallas_rollout.py."""
    def shr(v, k):  # logical shift with the amount pinned to int32 (x64 mode)
        return jax.lax.shift_right_logical(v, jnp.int32(k))

    x = eid * _i32(0x9E3779B9) + ep * _i32(0x85EBCA6B)
    x = x ^ (salt * _i32(0xC2B2AE35)) ^ _i32(axis_salt)
    x = (x ^ shr(x, 16)) * _i32(0x7FEB352D)
    x = (x ^ shr(x, 15)) * _i32(0x846CA68B)
    x = (x ^ shr(x, 16)) * _i32(0x9E3779B1)
    x = x ^ shr(x, 16)
    # top 24 bits -> float32-exact uniform
    return shr(x, 8).astype(dtype) * (2.0 ** -24)


def _reset_constants(params: EnvParams, spec: TaskSpec):
    """Host-side constants describing the in-kernel auto-reset target state,
    matching envs/base.reset with the default pose (the auto-reset path).
    Returns (xy0, alt, dz0, ticks0, status0, s0): start X/Y offset, start
    altitude, initial Z velocity, initial clock, status, and prev_shaping.

    With `integrate_on_reset` (the attic simple lander's real zero-demand
    reset step, simple_lander3d.py:79) the one deterministic free-fall Euler
    step is folded into the constants: dz0 = dt*g, ticks0 = 1, and shaping
    is seeded from the integrated state — valid because the spec has no
    reset randomness (perturb_on_reset=False)."""
    alt = (spec.start_altitude if spec.start_altitude is not None
           else params.task.initial_altitude)
    alt = float(alt)
    xy0 = float(spec.start_xy_offset)
    status0 = C.STATUS_AIRBORNE if alt > 0 else C.STATUS_LANDED
    dz0, ticks0 = 0.0, 0
    if spec.integrate_on_reset:
        assert not spec.perturb_on_reset and alt > 0, \
            'integrate_on_reset constants assume a deterministic airborne reset'
        dz0 = float(np.float32(params.task.dt) * np.float32(params.world.g))
        ticks0 = 1
    # prev_shaping of the reset state, computed in float32 exactly as
    # base._shaping does on the initial state
    if spec.kind == 'lander':
        rp = params.reward
        z = np.float32(-alt)
        s0 = -(np.float32(rp.xyz_penalty_factor) * np.sqrt(z * z)
               + np.float32(rp.yaw_penalty_factor) * np.float32(0.0))
        s0 = float(s0)
    elif spec.kind == 'lander_simple':
        # -(25·‖state[0:6]‖ + 250·‖state[6:10]‖) on the post-free-fall
        # state (base._shaping 'lander_simple'; simple_lander3d.py:113-117)
        rp = params.reward
        pos = np.array([xy0, 0.0, xy0, 0.0, -alt, dz0], np.float32)
        s0 = -(np.float32(rp.xyz_penalty_factor)
               * np.float32(np.sqrt(np.sum(pos * pos)))
               + np.float32(rp.pitch_roll_penalty_factor) * np.float32(0.0))
        s0 = float(s0)
    elif spec.kind == 'takeoff':
        s0 = float(-np.abs(np.float32(alt)
                           - np.float32(params.task.takeoff_target)))
    else:  # hover / althold / distance carry no (or zero) initial shaping
        s0 = 0.0
    return xy0, alt, dz0, ticks0, status0, s0


def make_env_step(params: EnvParams, spec: TaskSpec,
                  shape: Tuple[int, int], random_reset: bool):
    """Build the in-kernel environment transition used by the
    constant-action rollout kernel below.  All physics / reward /
    termination constants are closed over as Python floats so they compile
    to immediates.

    Returns env_step(carry, u, eid, salt) -> (carry', reward, done) where
      carry = (xs 12-tuple, ps 6-tuple, status, ticks, steps, pshape, ep),
      u     = (bz, u2ix, u3iy, u4iz, om) per-env thrust/torque accelerations
              from `motor_mix_terms` (each (R, 128)),
      eid   = (R, 128) int32 GLOBAL env ids (keys the reset-kick hash),
      salt  = scalar int32 run-level salt (the base_key analogue; must be
              identical on every shard for layout independence),
    and reward/done describe the finished step (pre-auto-reset), while
    carry' already contains freshly reset episodes on done lanes.  `ep` is
    the per-env episode index; fresh episodes on done lanes carry ep+1 and
    their wind kick is `_kick_u01(eid, ep+1, salt, axis)` — paralleling the
    XLA path's fold_in(fold_in(base_key, eid), episode) (envs/base.py
    `_initial_forces`).
    """
    vp = params.vehicle
    t = params.task
    rp = params.reward
    dt = t.dt
    g = params.world.g
    kind = spec.kind
    # Eq.12 inertia constants, combined host-side with the same Python-float
    # arithmetic the XLA path's tracing performs (core/dynamics.py:170-196)
    iy_iz = vp.Iy - vp.Iz
    iz_ix = vp.Iz - vp.Ix
    ix_iy = vp.Ix - vp.Iy
    jr_ix = vp.Jr / vp.Ix
    jr_iy = vp.Jr / vp.Iy
    blade = params.lift_model == 'blade_element'
    # kick = (2*u01 - 1) * (F/M) with F/M pre-divided host-side: u01*2 and
    # -1 are EXACT float ops (24-bit mantissa, Sterbenz), leaving a single
    # rounded multiply — so the kick value cannot shift by a ULP when XLA
    # fuses the surrounding program differently (shard_map vs not)
    kick_scale = float(t.initial_random_force) / float(vp.M)
    xy0, alt0, dz0, ticks0, status0, s0 = _reset_constants(params, spec)

    def env_step(carry, u, eid, salt):
        xs, ps, status, ticks, steps, pshape, ep = carry
        bz, u2ix, u3iy, u4iz, om = u
        x0, x1, x2, x3, x4, x5, x6, x7, x8, x9, x10, x11 = xs
        p0, p1, p2, p3, p4, p5 = ps

        entry_landed = status == C.STATUS_LANDED

        # --- dynamics step (core/dynamics.step, identical op order) ---
        cph, sph = jnp.cos(x6), jnp.sin(x6)
        cth, sth = jnp.cos(x8), jnp.sin(x8)
        cps, sps = jnp.cos(x10), jnp.sin(x10)
        rx = sph * sps + cph * cps * sth
        ry = cph * sps * sth - cps * sph
        rz = cph * cth
        ax, ay, az = bz * rx, bz * ry, bz * rz
        netz = az + g

        status1 = jnp.where((status == C.STATUS_LANDED) & (netz < 0),
                            C.STATUS_AIRBORNE, status)
        leveling = status1 == C.STATUS_LEVELING
        airborne = status1 == C.STATUS_AIRBORNE
        touchdown = airborne & (x4 > 0) & (x5 > 0)
        crash = ((x5 > C.LANDING_VEL_Y)
                 | (jnp.abs(x3) > C.LANDING_VEL_X)
                 | (jnp.abs(x6) > C.LANDING_ANGLE))
        integrate = airborne & ~touchdown

        if blade:
            phi_dd = (x11 * x9 * iy_iz / vp.Ix
                      - jr_ix * x9 * om + u2ix + p3)
            the_dd = -(x11 * x7 * iz_ix / vp.Iy
                       + jr_iy * x7 * om + u3iy) + p4
        else:
            phi_dd = x11 * x9 * iy_iz / vp.Ix + u2ix + p3
            the_dd = -(x11 * x7 * iz_ix / vp.Iy + u3iy) + p4
        psi_dd = x9 * x7 * ix_iy / vp.Iz + u4iz + p5
        # perturbation double-count (core/dynamics.py:199-201): every
        # velocity-derivative slot receives its perturb component again
        d = (x1, (ax + p0) + p0, x3, (ay + p1) + p1,
             x5, (netz + p2) + p2, x7, phi_dd + p3,
             x9, the_dd + p4, x11, psi_dd + p5)
        xi = tuple(xv + dt * dv for xv, dv in zip(xs, d))
        zero = jnp.zeros_like(x0)

        # --- env layer folded in: landed envs skip the dynamics
        # (base.py:292-297) unless the task drives the dynamics directly
        # from the ground (skip_when_landed=False, e.g. Takeoff).  The
        # three nested selects of the XLA path (integrate/leveling inside
        # dynamics.step, then the skip-when-landed select) collapse to one
        # select per state row plus a leveling zero on roll/pitch — the
        # masks are disjoint by construction, so the selected values are
        # identical bit-for-bit.
        skip = entry_landed if spec.skip_when_landed \
            else jnp.zeros(shape, bool)
        eff_integ = integrate & ~skip
        eff_level = leveling & ~skip
        keep_p = skip | touchdown
        xs_n = tuple(jnp.where(eff_integ, a, b) for a, b in zip(xi, xs))
        xs_n = (xs_n[:6]
                + (jnp.where(eff_level, zero, xs_n[6]), xs_n[7],
                   jnp.where(eff_level, zero, xs_n[8]), xs_n[9],
                   xs_n[10], xs_n[11]))
        ps_n = tuple(jnp.where(keep_p, pv, zero) for pv in ps)
        status_n = jnp.where(
            skip, status,
            jnp.where(
                leveling, C.STATUS_LANDED,
                jnp.where(touchdown,
                          jnp.where(crash, C.STATUS_CRASHED,
                                    C.STATUS_LEVELING),
                          status1))).astype(jnp.int32)
        ticks_n = ticks + (~keep_p).astype(jnp.int32)
        y0, y1, y2, y3, y4, y5, y6, y7, y8, y9, y10, y11 = xs_n

        # --- reward (base._reward) ---
        if kind == 'lander':
            pos_sq = (y0 * y0 + y1 * y1 + y2 * y2
                      + y3 * y3 + y4 * y4 + y5 * y5)
            yaw_sq = y10 * y10 + y11 * y11
            shaping = -(rp.xyz_penalty_factor * jnp.sqrt(pos_sq)
                        + rp.yaw_penalty_factor * jnp.sqrt(yaw_sq))
            shaping = shaping - jnp.where(jnp.abs(y5) > rp.dz_max,
                                          rp.dz_penalty, 0.0)
            reward = shaping - pshape
            inside = jnp.sqrt(y0 * y0 + y2 * y2) < rp.target_radius
            reward = reward + jnp.where(entry_landed & inside,
                                        rp.inside_radius_bonus, 0.0)
            done = entry_landed
        elif kind == 'lander_simple':
            # -(25·‖state[0:6]‖ + 250·‖state[6:10]‖) shaping delta; the
            # landing bonus is applied AFTER the oob/tilt replacement in
            # the 'simple' termination below (simple_lander3d.py:113-141)
            pos_sq = (y0 * y0 + y1 * y1 + y2 * y2
                      + y3 * y3 + y4 * y4 + y5 * y5)
            ang_sq = y6 * y6 + y7 * y7 + y8 * y8 + y9 * y9
            shaping = -(rp.xyz_penalty_factor * jnp.sqrt(pos_sq)
                        + rp.pitch_roll_penalty_factor * jnp.sqrt(ang_sq))
            reward = shaping - pshape
            done = entry_landed
        elif kind == 'althold':
            # +1 per step within tolerance (attic althold.py:52)
            on_target = (jnp.abs(-y4 - t.althold_target)
                         < t.althold_tolerance)
            shaping = jnp.zeros_like(pshape)
            reward = on_target.astype(pshape.dtype)
            done = jnp.zeros(shape, bool)
        elif kind == 'takeoff':
            # -|alt - target| shaping delta (attic takeoff.py:83-87)
            shaping = -jnp.abs(-y4 - t.takeoff_target)
            reward = shaping - pshape
            done = jnp.zeros(shape, bool)
        elif kind == 'distance':
            # sqrt(x^2 + y^2) shaping delta (attic distance.py:79-83)
            shaping = jnp.sqrt(y0 * y0 + y2 * y2)
            reward = shaping - pshape
            done = jnp.zeros(shape, bool)
        elif kind == 'target':
            # reward stubbed 0 (attic target.py:50-51); the step-indexed
            # moving-target track lives only in the observation, which the
            # constant-action rollout never materializes
            shaping = jnp.zeros_like(pshape)
            reward = jnp.zeros_like(pshape)
            done = jnp.zeros(shape, bool)
        else:  # hover: +1 per surviving step
            shaping = jnp.zeros_like(pshape)
            reward = jnp.ones_like(pshape)
            done = jnp.zeros(shape, bool)

        if spec.termination == 'crash_only':
            # post-step status (base.py:316-317, attic target.py:41-42)
            done = done | (status_n == C.STATUS_CRASHED)
        elif spec.termination == 'simple':
            # attic simple lander: oob AND tilt both REPLACE the reward;
            # the inside-radius bonus (squared compare) is added AFTERWARDS
            # on the landed step; crash terminates silently
            # (simple_lander3d.py:124-141; base._raw_step 'simple')
            oob = (jnp.abs(y0) >= t.bounds) | (jnp.abs(y2) >= t.bounds)
            tilt = ((jnp.abs(y6) >= t.max_angle)
                    | (jnp.abs(y8) >= t.max_angle))
            crashed = status == C.STATUS_CRASHED
            reward = jnp.where(oob | tilt, -t.out_of_bounds_penalty, reward)
            inside = (y0 * y0 + y2 * y2
                      < rp.target_radius * rp.target_radius)
            reward = reward + jnp.where(entry_landed & inside,
                                        rp.inside_radius_bonus, 0.0)
            done = done | oob | tilt | crashed
        elif spec.termination == 'standard':
            # --- standard termination (base.py:304-321) ---
            oob = (jnp.abs(y0) >= t.bounds) | (jnp.abs(y2) >= t.bounds)
            tilt = ((jnp.abs(y6) >= t.max_angle)
                    | (jnp.abs(y8) >= t.max_angle))
            crashed = status == C.STATUS_CRASHED
            reward = jnp.where(oob, reward - t.out_of_bounds_penalty,
                               jnp.where(tilt, -t.out_of_bounds_penalty,
                                         reward))
            done = done | oob | tilt | crashed
        done = done | (steps == t.max_steps)

        # --- auto-reset (base.step + base.reset, default pose) ---
        ep1 = ep + 1  # fresh episodes carry the incremented index
        if random_reset:
            # kick ~ U(-F, F)/M keyed by (GLOBAL env id, new episode index,
            # run salt): identical on any mesh layout, any batch size, and
            # in interpret vs compiled mode
            kick = tuple(
                (2.0 * _kick_u01(eid, ep1, salt, ax, pshape.dtype) - 1.0)
                * kick_scale for ax in _KICK_AXIS)
        else:
            kick = (zero, zero, zero)
        xs_r = tuple(
            jnp.where(done, rv, nv) for rv, nv in zip(
                (zero + xy0, zero, zero + xy0, zero,
                 zero + (-alt0), zero + dz0,
                 zero, zero, zero, zero, zero, zero), xs_n))
        ps_r = tuple(
            jnp.where(done, rv, nv) for rv, nv in zip(
                kick + (zero, zero, zero), ps_n))
        status_r = jnp.where(done, status0, status_n).astype(jnp.int32)
        ticks_r = jnp.where(done, ticks0, ticks_n).astype(jnp.int32)
        steps_r = jnp.where(done, 1, steps + 1).astype(jnp.int32)
        pshape_r = jnp.where(done, s0, shaping)
        ep_r = jnp.where(done, ep1, ep).astype(jnp.int32)
        return ((xs_r, ps_r, status_r, ticks_r, steps_r, pshape_r, ep_r),
                reward, done)

    return env_step


def _build_kernel(params: EnvParams, spec: TaskSpec, num_steps: int,
                  shape: Tuple[int, int], random_reset: bool):
    """The constant-action whole-rollout kernel: loads state + precomputed
    thrust/torque terms into registers, runs num_steps env transitions, and
    writes back the final state plus per-env reward sums / episode counts."""
    env_step = make_env_step(params, spec, shape, random_reset)

    def kernel(x_ref, p_ref, status_ref, ticks_ref, steps_ref, pshape_ref,
               ep_ref, eid_ref,
               bz_ref, u2_ref, u3_ref, u4_ref, om_ref, seed_ref,
               x_out, p_out, status_out, ticks_out, steps_out, pshape_out,
               ep_out, acc_out, eps_out):
        xs = tuple(x_ref[i] for i in range(12))
        ps = tuple(p_ref[i] for i in range(6))
        u = (bz_ref[:], u2_ref[:], u3_ref[:], u4_ref[:], om_ref[:])
        env0 = (xs, ps, status_ref[:], ticks_ref[:], steps_ref[:],
                pshape_ref[:], ep_ref[:])
        eid = eid_ref[:]
        salt = seed_ref[0]
        acc0 = jnp.zeros(shape, pshape_ref.dtype)
        eps0 = jnp.zeros(shape, jnp.int32)

        def one_step(carry):
            env, acc, eps = carry
            env, reward, done = env_step(env, u, eid, salt)
            return env, acc + reward, eps + done.astype(jnp.int32)

        # Mosaic supports only unroll=1 fori_loops; unroll manually to
        # amortize loop overhead (4 physics steps per loop iteration).
        unroll = 4

        def body(_, carry):
            for _ in range(unroll):
                carry = one_step(carry)
            return carry

        carry = jax.lax.fori_loop(0, num_steps // unroll, body,
                                  (env0, acc0, eps0))
        for _ in range(num_steps % unroll):
            carry = one_step(carry)
        (xs, ps, status, ticks, steps, pshape, ep), acc, eps = carry

        for i in range(12):
            x_out[i] = xs[i]
        for i in range(6):
            p_out[i] = ps[i]
        status_out[:] = status
        ticks_out[:] = ticks
        steps_out[:] = steps
        pshape_out[:] = pshape
        ep_out[:] = ep
        acc_out[:] = acc
        eps_out[:] = eps

    return kernel


def supports(params: EnvParams, spec: TaskSpec) -> bool:
    """Whether the fused kernel covers this task configuration — every task
    kind in the registry: Lander/Hover 1D/2D/3D, Lander3DSimple, plus
    AltHold/Takeoff/Distance/Target.  (Target's moving-target track lives
    only in the observation, which the constant-action rollout never
    materializes, so in-kernel it reduces to crash-only termination + zero
    reward — attic target.py:44-51.)"""
    return (spec.kind in ('lander', 'lander_simple', 'hover', 'althold',
                          'takeoff', 'distance', 'target')
            and spec.termination in ('standard', 'simple', 'none',
                                     'crash_only')
            and spec.action_mode in ('clip01', 'rescale01', 'raw',
                                     'demand3'))


@functools.partial(jax.jit, static_argnames=('num_steps', 'params', 'spec',
                                             'interpret'))
def _fused(state_arrays, action, seed, *, num_steps, params, spec, interpret):
    (x, perturb, status, ticks, steps, pshape, episode, env_ids) = state_arrays
    dtype = x.dtype
    b = x.shape[-1]
    r = b // LANES
    shape = (r, LANES)

    bz, u2, u3, u4, om = _motor_mix(action, params, spec, dtype)
    random_reset = (spec.perturb_on_reset
                    and float(params.task.initial_random_force) != 0.0)
    kernel = _build_kernel(params, spec, num_steps, shape, random_reset)

    def rs(a):  # (…, B) -> (…, R, 128)
        return a.reshape(a.shape[:-1] + shape)

    vec = functools.partial(jax.ShapeDtypeStruct, shape)
    out_shape = (
        jax.ShapeDtypeStruct((12,) + shape, dtype),
        jax.ShapeDtypeStruct((6,) + shape, dtype),
        vec(jnp.int32), vec(jnp.int32), vec(jnp.int32),
        vec(dtype), vec(jnp.int32), vec(dtype), vec(jnp.int32),
    )
    n_in = 13
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[vmem] * n_in + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vmem,) * len(out_shape),
        cost_estimate=pl.CostEstimate(
            flops=num_steps * b * 150,
            bytes_accessed=(12 + 6 + 5) * b * 4 * 2,
            transcendentals=num_steps * b * 8,
        ),
        interpret=interpret,
    )(rs(x), rs(perturb), rs(status), rs(ticks), rs(steps), rs(pshape),
      rs(episode), rs(env_ids),
      rs(bz), rs(u2), rs(u3), rs(u4), rs(om),
      jnp.asarray([seed], jnp.int32))

    def fl(a):  # (…, R, 128) -> (…, B)
        return a.reshape(a.shape[:-2] + (b,))

    return tuple(fl(o) for o in outs)


def fused_rollout(
    state: EnvState,
    action,
    num_steps: int,
    params: EnvParams,
    spec: TaskSpec,
    *,
    seed: int = 0,
    env_ids=None,
    interpret: Optional[bool] = None,
):
    """Run `num_steps` auto-resetting env steps with a constant action as ONE
    Pallas kernel launch.

    Returns (EnvState, totals) where totals = {'reward_sum': (B,) summed
    per-env rewards, 'episodes': (B,) int32 episodes completed}.  The
    returned EnvState matches what `num_steps` iterated `base.step` calls
    would produce (bit-exact when `initial_random_force == 0`; statistically
    equivalent otherwise — the in-kernel counter-hash kick stream parallels,
    but does not replay, the host `fold_in` stream).  Reset kicks are keyed
    by (env_ids, state.episode, seed): pass the envs' GLOBAL ids (defaults
    to arange(B)) and the same `seed` on every shard, and the trajectory is
    bit-identical on any sharding layout — the envs/base.py:16-19 contract.
    `initial_random_x` is not re-derived for auto-reset episodes (it only
    feeds the 2D renderer's wind pennant, twod.py:189-207).
    """
    if not supports(params, spec):
        raise ValueError(
            f'task {spec.name!r} (kind={spec.kind}, term={spec.termination}) '
            f'is outside the fused-kernel family; use scan_rollout')
    b = state.dyn.x.shape[-1]
    if b % LANES != 0:
        raise ValueError(f'batch {b} must be a multiple of {LANES}')
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    if env_ids is None:
        env_ids = jnp.arange(b, dtype=jnp.int32)

    arrays = (state.dyn.x, state.dyn.perturb, state.dyn.status,
              state.dyn.ticks, state.steps, state.prev_shaping,
              state.episode, jnp.asarray(env_ids, jnp.int32))
    (x, perturb, status, ticks, steps, pshape, episode, acc, eps) = _fused(
        arrays, action, seed, num_steps=num_steps, params=params, spec=spec,
        interpret=interpret)

    new_state = EnvState(
        dyn=DynamicsState(x=x, status=status, perturb=perturb, ticks=ticks),
        prev_shaping=pshape,
        steps=steps,
        episode=episode,
        initial_random_x=state.initial_random_x,
    )
    return new_state, {'reward_sum': acc, 'episodes': eps}


@functools.partial(jax.jit, static_argnames=('num_steps', 'params', 'spec'))
def scan_rollout(state: EnvState, action, base_key, env_ids, num_steps: int,
                 params: EnvParams, spec: TaskSpec):
    """XLA reference path: the same rollout as `lax.scan` over `base.step`.
    Works for every task kind and batch size; used as the fused kernel's
    correctness oracle and as the fallback for unsupported specs."""

    def body(carry, _):
        st, acc, eps = carry
        st, ts = base.step(st, action, base_key, env_ids, params, spec)
        return (st, acc + ts.reward, eps + ts.done.astype(jnp.int32)), None

    zero = jnp.zeros(state.prev_shaping.shape, state.prev_shaping.dtype)
    zeroi = jnp.zeros(state.prev_shaping.shape, jnp.int32)
    (st, acc, eps), _ = jax.lax.scan(body, (state, zero, zeroi), None,
                                     length=num_steps)
    return st, {'reward_sum': acc, 'episodes': eps}

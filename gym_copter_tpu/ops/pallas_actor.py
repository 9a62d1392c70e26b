"""Fused PPO training rollout: policy sampling + env + trajectory streaming.

One Pallas kernel produces the whole PPO rollout batch: per step it runs
the actor MLP (MXU), samples exploration noise from the TPU hardware PRNG
(Box-Muller), evaluates the critic, steps the environment (shared
`pallas_rollout.make_env_step` physics), and streams the transition
(obs, action, log_prob, value, reward, done) to HBM.  The env state never
leaves VMEM.

Streaming layout: the grid is (T // CHUNK,) sequential steps; trajectory
outputs are blocked (CHUNK, ...) along the time axis, so each grid step
fills its own time slice while the env/PRNG state persists in VMEM scratch
across grid steps (TPU grid iterations execute in order).  Matrix-shaped
per-step tensors (obs, action) are stored batch-on-lanes exactly as the MLP
produces them — no relayout on the store path; lane-tiled per-env scalars
(reward, done) are stored in the physics' (R, 128) tiling and reshaped on
the host side of the kernel boundary.

Relationship to learn/ppo.py's scan rollout: semantics match step-for-step
(obs is the pre-step observation; the carried state auto-resets, so the
next observation belongs to the new episode on done lanes).  Exploration
noise comes from the in-kernel PRNG rather than `jax.random.normal`, so a
fused-rollout training run is a different—but statistically identical—
sample path.  With the noise scale collapsed (log_std <= -60, below f32
resolution) both paths produce bit-identical trajectories; that is the
parity test.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs.base import EnvState, TaskSpec
from gym_copter_tpu.core.dynamics import DynamicsState
from gym_copter_tpu.ops import pallas_rollout as pr

LN_2PI = float(math.log(2.0 * math.pi))


class FusedTrajectory(NamedTuple):
    """PPO transition batch, time-major (matches learn/ppo.py Transition
    stacked by the rollout scan)."""

    obs: jnp.ndarray       # (T, obs_dim, B)
    action: jnp.ndarray    # (T, A, B)
    log_prob: jnp.ndarray  # (T, B)
    value: jnp.ndarray     # (T, B)
    reward: jnp.ndarray    # (T, B)
    done: jnp.ndarray      # (T, B) float32 (0/1)


def _chunk_for(num_steps: int, max_chunk: int = 8) -> int:
    for c in range(max_chunk, 0, -1):
        if num_steps % c == 0:
            return c
    return 1


def _build_actor_kernel(env_params: EnvParams, spec: TaskSpec,
                        num_steps: int, chunk: int, shape,
                        n_actor: int, n_critic: int,
                        obs_scale: float, action_bias: float, hover: float,
                        interpret: bool):
    # training keeps the reset wind kicks (task.py:177-188).  They come from
    # the layout-independent counter hash in pallas_rollout.make_env_step —
    # keyed by (GLOBAL env id, episode, kick salt), identical bits in
    # interpret (CPU) and compiled (TPU) mode and on any mesh shape.  Only
    # the EXPLORATION noise is per-device: hardware PRNG on TPU, a
    # murmur-style counter hash in interpret runs (the hardware PRNG has no
    # interpret-mode implementation) — a different but equally valid stream
    # (the kernel's noise RNG is internal either way).
    random_reset = (spec.perturb_on_reset
                    and float(env_params.task.initial_random_force) != 0.0)
    env_step = pr.make_env_step(env_params, spec, shape,
                                random_reset=random_reset)
    import numpy as _np
    _mix = _np.asarray(spec.mix_matrix, _np.float64)
    identity_mix = (_mix.shape[0] == _mix.shape[1]
                    and _np.array_equal(_mix, _np.eye(_mix.shape[0])))
    r, lanes = shape
    b = r * lanes
    n_obs = len(spec.obs_indices)
    obs_idx = spec.obs_indices
    n_grid = num_steps // chunk

    def kernel(*refs):
        # inputs: state(7: … + episode), env ids, actor w/b pairs, critic
        # w/b pairs, mix, log_std, seed[2] = (noise seed, kick salt)
        (x_ref, p_ref, status_ref, ticks_ref, steps_ref, pshape_ref,
         ep_ref, eid_ref) = refs[:8]
        w_off = 8
        actor_w = [(refs[w_off + 2 * i][:], refs[w_off + 2 * i + 1][:])
                   for i in range(n_actor)]
        c_off = w_off + 2 * n_actor
        critic_w = [(refs[c_off + 2 * i][:], refs[c_off + 2 * i + 1][:])
                    for i in range(n_critic)]
        mix_ref = refs[c_off + 2 * n_critic]
        ls_ref = refs[c_off + 2 * n_critic + 1]
        seed_ref = refs[c_off + 2 * n_critic + 2]
        out_off = c_off + 2 * n_critic + 3
        (obs_out, act_out, lp_out, val_out, rew_out, done_out,
         x_out, p_out, status_out, ticks_out, steps_out,
         pshape_out, ep_out) = refs[out_off:out_off + 13]
        (x_s, p_s, status_s, ticks_s, steps_s,
         pshape_s, ep_s) = refs[out_off + 13:out_off + 20]

        i = pl.program_id(0)
        if not interpret:
            # fresh, step-indexed PRNG stream per grid step (the hardware
            # PRNG state does not need to survive grid iterations this way)
            pltpu.prng_seed(seed_ref[0] + i)
        draw_counter = [0]

        @pl.when(i == 0)
        def _():
            x_s[:] = x_ref[:]
            p_s[:] = p_ref[:]
            status_s[:] = status_ref[:]
            ticks_s[:] = ticks_ref[:]
            steps_s[:] = steps_ref[:]
            pshape_s[:] = pshape_ref[:]
            ep_s[:] = ep_ref[:]

        xs = tuple(x_s[j] for j in range(12))
        ps = tuple(p_s[j] for j in range(6))
        env = (xs, ps, status_s[:], ticks_s[:], steps_s[:], pshape_s[:],
               ep_s[:])
        eid = eid_ref[:]
        kick_salt = seed_ref[1]
        log_std = ls_ref[:]                     # (A, 1)
        std = jnp.exp(log_std)
        dtype = pshape_s.dtype

        def mlp(weights, h, n):
            for li, (w, bias) in enumerate(weights):
                h = jnp.dot(w, h, preferred_element_type=h.dtype) + bias
                if li < n - 1:
                    h = jnp.tanh(h)
            return h

        def u01(shp):
            if interpret:
                # software fallback: murmur3-finalizer hash of
                # (element index, seed, grid step, draw counter)
                draw_counter[0] += 1
                idx = (jax.lax.broadcasted_iota(jnp.uint32, shp, 0)
                       * jnp.uint32(shp[-1])
                       + jax.lax.broadcasted_iota(jnp.uint32, shp, 1))
                x = (idx
                     ^ (seed_ref[0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
                     ^ (i.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
                     ^ jnp.uint32((draw_counter[0] * 0xC2B2AE35)
                                  & 0xFFFFFFFF))
                x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
                x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
                x = x ^ (x >> 16)
                return (x >> 8).astype(dtype) * (2.0 ** -24)
            bits = pltpu.bitcast(pltpu.prng_random_bits(shp), jnp.uint32)
            i24 = pltpu.bitcast(bits >> 8, jnp.int32)
            return i24.astype(dtype) * (2.0 ** -24)

        def normal(shp):
            """Box-Muller."""
            u1 = u01(shp) + (2.0 ** -25)        # (0, 1]: keeps log finite
            u2 = u01(shp)
            return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(
                (2.0 * math.pi) * u2)

        a_dim = actor_w[-1][0].shape[0]

        for k in range(chunk):
            xs = env[0]
            obs2d = jnp.stack([xs[j] for j in obs_idx]).reshape(n_obs, b)
            if spec.negate_obs:
                obs2d = -obs2d  # ENU observation (attic althold.py:48-50)
            h = obs2d / obs_scale
            mean = mlp(actor_w, h, n_actor) + action_bias
            value = mlp(critic_w, h, n_critic)[0]          # (B,)
            z = normal((a_dim, b))
            action = mean + std * z
            # diagonal-Gaussian log density (ppo._log_prob with
            # z = (action - mean) / std)
            lp = jnp.sum(-0.5 * z * z - log_std - 0.5 * LN_2PI, axis=0)

            env_action = hover * (1.0 + action)
            motors = jnp.clip(env_action, 0.0, 1.0)
            if identity_mix:
                m4 = motors  # identity mix: exact, skip the dot
            else:
                m4 = jnp.dot(mix_ref[:], motors, preferred_element_type=dtype)
            u = tuple(v.reshape(shape) for v in
                      pr.motor_mix_terms(m4, env_params, dtype))
            env, reward, done = env_step(env, u, eid, kick_salt)

            obs_out[k] = obs2d
            act_out[k] = action
            lp_out[k] = lp
            val_out[k] = value
            rew_out[k] = reward
            done_out[k] = done.astype(dtype)

        xs, ps, status, ticks, steps, pshape, ep = env
        for j in range(12):
            x_s[j] = xs[j]
        for j in range(6):
            p_s[j] = ps[j]
        status_s[:] = status
        ticks_s[:] = ticks
        steps_s[:] = steps
        pshape_s[:] = pshape
        ep_s[:] = ep

        @pl.when(i == n_grid - 1)
        def _():
            for j in range(12):
                x_out[j] = xs[j]
            for j in range(6):
                p_out[j] = ps[j]
            status_out[:] = status
            ticks_out[:] = ticks
            steps_out[:] = steps
            pshape_out[:] = pshape
            ep_out[:] = ep

    return kernel


@functools.partial(jax.jit, static_argnames=(
    'num_steps', 'env_params', 'spec', 'obs_scale', 'action_bias', 'hover',
    'n_actor', 'n_critic', 'interpret'))
def _rollout(state_arrays, flat_actor, flat_critic, log_std, seed,
             kick_salt, *,
             num_steps, env_params, spec, obs_scale, action_bias, hover,
             n_actor, n_critic, interpret):
    x, perturb, status, ticks, steps, pshape, episode, env_ids = state_arrays
    dtype = x.dtype
    b = x.shape[-1]
    r = b // pr.LANES
    shape = (r, pr.LANES)
    chunk = _chunk_for(num_steps)
    n_grid = num_steps // chunk
    n_obs = len(spec.obs_indices)
    a_dim = spec.action_size

    kernel = _build_actor_kernel(env_params, spec, num_steps, chunk, shape,
                                 n_actor, n_critic, obs_scale, action_bias,
                                 hover, interpret)

    def rs(a):
        return a.reshape(a.shape[:-1] + shape)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def t_block(*feat):
        """(T, *feat) output blocked (chunk, *feat) along time."""
        return pl.BlockSpec((chunk,) + feat,
                            lambda i: (i,) + (0,) * len(feat),
                            memory_space=pltpu.VMEM)

    def const_block(*feat):
        return pl.BlockSpec(feat, lambda i: (0,) * len(feat),
                            memory_space=pltpu.VMEM)

    n_weights = len(flat_actor) + len(flat_critic)
    in_specs = ([const_block(12, r, pr.LANES), const_block(6, r, pr.LANES)]
                + [const_block(r, pr.LANES)] * 6
                + [vmem] * (n_weights + 2) + [smem])

    out_shape = (
        jax.ShapeDtypeStruct((num_steps, n_obs, b), dtype),      # obs
        jax.ShapeDtypeStruct((num_steps, a_dim, b), dtype),      # action
        jax.ShapeDtypeStruct((num_steps, b), dtype),             # log_prob
        jax.ShapeDtypeStruct((num_steps, b), dtype),             # value
        jax.ShapeDtypeStruct((num_steps, r, pr.LANES), dtype),   # reward
        jax.ShapeDtypeStruct((num_steps, r, pr.LANES), dtype),   # done
        jax.ShapeDtypeStruct((12, r, pr.LANES), dtype),
        jax.ShapeDtypeStruct((6, r, pr.LANES), dtype),
        jax.ShapeDtypeStruct((r, pr.LANES), jnp.int32),
        jax.ShapeDtypeStruct((r, pr.LANES), jnp.int32),
        jax.ShapeDtypeStruct((r, pr.LANES), jnp.int32),
        jax.ShapeDtypeStruct((r, pr.LANES), dtype),
        jax.ShapeDtypeStruct((r, pr.LANES), jnp.int32),          # episode
    )
    out_specs = (
        t_block(n_obs, b), t_block(a_dim, b), t_block(b), t_block(b),
        t_block(r, pr.LANES), t_block(r, pr.LANES),
        const_block(12, r, pr.LANES), const_block(6, r, pr.LANES),
        const_block(r, pr.LANES), const_block(r, pr.LANES),
        const_block(r, pr.LANES), const_block(r, pr.LANES),
        const_block(r, pr.LANES),
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((12, r, pr.LANES), dtype),
            pltpu.VMEM((6, r, pr.LANES), dtype),
            pltpu.VMEM((r, pr.LANES), jnp.int32),
            pltpu.VMEM((r, pr.LANES), jnp.int32),
            pltpu.VMEM((r, pr.LANES), jnp.int32),
            pltpu.VMEM((r, pr.LANES), dtype),
            pltpu.VMEM((r, pr.LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rs(x), rs(perturb), rs(status), rs(ticks), rs(steps), rs(pshape),
      rs(episode), rs(env_ids),
      *flat_actor, *flat_critic,
      jnp.asarray(spec.mix_matrix, dtype),
      jnp.asarray(log_std, dtype).reshape(-1, 1),
      jnp.stack([jnp.asarray(seed, jnp.int32),
                 jnp.asarray(kick_salt, jnp.int32)]))

    (obs, action, lp, value, reward, done,
     xf, pf, statusf, ticksf, stepsf, pshapef, epf) = outs

    def fl(a):
        return a.reshape(a.shape[:-2] + (b,))

    traj = FusedTrajectory(obs=obs, action=action, log_prob=lp, value=value,
                           reward=fl(reward), done=fl(done))
    final = (fl(xf), fl(pf), fl(statusf), fl(ticksf), fl(stepsf), fl(pshapef),
             fl(epf))
    return traj, final


def fused_training_rollout(
    params,
    state: EnvState,
    num_steps: int,
    env_params: EnvParams,
    spec: TaskSpec,
    *,
    obs_scale: float,
    action_bias: float,
    hover: float,
    seed,
    kick_salt=None,
    env_ids=None,
    interpret: Optional[bool] = None,
):
    """PPO exploration rollout as one kernel launch.

    params: ppo-style dict {'actor': [...], 'critic': [...], 'log_std': (A,)}.
    Returns (FusedTrajectory, final EnvState).  `seed` selects the
    exploration-noise stream (vary it per train step; under shard_map it may
    differ per device).  `kick_salt` (default: seed) keys the reset-wind
    hash together with (env_ids, episode) — it must be IDENTICAL on every
    shard so reset kicks are layout-independent (envs/base.py:16-19).
    `env_ids` are the envs' GLOBAL ids (default arange(B) — pass the global
    slice when sharded).
    """
    if not pr.supports(env_params, spec):
        raise ValueError(
            f'task {spec.name!r} is outside the fused-kernel family')
    b = state.dyn.x.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    min_b = (8 * pr.LANES) if not interpret else pr.LANES
    if b % min_b != 0:
        raise ValueError(f'batch {b} must be a multiple of {min_b}')

    def flatten(layers):
        flat = []
        for layer in layers:
            flat.append(layer['w'])
            flat.append(layer['b'][:, None])
        return tuple(flat)

    if env_ids is None:
        env_ids = jnp.arange(b, dtype=jnp.int32)
    if kick_salt is None:
        kick_salt = seed
    arrays = (state.dyn.x, state.dyn.perturb, state.dyn.status,
              state.dyn.ticks, state.steps, state.prev_shaping,
              state.episode, jnp.asarray(env_ids, jnp.int32))
    traj, final = _rollout(
        arrays, flatten(params['actor']), flatten(params['critic']),
        params['log_std'], seed, kick_salt,
        num_steps=num_steps, env_params=env_params, spec=spec,
        obs_scale=float(obs_scale), action_bias=float(action_bias),
        hover=float(hover), n_actor=len(params['actor']),
        n_critic=len(params['critic']), interpret=interpret)

    x, perturb, status, ticks, steps, pshape, episode = final
    # initial_random_x is a render-only field (see
    # pallas_rollout.fused_rollout docstring)
    new_state = EnvState(
        dyn=DynamicsState(x=x, status=status, perturb=perturb, ticks=ticks),
        prev_shaping=pshape, steps=steps,
        episode=episode,
        initial_random_x=state.initial_random_x)
    return traj, new_state

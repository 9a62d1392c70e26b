"""Fused policy-inference + environment rollout as one Pallas TPU kernel.

The PPO evaluation loop (learn/ppo.py `make_eval_fn`) alternates an MLP
forward pass with an env step, T times, under `lax.scan` — every iteration
round-trips the env state and policy activations through HBM.  This kernel
fuses the whole evaluation episode: the actor MLP runs on the MXU
((out, in) @ (in, B) with the env batch on the lane dimension), the
dynamics/reward/termination/reset transition runs on the VPU (shared with
the constant-action kernel via `pallas_rollout.make_env_step`), and nothing
leaves VMEM until the final per-env returns are written back.

Semantics replicate `make_eval_fn` exactly (learn/ppo.py:254-284):
deterministic mean actions, `env_action = hover * (1 + mean)`, per-env
return accumulated until the FIRST done.  In-kernel auto-resets use zero
wind kicks — post-first-done lanes are masked out of the return, so the
metric is bit-identical to the XLA path's regardless of reset randomness.

This is the serving/inference configuration: policy + environment fused
into a single kernel launch per evaluation batch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base
from gym_copter_tpu.envs.base import EnvState, TaskSpec
from gym_copter_tpu.ops import pallas_rollout as pr


def _build_eval_kernel(env_params: EnvParams, spec: TaskSpec,
                       num_steps: int, shape, n_layers: int,
                       obs_scale: float, action_bias: float, hover: float):
    env_step = pr.make_env_step(env_params, spec, shape, random_reset=False)
    b = shape[0] * shape[1]
    obs_idx = spec.obs_indices
    mix = np.asarray(spec.mix_matrix, np.float64)
    identity_mix = (mix.shape[0] == mix.shape[1]
                    and np.array_equal(mix, np.eye(mix.shape[0])))

    def kernel(*refs):
        x_ref, p_ref, status_ref, ticks_ref, steps_ref, pshape_ref = refs[:6]
        w_refs = refs[6:6 + 2 * n_layers]
        mix_ref = refs[6 + 2 * n_layers]
        total_out, dones_out = refs[7 + 2 * n_layers:]

        weights = [(w_refs[2 * i][:], w_refs[2 * i + 1][:])
                   for i in range(n_layers)]

        xs = tuple(x_ref[i] for i in range(12))
        ps = tuple(p_ref[i] for i in range(6))
        # episode index / env ids / salt are dead inputs with
        # random_reset=False (eval resets use zero kicks; post-first-done
        # lanes are masked out of the metric anyway)
        zero_i = jnp.zeros(shape, jnp.int32)
        env0 = (xs, ps, status_ref[:], ticks_ref[:], steps_ref[:],
                pshape_ref[:], zero_i)
        total0 = jnp.zeros(shape, pshape_ref.dtype)
        seen0 = jnp.zeros(shape, jnp.int32)

        def policy_mix(xs):
            """obs -> actor mean -> motor thrust/torque accelerations.
            Replicates ppo._policy + base._raw_step's action path +
            pallas_rollout.motor_mix_terms, identical op order."""
            obs = jnp.stack([xs[i] for i in obs_idx]).reshape(len(obs_idx), b)
            if spec.negate_obs:
                obs = -obs  # ENU observation (attic althold.py:48-50)
            h = obs / obs_scale
            for i, (w, bias) in enumerate(weights):
                h = jnp.dot(w, h, preferred_element_type=h.dtype) + bias
                if i < n_layers - 1:
                    h = jnp.tanh(h)
            mean = h + action_bias
            env_action = hover * (1.0 + mean)

            motors = jnp.clip(env_action, 0.0, 1.0)
            if identity_mix:
                m4 = motors  # mix @ motors with an identity mix is exact
            else:
                m4 = jnp.dot(mix_ref[:], motors,
                             preferred_element_type=motors.dtype)
            bz, u2ix, u3iy, u4iz, om = pr.motor_mix_terms(
                m4, env_params, motors.dtype)
            return tuple(v.reshape(shape) for v in (bz, u2ix, u3iy, u4iz, om))

        def one_step(carry):
            env, total, seen = carry
            u = policy_mix(env[0])
            env, reward, done = env_step(env, u, zero_i, jnp.int32(0))
            # return-until-first-done (learn/ppo.py:275-276): this step's
            # reward counts iff no done had been seen BEFORE it
            total = total + jnp.where(seen > 0, 0.0, reward)
            seen = seen | done.astype(jnp.int32)
            return env, total, seen

        carry = jax.lax.fori_loop(
            0, num_steps, lambda _, c: one_step(c), (env0, total0, seen0))
        _, total, seen = carry
        total_out[:] = total
        dones_out[:] = seen

    return kernel


def _flatten_actor(actor):
    """ppo-style actor (list of {'w': (out,in), 'b': (out,)}) -> interleaved
    (w, b[:, None]) arrays."""
    flat = []
    for layer in actor:
        flat.append(layer['w'])
        flat.append(layer['b'][:, None])
    return flat


@functools.partial(jax.jit, static_argnames=(
    'num_steps', 'env_params', 'spec', 'obs_scale', 'action_bias', 'hover',
    'interpret'))
def _eval(state_arrays, flat_weights, *, num_steps, env_params, spec,
          obs_scale, action_bias, hover, interpret):
    x, perturb, status, ticks, steps, pshape = state_arrays
    dtype = x.dtype
    b = x.shape[-1]
    r = b // pr.LANES
    shape = (r, pr.LANES)
    n_layers = len(flat_weights) // 2

    kernel = _build_eval_kernel(env_params, spec, num_steps, shape, n_layers,
                                obs_scale, action_bias, hover)

    def rs(a):
        return a.reshape(a.shape[:-1] + shape)

    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    n_in = 7 + len(flat_weights)
    total, seen = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(shape, dtype),
                   jax.ShapeDtypeStruct(shape, jnp.int32)),
        in_specs=[vmem] * n_in,
        out_specs=(vmem, vmem),
        cost_estimate=pl.CostEstimate(
            flops=num_steps * b * (150 + 2 * sum(
                int(w.shape[0]) * int(w.shape[1])
                for w in flat_weights[::2])),
            bytes_accessed=(12 + 6) * b * 4 * 2,
            transcendentals=num_steps * b * 8,
        ),
        interpret=interpret,
    )(rs(x), rs(perturb), rs(status), rs(ticks), rs(steps), rs(pshape),
      *[jnp.asarray(w, dtype) for w in flat_weights],
      jnp.asarray(spec.mix_matrix, dtype))
    return total.reshape(b), seen.reshape(b)


def fused_policy_eval(
    actor,
    state: EnvState,
    num_steps: int,
    env_params: EnvParams,
    spec: TaskSpec,
    *,
    obs_scale: float,
    action_bias: float,
    hover: float,
    interpret: Optional[bool] = None,
):
    """Evaluate a deterministic MLP policy for `num_steps` env steps as ONE
    kernel launch.

    actor: ppo-style list of {'w': (out, in), 'b': (out,)} layers with tanh
    hidden activations (learn/ppo.py `mlp_apply`); the first layer's input
    size must equal spec.obs_size.

    Returns (returns (B,), done_seen (B,) int32): per-env reward summed
    until each env's first termination — the `make_eval_fn` metric.
    """
    if not pr.supports(env_params, spec):
        raise ValueError(
            f'task {spec.name!r} is outside the fused-kernel family')
    if spec.kind == 'target':
        raise ValueError('target obs rows are not state slices')
    b = state.dyn.x.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    # compiled mode: the per-step (B,) <-> (R, 128) relayouts between the
    # MLP (batch on lanes) and the SoA physics (R, 128) tiles require R to
    # be a whole number of (8, 128) f32 tiles
    min_b = (8 * pr.LANES) if not interpret else pr.LANES
    if b % min_b != 0:
        raise ValueError(f'batch {b} must be a multiple of {min_b}')

    arrays = (state.dyn.x, state.dyn.perturb, state.dyn.status,
              state.dyn.ticks, state.steps, state.prev_shaping)
    return _eval(arrays, tuple(_flatten_actor(actor)),
                 num_steps=num_steps, env_params=env_params, spec=spec,
                 obs_scale=float(obs_scale), action_bias=float(action_bias),
                 hover=float(hover), interpret=interpret)


def make_fused_eval_fn(env_params: EnvParams, spec: TaskSpec, cfg,
                       num_envs: int = 1024, num_steps: int = 999,
                       seed: int = 1000, interpret: Optional[bool] = None):
    """Drop-in fused replacement for `learn.ppo.make_eval_fn`: same fresh
    episodes (same seed/env-id reset), same metric, one kernel launch."""
    from gym_copter_tpu.control.heuristics import hover_motor_value

    hover = float(hover_motor_value(env_params))
    base_key = jax.random.PRNGKey(seed)
    env_ids = jnp.arange(num_envs, dtype=jnp.int32)

    def evaluate(params):
        env_state, _ = base.reset(base_key, env_ids,
                                  jnp.zeros(num_envs, jnp.int32),
                                  env_params, spec)
        total, _ = fused_policy_eval(
            params['actor'], env_state, num_steps, env_params, spec,
            obs_scale=cfg.obs_scale, action_bias=cfg.init_action_bias,
            hover=hover, interpret=interpret)
        return total.mean(), total

    return evaluate

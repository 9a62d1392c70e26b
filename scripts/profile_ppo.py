#!/usr/bin/env python3
"""Phase breakdown of the PPO train step on the real chip (VERDICT r3 item 3).

Times, with the same tunnel-aware differential method as bench.py:
  * rollout only (T=128 scan, B envs)
  * rollout + GAE + flatten (no updates)
  * the update phase alone (epochs x minibatches scan on pre-made data)
  * within the update: gather-only vs grad-only variants to separate the
    permutation gather (learn/ppo.py update_epoch) from the backward pass
  * the full train step

Usage:  python scripts/profile_ppo.py [--envs 4096] [--hidden 128]
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.learn import ppo


def timeit(fn, reps=8, n_lo=3, n_hi=13):
    """Differential timing: fn(n) must run the op n times and host-sync."""
    fn(2)  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(n_lo)
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(n_hi)
        t_hi = time.perf_counter() - t0
        times.append((t_hi - t_lo) / (n_hi - n_lo))
    return statistics.median(times)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', type=int, default=4096)
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--rollout', type=int, default=128)
    p.add_argument('--out', default=None)
    args = p.parse_args()
    B, T = args.envs, args.rollout

    params = EnvParams(vehicle=vehicles.DJI_PHANTOM)
    spec = tasks.LANDER_3D
    cfg = ppo.resolve_minibatches(
        ppo.PPOConfig(rollout_steps=T, hidden=args.hidden), B)
    key = jax.random.PRNGKey(0)
    env_ids = jnp.arange(B, dtype=jnp.int32)
    train_step, opt = ppo.make_train_step(params, spec, cfg,
                                          jax.random.PRNGKey(1), env_ids)
    ts = ppo.init_train_state(key, params, spec, cfg, B, opt)
    net = ts.params

    results = {'backend': jax.default_backend(), 'envs': B, 'rollout': T,
               'hidden': args.hidden, 'epochs': cfg.epochs,
               'minibatches': cfg.minibatches}

    # ---- full step ----
    step = jax.jit(train_step)

    def run_full(n):
        t = ts
        for _ in range(n):
            t, m = step(t)
        float(m['reward_per_step'])
    results['full_step_s'] = timeit(run_full)

    # ---- rollout only ----
    hover = float(__import__('gym_copter_tpu.control.heuristics',
                             fromlist=['x']).hover_motor_value(params))
    base_key = jax.random.PRNGKey(1)

    @jax.jit
    def rollout_only(net, state, obs, key):
        def step_fn(carry, _):
            env_state, obs, key = carry
            key, sub = jax.random.split(key)
            mean, log_std, value = ppo._policy(net, obs, cfg)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                sub, mean.shape, mean.dtype)
            env_state, tr = base.step(env_state, hover * (1.0 + action),
                                      base_key, env_ids, params, spec)
            return (env_state, tr.obs, key), (obs, action, tr.reward, tr.done)

        (env_state, obs, key), traj = jax.lax.scan(
            step_fn, (state, obs, key), None, length=T)
        return traj[2].sum()

    obs0 = base._get_obs(ts.env_state.dyn.x, ts.env_state.steps, params, spec)

    def run_rollout(n):
        for i in range(n):
            r = rollout_only(net, ts.env_state, obs0,
                             jax.random.fold_in(key, i))
        float(r)
    results['rollout_s'] = timeit(run_rollout)

    # ---- update phase alone, on synthetic flat data ----
    N = T * B
    kd = jax.random.split(jax.random.PRNGKey(3), 6)
    flat = (jax.random.normal(kd[0], (spec.obs_size, N)),
            jax.random.normal(kd[1], (spec.action_size, N)),
            jax.random.normal(kd[2], (N,)),
            jax.random.normal(kd[3], (N,)),
            jax.random.normal(kd[4], (N,)),
            jax.random.normal(kd[5], (N,)))

    optimizer = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                            optax.adam(cfg.learning_rate))
    opt_state = optimizer.init(net)

    def make_update(gather_mode):
        """gather_mode: 'gather' (current), 'preshuffle' (permute once per
        epoch, contiguous minibatch slices), 'none' (contiguous slices of
        unshuffled data — lower bound)."""
        def loss_fn(pp, o, a, lp, v, ad, tg):
            mean, log_std, value = ppo._policy(pp, o, cfg)
            log_prob = ppo._log_prob(mean, log_std, a)
            ratio = jnp.exp(log_prob - lp)
            adn = (ad - ad.mean()) / (ad.std() + 1e-8)
            pg = -jnp.mean(jnp.minimum(
                ratio * adn,
                jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adn))
            vl = 0.5 * jnp.mean((value - tg) ** 2)
            return pg + cfg.value_coef * vl

        @jax.jit
        def update(pp, opt_state, key, flat):
            obs, action, old_lp, old_v, adv, tgt = flat
            n = obs.shape[-1]
            mb = n // cfg.minibatches

            def epoch(carry, _):
                pp, opt_state, key = carry
                key, sub = jax.random.split(key)
                if gather_mode == 'gather':
                    perm = jax.random.permutation(sub, n)
                    data = (obs, action, old_lp, old_v, adv, tgt)
                elif gather_mode == 'preshuffle':
                    perm = jax.random.permutation(sub, n)
                    data = jax.tree.map(
                        lambda x: jnp.take(x, perm, axis=-1),
                        (obs, action, old_lp, old_v, adv, tgt))
                else:
                    data = (obs, action, old_lp, old_v, adv, tgt)

                def minibatch(carry, i):
                    pp, opt_state = carry
                    if gather_mode == 'gather':
                        idx = jax.lax.dynamic_slice_in_dim(perm, i * mb, mb)
                        mbd = jax.tree.map(
                            lambda x: jnp.take(x, idx, axis=-1), data)
                    else:
                        mbd = jax.tree.map(
                            lambda x: jax.lax.dynamic_slice_in_dim(
                                x, i * mb, mb, axis=-1), data)
                    grads = jax.grad(loss_fn)(pp, *mbd)
                    updates, opt_state = optimizer.update(grads, opt_state, pp)
                    pp = optax.apply_updates(pp, updates)
                    return (pp, opt_state), None

                (pp, opt_state), _ = jax.lax.scan(
                    minibatch, (pp, opt_state), jnp.arange(cfg.minibatches))
                return (pp, opt_state, key), None

            (pp, opt_state, key), _ = jax.lax.scan(
                epoch, (pp, opt_state, key), None, length=cfg.epochs)
            return pp
        return update

    for mode in ('gather', 'preshuffle', 'none'):
        upd = make_update(mode)

        def run_upd(n, upd=upd):
            for i in range(n):
                out = upd(net, opt_state, jax.random.fold_in(key, i), flat)
            jax.block_until_ready(out)
            float(out['log_std'][0])
        results[f'update_{mode}_s'] = timeit(run_upd)

    # the production trainer uses block shuffling, so its update share is
    # full - rollout; the three update_* variants above are the DIAGNOSTIC
    # alternatives that motivated it (element gather / materialized element
    # permutation / unshuffled lower bound — learn/ppo.py shuffle_block)
    # ---- bf16-matmul variant of the full production step ----
    cfg_bf16 = cfg._replace(matmul_dtype='bfloat16')
    step_bf16, opt_bf16 = ppo.make_train_step(params, spec, cfg_bf16,
                                              jax.random.PRNGKey(1), env_ids)
    ts_bf16 = ppo.init_train_state(key, params, spec, cfg_bf16, B, opt_bf16)
    jit_bf16 = jax.jit(step_bf16)

    def run_bf16(n):
        t = ts_bf16
        for _ in range(n):
            t, m = jit_bf16(t)
        float(m['reward_per_step'])
    results['full_step_bf16_s'] = timeit(run_bf16)

    # ---- analytic MFU accounting for the update phase ----
    # per transition per epoch: fwd actor+critic (2*sum(in*out) each) and
    # backward ~2x fwd (dgrad + wgrad); the log-prob/loss elementwise work
    # is negligible next to the dots
    h, O, A = args.hidden, spec.obs_size, spec.action_size
    fwd_flops = 2 * ((O * h + h * h + h * A) + (O * h + h * h + h * 1))
    update_flops = 3 * fwd_flops * N * cfg.epochs
    V5E_BF16_PEAK = 197e12
    update_actual = results['full_step_s'] - results['rollout_s']
    if update_actual > 1e-4:
        achieved = update_flops / update_actual
        results['mfu'] = {
            'update_flops_analytic': update_flops,
            'achieved_flops_per_sec': achieved,
            'fraction_of_v5e_bf16_peak': achieved / V5E_BF16_PEAK,
            'note': ('analytic dot FLOPs only; f32 dots do not reach the '
                     'bf16 MXU peak — the bf16 fraction is the honest '
                     'ceiling reference.  full_step_bf16_s shows what '
                     'bf16-with-f32-accumulation buys end to end.'),
        }
    results['accounting'] = {
        'rollout_pct': 100 * results['rollout_s'] / results['full_step_s'],
        'update_actual_s': update_actual,
        'update_pct': 100 * update_actual / results['full_step_s'],
    }
    if update_actual > 1e-4:
        # full_step_s and rollout_s are independently timed; when the
        # subtraction lands at ~0 (timing noise, or a rollout-dominated
        # config) the ratios below are garbage — skip them rather than
        # report inf
        results['accounting'].update({
            'element_gather_vs_actual':
                results['update_gather_s'] / update_actual,
            'unshuffled_lower_bound_vs_actual':
                results['update_none_s'] / update_actual,
        })
    else:
        results['accounting']['ratios_skipped'] = (
            'update_actual <= 0.1 ms — subtraction of independently timed '
            'quantities is noise-dominated at this scale')
    print(json.dumps(results, indent=1))
    if args.out:
        with open(args.out, 'w') as f:
            json.dump(results, f, indent=1)


if __name__ == '__main__':
    main()

"""Fused PPO training-rollout kernel vs the XLA scan rollout.

With the noise scale collapsed below f32 resolution (log_std = -60) both
paths take identical mean actions, so trajectories must agree to float
tolerance.  (Not bit-exactness: XLA's algebraic simplifier constant-folds
multiplication chains differently across separately compiled programs, so
ulp-level drift between the oracle and the kernel is expected and allowed
here — the training rollout's RNG stream is kernel-internal anyway.)

Also checks the exploration-noise statistics and the PPO integration
(one fused-rollout train step end-to-end in interpret mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_copter_tpu.control.heuristics import hover_motor_value
from gym_copter_tpu.core import vehicles
from gym_copter_tpu.core.types import EnvParams, TaskParams
from gym_copter_tpu.envs import base, tasks
from gym_copter_tpu.learn import ppo
from gym_copter_tpu.ops import pallas_actor as pa

B = 128


def _setup(log_std, max_steps=40, hidden=16):
    spec = tasks.HOVER_3D
    env_params = EnvParams(vehicle=vehicles.DJI_PHANTOM,
                           task=TaskParams(initial_random_force=0.0,
                                           max_steps=max_steps))
    # widen the clamp window so init_log_std passes through _policy
    # unclamped (the zero-noise test relies on log_std = -60 staying -60;
    # the training integration clamps before the kernel, ppo.py train_step)
    cfg = ppo.PPOConfig(hidden=hidden, init_log_std=log_std,
                        log_std_min=min(
                            ppo.PPOConfig._field_defaults['log_std_min'],
                            log_std))
    params = ppo.init_params(jax.random.PRNGKey(3), spec.obs_size,
                             spec.action_size, cfg)
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(B, dtype=jnp.int32)
    state, obs0 = base.reset(key, ids, jnp.zeros(B, jnp.int32), env_params,
                             spec, dtype=jnp.float32)
    return spec, env_params, cfg, params, key, ids, state, obs0


def test_fused_rollout_matches_scan_with_zero_noise():
    spec, env_params, cfg, params, key, ids, state, obs0 = _setup(-60.0)
    hover = float(hover_motor_value(env_params))
    T = 16

    traj, fin = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=0,
        interpret=True)

    def oracle():
        def step_fn(carry, _):
            env_state, obs, k = carry
            k, sub = jax.random.split(k)
            mean, log_std, value = ppo._policy(params, obs, cfg)
            action = mean + jnp.exp(log_std) * jax.random.normal(
                sub, mean.shape, mean.dtype)
            env_action = hover * (1.0 + action)
            env_state, ts = base.step(env_state, env_action, key, ids,
                                      env_params, spec)
            return (env_state, ts.obs, k), (obs, action, value, ts.reward,
                                            ts.done)
        (fs, _, _), tr = jax.lax.scan(
            step_fn, (state, obs0, jax.random.PRNGKey(9)), None, length=T)
        return fs, tr

    fs, (o, a, v, r, d) = jax.jit(oracle)()
    np.testing.assert_allclose(np.asarray(traj.obs), np.asarray(o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj.action), np.asarray(a),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj.value), np.asarray(v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj.reward), np.asarray(r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(traj.done),
                                  np.asarray(d.astype(jnp.float32)))
    np.testing.assert_allclose(np.asarray(fin.dyn.x), np.asarray(fs.dyn.x),
                               rtol=1e-5, atol=1e-5)


def test_exploration_noise_statistics():
    """z = (action - mean)/std must look standard-normal and the log_prob
    must match ppo._log_prob recomputed from (mean, log_std, action)."""
    spec, env_params, cfg, params, key, ids, state, obs0 = _setup(-1.0)
    hover = float(hover_motor_value(env_params))
    T = 64
    traj, _ = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=7,
        interpret=True)

    # recompute per-step: policy on stored obs must reproduce the stored
    # log_prob through ppo's own density function
    def check(obs_t, act_t, lp_t):
        m, ls, _ = ppo._policy(params, obs_t, cfg)
        lp = ppo._log_prob(m, ls, act_t)
        return jnp.max(jnp.abs(lp - lp_t))
    errs = jax.vmap(check)(traj.obs, traj.action, traj.log_prob)
    assert float(jnp.max(errs)) < 1e-3

    # noise statistics over T*A*B samples
    m_all = jax.vmap(lambda o: ppo._policy(params, o, cfg)[0])(traj.obs)
    z = (traj.action - m_all) * jnp.exp(-params['log_std'][None, :, None])
    z = np.asarray(z).ravel()
    assert abs(z.mean()) < 0.02
    assert abs(z.std() - 1.0) < 0.02
    # different seed -> different noise
    traj2, _ = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=8,
        interpret=True)
    assert not bool(jnp.all(traj2.action == traj.action))
    # same seed -> identical
    traj3, _ = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=7,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(traj3.action),
                                  np.asarray(traj.action))


@pytest.mark.skipif(jax.default_backend() != 'tpu',
                    reason='validates the HARDWARE PRNG Box-Muller stream')
def test_hardware_noise_stream_tpu():
    """The real chip's exploration noise (pltpu.prng_random_bits ->
    Box-Muller, ops/pallas_actor.py) — the stream CPU tests never see
    (interpret mode substitutes a murmur-style hash): standard-normal
    moments and tails, stored log_prob consistent with a recompute from
    (obs, action, params), and seed-keyed determinism (VERDICT round-2
    item 6)."""
    spec, env_params, cfg, params, key, ids, state, obs0 = _setup(-1.0)
    # hardware kernel needs >= 8*128 envs per launch
    big = 8 * 128
    ids = jnp.arange(big, dtype=jnp.int32)
    state, _ = base.reset(key, ids, jnp.zeros(big, jnp.int32), env_params,
                          spec, dtype=jnp.float32)
    hover = float(hover_motor_value(env_params))
    T = 64
    traj, _ = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=7)

    # stored log_prob == ppo._log_prob recomputed from (obs, action)
    def check(obs_t, act_t, lp_t):
        m, ls, _ = ppo._policy(params, obs_t, cfg)
        return jnp.max(jnp.abs(ppo._log_prob(m, ls, act_t) - lp_t))
    errs = jax.vmap(check)(traj.obs, traj.action, traj.log_prob)
    assert float(jnp.max(errs)) < 1e-3

    # Box-Muller sample statistics over T*A*B = 262144 draws
    m_all = jax.vmap(lambda o: ppo._policy(params, o, cfg)[0])(traj.obs)
    z = np.asarray((traj.action - m_all)
                   * jnp.exp(-params['log_std'][None, :, None])).ravel()
    n = z.size
    assert abs(z.mean()) < 4.0 / np.sqrt(n)           # ~4 sigma bound
    assert abs(z.std() - 1.0) < 0.01
    assert abs(np.mean(z ** 3)) < 0.03                # skewness ~ 0
    assert abs(np.mean(z ** 4) - 3.0) < 0.1           # kurtosis ~ 3
    assert abs(np.mean(np.abs(z) > 1.959964) - 0.05) < 0.005  # 5% tail
    # no duplicated draws across steps (a stuck PRNG would repeat rows)
    assert not np.array_equal(np.asarray(traj.action[0]),
                              np.asarray(traj.action[1]))

    # seed-keyed determinism on hardware
    traj2, _ = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=7)
    np.testing.assert_array_equal(np.asarray(traj2.action),
                                  np.asarray(traj.action))


@pytest.mark.parametrize('n_shards', [2, 8])
def test_training_rollout_kicks_layout_independent(n_shards):
    """With exploration noise collapsed but reset randomness ON
    (initial_random_force=30), the fused training rollout must be
    bit-identical sharded vs unsharded: the reset-kick hash keys on GLOBAL
    (env id, episode, salt), never the shard (envs/base.py:16-19)."""
    from gym_copter_tpu.parallel import sharding as sh

    if len(jax.devices()) < n_shards:
        pytest.skip('needs %d virtual devices' % n_shards)
    spec = tasks.LANDER_3D
    big = 8 * B
    env_params = EnvParams(vehicle=vehicles.DJI_PHANTOM,
                           task=TaskParams(initial_random_force=30.0,
                                           max_steps=30))
    cfg = ppo.PPOConfig(hidden=16, init_log_std=-60.0)
    params = ppo.init_params(jax.random.PRNGKey(3), spec.obs_size,
                             spec.action_size, cfg)
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(big, dtype=jnp.int32)
    state, _ = base.reset(key, ids, jnp.zeros(big, jnp.int32), env_params,
                          spec, dtype=jnp.float32)
    hover = float(hover_motor_value(env_params))
    T = 70  # > 2 episode caps: auto-resets with kicks happen in-kernel

    mesh = sh.make_mesh(jax.devices()[:n_shards])
    s_traj, s_fin = sh.sharded_fused_training_rollout(
        params, sh.shard_env_state(state, mesh), T, env_params, spec, mesh,
        obs_scale=cfg.obs_scale, action_bias=cfg.init_action_bias,
        hover=hover, seed=5, interpret=True)
    u_traj, u_fin = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=5,
        interpret=True)
    assert float(jnp.sum(u_traj.done)) > 0  # kicks actually drawn
    # Everything the kick stream determines is BITWISE layout-independent:
    # final perturb (pending kicks), episode indices, done pattern, final
    # state.  The kick arithmetic itself is fusion-proof (exact 2u-1 +
    # single rounded multiply, pallas_rollout.make_env_step).
    np.testing.assert_array_equal(np.asarray(s_fin.dyn.x),
                                  np.asarray(u_fin.dyn.x))
    np.testing.assert_array_equal(np.asarray(s_fin.dyn.perturb),
                                  np.asarray(u_fin.dyn.perturb))
    np.testing.assert_array_equal(np.asarray(s_fin.episode),
                                  np.asarray(u_fin.episode))
    np.testing.assert_array_equal(np.asarray(s_traj.done),
                                  np.asarray(u_traj.done))
    # Intermediate trajectory/reward: tight tolerance rather than bitwise —
    # in INTERPRET mode the kernel body is ordinary XLA, and the program
    # inside shard_map fuses a physics expression differently than the
    # program outside it (~1 ULP on ~1e-6 attitude values; observed on 1
    # env in 1024).  This is a CPU-interpreter artifact of comparing two
    # different XLA programs, not kick keying: the constant-action kernel's
    # 1/2/4/8-shard test (test_pallas_rollout.py) holds full bitwise state
    # parity with kicks on, and on hardware every shard runs the same
    # Mosaic kernel arithmetic.
    np.testing.assert_allclose(np.asarray(s_traj.obs),
                               np.asarray(u_traj.obs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_traj.reward),
                               np.asarray(u_traj.reward),
                               rtol=1e-5, atol=1e-4)


def test_sharded_fused_training_rollout_matches_unsharded():
    """Sharding the fused PPO rollout over the 8-device CPU mesh must not
    change the trajectory when the noise scale is collapsed (mean actions,
    deterministic env)."""
    from gym_copter_tpu.parallel import sharding as sh

    spec = tasks.HOVER_3D
    n_dev = len(jax.devices())
    big = n_dev * B
    env_params = EnvParams(vehicle=vehicles.DJI_PHANTOM,
                           task=TaskParams(initial_random_force=0.0,
                                           max_steps=40))
    cfg = ppo.PPOConfig(hidden=16, init_log_std=-60.0)
    params = ppo.init_params(jax.random.PRNGKey(3), spec.obs_size,
                             spec.action_size, cfg)
    key = jax.random.PRNGKey(0)
    ids = jnp.arange(big, dtype=jnp.int32)
    state, _ = base.reset(key, ids, jnp.zeros(big, jnp.int32), env_params,
                          spec, dtype=jnp.float32)
    hover = float(hover_motor_value(env_params))
    T = 12

    mesh = sh.make_mesh()
    s_traj, s_fin = sh.sharded_fused_training_rollout(
        params, sh.shard_env_state(state, mesh), T, env_params, spec, mesh,
        obs_scale=cfg.obs_scale, action_bias=cfg.init_action_bias,
        hover=hover, seed=0, interpret=True)
    u_traj, u_fin = pa.fused_training_rollout(
        params, state, T, env_params, spec, obs_scale=cfg.obs_scale,
        action_bias=cfg.init_action_bias, hover=hover, seed=0,
        interpret=True)
    np.testing.assert_allclose(np.asarray(s_traj.obs), np.asarray(u_traj.obs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_traj.reward),
                               np.asarray(u_traj.reward),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_traj.done),
                                  np.asarray(u_traj.done))
    np.testing.assert_allclose(np.asarray(s_fin.dyn.x),
                               np.asarray(u_fin.dyn.x),
                               rtol=1e-6, atol=1e-6)


def test_ppo_train_step_with_fused_sharded_mesh():
    """Full PPO update on the virtual mesh with the shard_mapped fused
    rollout: the real multi-chip training configuration, compiled and
    executed end-to-end."""
    from gym_copter_tpu.parallel import sharding as sh

    spec = tasks.HOVER_3D
    n_dev = len(jax.devices())
    num_envs = n_dev * B
    env_params = EnvParams(vehicle=vehicles.DJI_PHANTOM,
                           task=TaskParams(max_steps=40,
                                           initial_random_force=0.0))
    cfg = ppo.PPOConfig(hidden=16, rollout_steps=8, minibatches=2, epochs=2)
    key = jax.random.PRNGKey(1)
    ids = jnp.arange(num_envs, dtype=jnp.int32)
    mesh = sh.make_mesh()
    train_step, optimizer = ppo.make_train_step(
        env_params, spec, cfg, key, ids, rollout_mode='fused',
        interpret=True, mesh=mesh)
    ts = ppo.init_train_state(jax.random.PRNGKey(2), env_params, spec, cfg,
                              num_envs, optimizer)
    ts = ppo.TrainState(params=sh.replicate(ts.params, mesh),
                        opt_state=sh.replicate(ts.opt_state, mesh),
                        env_state=sh.shard_env_state(ts.env_state, mesh),
                        obs=sh.shard_env_state(ts.obs, mesh),
                        key=ts.key, update_idx=ts.update_idx)
    ts2, metrics = jax.jit(train_step)(ts)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
    assert int(ts2.update_idx) == 1


def test_ppo_train_step_with_fused_rollout():
    """One full PPO update driven by the fused rollout: finite metrics and
    matching Transition layout."""
    spec, env_params, cfg, params, key, ids, state, obs0 = _setup(
        -1.0, hidden=16)
    cfg = cfg._replace(rollout_steps=8, minibatches=2, epochs=2)
    train_step, optimizer = ppo.make_train_step(
        env_params, spec, cfg, key, ids, rollout_mode='fused',
        interpret=True)
    ts = ppo.init_train_state(jax.random.PRNGKey(2), env_params, spec, cfg,
                              B, optimizer)
    ts2, metrics = train_step(ts)
    for k, v in metrics.items():
        assert bool(jnp.isfinite(v)), k
    assert int(ts2.update_idx) == 1

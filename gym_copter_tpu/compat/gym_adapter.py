"""Single-env Gymnasium drop-in wrapper.

Gives users of the reference (`gym.make('gym_copter:Lander-v0')`,
gym_copter/__init__.py:9-13) the same 5-tuple API on top of the batched JAX
engine: a B=1 slice of the lockstep step, with numpy in/out, matching
observation/action spaces, and the reference's seeding-and-reset protocol.

Two seeding modes:
  * default: JAX key-derived perturbations (deterministic per (seed, episode));
  * legacy_seeding=True: draw the reset wind kick from *global* `np.random`
    exactly like the reference (task.py:71-75, 199-202), so seeded reference
    trajectories can be replayed bit-for-bit (with dtype=float64).

Also registers `GymCopterTpu/<Name>` ids with the Gymnasium registry on
import, so `gymnasium.make('GymCopterTpu/Lander-v0')` works.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax.numpy as jnp

import gymnasium as gym
from gymnasium import spaces

from gym_copter_tpu.core import constants as C
from gym_copter_tpu.core.types import EnvParams
from gym_copter_tpu.envs import registry, tasks
from gym_copter_tpu.envs.base import EnvState


class GymCopterEnv(gym.Env):
    """Gymnasium Env facade over one JAX-stepped copter environment.

    Mirrors the reference `_Task` surface: Box obs space (±inf, float32),
    Box action space ([-1, 1]^n) (task.py:46-55), `step` returning
    (obs, reward, terminated, False, {}) with terminated semantics identical
    to the reference's `done` (truncation is folded into terminated exactly
    like task.py:128-137), plus `set_altitude` (task.py:67-69) and a
    `pose` attribute for renderers (task.py:102-103).
    """

    metadata = {'render_modes': ['human', 'rgb_array'], 'render_fps': 100}

    def __init__(self, name: str = 'Lander-v0',
                 params: Optional[EnvParams] = None,
                 seed: int = 0,
                 legacy_seeding: bool = False,
                 dtype=jnp.float32):
        self._name = name
        self._env = registry.make(name, num_envs=1, params=params, seed=seed,
                                  dtype=dtype)
        self._legacy_seeding = legacy_seeding
        self._dtype = dtype
        self._state: Optional[EnvState] = None
        self._episode = 0
        self._initial_altitude: Optional[float] = None
        self.viewer = None
        self.pose = None
        self.done = False
        self.spinning = False

        spec = self._env.spec
        self.observation_space = spaces.Box(
            -np.inf, np.inf, shape=(spec.obs_size,), dtype=np.float32)
        self.action_space = spaces.Box(
            -1.0, 1.0, shape=(spec.action_size,), dtype=np.float32)
        self.STATE_NAMES = _state_names(spec)
        self.FRAMES_PER_SECOND = int(round(1.0 / self._env.params.task.dt))

    # -- reference `_Task.set_altitude` (task.py:67-69): stores the start
    # altitude used by subsequent resets.  Implemented as a reset-time pose
    # override rather than rebuilding the env handle, so calling it
    # per-episode (like the attic scripts do) never re-jits anything.
    def set_altitude(self, altitude):
        self._initial_altitude = float(altitude)

    def seed(self, seed=None):
        """Reference `_Task.seed` (task.py:71-75): seeds global np.random
        (used by the legacy perturbation path)."""
        np.random.seed(seed)
        return [seed]

    def reset(self, seed=None, options=None, pose=None, perturb=True):
        super().reset(seed=seed)   # seeds gymnasium's np_random per the API
        if seed is not None:
            if self._legacy_seeding:
                np.random.seed(seed)
            else:
                # gymnasium determinism contract: reset(seed=s) must make
                # the episode reproducible — rekey the perturbation stream
                # and restart the episode index (no re-jit: the key is a
                # runtime argument of the compiled reset)
                import jax
                self._env.base_key = jax.random.PRNGKey(seed)
                self._episode = 0
        if pose is None and self._initial_altitude is not None:
            pose = (0.0, 0.0, self._initial_altitude, 0.0, 0.0)

        perturb_force = None
        if not perturb or not self._env.spec.perturb_on_reset:
            # tasks without the reset wind kick (AltHold/Takeoff/Distance/
            # Target/Lander3DSimple) must not consume the legacy np.random
            # stream either — their reference resets never draw from it
            perturb_force = np.zeros((6, 1))
        elif self._legacy_seeding:
            f = self._env.params.task.initial_random_force
            perturb_force = np.zeros((6, 1))
            perturb_force[0, 0] = np.random.uniform(-f, f)
            perturb_force[1, 0] = np.random.uniform(-f, f)
            perturb_force[2, 0] = np.random.uniform(-f, f)

        self._state, obs = self._env.reset(
            episode=self._episode, pose=pose, perturb_force=perturb_force)
        self._episode += 1
        self.done = False
        self._update_pose()
        return np.asarray(obs[:, 0], np.float32), {}

    def step(self, action):
        # keep full precision until the env-dtype cast (a float32 detour
        # would break the float64 legacy bit-replay)
        action = jnp.asarray(np.asarray(action, np.float64)[:, None],
                             self._dtype)
        entry_steps = self._state.steps
        self._state, ts = self._env.step(self._state, action)
        self.done = bool(ts.done[0])
        self.spinning = bool(ts.spinning[0])
        # pose reflects the step's own (terminal) state, not the auto-reset
        # state, matching the reference's post-step pose (task.py:102-103)
        self._update_pose(np.asarray(ts.x[:, 0]))
        if self.done:
            # Gymnasium semantics: step returns the TERMINAL observation
            # (the reference's task.py:133 returns the final state; reset
            # starts the next episode).  The batched TimeStep.obs already
            # belongs to the auto-reset next episode, so re-derive the
            # terminal obs from the finished step's state.
            from gym_copter_tpu.envs.base import _get_obs
            term = _get_obs(ts.x, entry_steps, self._env.params,
                            self._env.spec)
            obs = np.asarray(term[:, 0], np.float32)
        else:
            obs = np.asarray(ts.obs[:, 0], np.float32)
        return obs, float(ts.reward[0]), self.done, False, {}

    def _update_pose(self, x=None):
        if x is None:
            x = np.asarray(self._state.dyn.x[:, 0])
        self.pose = (x[C.STATE_X], x[C.STATE_Y], x[C.STATE_Z],
                     x[C.STATE_PHI], x[C.STATE_THETA], x[C.STATE_PSI])

    def render(self):
        return None if self.viewer is None else self.viewer.render()

    def close(self):
        if self.viewer is not None:
            self.viewer.close()
        super().close()


class GymCopterVisualEnv(GymCopterEnv):
    """Single-env visual variant — the reference's LanderVisual / HoverVisual
    / LanderDVS / HoverDVS wrappers (attic/gym_copter/envs/lander.py:101-138,
    hover3d.py:52-89): `self.image` holds the latest (res, res) camera frame
    (binary) or event frame ({-1,0,+1} when dvs=True)."""

    RES = 16

    def __init__(self, name='Lander-v0', dvs=False, res=None, **kwargs):
        super().__init__(name, **kwargs)
        from gym_copter_tpu.sensors.vision import DVS, VisionSensor
        res = res or self.RES
        self._sensor = DVS(res=res) if dvs else VisionSensor(res=res)
        self._dvs = dvs
        self._prev = None
        self.image = None

    def reset(self, **kwargs):
        self._prev = None
        self.image = None
        return super().reset(**kwargs)

    def step(self, action):
        result = super().step(action)
        x, y, z, phi, theta, psi = self.pose
        curr = np.asarray(self._sensor.get_image(
            x, y, max(-z, 1e-6), np.degrees(phi), np.degrees(theta),
            np.degrees(psi)))
        if self._dvs:
            self.image = (np.zeros_like(curr) if self._prev is None
                          else np.sign(self._prev - curr))
            self._prev = curr
        else:
            self.image = curr
        return result


def _state_names(spec):
    full = list(C.STATE_NAMES_12)
    names = [full[i] for i in spec.obs_indices]
    if spec.kind == 'target':
        names += ['TargetX', 'TargetY', 'TargetAlt']
    return names


def _register_all():
    for name in tasks.ALL_TASKS:
        gym_id = f'GymCopterTpu/{name}'
        if gym_id not in gym.registry:
            gym.register(
                id=gym_id,
                entry_point='gym_copter_tpu.compat.gym_adapter:GymCopterEnv',
                max_episode_steps=1000,  # matches gym_copter/__init__.py:12
                kwargs={'name': name},
            )


_register_all()

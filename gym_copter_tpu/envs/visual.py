"""Vision / DVS environment wrappers.

Capability twin of the reference visual variants — `LanderVisual` /
`LanderDVS` (attic/gym_copter/envs/lander.py:101-138) and `HoverVisual` /
`HoverDVS` (attic/gym_copter/envs/hover3d.py:52-89): each step additionally
produces a downward-camera image (binary, res=16 by default) or an event
image in {-1, 0, +1}.  Batched and functional: images are (B, res, res)
and the DVS previous-frame is threaded through an explicit VisualState, so
the whole visual rollout stays inside jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from gym_copter_tpu.envs.registry import CopterEnv
from gym_copter_tpu.sensors.vision import DVS, VisionSensor

RES = 16  # reference wrapper resolution (attic lander.py:103)


class VisualState(NamedTuple):
    env_state: object
    prev: jnp.ndarray   # (B, res, res) previous frame (DVS)
    first: jnp.ndarray  # () bool — reference returns a zero event image on
                        # the first call (dvs.py:37-44)


class VisualCopterEnv:
    """Wraps a CopterEnv; step returns (state, ts, image_batch)."""

    def __init__(self, env: CopterEnv, dvs: bool = False,
                 sensor: Optional[VisionSensor] = None):
        self.env = env
        self.dvs = dvs
        self.sensor = sensor or (DVS(res=RES) if dvs else VisionSensor(res=RES))

    def reset(self, **kwargs):
        env_state, obs = self.env.reset(**kwargs)
        prev = jnp.zeros((self.env.num_envs, self.sensor.res, self.sensor.res),
                         jnp.float32)
        state = VisualState(env_state=env_state, prev=prev,
                            first=jnp.asarray(True))
        return state, obs

    def step(self, state: VisualState, action):
        env_state, ts = self.env.step(state.env_state, action)
        poses = self.sensor.pose_from_state(ts.x)
        curr = self.sensor.get_images(poses)
        if self.dvs:
            events = jnp.where(state.first, jnp.zeros_like(curr),
                               jnp.sign(state.prev - curr))
            image = events
        else:
            image = curr
        new_state = VisualState(env_state=env_state, prev=curr,
                                first=jnp.asarray(False))
        return new_state, ts, image

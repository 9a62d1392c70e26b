"""Synthetic downward-looking vision and DVS (event-camera) sensors.

Capability twin of the reference sensors (attic/gym_copter/sensors/vision/
vs.py, dvs.py), redesigned for batched TPU execution:

  * the reference rasterizes the landing-pad circle with cv2.circle and
    perspective-warps the *image* with cv2.warpPerspective (vs.py:39-65,
    117-199); here the warp is inverted analytically, so each output pixel
    evaluates the circle predicate directly at its inverse-mapped source
    coordinate — no image gather, no OpenCV, pure elementwise math that
    vmaps over thousands of environments;
  * geometry matches the reference: pin-hole scaling by altitude
    (vs.py:109-115: pixel = coord * res / (2 z tan(fov/2)), truncated), the
    P*T*Rtheta*Rpsi*Rphi 4x4 projective chain (vs.py:117-176), the 4-point
    homography, the warp margin crop (vs.py:59-65), and binary
    re-thresholding;
  * DVS: first difference of consecutive frames quantized to {-1, 0, +1}
    (dvs.py:37-52) — the previous frame is carried functionally.

Images are (res, res) for one pose, (B, res, res) batched.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


class VisionSensor:
    """Functional vision sensor; all methods are jit/vmap-safe."""

    def __init__(self, objsize: float = 1.0, res: int = 128,
                 fov: float = 60.0):
        self.objsize = objsize
        self.res = res
        self.fov = fov

        # static warp-frame geometry (vs.py:50-53, 126-131)
        d = math.hypot(res, res)
        half_fov = math.radians(fov / 2)
        self.side_length = int(d / math.cos(half_fov))
        self.side_length_f = d / math.cos(half_fov)
        self.h = d / (2.0 * math.sin(half_fov))
        self.n = self.h - d / 2.0
        self.f = self.h + d / 2.0
        self.margin = (self.side_length - res) // 2

    # -- homography ---------------------------------------------------------

    def _warp_homography(self, psi, theta, phi):
        """3x3 output<-input pixel homography of the reference's
        cv2.getPerspectiveTransform(ptsIn, ptsOut) (vs.py:117-199), built
        from the same P*T*Rtheta*Rpsi*Rphi chain.  Angles in degrees."""
        rad = jnp.radians
        st, ct = jnp.sin(rad(psi)), jnp.cos(rad(psi))
        sp, cp = jnp.sin(rad(theta)), jnp.cos(rad(theta))
        sg, cg = jnp.sin(rad(phi)), jnp.cos(rad(phi))

        one = jnp.ones_like(st)
        zero = jnp.zeros_like(st)

        def mat4(rows):
            return jnp.stack([jnp.stack(r) for r in rows])

        r_psi = mat4([[ct, -st, zero, zero], [st, ct, zero, zero],
                      [zero, zero, one, zero], [zero, zero, zero, one]])
        r_theta = mat4([[one, zero, zero, zero], [zero, cp, -sp, zero],
                        [zero, sp, cp, zero], [zero, zero, zero, one]])
        r_phi = mat4([[cg, zero, -sg, zero], [zero, one, zero, zero],
                      [sg, zero, cg, zero], [zero, zero, zero, one]])

        half_fov = math.radians(self.fov / 2)
        t = jnp.asarray(np.array(
            [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -self.h], [0, 0, 0, 1]],
            np.float64), st.dtype)
        ppm = np.zeros((4, 4))
        ppm[0, 0] = ppm[1, 1] = 1.0 / math.tan(half_fov)
        ppm[2, 2] = -(self.f + self.n) / (self.f - self.n)
        ppm[2, 3] = -(2.0 * self.f * self.n) / (self.f - self.n)
        ppm[3, 2] = -1.0
        p = jnp.asarray(ppm, st.dtype)

        fmat = p @ t @ r_theta @ r_psi @ r_phi

        # transform the four image corners (z=0 plane): keep rows x,y,w
        half_w = half_h = self.res / 2.0
        corners = jnp.asarray(np.array(
            [[-half_w, half_w, half_w, -half_w],
             [half_h, half_h, -half_h, -half_h],
             [0.0, 0.0, 0.0, 0.0],
             [1.0, 1.0, 1.0, 1.0]]), st.dtype)
        out = fmat @ corners                       # (4, 4)
        out_xy = out[:2] / out[3]                  # perspective divide
        pts_out = (out_xy + 1.0) * (self.side_length_f * 0.5)  # (2, 4)
        pts_in_x = corners[0] + half_w
        pts_in_y = corners[1] + half_h

        # solve the 8x8 system for the homography mapping in->out
        def rows_for(xi, yi, xo, yo):
            r1 = jnp.stack([xi, yi, jnp.ones_like(xi), zero, zero, zero,
                            -xo * xi, -xo * yi])
            r2 = jnp.stack([zero, zero, zero, xi, yi, jnp.ones_like(xi),
                            -yo * xi, -yo * yi])
            return r1, r2

        rows, rhs = [], []
        for i in range(4):
            r1, r2 = rows_for(pts_in_x[i], pts_in_y[i],
                              pts_out[0, i], pts_out[1, i])
            rows += [r1, r2]
            rhs += [pts_out[0, i], pts_out[1, i]]
        a = jnp.stack(rows)
        b = jnp.stack(rhs)
        hvec = jnp.linalg.solve(a, b)
        hmat = jnp.concatenate([hvec, jnp.ones((1,), hvec.dtype)]).reshape(3, 3)
        return hmat

    # -- rendering ----------------------------------------------------------

    def _scale(self, z, val):
        """Altitude-scaled pin-hole projection, truncated to int like the
        reference (vs.py:109-115)."""
        half_fov = math.radians(self.fov / 2)
        return jnp.trunc(val * self.res / (2.0 * z * math.tan(half_fov)))

    def get_image(self, x, y, z, phi, theta, psi):
        """Render one pose -> (res, res) binary image.  Angles in DEGREES,
        z is positive altitude (the callers negate NED z, e.g.
        attic/gym_copter/envs/lander.py:118)."""
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        z = jnp.asarray(z, jnp.float32)
        cx = self._scale(z, x) + self.res // 2
        cy = self._scale(z, y) + self.res // 2
        r = self._scale(z, jnp.asarray(self.objsize, jnp.float32))

        hmat = self._warp_homography(jnp.asarray(psi, jnp.float32),
                                     jnp.asarray(theta, jnp.float32),
                                     jnp.asarray(phi, jnp.float32))
        hinv = jnp.linalg.inv(hmat)

        # output grid = cropped warp region (warped[margin:-margin])
        rows = jax.lax.broadcasted_iota(jnp.float32,
                                        (self.res, self.res), 0) + self.margin
        cols = jax.lax.broadcasted_iota(jnp.float32,
                                        (self.res, self.res), 1) + self.margin
        w = hinv[2, 0] * cols + hinv[2, 1] * rows + hinv[2, 2]
        u = (hinv[0, 0] * cols + hinv[0, 1] * rows + hinv[0, 2]) / w
        v = (hinv[1, 0] * cols + hinv[1, 1] * rows + hinv[1, 2]) / w

        # evaluate the filled-circle predicate at the source coordinate
        inside = ((u - cx) ** 2 + (v - cy) ** 2) <= r * r
        in_bounds = ((u >= 0) & (u <= self.res - 1)
                     & (v >= 0) & (v <= self.res - 1))
        return (inside & in_bounds).astype(jnp.float32)

    def get_images(self, poses):
        """Batched render: poses (6, B) rows (x, y, z, phi, theta, psi),
        angles in degrees, z positive altitude -> (B, res, res)."""
        return jax.vmap(
            lambda p: self.get_image(p[0], p[1], p[2], p[3], p[4], p[5]),
            in_axes=1)(poses)

    def pose_from_state(self, x):
        """(12, B) NED state -> (6, B) sensor pose: positive altitude
        clamped away from zero, angles to degrees (the wrappers'
        max(-z, 1e-6) + degrees() convention, hover3d.py:69-76)."""
        alt = jnp.maximum(-x[4], 1e-6)
        deg = jnp.degrees
        return jnp.stack([x[0], x[2], alt, deg(x[6]), deg(x[8]), deg(x[10])])


class DVS(VisionSensor):
    """Event camera: sign of the first difference of consecutive frames
    (dvs.py:37-52).  Functional: thread `prev` through the rollout."""

    def initial_prev(self, batch=None):
        shape = (self.res, self.res) if batch is None else (batch, self.res,
                                                            self.res)
        return jnp.zeros(shape, jnp.float32)

    def get_events(self, prev, x, y, z, phi, theta, psi):
        """Returns (events in {-1,0,+1}, new_prev)."""
        curr = self.get_image(x, y, z, phi, theta, psi)
        return jnp.sign(prev - curr), curr

    def get_events_batch(self, prev, poses):
        curr = self.get_images(poses)
        return jnp.sign(prev - curr), curr

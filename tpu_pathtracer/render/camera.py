"""Pinhole camera: batched ray generation in render space.

Equivalent of the reference ``Camera<F>`` (renderer/src/camera.rs:15-93).
Render space = world translated so the camera sits at the origin (the
reference's world_to_render is a pure translation, camera.rs:84-87); the
scene compiler bakes the same translation into the geometry, so rays
originate at 0.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Camera:
    """fov: vertical field of view in degrees (scale applies to y; x gets
    aspect * scale — renderer/src/camera.rs:51-65)."""
    position: tuple
    direction: tuple
    up: tuple
    fov: float
    width: int
    height: int

    def look_to(self, position, direction, up=(0.0, 1.0, 0.0)) -> "Camera":
        d = np.asarray(direction, np.float64)
        d = d / np.linalg.norm(d)
        u = np.asarray(up, np.float64)
        u = u / np.linalg.norm(u)
        return dataclasses.replace(self, position=tuple(np.asarray(position, np.float64)),
                                   direction=tuple(d), up=tuple(u))

    @property
    def rotation(self) -> np.ndarray:
        """camera-space -> render-space rotation (columns = right, up, -fwd),
        the transpose of glam's look_to_rh view matrix (camera.rs:62-63)."""
        f = np.asarray(self.direction, np.float64)
        r = np.cross(f, np.asarray(self.up, np.float64))
        r = r / np.linalg.norm(r)
        u = np.cross(r, f)
        return np.stack([r, u, -f], axis=1)  # columns

    def generate_rays(self, pixel_xy, filter_uv):
        """pixel_xy: (R, 2) int pixel coords; filter_uv: V2 of (R,) in [0,1).

        Box-filter jitter of width 1 (filter.rs:16-31): the sample point is
        px + (uv - 0.5) + 0.5 = px + uv.  Returns (origin V3, dir V3,
        weight (R,)).  The 3x3 rotation entries are compile-time scalars,
        so the camera transform is nine fused multiply-adds over (R,)
        components (utils/vec.py SoA convention).
        """
        from ..utils.vec import V3, normalize3

        x = pixel_xy[:, 0].astype(jnp.float32) + filter_uv.x
        y = pixel_xy[:, 1].astype(jnp.float32) + filter_uv.y
        aspect = self.width / self.height
        scale = float(np.tan(np.radians(self.fov) / 2.0))
        dx = (2.0 * x / self.width - 1.0) * aspect * scale
        dy = (1.0 - 2.0 * y / self.height) * scale
        d_cam = normalize3(V3(dx, dy, -jnp.ones_like(dx)))
        m = np.asarray(self.rotation, np.float32)
        d = normalize3(V3(
            m[0, 0] * d_cam.x + m[0, 1] * d_cam.y + m[0, 2] * d_cam.z,
            m[1, 0] * d_cam.x + m[1, 1] * d_cam.y + m[1, 2] * d_cam.z,
            m[2, 0] * d_cam.x + m[2, 1] * d_cam.y + m[2, 2] * d_cam.z))
        z = jnp.zeros_like(x)
        return V3(z, z, z), d, jnp.ones_like(x)


def default_camera(width: int, height: int, fov: float = 45.0) -> Camera:
    """Matches Camera::new defaults (camera.rs:26-37) + main.rs's 45 deg."""
    return Camera(position=(0.0, 0.0, 0.0), direction=(0.0, 0.0, -1.0),
                  up=(0.0, 1.0, 0.0), fov=fov, width=width, height=height)

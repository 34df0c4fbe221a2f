"""Thin-lens perspective camera with batched ray generation.

TPU-native counterpart of /root/reference/src/camera.rs. The camera is a JAX
pytree (all fields are differentiable leaves), and `cast_rays` generates a whole
batch of rays at once from normalized screen coordinates, instead of one ray per
call — primary rays are just a couple of fused VPU ops.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from .utils.vmath import normalize, dot
from .sampling import uniform_disk

__all__ = ["Camera"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A simple thin-lens perspective camera.

    Fields mirror /root/reference/src/camera.rs:8-26; defaults mirror
    camera.rs:28-39 (eye at (0,0,10) looking -z, y-up, fov pi/6, no aperture).
    """

    eye: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.array([0.0, 0.0, 10.0], jnp.float32)
    )
    direction: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.array([0.0, 0.0, -1.0], jnp.float32)
    )
    up: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.array([0.0, 1.0, 0.0], jnp.float32)
    )
    fov: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(math.pi / 6)
    )
    aperture: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0)
    )
    focal_distance: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.float32(0.0)
    )

    def __post_init__(self):
        # Coerce host-side tuples/lists/scalars so Camera(eye=(0,0,10), ...)
        # works like the reference's struct literal (camera.rs:28-39). Only
        # plain host types are touched — tracers and device arrays pass
        # through untouched (this runs on every pytree unflatten).
        import numpy as _np

        for f in ("eye", "direction", "up", "fov", "aperture", "focal_distance"):
            v = getattr(self, f)
            if isinstance(v, (tuple, list, float, int, _np.ndarray, _np.generic)):
                object.__setattr__(self, f, jnp.asarray(v, jnp.float32))

    @staticmethod
    def look_at(eye, center, up, fov) -> "Camera":
        """Perspective camera looking at a point (camera.rs:43-54)."""
        eye = jnp.asarray(eye, jnp.float32)
        center = jnp.asarray(center, jnp.float32)
        up = jnp.asarray(up, jnp.float32)
        direction = normalize(center - eye)
        up = normalize(up - dot(up, direction) * direction)
        return Camera(
            eye=eye,
            direction=direction,
            up=up,
            fov=jnp.float32(fov),
        )

    def focus(self, focal_point, aperture) -> "Camera":
        """Focus on a world position with a given aperture (camera.rs:57-61)."""
        focal_point = jnp.asarray(focal_point, jnp.float32)
        fd = dot(focal_point - self.eye, self.direction)
        return dataclasses.replace(
            self,
            focal_distance=jnp.asarray(fd, jnp.float32),
            aperture=jnp.float32(aperture),
        )

    def cast_rays(self, x: jnp.ndarray, y: jnp.ndarray, key: jax.Array):
        """Cast a batch of rays for normalized screen coords in [-1, 1].

        Math parity with camera.rs:64-81: depth d = cot(fov/2); direction
        d*dir + x*right + y*up; if aperture > 0, jitter origin on the lens disk
        and aim at the focal point (depth of field). `x`/`y` have shape (N,),
        returns (origins (N,3), unit directions (N,3)).
        """
        d = 1.0 / jnp.tan(self.fov / 2.0)
        right = normalize(jnp.cross(self.direction, self.up))
        base_dir = (
            d * self.direction
            + x[..., None] * right
            + y[..., None] * self.up
        )
        origin = jnp.broadcast_to(self.eye, base_dir.shape)

        # Depth of field: always computed, selected by aperture > 0 so the
        # whole thing stays branch-free under jit.
        lens_xy = uniform_disk(key, x.shape)
        focal_point = origin + normalize(base_dir) * self.focal_distance
        offset = (
            lens_xy[..., 0:1] * right + lens_xy[..., 1:2] * self.up
        ) * self.aperture
        dof_origin = origin + offset
        dof_dir = focal_point - dof_origin

        use_dof = self.aperture > 0.0
        origin = jnp.where(use_dof, dof_origin, origin)
        direction = jnp.where(use_dof, dof_dir, base_dir)
        return origin, normalize(direction)

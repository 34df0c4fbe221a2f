"""Lights: point / ambient / directional / emissive-object area lights.

TPU-native counterpart of /root/reference/src/light.rs. Host-side light specs
compile to small pytrees whose `illuminate(key, pos)` returns, for a batch of
N shading points, the tuple (intensity (N,3), dir_to_light (N,3),
dist_to_light (N,)) — exactly the contract of Light::illuminate
(light.rs:23-46). Area-light shape sampling follows Shape::sample for the
sphere (sphere.rs:52-64), cube (cube.rs:74-87), triangle + kd-tree uniform
object choice (mesh.rs:84-98, kdtree.rs:138-143), and the Transformed pdf
rescaling (shape.rs:139-151).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .utils.vmath import dot, normalize, safe_sqrt
from .sampling import uniform_disk, uniform_triangle_barycentric

__all__ = [
    "PointLight",
    "AmbientLight",
    "DirectionalLight",
    "ObjectLight",
    "PointLightData",
    "AmbientLightData",
    "DirectionalLightData",
    "SphereLightData",
    "CubeLightData",
    "MeshLightData",
]


# ---------------------------------------------------------------------------
# Host-side specs (what users put into a Scene)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class PointLight:
    color: tuple
    position: tuple

    def __init__(self, color, position):
        object.__setattr__(self, "color", tuple(np.asarray(color, float).reshape(3)))
        object.__setattr__(self, "position", tuple(np.asarray(position, float).reshape(3)))


@dataclasses.dataclass(frozen=True)
class AmbientLight:
    color: tuple

    def __init__(self, color):
        object.__setattr__(self, "color", tuple(np.asarray(color, float).reshape(3)))


@dataclasses.dataclass(frozen=True)
class DirectionalLight:
    color: tuple
    direction: tuple

    def __init__(self, color, direction):
        object.__setattr__(self, "color", tuple(np.asarray(color, float).reshape(3)))
        object.__setattr__(self, "direction", tuple(np.asarray(direction, float).reshape(3)))


class ObjectLight:
    """Light from an invisible emissive object (light.rs:17-19). The object's
    shape is sampled for next-event estimation but never intersected by
    visibility rays, matching the reference (the light is not in
    scene.objects)."""

    def __init__(self, obj):
        self.object = obj


# ---------------------------------------------------------------------------
# Device-side pytrees
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointLightData:
    color: jnp.ndarray  # (3,)
    position: jnp.ndarray  # (3,)

    def illuminate(self, key, pos):
        disp = self.position - pos
        ln = jnp.linalg.norm(disp, axis=-1)
        ln_safe = jnp.maximum(ln, 1e-12)
        intensity = self.color / (ln_safe * ln_safe)[..., None]
        return intensity, disp / ln_safe[..., None], ln


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AmbientLightData:
    """Handled specially by the integrator: adds color * albedo with no
    shadow ray (renderer.rs:187-188)."""

    color: jnp.ndarray  # (3,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectionalLightData:
    color: jnp.ndarray  # (3,)
    direction: jnp.ndarray  # (3,)

    def illuminate(self, key, pos):
        n = pos.shape[0]
        wi = jnp.broadcast_to(-normalize(self.direction), (n, 3))
        intensity = jnp.broadcast_to(self.color, (n, 3))
        return intensity, wi, jnp.full((n,), jnp.inf, pos.dtype)


def _object_light_intensity(v, n, p, emitted, world_pos):
    """Common geometric term for emissive-object lights (light.rs:34-45)."""
    disp = v - world_pos
    ln = jnp.linalg.norm(disp, axis=-1)
    ln_safe = jnp.maximum(ln, 1e-12)
    cosine = jnp.maximum(-dot(disp, n), 0.0) / ln_safe
    surface_area = jnp.maximum(cosine, 0.0) / (ln_safe * ln_safe)
    p_safe = jnp.maximum(p, 1e-20)
    intensity = emitted * (surface_area / p_safe)[..., None]
    return intensity, disp / ln_safe[..., None], ln


def _transform_sample(l2w_lin, l2w_trans, nmat, det, v_local, n_local, p_local):
    """Apply Transformed::sample pdf/normal correction (shape.rs:139-151)."""
    v = jnp.einsum("ij,...j->...i", l2w_lin, v_local) + l2w_trans
    n = normalize(jnp.einsum("ij,...j->...i", nmat, n_local))
    ph = dot(jnp.einsum("ij,...j->...i", l2w_lin, n_local), n)
    base = det / jnp.where(jnp.abs(ph) > 1e-20, ph, 1e-20)
    return v, n, p_local / base


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SphereLightData:
    """Emissive (possibly transformed) unit sphere."""

    inv_tf: jnp.ndarray  # (3,4) world->local affine
    l2w_lin: jnp.ndarray  # (3,3)
    l2w_trans: jnp.ndarray  # (3,)
    nmat: jnp.ndarray  # (3,3) inverse-transpose linear
    det: jnp.ndarray  # () determinant of linear part
    emitted: jnp.ndarray  # (3,) color * emittance

    def illuminate(self, key, pos):
        # Cosine-weighted hemisphere facing the (local-space) target
        # (sphere.rs:52-64); target transformed into local space first
        # (shape.rs:139-141).
        tgt = jnp.einsum("ij,...j->...i", self.inv_tf[:, :3], pos) + self.inv_tf[:, 3]
        n = normalize(tgt)
        nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
        use_x = jnp.abs(nx) > 1e-12
        t_a = jnp.stack([ny, -nx, jnp.zeros_like(nx)], -1)
        t_b = jnp.stack([jnp.zeros_like(nx), -nz, ny], -1)
        n1 = normalize(jnp.where(use_x[..., None], t_a, t_b))
        n2 = jnp.cross(n1, n)
        xy = uniform_disk(key, pos.shape[:-1])
        z = safe_sqrt(1.0 - jnp.sum(xy * xy, -1))
        p_local = xy[..., 0:1] * n1 + xy[..., 1:2] * n2 + z[..., None] * n
        pdf = z / jnp.pi
        v, nrm, pdf = _transform_sample(
            self.l2w_lin, self.l2w_trans, self.nmat, self.det, p_local, p_local, pdf
        )
        return _object_light_intensity(v, nrm, pdf, self.emitted, pos)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CubeLightData:
    """Emissive (possibly transformed) unit cube; uniform face sampling with
    pdf 1/6 (cube.rs:74-87)."""

    l2w_lin: jnp.ndarray
    l2w_trans: jnp.ndarray
    nmat: jnp.ndarray
    det: jnp.ndarray
    emitted: jnp.ndarray

    def illuminate(self, key, pos):
        shape = pos.shape[:-1]
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.uniform(k1, shape) - 0.5
        b = jax.random.uniform(k2, shape) - 0.5
        face = jax.random.randint(k3, shape, 0, 6)
        half = jnp.full_like(a, 0.5)
        zero = jnp.zeros_like(a)
        one = jnp.ones_like(a)
        vs = jnp.stack(
            [
                jnp.stack([a, b, half], -1),
                jnp.stack([a, b, -half], -1),
                jnp.stack([a, half, b], -1),
                jnp.stack([a, -half, b], -1),
                jnp.stack([half, a, b], -1),
                jnp.stack([-half, a, b], -1),
            ],
            axis=0,
        )
        ns = jnp.stack(
            [
                jnp.stack([zero, zero, one], -1),
                jnp.stack([zero, zero, -one], -1),
                jnp.stack([zero, one, zero], -1),
                jnp.stack([zero, -one, zero], -1),
                jnp.stack([one, zero, zero], -1),
                jnp.stack([-one, zero, zero], -1),
            ],
            axis=0,
        )
        # One-hot select over the 6 faces (mask + reduce, no TPU gather)
        oh = jax.nn.one_hot(face, 6, dtype=pos.dtype)  # (..., 6)
        oh_f = jnp.moveaxis(oh, -1, 0)[..., None]  # (6, ..., 1)
        v_local = jnp.sum(vs * oh_f, axis=0)
        n_local = jnp.sum(ns * oh_f, axis=0)
        pdf = jnp.full(shape, 1.0 / 6.0, pos.dtype)
        v, nrm, pdf = _transform_sample(
            self.l2w_lin, self.l2w_trans, self.nmat, self.det, v_local, n_local, pdf
        )
        return _object_light_intensity(v, nrm, pdf, self.emitted, pos)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MonomialLightData:
    """Emissive (possibly transformed) monomial surface, exp=4.

    Parity with monomial_surface.rs:108-125: the reference samples the RIM
    circle (rand_distr::UnitCircle gives |(x,z)| = 1, so pos = (x, h, z)),
    flips the analytic normal with probability 1/2 (the surface is
    two-sided), and uses pdf 1/(2*AREA) with the hard-coded one-side area
    6.3406654362 (monomial_surface.rs:117).
    """

    AREA = 6.3406654362

    inv_tf: jnp.ndarray  # (3,4) world->local affine (unused; kept for parity)
    l2w_lin: jnp.ndarray  # (3,3)
    l2w_trans: jnp.ndarray  # (3,)
    nmat: jnp.ndarray  # (3,3)
    det: jnp.ndarray  # ()
    height: jnp.ndarray  # ()
    emitted: jnp.ndarray  # (3,)

    def illuminate(self, key, pos):
        shape = pos.shape[:-1]
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, shape, pos.dtype, 0.0, 2.0 * jnp.pi)
        x = jnp.cos(theta)
        z = jnp.sin(theta)
        h = self.height
        p_local = jnp.stack([x, jnp.broadcast_to(h, shape), z], -1)
        r2 = x * x + z * z  # == 1 on the rim, kept for formula parity
        n_local = normalize(
            jnp.stack([h * 4.0 * x * r2, -jnp.ones_like(x), h * 4.0 * z * r2], -1)
        )
        flip = jax.random.bernoulli(k2, 0.5, shape)
        n_local = jnp.where(flip[..., None], -n_local, n_local)
        pdf = jnp.full(shape, 1.0 / (2.0 * self.AREA), pos.dtype)
        v, nrm, pdf = _transform_sample(
            self.l2w_lin, self.l2w_trans, self.nmat, self.det, p_local, n_local, pdf
        )
        return _object_light_intensity(v, nrm, pdf, self.emitted, pos)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MeshLightData:
    """Emissive triangle mesh, already in world space. Uniform triangle choice
    (kdtree.rs:138-143) x uniform point in triangle with pdf 1/area
    (mesh.rs:84-98). Baking the transform into world-space triangles gives
    pointwise-identical pdfs to the reference's local-sample + pdf-rescale."""

    verts: jnp.ndarray  # (T, 3, 3)
    norms: jnp.ndarray  # (T, 3, 3)
    areas: jnp.ndarray  # (T,)
    emitted: jnp.ndarray  # (3,)

    def illuminate(self, key, pos):
        shape = pos.shape[:-1]
        k1, k2 = jax.random.split(key)
        num = self.verts.shape[0]
        tri = jax.random.randint(k1, shape, 0, num)
        uv = uniform_triangle_barycentric(k2, shape)
        u, v_ = uv[..., 0], uv[..., 1]
        w = 1.0 - u - v_
        # One-hot matmul instead of per-ray gather (light meshes are small)
        oh = jax.nn.one_hot(tri, num, dtype=pos.dtype)  # (..., T)
        tv = jnp.einsum("...t,tkj->...kj", oh, self.verts)  # (..., 3, 3)
        tn = jnp.einsum("...t,tkj->...kj", oh, self.norms)
        point = (
            u[..., None] * tv[..., 0, :]
            + v_[..., None] * tv[..., 1, :]
            + w[..., None] * tv[..., 2, :]
        )
        nrm = normalize(
            u[..., None] * tn[..., 0, :]
            + v_[..., None] * tn[..., 1, :]
            + w[..., None] * tn[..., 2, :]
        )
        pdf = 1.0 / (jnp.maximum(oh @ self.areas, 1e-20) * num)
        return _object_light_intensity(point, nrm, pdf, self.emitted, pos)

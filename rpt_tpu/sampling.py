"""Shared Monte Carlo sampling primitives (counter-based, deterministic).

The reference uses per-thread `StdRng::from_entropy()` (renderer.rs:121) so its
renders are not reproducible. Here everything derives from a single
`jax.random` threefry key — deterministic per seed, splittable per ray and per
bounce, which is both TPU-native and lets tests assert statistics exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .utils.vmath import safe_sqrt

__all__ = [
    "uniform_disk",
    "uniform_circle",
    "cosine_hemisphere",
    "uniform_triangle_barycentric",
]


def uniform_disk(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform sample inside the unit disk, shape (..., 2).

    Concentric-map free: uses sqrt(r) * (cos t, sin t), which is the same
    distribution as rand_distr::UnitDisc used by the reference
    (camera.rs:73, material.rs:271, sphere.rs:53).
    """
    k1, k2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(k1, shape))
    theta = jax.random.uniform(k2, shape, minval=0.0, maxval=2.0 * jnp.pi)
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def uniform_circle(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform sample on the unit circle boundary, shape (..., 2).

    Same distribution as rand_distr::UnitCircle (material.rs:251,
    monomial_surface.rs sample).
    """
    theta = jax.random.uniform(key, shape, minval=0.0, maxval=2.0 * jnp.pi)
    return jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)


def cosine_hemisphere(key: jax.Array, shape=()) -> jnp.ndarray:
    """Cosine-weighted hemisphere sample in local (t1, t2, n) coords
    via Malley's method (disk lift), as in material.rs:268-273. Returns
    (..., 3) with z >= 0; pdf is z / pi.
    """
    xy = uniform_disk(key, shape)
    z = safe_sqrt(1.0 - jnp.sum(xy * xy, axis=-1))
    return jnp.concatenate([xy, z[..., None]], axis=-1)


def uniform_triangle_barycentric(key: jax.Array, shape=()) -> jnp.ndarray:
    """Uniform barycentric coordinates (u, v) with u + v <= 1.

    The reference rejects u+v>1 and redraws (mesh.rs:84-98); the mirror trick
    (u,v) -> (1-u, 1-v) yields the identical uniform distribution without
    rejection, which keeps shapes static under jit.
    """
    uv = jax.random.uniform(key, shape + (2,))
    over = jnp.sum(uv, axis=-1, keepdims=True) > 1.0
    return jnp.where(over, 1.0 - uv, uv)

"""Batched 3-vector math helpers.

All functions operate on arrays whose last axis has size 3 and broadcast over
leading axes. This is the TPU-native replacement for the reference's
`nalgebra-glm` scalar vector math (see /root/reference/src/color.rs:2 usage of
`glm::DVec3` throughout): instead of one vector at a time, every op here is
vectorized over an arbitrary batch of rays/normals so it maps onto the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "dot",
    "length",
    "length2",
    "normalize",
    "reflect",
    "orthonormal_basis",
    "from_local",
    "safe_sqrt",
]


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt clamped at 0 with a finite gradient.

    `sqrt(maximum(x, 0))` has an infinite derivative at x<=0 that poisons
    reverse-mode AD through `where` masks (0 * inf = NaN); the double-where
    evaluates sqrt only on strictly positive inputs.
    """
    pos = x > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the trailing axis."""
    return jnp.sum(a * b, axis=-1)


def length2(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(v * v, axis=-1)


def length(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(length2(v))


def normalize(v: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: returns v/|v|, and 0 for (near-)zero vectors.

    Uses the double-where pattern so the rsqrt is only ever *evaluated* on
    safe inputs: rsqrt(clamped_tiny) has an f32-overflowing derivative that
    would turn masked lanes into NaN gradients.
    """
    import jax

    n2 = length2(v)
    ok = n2 > eps
    inv = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, n2, 1.0)), 0.0)
    return v * inv[..., None]


def reflect(incident: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """GLM-convention reflection: I - 2 (N.I) N (see glm::reflect_vec used at
    /root/reference/src/material.rs:267)."""
    return incident - 2.0 * dot(n, incident)[..., None] * n


def orthonormal_basis(n: jnp.ndarray):
    """Build tangent vectors (t1, t2) orthogonal to unit normal `n`.

    Mirrors the branch structure of `local_to_world` in
    /root/reference/src/material.rs:316-324 (and the identical basis in
    /root/reference/src/shape/sphere.rs:52-64): if n.x is a usable float the
    tangent is normalize(n.y, -n.x, 0), otherwise normalize(0, -n.z, n.y).
    Batched with a `where` instead of a data-dependent branch.
    """
    nx, ny, nz = n[..., 0], n[..., 1], n[..., 2]
    use_x = jnp.abs(nx) > 1e-12
    t_a = jnp.stack([ny, -nx, jnp.zeros_like(nx)], axis=-1)
    t_b = jnp.stack([jnp.zeros_like(nx), -nz, ny], axis=-1)
    t1 = normalize(jnp.where(use_x[..., None], t_a, t_b))
    t2 = jnp.cross(n, t1)
    return t1, t2


def from_local(n: jnp.ndarray, local: jnp.ndarray) -> jnp.ndarray:
    """Map a vector expressed in the (t1, t2, n) local frame to world space."""
    t1, t2 = orthonormal_basis(n)
    return (
        local[..., 0:1] * t1 + local[..., 1:2] * t2 + local[..., 2:3] * n
    )

"""Differentiable rendering: gradients of pixels w.r.t. scene parameters.

The reference has no differentiable mode (it is a forward-only Rust renderer);
this is a capability the TPU-native rewrite adds per BASELINE.md: pixel
gradients with respect to material parameters (albedo, roughness, emittance,
IOR, metallic) and camera parameters flow through the path-integral estimator
with *detached sampling* (sampled directions/pdfs are stop_gradient'ed in the
integrator), which is unbiased for the continuous integrand.

Scene geometry is closed over as compile-time constants (see the TPU-compile
note in rpt_tpu/renderer.py); only the differentiated leaves (the material
table, the camera) are jit arguments.

Typical use:

    img_fn, mats0 = make_diff_render(scene, camera, width=32, height=32, spp=4)
    loss = lambda mats: jnp.mean((img_fn(mats) - target) ** 2)
    g = jax.grad(loss)(mats0)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .materials import MaterialTable
from .renderer import SceneCache, _render_pass_tiled, _tile_perm_np, scene_cache_key

__all__ = ["make_material_render_fn", "render_with_materials", "render_with_camera", "make_diff_render"]

# Digest-keyed + bounded + scene-pinning: see renderer.SceneCache.
_DIFF_CACHE = SceneCache()


def make_material_render_fn(scene_data, width: int, height: int, max_bounces: int, spp: int):
    """Jitted (materials, camera, key, t_min, ev_scale) -> (H, W, 3) image,
    averaging `spp` samples; differentiable in materials and camera."""
    cache_key = (scene_cache_key(scene_data), width, height, max_bounces, spp)
    fn = _DIFF_CACHE.get(cache_key)
    if fn is None:

        @jax.jit
        def fn(materials, camera, key, t_min, ev_scale):
            sd = dataclasses.replace(scene_data, materials=materials)

            # One traced sample body under lax.scan + remat: program size is
            # O(1) in spp (the Python-unrolled version compiled spp copies of
            # the whole path tracer) and the backward pass rematerializes each
            # sample's path intermediates instead of storing them, so memory
            # is O(spp * H * W) for the carried accumulator only. Sample i
            # still uses fold_in(key, i) and left-to-right summation, so the
            # result is bit-identical to the unrolled version.
            @jax.checkpoint
            def body(acc, i):
                k = jax.random.fold_in(key, i)
                frame = _render_pass_tiled(
                    sd, camera, k, width, height, max_bounces, t_min, ev_scale
                )
                return acc + frame, None

            acc0 = jnp.zeros((width * height, 3), materials.color.dtype)
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(spp))
            _, inv = _tile_perm_np(width, height)
            return acc[jnp.asarray(inv)].reshape(height, width, 3) / spp

        _DIFF_CACHE.put(cache_key, fn, scene_data)
    return fn


def render_with_materials(
    materials: MaterialTable,
    scene_data,
    camera,
    key,
    width,
    height,
    max_bounces,
    t_min,
    ev_scale,
    spp: int = 1,
):
    """Render an spp-averaged frame as a differentiable function of the
    material table (and camera). Same estimator as Renderer, same key
    discipline, so the primal matches the forward renderer exactly."""
    fn = make_material_render_fn(scene_data, width, height, max_bounces, spp)
    return fn(materials, camera, key, t_min, ev_scale)


def render_with_camera(
    camera,
    scene_data,
    key,
    width,
    height,
    max_bounces,
    t_min,
    ev_scale,
    spp: int = 1,
):
    """Differentiable in the camera pytree (eye, direction, fov, ...)."""
    fn = make_material_render_fn(scene_data, width, height, max_bounces, spp)
    return fn(scene_data.materials, camera, key, t_min, ev_scale)


def make_diff_render(
    scene,
    camera,
    width: int,
    height: int,
    max_bounces: int = 2,
    spp: int = 1,
    epsilon: float = 1e-3,
    exposure_value: float = 0.0,
    seed: int = 0,
    dtype=jnp.float32,
):
    """Build `materials -> (H, W, 3) image`, differentiable and jitted."""
    scene_data = scene.compile(dtype)
    t_min = jnp.asarray(epsilon, dtype)
    ev_scale = jnp.asarray(2.0**exposure_value, dtype)
    key = jax.random.PRNGKey(seed)
    fn = make_material_render_fn(scene_data, width, height, max_bounces, spp)

    def img_fn(materials: MaterialTable):
        return fn(materials, camera, key, t_min, ev_scale)

    return img_fn, scene_data.materials

"""Multi-chip rendering: shard the ray wavefront over a device mesh.

TPU-native replacement for the reference's rayon scanline fan-out
(renderer.rs:117-129). The parallel decomposition is identical in spirit —
data parallelism over pixels — but expressed as `shard_map` over a 1-D
`jax.sharding.Mesh`: the flattened pixel wavefront is sharded on the "rays"
axis, the compiled scene (SoA arrays + BVH) is replicated per chip, and each
shard traces its pixels with an independently folded RNG key (the analog of
the per-scanline StdRng at renderer.rs:121, but deterministic). Radiance needs
no collective at all — each chip owns disjoint pixels; gradient reductions in
the differentiable path ride ICI via the automatic psum in shard_map's
backward.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..integrator import trace_paths
from ..renderer import SceneCache, pixel_ndc_tiled, scene_cache_key

__all__ = [
    "make_ray_mesh",
    "render_pass_sharded",
    "make_sharded_render_fn",
    "make_sharded_diff_fn",
    "render_distributed",
]


def make_ray_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the first n devices, axis name 'rays'."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("rays",))


def _shard_body(scene_data, camera, key, xg, yg, jitter_scale, t_min, ev_scale, *, max_bounces):
    """Per-shard render: runs on each device with its local pixel slice."""
    shard_id = jax.lax.axis_index("rays")
    key = jax.random.fold_in(key, shard_id)
    n = xg.shape[0]
    k_jit, k_cam, k_trace = jax.random.split(key, 3)
    jitter = jax.random.uniform(
        k_jit, (2, n), xg.dtype, minval=-1.0, maxval=1.0
    ) * jitter_scale
    o, d = camera.cast_rays(xg + jitter[0], yg + jitter[1], k_cam)
    colors = trace_paths(scene_data, o, d, k_trace, max_bounces, t_min)
    return colors * ev_scale


# Scene data is closed over as constants (see the TPU-compile note in
# rpt_tpu/renderer.py); only the wavefront + camera + key are arguments.
# Keyed on the scene CONTENT digest (never a reusable id()) and bounded,
# with each entry pinning its SceneData — see renderer.SceneCache.
_SHARD_CACHE = SceneCache()


def make_sharded_render_fn(scene_data, width: int, height: int, max_bounces: int, mesh: Mesh):
    cache_key = (scene_cache_key(scene_data), width, height, max_bounces, mesh)
    fn = _SHARD_CACHE.get(cache_key)
    if fn is not None:
        return fn

    xg_full, yg_full, dim, inv = pixel_ndc_tiled(
        width, height, scene_data.materials.color.dtype
    )
    n = xg_full.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    xg_full = jnp.pad(xg_full, (0, pad))
    yg_full = jnp.pad(yg_full, (0, pad))
    jitter_scale = jnp.asarray(1.0 / dim, xg_full.dtype)

    body = shard_map(
        partial(_shard_body, scene_data, max_bounces=max_bounces),
        mesh=mesh,
        in_specs=(P(), P(), P("rays"), P("rays"), P(), P(), P()),
        out_specs=P("rays"),
        check_vma=False,
    )

    @jax.jit
    def fn(camera, key, t_min, ev_scale):
        colors = body(camera, key, xg_full, yg_full, jitter_scale, t_min, ev_scale)
        return colors[inv].reshape(height, width, 3)

    _SHARD_CACHE.put(cache_key, fn, scene_data)
    return fn


def render_pass_sharded(
    scene_data, camera, key, width, height, max_bounces, t_min, ev_scale, mesh
):
    """One sample per pixel, sharded across `mesh`; returns (H, W, 3).

    Pixels are padded to a multiple of the device count; the scene and camera
    are replicated, the pixel wavefront is sharded.
    """
    fn = make_sharded_render_fn(scene_data, width, height, max_bounces, mesh)
    return fn(camera, key, t_min, ev_scale)


def make_sharded_diff_fn(scene_data, width: int, height: int, max_bounces: int, mesh: Mesh):
    """Sharded differentiable render: geometry closed over, the material
    table a replicated jit argument. Gradients w.r.t. materials are
    all-reduced across shards by shard_map's transpose (psum over ICI)."""
    import dataclasses

    cache_key = ("diff", scene_cache_key(scene_data), width, height,
                 max_bounces, mesh)
    cached = _SHARD_CACHE.get(cache_key)
    if cached is not None:
        return cached

    xg_full, yg_full, dim, inv = pixel_ndc_tiled(
        width, height, scene_data.materials.color.dtype
    )
    n = xg_full.shape[0]
    n_dev = mesh.devices.size
    pad = (-n) % n_dev
    xg_full = jnp.pad(xg_full, (0, pad))
    yg_full = jnp.pad(yg_full, (0, pad))
    jitter_scale = jnp.asarray(1.0 / dim, xg_full.dtype)

    def body_with_mats(materials, camera, key, xg, yg, js, t_min, ev_scale):
        sd = dataclasses.replace(scene_data, materials=materials)
        return _shard_body(
            sd, camera, key, xg, yg, js, t_min, ev_scale, max_bounces=max_bounces
        )

    body = shard_map(
        body_with_mats,
        mesh=mesh,
        in_specs=(P(), P(), P(), P("rays"), P("rays"), P(), P(), P()),
        out_specs=P("rays"),
        check_vma=False,
    )

    @jax.jit
    def fn(materials, camera, key, t_min, ev_scale):
        colors = body(materials, camera, key, xg_full, yg_full, jitter_scale, t_min, ev_scale)
        return colors[inv].reshape(height, width, 3)

    _SHARD_CACHE.put(cache_key, fn, scene_data)
    return fn


def make_sharded_many_fn(scene_data, width: int, height: int, max_bounces: int, mesh: Mesh):
    """Jitted (camera, base_key, start, n, t_min, ev_scale) -> (sum, sum_sq)
    accumulating `n` samples per pixel ON DEVICE with the pixel wavefront
    sharded over `mesh` — the multi-chip analog of make_render_many_fn.

    The per-sample loop runs inside shard_map (one dispatch for the whole
    batch), so multi-chip rendering pays O(1) host round trips instead of the
    ~25 ms relay cost per sample the old per-pass loop paid. Sample i uses
    fold_in(base_key, start+i) before the per-shard fold, identical to the
    per-pass sharded path, so chunked and unchunked renders are bit-identical.
    """
    cache_key = ("many", scene_cache_key(scene_data), width, height,
                 max_bounces, mesh)
    fn = _SHARD_CACHE.get(cache_key)
    if fn is not None:
        return fn

    xg_full, yg_full, dim, inv = pixel_ndc_tiled(
        width, height, scene_data.materials.color.dtype
    )
    n_pix = xg_full.shape[0]
    n_dev = mesh.devices.size
    pad = (-n_pix) % n_dev
    xg_full = jnp.pad(xg_full, (0, pad))
    yg_full = jnp.pad(yg_full, (0, pad))
    jitter_scale = jnp.asarray(1.0 / dim, xg_full.dtype)
    dtype = scene_data.materials.color.dtype

    def shard_many(camera, base_key, start, n_samples, xg, yg, t_min, ev_scale):
        m = xg.shape[0]

        def body(i, acc):
            s, ss = acc
            key = jax.random.fold_in(base_key, start + i)
            colors = _shard_body(
                scene_data, camera, key, xg, yg, jitter_scale, t_min, ev_scale,
                max_bounces=max_bounces,
            )
            return (s + colors, ss + jnp.sum(colors * colors, axis=-1))

        init = (jnp.zeros((m, 3), dtype), jnp.zeros((m,), dtype))
        return jax.lax.fori_loop(0, n_samples, body, init)

    body = shard_map(
        shard_many,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P("rays"), P("rays"), P(), P()),
        out_specs=(P("rays"), P("rays")),
        check_vma=False,
    )

    @jax.jit
    def fn(camera, base_key, start, n_samples, t_min, ev_scale):
        s, ss = body(camera, base_key, start, n_samples, xg_full, yg_full, t_min, ev_scale)
        return (
            s[inv].reshape(height, width, 3),
            ss[inv].reshape(height, width),
        )

    _SHARD_CACHE.put(cache_key, fn, scene_data)
    return fn


def render_distributed(renderer, mesh: Mesh | None = None):
    """Render a full frame buffer with the wavefront sharded over `mesh`.

    Drop-in distributed variant of Renderer.render_buffer(). All samples
    accumulate on device in ONE dispatch (see make_sharded_many_fn).
    """
    from ..buffer import Buffer

    if mesh is None:
        mesh = make_ray_mesh()
    scene_data, t_min, ev_scale = renderer._pass_args()
    base = jax.random.PRNGKey(renderer.seed)
    fn = make_sharded_many_fn(
        scene_data, renderer.width, renderer.height, renderer.max_bounces, mesh
    )
    s, ss = fn(
        renderer.camera, base, jnp.int32(0), jnp.int32(renderer.num_samples),
        t_min, ev_scale,
    )
    return Buffer(sum=s, sum_sq=ss, count=jnp.asarray(renderer.num_samples, jnp.int32))

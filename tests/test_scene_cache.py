"""Digest-keyed per-scene jit caches (VERDICT r4 weak #4).

The per-scene compiled-function caches must key on scene CONTENT, not
id(scene_data): after a container is garbage-collected, CPython can hand its
id to a brand-new scene, and an id-keyed cache would then return the OLD
scene's compiled program (whose geometry is baked in as constants).
"""

import gc

import numpy as np
import jax.numpy as jnp

from rpt_tpu import Camera, Material, Object, PointLight, Renderer, Scene, hex_color, sphere
from rpt_tpu.renderer import SceneCache, make_render_fn, scene_cache_key


def _scene(color_hex):
    scene = Scene()
    scene.add(Object(sphere()).material(Material.diffuse(hex_color(color_hex))))
    scene.add(PointLight(hex_color(0xFFFFFF) * 60.0, [0.0, 4.0, 4.0]))
    return scene


def test_digest_is_content_addressed():
    sd_a = _scene(0xFF0000).compile()
    sd_b = _scene(0xFF0000).compile()  # distinct objects, equal content
    sd_c = _scene(0x00FF00).compile()
    assert sd_a.digest and sd_a.digest == sd_b.digest
    assert sd_a.digest != sd_c.digest
    # Content-equal scenes share ONE compiled render fn even though their
    # containers (and ids) differ — proof the key is the digest, not id().
    assert sd_a is not sd_b
    assert make_render_fn(sd_a, 16, 12, 0) is make_render_fn(sd_b, 16, 12, 0)


def test_gc_then_new_scene_renders_correctly():
    """Drop a compiled scene, GC, build a different one: the new scene must
    render ITS OWN image (an id-keyed cache could alias the two)."""
    r_a = Renderer(_scene(0xFF0000), Camera(), width=24, height=16,
                   num_samples=2)
    img_a = r_a.render().astype(np.int32)
    del r_a
    gc.collect()
    r_b = Renderer(_scene(0x00FF00), Camera(), width=24, height=16,
                   num_samples=2)
    img_b = r_b.render().astype(np.int32)
    # The sphere region must flip from red-dominant to green-dominant.
    assert img_a[..., 0].sum() > img_a[..., 1].sum()
    assert img_b[..., 1].sum() > img_b[..., 0].sum()


def test_scene_cache_bounded_and_pinning():
    cache = SceneCache(cap=3)
    keeps = []
    for i in range(7):
        sd = _scene(0x010101 * (i + 1)).compile()
        keeps.append(sd)
        cache.put((scene_cache_key(sd), 8, 8), lambda: i, sd)
    assert len(cache._entries) == 3
    # The surviving entries pin their SceneData containers.
    assert all(e[1] is not None for e in cache._entries.values())


def test_dynamic_mode_strips_digest():
    """dynamic=True passes the scene as a jit ARGUMENT; the digest (static
    pytree metadata) must be stripped so same-topology frames share one
    treedef and one compile."""
    import dataclasses

    sd = _scene(0xFF0000).compile()
    stripped = dataclasses.replace(sd, digest="")
    import jax

    t1 = jax.tree_util.tree_structure(stripped)
    sd2 = dataclasses.replace(_scene(0x00FF00).compile(), digest="")
    t2 = jax.tree_util.tree_structure(sd2)
    assert t1 == t2  # same topology, same treedef despite different content

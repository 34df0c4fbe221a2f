"""Parity tests: 8-ary wide-BVH Pallas traversal vs. the XLA while_loop path.

Interpreter mode on the CPU mesh (the Mosaic compile is exercised on TPU by
bench.py). Semantics under test match the reference traversal at
/root/reference/src/kdtree.rs:151-223 and /root/reference/src/shape/
mesh.rs:49-82 — the wide collapse must visit a superset of the pruned binary
walk, so hits agree exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpt_tpu.ops.bvh import build_bvh, bvh_closest_hit
from rpt_tpu.ops.bvh8_pallas import (
    BRANCH,
    bvh8_closest_hit_pallas,
    bvh8_occluded_pallas,
    pack_bvh8_for_pallas,
)
from test_bvh_pallas import _random_mesh, _rays_at_mesh


@pytest.mark.parametrize("n_tris", [5, 40, 300])
def test_bvh8_matches_xla(n_tris):
    verts, norms, mats = _random_mesh(n_tris)
    bvh = build_bvh(verts, norms, mats)
    o, d = _rays_at_mesh(333, verts)  # deliberately not a multiple of 128
    t_min = 1e-3

    ref = bvh_closest_hit(bvh, o, d, t_min)
    got = bvh8_closest_hit_pallas(bvh, o, d, t_min, interpret=True)

    hit_ref = np.isfinite(np.asarray(ref.t))
    np.testing.assert_array_equal(np.isfinite(np.asarray(got.t)), hit_ref)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_ref], np.asarray(ref.t)[hit_ref],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(got.mat_id)[hit_ref], np.asarray(ref.mat_id)[hit_ref]
    )


def test_bvh8_pack_structure():
    """Every leaf appears exactly once among the wide children, and child
    bounds equal the collapsed binary nodes' bounds."""
    verts, norms, mats = _random_mesh(500, seed=2)
    bvh = build_bvh(verts, norms, mats)
    pack = pack_bvh8_for_pallas(bvh)
    from rpt_tpu.ops.bvh8_pallas import META_STRIDE

    wmeta = np.asarray(pack.wmeta).reshape(
        pack.wbounds.shape[0], -1, META_STRIDE
    )
    counts = wmeta[..., 1:16:2]
    starts = wmeta[..., 0:16:2]
    leaf_starts = starts[counts > 0]
    want = np.asarray(bvh.leaf_start)[np.asarray(bvh.leaf_count) > 0]
    np.testing.assert_array_equal(np.sort(leaf_starts), np.sort(want))
    # Leaf triangle coverage: counts sum to the true triangle count.
    assert counts[counts > 0].sum() == np.asarray(bvh.leaf_count).sum()


def test_bvh8_multichunk_matches_xla(monkeypatch):
    """Force the chunked path: a tiny wide-node budget must split the tree
    into many streamed chunks and still agree with the XLA traversal."""
    import rpt_tpu.ops.bvh8_pallas as b8

    monkeypatch.setattr(b8, "CHUNK_WNODES", 8)
    verts, norms, mats = _random_mesh(600, seed=3)
    bvh = build_bvh(verts, norms, mats)
    packed = b8.pack_bvh8_for_pallas(bvh)
    assert packed.n_chunks >= 4, "budget should force multiple chunks"

    o, d = _rays_at_mesh(300, verts)
    ref = bvh_closest_hit(bvh, o, d, 1e-3)
    got = b8.bvh8_closest_hit_pallas(
        bvh, o, d, 1e-3, packed=packed, interpret=True
    )
    hit_ref = np.isfinite(np.asarray(ref.t))
    np.testing.assert_array_equal(np.isfinite(np.asarray(got.t)), hit_ref)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_ref], np.asarray(ref.t)[hit_ref],
        rtol=2e-5, atol=2e-5,
    )


def test_bvh8_active_mask_parks_lanes():
    verts, norms, mats = _random_mesh(100)
    bvh = build_bvh(verts, norms, mats)
    o, d = _rays_at_mesh(256, verts)
    active = jnp.arange(256) % 2 == 0

    got = bvh8_closest_hit_pallas(bvh, o, d, 1e-3, active=active, interpret=True)
    full = bvh8_closest_hit_pallas(bvh, o, d, 1e-3, interpret=True)
    t = np.asarray(got.t)
    assert not np.isfinite(t[1::2]).any()
    np.testing.assert_allclose(t[0::2], np.asarray(full.t)[0::2], rtol=1e-6)


def test_bvh8_occlusion_matches_closest():
    verts, norms, mats = _random_mesh(400, seed=5)
    bvh = build_bvh(verts, norms, mats)
    o, d = _rays_at_mesh(333, verts, seed=6)
    t_min = 1e-3

    ref_t = np.asarray(bvh_closest_hit(bvh, o, d, t_min).t)
    rng = np.random.default_rng(7)
    t_max = jnp.asarray(rng.uniform(2.0, 6.0, o.shape[0]), jnp.float32)

    got = bvh8_occluded_pallas(bvh, o, d, t_min, t_max, interpret=True)
    want = ref_t <= np.asarray(t_max)
    assert want.any() and (~want).any()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_bvh8_pack_failure_falls_back_to_binary(monkeypatch):
    """When the wide pack hits a static-budget wall (here: a tiny forced
    STACK_CAP), pack_bvh8_for_pallas returns None and compile_scene ships
    the binary packet kernel instead of crashing (ADVICE r4)."""
    import rpt_tpu.ops.bvh8_pallas as b8
    import rpt_tpu.scene as scene_mod

    monkeypatch.setattr(b8, "STACK_CAP", 2)
    monkeypatch.setattr(scene_mod, "WIDE_KERNEL_MIN_TRIS", 1)

    verts, norms, mats = _random_mesh(800, seed=9)
    bvh = build_bvh(verts, norms, mats)
    assert b8.pack_bvh8_for_pallas(bvh) is None

    from rpt_tpu import Material, Object, Scene
    from rpt_tpu.shapes import Mesh

    scene = Scene()
    scene.add(Object(Mesh(np.asarray(verts))).material(Material.diffuse((0.5, 0.5, 0.5))))
    sd = scene.compile()
    assert sd.bvh8_packed is None
    assert sd.bvh_packed is not None  # binary kernel takes over

"""Parity tests: Pallas packet BVH traversal vs. the XLA while_loop path.

Runs the kernel in interpreter mode on the CPU mesh (the real Mosaic compile
is exercised on TPU by bench.py / examples). Semantics under test match the
reference traversal at /root/reference/src/kdtree.rs:151-223 and the triangle
test at /root/reference/src/shape/mesh.rs:49-82.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpt_tpu.ops.bvh import build_bvh, bvh_closest_hit
from rpt_tpu.ops.bvh_pallas import (
    bvh_closest_hit_pallas,
    bvh_occluded_pallas,
    pack_bvh_for_pallas,
)


def _random_mesh(n_tris: int, seed: int = 0):
    """Random triangle soup in [-1,1]^3 with smooth-ish normals."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1.0, 1.0, (n_tris, 1, 3))
    offs = rng.uniform(-0.15, 0.15, (n_tris, 2, 3))
    verts = np.concatenate([base, base + offs], axis=1)
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    norms = np.repeat(n[:, None, :], 3, axis=1)
    mats = rng.integers(0, 4, n_tris).astype(np.int32)
    return verts, norms, mats


def _rays_at_mesh(n_rays: int, verts: np.ndarray, seed: int = 1):
    """Rays from a sphere of radius 4 aimed at (jittered) triangle centroids,
    so a large fraction of lanes actually hit geometry."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3))
    o /= np.linalg.norm(o, axis=-1, keepdims=True)
    o *= 4.0
    cent = verts.mean(axis=1)
    target = cent[rng.integers(0, cent.shape[0], n_rays)]
    target += rng.uniform(-0.05, 0.05, (n_rays, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("n_tris", [40, 300])
def test_pallas_matches_xla(n_tris):
    verts, norms, mats = _random_mesh(n_tris)
    bvh = build_bvh(verts, norms, mats)
    o, d = _rays_at_mesh(333, verts)  # deliberately not a multiple of 128
    t_min = 1e-3

    ref = bvh_closest_hit(bvh, o, d, t_min)
    got = bvh_closest_hit_pallas(bvh, o, d, t_min, interpret=True)

    hit_ref = np.isfinite(np.asarray(ref.t))
    hit_got = np.isfinite(np.asarray(got.t))
    assert hit_ref.sum() > 50, "test geometry too sparse to be meaningful"
    np.testing.assert_array_equal(hit_got, hit_ref)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_ref], np.asarray(ref.t)[hit_ref], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got.normal)[hit_ref],
        np.asarray(ref.normal)[hit_ref],
        rtol=1e-3,
        atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(got.mat_id)[hit_ref], np.asarray(ref.mat_id)[hit_ref]
    )


def test_pallas_active_mask_parks_lanes():
    verts, norms, mats = _random_mesh(100)
    bvh = build_bvh(verts, norms, mats)
    o, d = _rays_at_mesh(256, verts)
    active = jnp.arange(256) % 2 == 0

    got = bvh_closest_hit_pallas(bvh, o, d, 1e-3, active=active, interpret=True)
    full = bvh_closest_hit_pallas(bvh, o, d, 1e-3, interpret=True)

    t = np.asarray(got.t)
    # Inactive lanes report a miss
    assert not np.isfinite(t[1::2]).any()
    # Active lanes agree with the unmasked traversal
    np.testing.assert_allclose(t[0::2], np.asarray(full.t)[0::2], rtol=1e-6)


def test_pallas_multichunk_matches_xla(monkeypatch):
    """Force the chunked megamesh path (VERDICT r3 item 3): a mesh whose BVH
    exceeds the per-chunk node budget must stream subtree chunks through SMEM
    and still agree with the XLA traversal exactly."""
    import rpt_tpu.ops.bvh_pallas as bp

    monkeypatch.setattr(bp, "CHUNK_NODES", 37)  # tiny budget -> many chunks
    verts, norms, mats = _random_mesh(600, seed=3)
    bvh = build_bvh(verts, norms, mats)
    packed = bp.pack_bvh_for_pallas(bvh)
    assert packed.n_chunks >= 4, "budget should force multiple chunks"

    o, d = _rays_at_mesh(300, verts)
    ref = bvh_closest_hit(bvh, o, d, 1e-3)
    got = bp.bvh_closest_hit_pallas(bvh, o, d, 1e-3, packed=packed, interpret=True)

    hit_ref = np.isfinite(np.asarray(ref.t))
    np.testing.assert_array_equal(np.isfinite(np.asarray(got.t)), hit_ref)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_ref], np.asarray(ref.t)[hit_ref], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.mat_id)[hit_ref], np.asarray(ref.mat_id)[hit_ref]
    )


def test_pack_layout():
    verts, norms, mats = _random_mesh(25)
    bvh = build_bvh(verts, norms, mats)
    pack = pack_bvh_for_pallas(bvh)
    bounds, meta, tri = pack.bounds, pack.meta, pack.tri
    assert pack.n_chunks == 1
    M = np.asarray(bvh.node_min).shape[0]
    # Flat 1-D SMEM layouts (2-D SMEM windows lane-pad to 128)
    assert bounds.shape == (M * 8,) and meta.shape == (M * 4,)
    # Leaf starts are 8-aligned so the kernel's (8, K) loads are aligned.
    starts = np.asarray(bvh.leaf_start)[np.asarray(bvh.leaf_count) > 0]
    assert (starts % 8 == 0).all()
    # Swizzled v0 matches the permuted verts table; one (8,128) block per leaf.
    T = bvh.num_tris
    assert tri.shape == (T // 8, 8, 128)
    np.testing.assert_allclose(
        tri.reshape(T, 128)[:, 0:3], np.asarray(bvh.verts)[:, 0], rtol=1e-6
    )


@pytest.mark.parametrize("n_chunks_budget", [None, 37])
def test_pallas_occlusion_matches_closest(monkeypatch, n_chunks_budget):
    """Any-hit shadow kernel: boolean parity with `closest.t <= t_max` on
    single-chunk and chunked layouts, including the per-lane max distance
    (NEE visibility, renderer.rs:191-199)."""
    import rpt_tpu.ops.bvh_pallas as bp

    if n_chunks_budget is not None:
        monkeypatch.setattr(bp, "CHUNK_NODES", n_chunks_budget)
    verts, norms, mats = _random_mesh(400, seed=5)
    bvh = build_bvh(verts, norms, mats)
    packed = bp.pack_bvh_for_pallas(bvh)
    o, d = _rays_at_mesh(333, verts, seed=6)
    t_min = 1e-3

    ref_t = np.asarray(bvh_closest_hit(bvh, o, d, t_min).t)
    # t_max chosen per-lane so some hits fall beyond it (light closer than
    # the occluder -> visible) and some within.
    rng = np.random.default_rng(7)
    t_max = jnp.asarray(rng.uniform(2.0, 6.0, o.shape[0]), jnp.float32)

    got = bp.bvh_occluded_pallas(
        bvh, o, d, t_min, t_max, packed=packed, interpret=True
    )
    want = ref_t <= np.asarray(t_max)
    # Guard against a degenerate test: need both occluded and visible lanes.
    assert want.any() and (~want).any()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_pallas_occlusion_active_mask():
    verts, norms, mats = _random_mesh(100)
    bvh = build_bvh(verts, norms, mats)
    o, d = _rays_at_mesh(256, verts)
    active = jnp.arange(256) % 2 == 0
    t_max = jnp.full((256,), 10.0, jnp.float32)

    got = bvh_occluded_pallas(bvh, o, d, 1e-3, t_max, active=active, interpret=True)
    full = bvh_occluded_pallas(bvh, o, d, 1e-3, t_max, interpret=True)
    got = np.asarray(got)
    # Inactive lanes are never occluded; active lanes agree with unmasked.
    assert not got[1::2].any()
    np.testing.assert_array_equal(got[0::2], np.asarray(full)[0::2])

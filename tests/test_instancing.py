"""Tests for Group flattening, chunked primitive batches, and the two-level
instanced BVH (TLAS+BLAS), cf. the reference's nested kd-trees
(/root/reference/src/kdtree.rs:128, examples/fractal_teapots.rs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpt_tpu import Group, Material, Object, Scene, group, sphere
from rpt_tpu.scene import _maybe_chunked, compile_scene
from rpt_tpu.ops import intersect as ops
from rpt_tpu.ops.tlas import build_instanced, instanced_closest_hit
from rpt_tpu.shapes import Mesh


def _random_rays(n, key, origin_box=3.0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    o = jax.random.uniform(k1, (n, 3), minval=-origin_box, maxval=origin_box)
    d = jax.random.normal(k2, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _inward_rays(n, key, radius=6.0, target_jitter=1.5):
    """Origins on a sphere of `radius` looking at jittered points near the
    origin — guarantees most rays hit geometry clustered around the origin."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    o = jax.random.normal(k1, (n, 3))
    o = radius * o / jnp.linalg.norm(o, axis=-1, keepdims=True)
    target = jax.random.uniform(k2, (n, 3), minval=-target_jitter, maxval=target_jitter)
    d = target - o
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _tet_mesh(seed=0, tris=24):
    """A random triangle soup around the origin."""
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (tris, 3))
    e = rng.uniform(-0.4, 0.4, (tris, 2, 3))
    verts = np.stack([v0, v0 + e[:, 0], v0 + e[:, 1]], axis=1)
    return Mesh(verts)


def test_group_flattens_like_individual_objects():
    mat = Material.diffuse((0.5, 0.5, 0.5))
    spheres = [
        sphere().scale([0.5, 0.5, 0.5]).translate([i - 1.0, 0.0, 0.0])
        for i in range(3)
    ]

    s_group = Scene()
    s_group.add(Object(group(spheres)).material(mat))
    s_flat = Scene()
    for sp in spheres:
        s_flat.add(Object(sp).material(mat))

    o, d = _random_rays(64, key=1)
    t_min = jnp.float32(1e-3)
    hg = s_group.compile().intersect(o, d, t_min)
    hf = s_flat.compile().intersect(o, d, t_min)
    np.testing.assert_allclose(hg.t, hf.t)
    np.testing.assert_allclose(hg.normal, hf.normal)
    np.testing.assert_array_equal(hg.mat_id, hf.mat_id)


def test_nested_group_transforms_compose():
    mat = Material.diffuse((0.2, 0.4, 0.6))
    inner = group([sphere().translate([1.0, 0.0, 0.0])])
    outer = group([inner.scale([2.0, 2.0, 2.0])]).translate([0.0, 1.0, 0.0])

    s_nested = Scene()
    s_nested.add(Object(outer).material(mat))
    s_direct = Scene()
    s_direct.add(
        Object(
            sphere().translate([1.0, 0.0, 0.0]).scale([2.0, 2.0, 2.0]).translate([0.0, 1.0, 0.0])
        ).material(mat)
    )

    o, d = _random_rays(64, key=2, origin_box=6.0)
    t_min = jnp.float32(1e-3)
    hn = s_nested.compile().intersect(o, d, t_min)
    hd = s_direct.compile().intersect(o, d, t_min)
    np.testing.assert_allclose(hn.t, hd.t, rtol=1e-5)
    np.testing.assert_allclose(hn.normal, hd.normal, rtol=1e-4, atol=1e-5)


def test_chunked_matches_unchunked_spheres():
    rng = np.random.default_rng(3)
    P, N = 37, 128
    inv_tf = np.tile(np.eye(3, 4, dtype=np.float32), (P, 1, 1))
    inv_tf[:, :, 3] = rng.uniform(-4, 4, (P, 3))  # translated unit spheres
    nmat = np.tile(np.eye(3, dtype=np.float32), (P, 1, 1))
    mat_id = rng.integers(0, 5, P).astype(np.int32)
    arrays = (jnp.asarray(inv_tf), jnp.asarray(nmat), jnp.asarray(mat_id))

    o, d = _random_rays(N, key=4, origin_box=6.0)
    t_min = jnp.float32(1e-3)
    direct = ops.intersect_spheres(o, d, t_min, *arrays)
    chunked = _maybe_chunked(ops.intersect_spheres, arrays, o, d, t_min, chunk=8)
    # fori_loop chunks compile separately from the one-shot broadcast, so f32
    # rounding may differ in the last couple of ulps.
    np.testing.assert_allclose(chunked.t, direct.t, rtol=1e-5, atol=1e-5)
    # Hit.normal is documented garbage on miss lanes (ops/intersect.py); only
    # compare where both paths actually hit.
    hit_mask = np.isfinite(np.asarray(direct.t))
    assert hit_mask.sum() > 20, "test should actually hit things"
    np.testing.assert_allclose(
        np.asarray(chunked.normal)[hit_mask],
        np.asarray(direct.normal)[hit_mask],
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(chunked.mat_id)[hit_mask], np.asarray(direct.mat_id)[hit_mask]
    )


def _instanced_vs_baked(mesh_factory, matrices):
    """Scene A: one shared mesh, many instances -> TLAS path.
    Scene B: fresh mesh object per instance -> baked brute-force/BVH path."""
    mats = [Material.diffuse((0.8, 0.2, 0.2)), Material.specular((0.2, 0.8, 0.2), 0.3)]

    shared = mesh_factory()
    s_inst = Scene()
    for i, m in enumerate(matrices):
        s_inst.add(Object(shared.transform(m)).material(mats[i % 2]))
    data_inst = compile_scene(s_inst)
    assert data_inst.instanced is not None, "shared mesh should take the TLAS path"

    s_baked = Scene()
    for i, m in enumerate(matrices):
        s_baked.add(Object(mesh_factory().transform(m)).material(mats[i % 2]))
    data_baked = compile_scene(s_baked)
    assert data_baked.instanced is None, "unique meshes should take the baked path"

    # Aim rays from a sphere of origins at the transformed triangle centroids
    # so that hundreds of lanes actually hit the (sparse) triangle soup.
    targets = []
    for m in matrices:
        v = mesh_factory().vertices  # (T, 3, 3)
        c = v.mean(axis=1)  # centroids (T, 3)
        ch = np.concatenate([c, np.ones((len(c), 1))], axis=1)
        targets.append((ch @ np.asarray(m, np.float64).T)[:, :3])
    targets = np.concatenate(targets)
    n_rays = 256
    rng = np.random.default_rng(7)
    o = rng.normal(size=(n_rays, 3))
    o = 6.0 * o / np.linalg.norm(o, axis=-1, keepdims=True)
    tsel = targets[rng.integers(0, len(targets), n_rays)]
    d = tsel - o
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.asarray(o, jnp.float32)
    d = jnp.asarray(d, jnp.float32)
    t_min = jnp.float32(1e-3)
    hi = data_inst.intersect(o, d, t_min)
    hb = data_baked.intersect(o, d, t_min)
    # Same hits up to f32 transform round-off (baked bakes f64 then casts;
    # instanced transforms rays in f32).
    finite = np.isfinite(np.asarray(hi.t)) | np.isfinite(np.asarray(hb.t))
    np.testing.assert_allclose(
        np.asarray(hi.t)[finite], np.asarray(hb.t)[finite], rtol=2e-4, atol=2e-4
    )
    both = np.isfinite(np.asarray(hi.t)) & np.isfinite(np.asarray(hb.t))
    np.testing.assert_allclose(
        np.asarray(hi.normal)[both], np.asarray(hb.normal)[both], rtol=1e-2, atol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(hi.mat_id)[both], np.asarray(hb.mat_id)[both])
    assert both.sum() > 50, "test should actually hit things"


def test_instanced_matches_baked_two_instances():
    m1 = np.eye(4)
    m1[:3, 3] = [1.5, 0.0, 0.0]
    m2 = np.diag([0.5, 2.0, 1.0, 1.0])
    m2[:3, 3] = [-1.5, 0.5, 0.0]
    _instanced_vs_baked(lambda: _tet_mesh(seed=5), [m1, m2])


def test_instanced_many_instances_rotated():
    mats = []
    for i in range(9):
        ang = 2 * np.pi * i / 9
        c, s = np.cos(ang), np.sin(ang)
        m = np.eye(4)
        m[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]) * 0.6
        m[:3, 3] = [2.5 * c, 0.3 * i - 1.0, 2.5 * s]
        mats.append(m)
    _instanced_vs_baked(lambda: _tet_mesh(seed=6, tris=40), mats)


def test_instanced_two_distinct_meshes_shared():
    """Two different meshes, each used twice: both become BLASes."""
    mesh_a = _tet_mesh(seed=10)
    mesh_b = _tet_mesh(seed=11, tris=30)
    mat = Material.diffuse((0.5, 0.5, 0.9))
    s = Scene()
    offs = [[2.0, 0, 0], [-2.0, 0, 0], [0, 0, 2.0], [0, 0, -2.0]]
    for i, off in enumerate(offs):
        mesh = mesh_a if i % 2 == 0 else mesh_b
        s.add(Object(mesh.translate(off)).material(mat))
    data = compile_scene(s)
    assert data.instanced is not None
    assert data.instanced.inst_inv.shape[0] == 4

    # Brute-force ground truth: bake by hand
    o, d = _random_rays(200, key=12, origin_box=5.0)
    t_min = jnp.float32(1e-3)
    hit = data.intersect(o, d, t_min)

    all_v = []
    for i, off in enumerate(offs):
        mesh = mesh_a if i % 2 == 0 else mesh_b
        all_v.append(mesh.vertices + np.asarray(off))
    verts = np.concatenate(all_v).astype(np.float32)
    t_ref, _ = ops.triangles_hit_t(
        o, d, t_min, verts[:, 0], verts[:, 1], verts[:, 2]
    )
    t_ref = jnp.min(t_ref, axis=1)
    np.testing.assert_allclose(hit.t, t_ref, rtol=2e-4, atol=2e-4)


def test_group_of_mixed_primitives():
    """Groups may contain different primitive types (Bounded parity)."""
    from rpt_tpu import cube

    mat = Material.diffuse((1.0, 1.0, 0.0))
    g = group([sphere().translate([2.0, 0, 0]), cube().translate([-2.0, 0, 0])])
    s = Scene()
    s.add(Object(g.scale([1.0, 1.0, 1.0])).material(mat))
    data = compile_scene(s)
    assert data.spheres is not None and data.cubes is not None

    o = jnp.array([[2.0, 0.0, 5.0], [-2.0, 0.0, 5.0]], jnp.float32)
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    hit = data.intersect(o, d, jnp.float32(1e-3))
    np.testing.assert_allclose(hit.t, [4.0, 4.5], rtol=1e-5)

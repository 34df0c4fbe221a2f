"""Parity tests: two-level Pallas packet TLAS vs. the XLA while_loop path.

Runs the kernel in interpreter mode on the CPU mesh (Mosaic compilation is
asserted on TPU by bench.py's fractal_teapots parity check). Semantics under
test match the reference's nested kd-tree traversal — a Transformed<Mesh>
re-enters the child tree with a transformed ray
(/root/reference/src/shape.rs:127-137 + /root/reference/src/kdtree.rs:151-223).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rpt_tpu.ops.tlas import build_instanced, instanced_closest_hit
from rpt_tpu.ops.tlas_pallas import (
    pack_tlas_for_pallas,
    tlas_closest_hit_pallas,
    tlas_occluded_pallas,
    tlas_pallas_eligible,
)


class _FakeMesh:
    def __init__(self, verts, norms):
        self.vertices = verts
        self.normals = norms


def _random_mesh(n_tris: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-0.5, 0.5, (n_tris, 1, 3))
    offs = rng.uniform(-0.12, 0.12, (n_tris, 2, 3))
    verts = np.concatenate([base, base + offs], axis=1)
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    norms = np.repeat(n[:, None, :], 3, axis=1)
    return _FakeMesh(verts, norms)


def _random_transform(rng):
    """Random rotation + anisotropic scale + translation (full affine)."""
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    rot = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    scale = np.diag(rng.uniform(0.5, 1.8, 3))
    m = np.eye(4)
    m[:3, :3] = rot @ scale
    m[:3, 3] = rng.uniform(-3.0, 3.0, 3)
    return m


def _build_instanced_scene(n_meshes=2, n_instances=9, tris_per_mesh=60, seed=0):
    rng = np.random.default_rng(seed)
    meshes = [_random_mesh(tris_per_mesh, seed=seed + i) for i in range(n_meshes)]
    instances = [
        (int(rng.integers(0, n_meshes)), _random_transform(rng), int(rng.integers(0, 4)))
        for _ in range(n_instances)
    ]
    return meshes, instances


def _rays_at_instances(n_rays, meshes, instances, seed=1):
    """Rays from a far sphere aimed at (slightly jittered) world-space
    triangle centroids, so most lanes actually hit geometry."""
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n_rays, 3))
    o /= np.linalg.norm(o, axis=-1, keepdims=True)
    o *= 10.0
    cents = []
    for mesh_idx, m, _ in instances:
        local = meshes[mesh_idx].vertices.mean(axis=1)
        cents.append(local @ m[:3, :3].T + m[:3, 3])
    cents = np.concatenate(cents)
    target = cents[rng.integers(0, cents.shape[0], n_rays)]
    target += rng.uniform(-0.01, 0.01, (n_rays, 3))
    d = target - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


@pytest.mark.parametrize("n_meshes,n_instances", [(1, 5), (3, 17)])
def test_tlas_pallas_matches_xla(n_meshes, n_instances):
    meshes, instances = _build_instanced_scene(n_meshes, n_instances)
    im = build_instanced(meshes, instances)
    assert tlas_pallas_eligible(im)
    o, d = _rays_at_instances(333, meshes, instances)  # not a multiple of 128
    t_min = 1e-3

    ref = instanced_closest_hit(im, o, d, t_min)
    got = tlas_closest_hit_pallas(im, o, d, t_min, interpret=True)

    hit_ref = np.isfinite(np.asarray(ref.t))
    hit_got = np.isfinite(np.asarray(got.t))
    assert hit_ref.sum() > 60, "test geometry too sparse to be meaningful"
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


def test_tlas_pallas_active_mask_parks_lanes():
    meshes, instances = _build_instanced_scene(2, 7, seed=5)
    im = build_instanced(meshes, instances)
    o, d = _rays_at_instances(256, meshes, instances, seed=6)
    active = jnp.arange(256) % 2 == 0

    got = tlas_closest_hit_pallas(im, o, d, 1e-3, active=active, interpret=True)
    full = tlas_closest_hit_pallas(im, o, d, 1e-3, interpret=True)

    t = np.asarray(got.t)
    assert not np.isfinite(t[1::2]).any()
    np.testing.assert_allclose(t[0::2], np.asarray(full.t)[0::2], rtol=1e-6)


def test_tlas_pack_layout():
    meshes, instances = _build_instanced_scene(2, 6, tris_per_mesh=30)
    im = build_instanced(meshes, instances)
    pack = pack_tlas_for_pallas(im)

    Mt = np.asarray(im.t_min).shape[0]
    Mb = np.asarray(im.b_min).shape[0]
    K = np.asarray(im.inst_inv).shape[0]
    assert pack.t_bounds.shape == (Mt * 8,) and pack.t_meta.shape == (Mt * 4,)
    assert pack.b_bounds.shape == (Mb * 8,) and pack.b_meta.shape == (Mb * 4,)
    assert pack.inst_f.shape == (K * 12,) and pack.inst_i.shape == (K * 4,)
    # One (8,128) block per non-empty leaf; swizzled v0 matches packed verts.
    L = pack.tri.shape[0]
    assert pack.p_verts.shape == (L * 8, 3, 3)
    np.testing.assert_allclose(
        pack.tri.reshape(L * 8, 128)[:, 0:3], pack.p_verts[:, 0], rtol=1e-6
    )
    # Every original triangle appears in the packed table exactly once as a
    # real (counted) entry.
    b_meta = np.asarray(pack.b_meta).reshape(Mb, 4)
    counted = int(b_meta[:, 2].sum())
    assert counted == np.asarray(im.verts).shape[0]


def test_tlas_occlusion_matches_closest():
    """Any-hit shadow variant of the two-level kernel: boolean parity with
    `closest.t <= t_max`, with a per-lane max distance so some hits fall
    beyond the light (visible) and some within (occluded)."""
    meshes, instances = _build_instanced_scene(3, 17, seed=11)
    im = build_instanced(meshes, instances)
    o, d = _rays_at_instances(333, meshes, instances, seed=12)
    t_min = 1e-3

    ref_t = np.asarray(tlas_closest_hit_pallas(im, o, d, t_min, interpret=True).t)
    rng = np.random.default_rng(13)
    t_max = jnp.asarray(rng.uniform(2.0, 7.0, o.shape[0]), jnp.float32)

    got = tlas_occluded_pallas(im, o, d, t_min, t_max, interpret=True)
    want = ref_t <= np.asarray(t_max)
    assert want.any() and (~want).any()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_tlas_occlusion_active_mask():
    meshes, instances = _build_instanced_scene(2, 7, seed=21)
    im = build_instanced(meshes, instances)
    o, d = _rays_at_instances(256, meshes, instances, seed=22)
    active = jnp.arange(256) % 2 == 0
    t_max = jnp.full((256,), 10.0, jnp.float32)

    got = np.asarray(
        tlas_occluded_pallas(im, o, d, 1e-3, t_max, active=active, interpret=True)
    )
    full = np.asarray(tlas_occluded_pallas(im, o, d, 1e-3, t_max, interpret=True))
    assert not got[1::2].any()
    np.testing.assert_array_equal(got[0::2], full[0::2])

"""Stream compaction and wavefront occupancy stats.

Compaction is a pure execution-order change: RNG draws and shading happen in
original lane order; only scene.intersect sees the live-first partition, and
its per-ray results are order-independent. So compact=True must be
BIT-identical to compact=False — that is the whole test."""

import numpy as np
import jax
import jax.numpy as jnp

from rpt_tpu import (
    Camera,
    Material,
    Object,
    ObjectLight,
    Renderer,
    Scene,
    hex_color,
    plane,
    sphere,
)
from rpt_tpu.integrator import _compaction_perm, trace_paths
from rpt_tpu.profiling import depth_stats, measure_rays_per_sec, rays_per_sample
from rpt_tpu.renderer import pixel_ndc
from test_tlas_pallas import _build_instanced_scene


def _mesh_scene():
    """Sphere + floor + mesh instances + area light: exercises every
    traversal path with a wavefront that actually dies off with depth."""
    meshes, instances = _build_instanced_scene(2, 6, tris_per_mesh=40)
    scene = Scene()
    from rpt_tpu.shapes import Mesh, Transformed

    # Instanced meshes enter via shared Mesh objects + transforms.
    mesh_objs = [
        Mesh(vertices=np.asarray(m.vertices), normals=np.asarray(m.normals))
        for m in meshes
    ]
    for mesh_idx, mat4, _ in instances:
        scene.add(
            Object(Transformed(mesh_objs[mesh_idx], np.asarray(mat4))).material(
                Material.diffuse(hex_color(0xB0B0B0))
            )
        )
    scene.add(Object(sphere()).material(Material.specular(hex_color(0xB7410E), 0.2)))
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0x777777))
        )
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([2.0] * 3).translate([0.0, 14.0, 0.0])
            ).material(Material.light(hex_color(0xFFFFFF), 30.0))
        )
    )
    cam = Camera.look_at([-4.0, 5.0, 9.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], np.pi / 4)
    return scene, cam


def test_compaction_perm_partitions():
    active = jnp.asarray(np.random.default_rng(0).random(1000) < 0.3)
    perm, pos = _compaction_perm(active)
    n_alive = int(jnp.sum(active))
    sorted_active = np.asarray(active)[np.asarray(perm)]
    assert sorted_active[:n_alive].all() and not sorted_active[n_alive:].any()
    # pos is the exact inverse of perm
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(pos)], np.arange(1000))
    # stability: relative order preserved within each class
    orig_alive = np.flatnonzero(np.asarray(active))
    np.testing.assert_array_equal(np.asarray(perm)[:n_alive], orig_alive)


def test_compacted_trace_bit_identical():
    scene, cam = _mesh_scene()
    sd = scene.compile()
    xg, yg, dim = pixel_ndc(48, 32)
    key = jax.random.PRNGKey(7)
    o, d = cam.cast_rays(xg, yg, key)

    plain = trace_paths(sd, o, d, key, 3, 1e-3, compact=False)
    packed = trace_paths(sd, o, d, key, 3, 1e-3, compact=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(packed))


def test_depth_stats_decay_and_counters():
    scene, cam = _mesh_scene()
    r = Renderer(scene, cam, width=48, height=32, max_bounces=4, num_samples=1)
    stats = depth_stats(r)
    ff, cf = stats["found_frac"], stats["cont_frac"]
    assert ff.shape == (5,) and cf.shape == (4,)
    assert np.all((ff >= 0) & (ff <= 1)) and np.all((cf >= 0) & (cf <= 1))
    # Continuation fraction is non-increasing: lanes only ever die.
    assert np.all(np.diff(cf) <= 1e-6)
    # Ray accounting: 1 closest-hit + 1 shadow light per depth.
    assert rays_per_sample(r.scene.compile(), 4) == 5 * 2

    meter = measure_rays_per_sec(r, warmup=1, passes=2)
    assert meter["rays_per_sec"] > 0 and meter["rays"] == 48 * 32 * 10 * 2


def test_octant_perm_groups_and_inverts():
    from rpt_tpu.integrator import _octant_perm

    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.normal(size=(777, 3)), jnp.float32)
    active = jnp.asarray(rng.random(777) < 0.6)
    perm, pos = _octant_perm(d, active)
    perm_n, pos_n = np.asarray(perm), np.asarray(pos)
    # pos is the exact inverse of perm
    np.testing.assert_array_equal(perm_n[pos_n], np.arange(777))
    # sorted order: live lanes grouped by non-decreasing octant, dead last
    dn, an = np.asarray(d), np.asarray(active)
    key = (dn[:, 0] < 0) + 2 * (dn[:, 1] < 0) + 4 * (dn[:, 2] < 0)
    key = np.where(an, key, 8)
    sorted_key = key[perm_n]
    assert (np.diff(sorted_key) >= 0).all()
    # stability within each bucket
    for b in range(9):
        np.testing.assert_array_equal(
            perm_n[sorted_key == b], np.flatnonzero(key == b)
        )


def test_octsorted_trace_bit_identical():
    scene, cam = _mesh_scene()
    sd = scene.compile()
    xg, yg, dim = pixel_ndc(48, 32)
    key = jax.random.PRNGKey(7)
    o, d = cam.cast_rays(xg, yg, key)

    plain = trace_paths(sd, o, d, key, 3, 1e-3, compact=False)
    sorted_ = trace_paths(sd, o, d, key, 3, 1e-3, compact="octant")
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sorted_))


def test_morton_perm_groups_and_inverts():
    from rpt_tpu.integrator import _morton_perm

    rng = np.random.default_rng(5)
    o = jnp.asarray(rng.uniform(-2, 2, size=(777, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(size=(777, 3)), jnp.float32)
    active = jnp.asarray(rng.random(777) < 0.6)
    lo = jnp.asarray([-2.0, -2.0, -2.0])
    hi = jnp.asarray([2.0, 2.0, 2.0])
    perm, pos = _morton_perm(o, d, active, lo, hi)
    perm_n, pos_n = np.asarray(perm), np.asarray(pos)
    # pos is the exact inverse of perm; perm is a permutation
    np.testing.assert_array_equal(perm_n[pos_n], np.arange(777))
    np.testing.assert_array_equal(np.sort(perm_n), np.arange(777))
    # dead lanes all sort after every live lane
    an = np.asarray(active)
    n_alive = an.sum()
    assert an[perm_n][:n_alive].all() and not an[perm_n][n_alive:].any()
    # primary key is the direction octant (live lanes)
    dn = np.asarray(d)
    key = (dn[:, 0] < 0) + 2 * (dn[:, 1] < 0) + 4 * (dn[:, 2] < 0)
    sk = key[perm_n][:n_alive]
    assert (np.diff(sk) >= 0).all()


def test_gather_packed_round_trip():
    from rpt_tpu.integrator import _gather_packed

    rng = np.random.default_rng(6)
    n = 333
    perm = jnp.asarray(rng.permutation(n), jnp.int32)
    f1 = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    f3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    ints = jnp.asarray(rng.integers(-5, 900, size=(n,)), jnp.int32)
    bools = jnp.asarray(rng.random(n) < 0.5)
    inf = f1.at[7].set(jnp.inf)  # hit.t carries +inf misses through packing
    g_inf, g3, gi, gb = _gather_packed(perm, (inf, f3, ints, bools))
    p = np.asarray(perm)
    np.testing.assert_array_equal(np.asarray(g_inf), np.asarray(inf)[p])
    np.testing.assert_array_equal(np.asarray(g3), np.asarray(f3)[p])
    np.testing.assert_array_equal(np.asarray(gi), np.asarray(ints)[p])
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(bools)[p])


def test_mortonsorted_trace_bit_identical():
    scene, cam = _mesh_scene()
    sd = scene.compile()
    xg, yg, dim = pixel_ndc(48, 32)
    key = jax.random.PRNGKey(7)
    o, d = cam.cast_rays(xg, yg, key)

    plain = trace_paths(sd, o, d, key, 3, 1e-3, compact=False)
    sorted_ = trace_paths(sd, o, d, key, 3, 1e-3, compact="morton")
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(sorted_))

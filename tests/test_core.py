"""Core unit tests: color, camera, and batched intersectors.

The reference has exactly three unit tests (SURVEY.md §4); we test far harder,
using analytic closed-form cases for every primitive.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpt_tpu.color import hex_color, color_bytes
from rpt_tpu.camera import Camera
from rpt_tpu.ops import intersect as ops
from rpt_tpu import shapes as sh
from rpt_tpu.scene import Scene, Object, compile_scene
from rpt_tpu.materials import Material


def rays(origins, dirs):
    o = jnp.asarray(origins, jnp.float32).reshape(-1, 3)
    d = jnp.asarray(dirs, jnp.float32).reshape(-1, 3)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def identity_xf(n=1):
    inv_tf = jnp.tile(jnp.eye(3, 4, dtype=jnp.float32), (n, 1, 1))
    nmat = jnp.tile(jnp.eye(3, dtype=jnp.float32), (n, 1, 1))
    return inv_tf, nmat


class TestColor:
    def test_colors_work(self):
        # Parity with the reference test at color.rs:26-39
        assert np.array_equal(color_bytes(hex_color(0x000000)), [0, 0, 0])
        assert np.array_equal(color_bytes(hex_color(0xFFFFFF)), [255, 255, 255])
        assert np.array_equal(color_bytes(hex_color(0xFF0000)), [255, 0, 0])

    def test_gamma_roundtrip(self):
        for v in (0x123456, 0xABCDEF, 0x808080):
            np.testing.assert_array_equal(
                color_bytes(hex_color(v)),
                [(v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF],
            )


class TestCamera:
    def test_default_center_ray(self):
        cam = Camera()
        o, d = cam.cast_rays(jnp.zeros(1), jnp.zeros(1), jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(o[0]), [0, 0, 10], atol=1e-6)
        np.testing.assert_allclose(np.asarray(d[0]), [0, 0, -1], atol=1e-6)

    def test_look_at_orthogonality(self):
        cam = Camera.look_at([1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], 1.0)
        assert abs(float(jnp.dot(cam.direction, cam.up))) < 1e-6
        assert abs(float(jnp.linalg.norm(cam.direction)) - 1) < 1e-6

    def test_fov_edge_ray(self):
        # x=1 (NDC edge) should make angle fov/2 with the axis
        fov = 0.8
        cam = Camera.look_at([0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], fov)
        _, d = cam.cast_rays(jnp.ones(1), jnp.zeros(1), jax.random.PRNGKey(0))
        cos = float(jnp.dot(d[0], cam.direction))
        assert abs(np.arccos(cos) - fov / 2) < 1e-5

    def test_depth_of_field_converges_at_focal_plane(self):
        cam = Camera.look_at([0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], 0.8)
        cam = cam.focus([0.0, 0.0, 0.0], 0.3)
        # Rays through the same screen point from different lens positions all
        # pass through the focal point.
        pts = []
        for s in range(5):
            o, d = cam.cast_rays(jnp.zeros(1), jnp.zeros(1), jax.random.PRNGKey(s))
            t = -float(o[0, 2]) / float(d[0, 2]) * 1.0  # z=0 plane
            pts.append(np.asarray(o[0] + t * d[0]))
        pts = np.stack(pts)
        assert np.abs(pts - pts[0]).max() < 1e-4


class TestSphere:
    def test_head_on(self):
        o, d = rays([[0, 0, 10]], [[0, 0, -1]])
        inv_tf, nmat = identity_xf()
        hit = ops.intersect_spheres(o, d, 1e-4, inv_tf, nmat, jnp.zeros(1, jnp.int32))
        assert abs(float(hit.t[0]) - 9.0) < 1e-5
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-5)

    def test_from_inside_picks_t_plus(self):
        o, d = rays([[0, 0, 0]], [[0, 0, -1]])
        inv_tf, nmat = identity_xf()
        hit = ops.intersect_spheres(o, d, 1e-4, inv_tf, nmat, jnp.zeros(1, jnp.int32))
        assert abs(float(hit.t[0]) - 1.0) < 1e-5
        # Normal is the surface point itself (outward), sphere.rs:38-40
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, -1], atol=1e-5)

    def test_miss(self):
        o, d = rays([[0, 5, 10]], [[0, 0, -1]])
        inv_tf, nmat = identity_xf()
        hit = ops.intersect_spheres(o, d, 1e-4, inv_tf, nmat, jnp.zeros(1, jnp.int32))
        assert not bool(hit.valid[0])

    def test_scaled_translated(self):
        # Sphere scaled by 2 and moved to (0, 12, 0): ray from origin going +y
        # hits at y = 10.
        s = sh.sphere().scale([2.0, 2.0, 2.0]).translate([0.0, 12.0, 0.0])
        scene = Scene()
        scene.add(Object(s, Material.diffuse((1, 1, 1))))
        data = scene.compile()
        o, d = rays([[0, 0, 0]], [[0, 1, 0]])
        hit = data.intersect(o, d, 1e-4)
        assert abs(float(hit.t[0]) - 10.0) < 1e-4
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, -1, 0], atol=1e-4)

    def test_nonuniform_scale_normal(self):
        # Ellipsoid x²/4 + y² + z² = 1: at point (2,0,0) normal is +x
        s = sh.sphere().scale([2.0, 1.0, 1.0])
        scene = Scene()
        scene.add(Object(s, Material.diffuse((1, 1, 1))))
        data = scene.compile()
        o, d = rays([[5, 0, 0]], [[-1, 0, 0]])
        hit = data.intersect(o, d, 1e-4)
        assert abs(float(hit.t[0]) - 3.0) < 1e-4
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [1, 0, 0], atol=1e-4)


class TestPlane:
    def test_hit_and_normal_flip(self):
        normals = jnp.asarray([[0.0, 1.0, 0.0]])
        values = jnp.asarray([-1.0])
        o, d = rays([[0, 5, 0], [0, -5, 0]], [[0, -1, 0], [0, 1, 0]])
        hit = ops.intersect_planes(o, d, 1e-4, normals, values, jnp.zeros(1, jnp.int32))
        assert abs(float(hit.t[0]) - 6.0) < 1e-5
        assert abs(float(hit.t[1]) - 4.0) < 1e-5
        # Normal flipped toward each ray (plane.rs:27)
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 1, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(hit.normal[1]), [0, -1, 0], atol=1e-6)

    def test_parallel_miss(self):
        normals = jnp.asarray([[0.0, 1.0, 0.0]])
        values = jnp.asarray([-1.0])
        o, d = rays([[0, 5, 0]], [[1, 0, 0]])
        hit = ops.intersect_planes(o, d, 1e-4, normals, values, jnp.zeros(1, jnp.int32))
        assert not bool(hit.valid[0])


class TestCube:
    def test_entry_normal(self):
        o, d = rays([[0, 0, 5]], [[0, 0, -1]])
        inv_tf, nmat = identity_xf()
        hit = ops.intersect_cubes(o, d, 1e-4, inv_tf, nmat, jnp.zeros(1, jnp.int32))
        assert abs(float(hit.t[0]) - 4.5) < 1e-5
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-6)

    def test_inside_exit_normal(self):
        o, d = rays([[0.1, 0, 0]], [[1, 0, 0]])
        inv_tf, nmat = identity_xf()
        hit = ops.intersect_cubes(o, d, 1e-4, inv_tf, nmat, jnp.zeros(1, jnp.int32))
        assert abs(float(hit.t[0]) - 0.4) < 1e-5
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [1, 0, 0], atol=1e-6)

    def test_diagonal_miss(self):
        o, d = rays([[2, 2, 2]], [[1, 1, 1]])
        inv_tf, nmat = identity_xf()
        hit = ops.intersect_cubes(o, d, 1e-4, inv_tf, nmat, jnp.zeros(1, jnp.int32))
        assert not bool(hit.valid[0])

    def test_rotated_cube(self):
        c = sh.cube().rotate_y(np.pi / 4).scale([2.0, 2.0, 2.0])
        scene = Scene()
        scene.add(Object(c, Material.diffuse((1, 1, 1))))
        data = scene.compile()
        o, d = rays([[5, 0, 0]], [[-1, 0, 0]])
        hit = data.intersect(o, d, 1e-4)
        # Scaled by 2 then... scale applied after rotate: corner at
        # x = 2*(sqrt(2)/2) = sqrt(2)
        assert abs(float(hit.t[0]) - (5.0 - np.sqrt(2.0))) < 1e-3


class TestTriangle:
    def test_hit_inside(self):
        verts = jnp.asarray(
            [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32
        )
        norms = jnp.asarray([[[0.0, 0.0, 1.0]] * 3], jnp.float32)
        o, d = rays([[0.2, 0.2, 5.0]], [[0, 0, -1]])
        hit = ops.intersect_triangles(o, d, 1e-4, verts, norms, jnp.zeros(1, jnp.int32))
        assert abs(float(hit.t[0]) - 5.0) < 1e-5
        np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, 1], atol=1e-6)

    def test_outside_misses(self):
        verts = jnp.asarray(
            [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32
        )
        norms = jnp.asarray([[[0.0, 0.0, 1.0]] * 3], jnp.float32)
        o, d = rays([[0.9, 0.9, 5.0]], [[0, 0, -1]])
        hit = ops.intersect_triangles(o, d, 1e-4, verts, norms, jnp.zeros(1, jnp.int32))
        assert not bool(hit.valid[0])

    def test_smooth_normal_interpolation(self):
        verts = jnp.asarray(
            [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], jnp.float32
        )
        # Different per-vertex normals; at centroid the interpolated normal is
        # the normalized average (mesh.rs:77)
        n1 = np.array([0.0, 0.0, 1.0])
        n2 = np.array([1.0, 0.0, 1.0]) / np.sqrt(2)
        n3 = np.array([0.0, 1.0, 1.0]) / np.sqrt(2)
        norms = jnp.asarray([np.stack([n1, n2, n3])], jnp.float32)
        o, d = rays([[1 / 3, 1 / 3, 5.0]], [[0, 0, -1]])
        hit = ops.intersect_triangles(o, d, 1e-4, verts, norms, jnp.zeros(1, jnp.int32))
        expect = (n1 + n2 + n3) / 3
        expect /= np.linalg.norm(expect)
        np.testing.assert_allclose(np.asarray(hit.normal[0]), expect, atol=1e-4)


class TestMonomial:
    def test_vertical_hit(self):
        # Surface y = 2 (x²+z²)²; vertical ray down at x=0.5: y = 2*(0.25)² = 0.125
        scene = Scene()
        scene.add(Object(sh.monomial_surface(2.0), Material.diffuse((1, 1, 1))))
        data = scene.compile()
        o, d = rays([[0.5, 5.0, 0.0]], [[0, -1, 0]])
        hit = data.intersect(o, d, 1e-4)
        assert bool(hit.valid[0])
        y_hit = 5.0 - float(hit.t[0])
        assert abs(y_hit - 0.125) < 1e-3

    def test_outside_disk_misses(self):
        scene = Scene()
        scene.add(Object(sh.monomial_surface(2.0), Material.diffuse((1, 1, 1))))
        data = scene.compile()
        o, d = rays([[1.5, 5.0, 0.0]], [[0, -1, 0]])
        hit = data.intersect(o, d, 1e-4)
        assert not bool(hit.valid[0])

    def test_normal_points_up_toward_ray(self):
        scene = Scene()
        scene.add(Object(sh.monomial_surface(2.0), Material.diffuse((1, 1, 1))))
        data = scene.compile()
        o, d = rays([[0.3, 5.0, 0.0]], [[0, -1, 0]])
        hit = data.intersect(o, d, 1e-4)
        # Two-sided normal flipped against the downward ray => +y component
        assert float(hit.normal[0, 1]) > 0


class TestSceneMerge:
    def test_closest_wins_across_types(self):
        scene = Scene()
        scene.add(Object(sh.sphere(), Material.diffuse((1, 0, 0))))  # mat 0
        scene.add(
            Object(sh.plane([0.0, 0.0, 1.0], -5.0), Material.diffuse((0, 1, 0)))
        )  # mat 1
        data = scene.compile()
        o, d = rays([[0, 0, 10]], [[0, 0, -1]])
        hit = data.intersect(o, d, 1e-4)
        assert abs(float(hit.t[0]) - 9.0) < 1e-4
        assert int(hit.mat_id[0]) == 0
        # Ray that misses the sphere falls through to the plane
        o, d = rays([[3, 0, 10]], [[0, 0, -1]])
        hit = data.intersect(o, d, 1e-4)
        assert abs(float(hit.t[0]) - 15.0) < 1e-3
        assert int(hit.mat_id[0]) == 1


def test_analytic_occluded_matches_closest_hit():
    """scene.occluded must stay boolean-equal to intersect().t <= t_max now
    that analytic NEE visibility has its own any-hit path (no winner
    selection): same per-primitive hit times, OR vs min reduction."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rpt_tpu import Material, Object, Scene, hex_color
    from rpt_tpu.shapes import Cube, Mesh, MonomialSurface, Plane, Sphere

    rng = np.random.default_rng(11)
    scene = Scene()
    scene.add(Object(Sphere().scale([1.3, 0.8, 1.0]).translate([0.5, 0.2, -1.0])))
    scene.add(Object(Cube().rotate_y(0.4).translate([-1.2, 0.0, 0.5])))
    scene.add(Object(Plane(np.array([0.0, 1.0, 0.0]), -1.5)))
    scene.add(
        Object(
            MonomialSurface(height=1.0).translate([0.0, -0.5, 1.0])
        ).material(Material.clear(1.5, 0.1))
    )
    tris = rng.normal(size=(5, 3, 3)) * 0.7 + np.array([1.5, 0.5, 0.5])
    scene.add(Object(Mesh(tris)))
    sd = scene.compile()

    n = 512
    o = jnp.asarray(rng.normal(size=(n, 3)) * 2.5, jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    t_max = jnp.asarray(rng.uniform(0.3, 6.0, size=(n,)), jnp.float32)

    hit = sd.intersect(o, d, 1e-3)
    occ = sd.occluded(o, d, 1e-3, t_max)
    want = np.asarray(hit.t) <= np.asarray(t_max)
    got = np.asarray(occ)
    # Allow knife-edge float disagreements only at the exact boundary.
    disagree = got != want
    if disagree.any():
        rel = np.abs(np.asarray(hit.t)[disagree] - np.asarray(t_max)[disagree])
        assert np.all(rel < 1e-4), f"{disagree.sum()} non-boundary mismatches"

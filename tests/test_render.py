"""End-to-end render tests on tiny frames (CPU jax).

Covers the full integrator path: camera -> intersect -> NEE -> bounce scan ->
buffer, with analytic checks where closed forms exist.
"""

import numpy as np
import jax.numpy as jnp

from rpt_tpu import (
    AmbientLight,
    Buffer,
    Camera,
    Environment,
    Filter,
    Material,
    Object,
    ObjectLight,
    PointLight,
    Renderer,
    Scene,
    hex_color,
    plane,
    sphere,
)


def sphere_scene():
    scene = Scene()
    scene.add(Object(sphere()))
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([2.0, 2.0, 2.0]).translate([0.0, 12.0, 0.0])
            ).material(Material.light(hex_color(0xFFFFFF), 40.0))
        )
    )
    return scene


def sphere_camera():
    return Camera.look_at([-2.5, 4.0, 6.5], [0.0, -0.25, 0.0], [0.0, 1.0, 0.0], np.pi / 4)


class TestSphereScene:
    def test_renders_finite_and_lit(self):
        r = Renderer(
            sphere_scene(), sphere_camera(), width=64, height=36,
            max_bounces=2, num_samples=4,
        )
        buf = r.render_buffer()
        mean = np.asarray(buf.mean_image())
        assert np.all(np.isfinite(mean))
        assert mean.mean() > 0.01  # lit
        assert mean.max() < 100.0  # clamped / sane

    def test_deterministic_per_seed(self):
        r1 = Renderer(sphere_scene(), sphere_camera(), width=32, height=18,
                      max_bounces=2, num_samples=2, seed=7)
        r2 = Renderer(sphere_scene(), sphere_camera(), width=32, height=18,
                      max_bounces=2, num_samples=2, seed=7)
        np.testing.assert_array_equal(r1.render(), r2.render())

    def test_different_seeds_differ(self):
        r1 = Renderer(sphere_scene(), sphere_camera(), width=32, height=18,
                      max_bounces=2, num_samples=1, seed=1)
        r2 = Renderer(sphere_scene(), sphere_camera(), width=32, height=18,
                      max_bounces=2, num_samples=1, seed=2)
        assert not np.array_equal(r1.render(), r2.render())

    def test_variance_decreases_with_spp(self):
        r = Renderer(sphere_scene(), sphere_camera(), width=32, height=18,
                     max_bounces=2, num_samples=64)
        captured = []
        r.iterative_render(16, lambda it, buf: captured.append(float(buf.variance())))
        # The per-pixel sample variance estimate converges (roughly constant);
        # the *error of the mean* shrinks as 1/n. Check the estimates are
        # finite, positive, and stable within 2x.
        assert all(np.isfinite(v) and v >= 0 for v in captured)
        assert captured[-1] < captured[0] * 2.0 + 1e-6


class TestAnalyticLighting:
    def test_ambient_only_exact(self):
        # Camera sees a diffuse plane lit only by ambient light:
        # color = ambient ⊙ albedo exactly (renderer.rs:187-188)
        scene = Scene()
        albedo = np.array([0.3, 0.5, 0.7])
        scene.add(Object(plane([0.0, 0.0, 1.0], 0.0)).material(Material.diffuse(albedo)))
        scene.add(AmbientLight((0.2, 0.4, 0.6)))
        cam = Camera()  # at (0,0,10) looking -z
        r = Renderer(scene, cam, width=8, height=8, max_bounces=0, num_samples=1)
        img = np.asarray(r.render_buffer().mean_image())
        expect = np.broadcast_to(np.array([0.2, 0.4, 0.6]) * albedo, img.shape)
        np.testing.assert_allclose(img, expect, rtol=1e-4)

    def test_point_light_inverse_square(self):
        # Head-on diffuse plane + point light on the camera axis. The center
        # pixel brightness follows (1-F(0 deg)) a/pi * c/r^2 approximately.
        scene = Scene()
        albedo = np.array([0.8, 0.8, 0.8])
        scene.add(Object(plane([0.0, 0.0, 1.0], 0.0)).material(Material.diffuse(albedo)))
        scene.add(PointLight((10.0, 10.0, 10.0), (0.0, 0.0, 4.0)))
        cam = Camera()
        r = Renderer(scene, cam, width=9, height=9, max_bounces=0, num_samples=8)
        img = np.asarray(r.render_buffer().mean_image())
        center = img[4, 4]
        # cos=1, r=4 -> c/16; diffuse f=(1-F)a/pi with F≈0.04+(0.96)(1-1)^5... at
        # normal incidence to light, wo≈wi≈n, F≈F0=0.04
        expect = (1 - 0.04) * albedo / np.pi * (10.0 / 16.0)
        np.testing.assert_allclose(center, expect, rtol=0.05)

    def test_environment_miss_color(self):
        scene = Scene()
        scene.set_environment(Environment.from_color((0.25, 0.5, 0.75)))
        cam = Camera()
        r = Renderer(scene, cam, width=4, height=4, max_bounces=0, num_samples=1)
        img = np.asarray(r.render_buffer().mean_image())
        np.testing.assert_allclose(
            img, np.broadcast_to(np.array([0.25, 0.5, 0.75]), img.shape), rtol=1e-5
        )

    def test_emissive_object_seen_directly(self):
        # An emissive sphere IN the scene (not a light) shows its emittance
        # directly (renderer.rs:153)
        scene = Scene()
        scene.add(Object(sphere()).material(Material.light((1.0, 0.5, 0.25), 3.0)))
        cam = Camera()
        r = Renderer(scene, cam, width=5, height=5, max_bounces=0, num_samples=1)
        img = np.asarray(r.render_buffer().mean_image())
        np.testing.assert_allclose(
            img[2, 2], np.array([1.0, 0.5, 0.25]) * 3.0, rtol=1e-4
        )

    def test_exposure_value_scales(self):
        scene = Scene()
        scene.set_environment(Environment.from_color((0.1, 0.1, 0.1)))
        r0 = Renderer(scene, Camera(), width=4, height=4, num_samples=1)
        r1 = Renderer(scene, Camera(), width=4, height=4, num_samples=1,
                      exposure_value=2.0)
        i0 = np.asarray(r0.render_buffer().mean_image())
        i1 = np.asarray(r1.render_buffer().mean_image())
        np.testing.assert_allclose(i1, 4.0 * i0, rtol=1e-5)

    def test_shadowing(self):
        # A blocker between light and floor creates a darker region
        scene = Scene()
        scene.add(Object(plane([0.0, 1.0, 0.0], 0.0)).material(
            Material.diffuse((0.8, 0.8, 0.8))))
        scene.add(Object(sphere().translate([0.0, 2.0, 0.0])).material(
            Material.diffuse((0.8, 0.8, 0.8))))
        scene.add(PointLight((50.0, 50.0, 50.0), (0.0, 6.0, 0.0)))
        cam = Camera.look_at([0.0, 6.0, 9.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], 0.9)
        r = Renderer(scene, cam, width=33, height=33, max_bounces=0, num_samples=4)
        img = np.asarray(r.render_buffer().mean_image())
        lum = img.mean(axis=-1)
        # The shadow disk is centered below the sphere (image center); the
        # floor on the same row away from center is fully lit.
        shadowed = lum[16, 16]
        lit = lum[16, 4]
        assert lit > 0.1
        assert shadowed < 0.2 * lit


class TestBufferStats:
    def test_variance_matches_numpy(self):
        buf = Buffer.new(2, 2)
        frames = [np.random.RandomState(i).rand(2, 2, 3).astype(np.float32) for i in range(5)]
        for f in frames:
            buf = buf.add_samples(jnp.asarray(f))
        stack = np.stack(frames)  # (S,H,W,3)
        mean = stack.mean(axis=0)
        per_pixel = ((stack - mean) ** 2).sum(axis=-1).sum(axis=0) / (len(frames) - 1)
        np.testing.assert_allclose(float(buf.variance()), per_pixel.mean(), rtol=1e-4)

    def test_box_filter_averages(self):
        buf = Buffer.new(3, 3)
        frame = np.zeros((3, 3, 3), np.float32)
        frame[1, 1] = 9.0
        buf = buf.add_samples(jnp.asarray(frame))
        img = np.asarray(buf.mean_image(Filter.box(1)))
        # Center 3x3 window sees the spike averaged over 9 pixels
        np.testing.assert_allclose(img[1, 1], 1.0, rtol=1e-5)
        # Corner window has 4 pixels, one of which is the spike
        np.testing.assert_allclose(img[0, 0], 9.0 / 4.0, rtol=1e-5)


class TestActiveLaneMasking:
    """The active-lane parking / dead-depth skipping in trace_paths must be
    estimator-identical to tracing every lane naively (the masked lanes only
    ever multiply into the reverse fold with zero weights)."""

    def test_subset_consistency_with_mixed_hit_miss(self):
        import jax
        from rpt_tpu.integrator import trace_paths

        scene = sphere_scene()
        scene.set_environment(Environment.from_color(hex_color(0x305080)))
        data = scene.compile()

        # Half the rays hit geometry, half point straight up (guaranteed miss
        # at depth 0 -> dead lanes from depth 1 on).
        n = 64
        o_hit = jnp.tile(jnp.asarray([[0.0, 3.0, 4.0]], jnp.float32), (n, 1))
        d_hit = jnp.tile(
            jnp.asarray([[0.0, -0.55, -0.75]], jnp.float32), (n, 1)
        )
        d_hit = d_hit / jnp.linalg.norm(d_hit, axis=-1, keepdims=True)
        o_miss = o_hit
        d_miss = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32), (n, 1))

        o = jnp.concatenate([o_hit, o_miss])
        d = jnp.concatenate([d_hit, d_miss])
        key = jax.random.PRNGKey(3)

        # Mixed batch: half the lanes die at depth 1.
        mixed = trace_paths(data, o, d, key, max_bounces=3, t_min=1e-3)
        assert np.isfinite(np.asarray(mixed)).all()

        # The all-miss half traced alone (every lane dead after depth 0: the
        # lax.cond skip branch actually runs) must agree with its slice of the
        # mixed batch on the env color exactly.
        env = np.asarray(hex_color(0x305080), np.float32)
        np.testing.assert_allclose(np.asarray(mixed[n:]), np.tile(env, (n, 1)), rtol=1e-6)

        all_miss = trace_paths(data, o_miss, d_miss, key, max_bounces=3, t_min=1e-3)
        np.testing.assert_allclose(np.asarray(all_miss), np.tile(env, (n, 1)), rtol=1e-6)

"""Monomial-surface area lights (monomial_surface.rs:108-125 parity).

The reference samples the rim circle (pos = (x, h, z), |(x,z)|=1) with a
random two-sided normal and pdf 1/(2*6.3406654362). Checks: the sampled
geometry term obeys inverse-square falloff for distant targets, and an
emissive monomial lights a scene end-to-end.
"""

import math

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
    monomial_surface,
    plane,
)
from rpt_tpu.scene import compile_scene


def _light_scene(emittance=50.0):
    scene = Scene()
    scene.add(
        Object(plane([0.0, 1.0, 0.0], 0.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(
        ObjectLight(
            Object(monomial_surface(2.0, 4.0).translate([0.0, 3.0, 0.0])).material(
                Material.light((1.0, 1.0, 1.0), emittance)
            )
        )
    )
    return scene


def test_monomial_light_matches_reference_formula():
    """Monte Carlo mean of illuminate() vs a dense numpy quadrature of the
    reference's exact sampling formula (rim point (x, h, z), two-sided
    normal, pdf 1/(2*AREA), geometric term light.rs:34-45)."""
    data = compile_scene(_light_scene(emittance=50.0), jnp.float32)
    light = data.lights[0]
    key = jax.random.PRNGKey(0)

    n = 8192
    target = np.array([0.0, -7.0, 0.0])
    pos = jnp.tile(jnp.asarray(target)[None, :], (n, 1))
    intensity, wi, dist = light.illuminate(key, pos)
    mc_mean = float(jnp.mean(intensity[:, 0]))

    # Quadrature over the rim circle; expectation over the normal flip is
    # the average of the two signs.
    theta = np.linspace(0.0, 2.0 * np.pi, 20001)[:-1]
    x, z = np.cos(theta), np.sin(theta)
    h = 2.0
    p = np.stack([x, np.full_like(x, h + 3.0), z], -1)  # translated +3 in y
    nrm = np.stack([h * 4.0 * x, -np.ones_like(x), h * 4.0 * z], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    AREA = 6.3406654362
    disp = p - target
    ln = np.linalg.norm(disp, axis=-1)
    expect = 0.0
    for sign in (1.0, -1.0):
        cosine = np.maximum(-(disp * sign * nrm).sum(-1), 0.0) / ln
        geo = cosine / (ln * ln)
        expect += 0.5 * np.mean(50.0 * geo / (1.0 / (2.0 * AREA)))
    np.testing.assert_allclose(mc_mean, expect, rtol=0.05)

    # Directions point up toward the light; distance is to the rim
    assert float(jnp.mean(wi[:, 1])) > 0.9
    expected_d = np.sqrt((h + 3.0 + 7.0) ** 2 + 1.0)
    np.testing.assert_allclose(np.asarray(dist), expected_d, rtol=1e-3)


def test_monomial_light_illuminates_render():
    cam = Camera.look_at([0.0, 2.0, 8.0], [0.0, 0.5, 0.0], [0.0, 1.0, 0.0], math.pi / 4)
    r = Renderer(_light_scene(), cam, width=32, height=24, max_bounces=0, num_samples=4, seed=5)
    img = np.asarray(r.render_buffer().mean_image())
    assert np.isfinite(img).all()
    assert img.mean() > 1e-3, "monomial light contributes no radiance"

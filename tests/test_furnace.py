"""Absolute-correctness check: the Monte Carlo estimator against an
independent f64 quadrature of the BSDF integral (VERDICT r2 weak #8 — pins
correctness to the physics, not to repo-vs-oracle agreement).

Setup: a sphere under a uniform emissive environment L, no lights, one
bounce. Looking head-on (tiny fov), the center pixel's expected radiance is

    E[pixel] = L * integral_hemisphere f(n, wo=n, wi) cos(theta) dw_i

because every bounce ray from a convex sphere either escapes to the uniform
environment (contributing f cos/pdf * L, whose expectation is the integral)
or re-hits the sphere below the horizon where f = 0 and the hit carries no
emission. The integral is evaluated here by 2-D quadrature of the
Cook-Torrance/Beckmann + Lambert formulas written directly from
material.rs:125-172 in float64 — a separate implementation from
rpt_tpu.materials. Agreement validates bsdf(), sample_f()'s mixture pdf
(material.rs:290-311), AND the estimator weighting f*cos/pdf
(renderer.rs:156-168) in absolute terms.
"""

import numpy as np
import pytest

from rpt_tpu import Camera, Environment, Material, Object, Renderer, Scene, sphere

ALBEDO = (0.65, 0.40, 0.25)
ENV_L = (0.9, 1.1, 0.7)


def _quadrature_albedo(color, roughness, index, n_theta=2048, n_phi=512):
    """integral f(n, wo=n, wi) cos dw_i per channel, f64 quadrature.

    Formulas from material.rs:125-172 with wo = n = +z, metallic = 0:
    Beckmann D (material.rs:143), Schlick Fresnel (material.rs:147-154),
    min-based G (material.rs:158-160), spec DFG/4(n.wi)(n.wo) + (1-F)c/pi.
    """
    color = np.asarray(color, np.float64)
    m2 = float(roughness) ** 2
    f0 = ((index - 1.0) / (index + 1.0)) ** 2

    theta = (np.arange(n_theta) + 0.5) * (0.5 * np.pi / n_theta)
    phi = (np.arange(n_phi) + 0.5) * (2.0 * np.pi / n_phi)
    ct, st = np.cos(theta), np.sin(theta)
    wi = np.stack(
        [
            st[:, None] * np.cos(phi)[None, :],
            st[:, None] * np.sin(phi)[None, :],
            np.broadcast_to(ct[:, None], (n_theta, n_phi)),
        ],
        -1,
    )  # (T, P, 3)
    wo = np.array([0.0, 0.0, 1.0])
    h = wi + wo
    h = h / np.linalg.norm(h, axis=-1, keepdims=True)
    n_wi = wi[..., 2]
    n_wo = 1.0
    n_h = h[..., 2]
    wo_h = h[..., 2]  # wo . h with wo = z
    nh2 = n_h * n_h
    d = np.exp((nh2 - 1.0) / (m2 * nh2)) / (np.pi * m2 * nh2 * nh2)
    fr = f0 + (1.0 - f0) * (1.0 - wo_h) ** 5
    g = np.minimum(1.0, 2.0 * np.minimum(n_wi * n_h, n_wo * n_h) / wo_h)
    spec = d * fr * g / (4.0 * n_wo * np.maximum(n_wi, 1e-12))
    # f * cos integrand, per channel: (spec + (1-F) c/pi) * cos
    cos_w = n_wi * st[:, None]  # cos(theta) * sin(theta) measure
    dwdt = (0.5 * np.pi / n_theta) * (2.0 * np.pi / n_phi)
    spec_int = np.sum(spec * cos_w) * dwdt
    diff_int = np.sum((1.0 - fr) / np.pi * cos_w) * dwdt
    return spec_int + diff_int * color


@pytest.mark.parametrize("mat_kind", ["diffuse", "specular"])
def test_furnace_matches_quadrature(mat_kind):
    if mat_kind == "diffuse":
        mat = Material.diffuse(ALBEDO)
    else:
        mat = Material.specular(ALBEDO, 0.4)

    scene = Scene()
    scene.add(Object(sphere()).material(mat))
    scene.set_environment(Environment.from_color(ENV_L))
    cam = Camera(eye=(0.0, 0.0, 40.0), direction=(0.0, 0.0, -1.0),
                 up=(0.0, 1.0, 0.0), fov=0.004)
    r = Renderer(scene, cam, width=5, height=5, max_bounces=1,
                 num_samples=3000, epsilon=1e-3, seed=3)
    img = np.asarray(r.render_buffer().mean_image(), np.float64)
    rendered = img[2, 2]  # center pixel: wo = n to within ~fov

    expect = np.asarray(ENV_L, np.float64) * _quadrature_albedo(
        mat.color, mat.roughness, mat.index
    )
    rel = np.abs(rendered - expect) / expect
    assert rel.max() < 0.03, (rendered, expect, rel)

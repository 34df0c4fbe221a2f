"""Finite-difference validation of material/camera gradients (BASELINE.md
"gradient L2 error" metric), widening round-1's albedo-only check.

At max_bounces=0 with a point light, the render is deterministic given the
key and NO sample depends on material parameters (NEE directions come from
the light), so the detached-sampling gradient must equal finite differences
to f32 accuracy for every material parameter the BSDF reads:
roughness, metallic, IOR (material.rs:125-210), and emittance.

At max_bounces>=1 the bounce directions depend on the parameters through the
sampler; the detached estimator and the FD of the Monte Carlo loss both
converge to the true gradient as spp grows, so that comparison runs at high
spp with a loose tolerance.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpt_tpu import Camera, Material, Object, PointLight, Renderer, Scene, hex_color, plane, sphere
from rpt_tpu.grad import make_diff_render


def _scene():
    s = Scene()
    s.add(Object(sphere()).material(Material.specular(hex_color(0xCC2222), 0.35)))
    s.add(Object(plane([0.0, 1.0, 0.0], -1.0)).material(Material.diffuse(hex_color(0x888888))))
    s.add(PointLight((25.0, 25.0, 25.0), (3.0, 5.0, 4.0)))
    return s


def _cam():
    import math

    return Camera.look_at([0.0, 1.5, 6.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], math.pi / 5)


def _fd_vs_grad(field, bounces, spp, eps, atol):
    img_fn, mats0 = make_diff_render(
        _scene(), _cam(), width=12, height=8, max_bounces=bounces, spp=spp
    )

    def loss_from(v):
        return jnp.mean(img_fn(dataclasses.replace(mats0, **{field: v})))

    v0 = getattr(mats0, field)
    g = np.asarray(jax.grad(loss_from)(v0)).ravel()

    base = np.asarray(v0, np.float64)
    fd = np.zeros_like(base).ravel()
    flat = base.ravel()
    for i in range(flat.shape[0]):
        vp = flat.copy(); vp[i] += eps
        vm = flat.copy(); vm[i] -= eps
        lp = float(loss_from(jnp.asarray(vp.reshape(base.shape), v0.dtype)))
        lm = float(loss_from(jnp.asarray(vm.reshape(base.shape), v0.dtype)))
        fd[i] = (lp - lm) / (2 * eps)

    scale = max(np.abs(fd).max(), 1e-6)
    l2_err = float(np.linalg.norm(g - fd) / max(np.linalg.norm(fd), 1e-12))
    print(f"grad-L2-relative-error[{field}, bounces={bounces}]: {l2_err:.4f}")
    np.testing.assert_allclose(g / scale, fd / scale, atol=atol)
    return l2_err


@pytest.mark.parametrize(
    "field,eps,atol",
    [
        ("roughness", 1e-2, 0.05),
        ("metallic", 1e-2, 0.05),
        ("index", 1e-2, 0.05),
        ("emittance", 1e-2, 0.05),
    ],
)
def test_material_gradients_match_fd_direct(field, eps, atol):
    l2 = _fd_vs_grad(field, bounces=0, spp=2, eps=eps, atol=atol)
    assert l2 < 0.1


def test_roughness_gradient_matches_fd_with_bounces():
    # High-spp so both the detached estimator and the FD of the MC loss have
    # converged near the true gradient despite sampler dependence.
    l2 = _fd_vs_grad("roughness", bounces=2, spp=192, eps=2e-2, atol=0.25)
    assert l2 < 0.5


@pytest.mark.parametrize(
    "field,spp,eps,atol,l2max",
    [
        # index/metallic steer the lobe mixture (material.rs:233-235), so the
        # MC losses need high spp before FD and the detached estimator agree.
        ("index", 192, 2e-2, 0.25, 0.5),
        ("metallic", 192, 2e-2, 0.25, 0.5),
        # Albedo with metallic=0 materials: sampled directions are
        # independent of color, so agreement is tight at moderate spp.
        ("color", 64, 1e-2, 0.1, 0.2),
    ],
)
def test_material_gradients_match_fd_with_bounces(field, spp, eps, atol, l2max):
    """VERDICT r3 item 7: indirect-light gradient coverage beyond roughness."""
    l2 = _fd_vs_grad(field, bounces=2, spp=spp, eps=eps, atol=atol)
    assert l2 < l2max


def _scene_clear():
    """Dielectric sphere (Material.clear, the material.rs:173-209 BTDF path)
    over a bright floor, so radiance reaches the camera THROUGH the
    transmission lobe."""
    s = Scene()
    s.add(Object(sphere()).material(Material.clear(1.5, 0.05)))
    s.add(Object(plane([0.0, 1.0, 0.0], -1.0)).material(Material.diffuse(hex_color(0xBBBBBB))))
    s.add(PointLight((25.0, 25.0, 25.0), (3.0, 5.0, 4.0)))
    return s


def test_transmission_index_gradient_matches_fd():
    """Gradient THROUGH the transmission lobe (VERDICT r3 item 7): the IOR of
    a clear sphere changes both the refracted directions (detached) and the
    Fresnel/BTDF weights (differentiated); at high spp the detached estimator
    and the FD of the MC loss agree."""
    img_fn, mats0 = make_diff_render(
        _scene_clear(), _cam(), width=12, height=8, max_bounces=3, spp=192
    )

    def loss_from(v):
        return jnp.mean(img_fn(dataclasses.replace(mats0, index=v)))

    v0 = mats0.index
    g = np.asarray(jax.grad(loss_from)(v0)).ravel()
    eps = 2e-2
    base = np.asarray(v0, np.float64).ravel()
    fd = np.zeros_like(base)
    for i in range(base.shape[0]):
        vp = base.copy(); vp[i] += eps
        vm = base.copy(); vm[i] -= eps
        fd[i] = (
            float(loss_from(jnp.asarray(vp, v0.dtype)))
            - float(loss_from(jnp.asarray(vm, v0.dtype)))
        ) / (2 * eps)
    scale = max(np.abs(fd).max(), 1e-6)
    l2 = float(np.linalg.norm(g - fd) / max(np.linalg.norm(fd), 1e-12))
    print(f"grad-L2-relative-error[index/transmission, bounces=3]: {l2:.4f}")
    np.testing.assert_allclose(g / scale, fd / scale, atol=0.3)
    assert l2 < 0.5


def test_camera_gradient_matches_fd_with_bounces():
    """Camera-eye gradients at bounces>=1 (BASELINE.md camera-grad metric).

    The detached estimator differentiates the CONTINUOUS integrand only —
    silhouette (visibility-boundary) terms are out of scope by construction,
    exactly like the material tests' lobe-choice detachment. So the view
    frames a smooth region (the floor beside the sphere, lit by the point
    light with indirect bounces off it): there FD and AD must agree."""
    import math

    from rpt_tpu.grad import make_material_render_fn

    scene = _scene()
    sd = scene.compile()
    # Look at the floor to the side of the sphere: no silhouette in frame.
    cam0 = Camera.look_at(
        [2.5, 1.5, 5.0], [3.5, -1.0, 0.0], [0.0, 1.0, 0.0], math.pi / 7
    )
    fn = make_material_render_fn(sd, 12, 8, 2, 128)
    t_min = jnp.float32(1e-3)
    ev = jnp.float32(1.0)
    key = jax.random.PRNGKey(0)

    def loss_from_eye(eye):
        cam = dataclasses.replace(cam0, eye=eye)
        return jnp.mean(fn(sd.materials, cam, key, t_min, ev))

    eye0 = cam0.eye
    g = np.asarray(jax.grad(loss_from_eye)(eye0)).ravel()
    eps = 5e-3
    base = np.asarray(eye0, np.float64).ravel()
    fd = np.zeros_like(base)
    for i in range(base.shape[0]):
        vp = base.copy(); vp[i] += eps
        vm = base.copy(); vm[i] -= eps
        fd[i] = (
            float(loss_from_eye(jnp.asarray(vp, eye0.dtype)))
            - float(loss_from_eye(jnp.asarray(vm, eye0.dtype)))
        ) / (2 * eps)
    scale = max(np.abs(fd).max(), 1e-6)
    l2 = float(np.linalg.norm(g - fd) / max(np.linalg.norm(fd), 1e-12))
    print(f"grad-L2-relative-error[camera.eye, bounces=2]: {l2:.4f}")
    np.testing.assert_allclose(g / scale, fd / scale, atol=0.25)
    assert l2 < 0.5

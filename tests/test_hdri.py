"""HDRI end-to-end: RGBE file roundtrip, bilinear equirectangular lookup vs
an independent numpy oracle, and a render whose miss rays read the HDRI.

Parity targets: the reference decodes .hdr with image::codecs::hdr
(examples/wine_glass.rs load_hdr) and samples it with bilinear interpolation
over (azimuth, polar) in Environment::get_color
(/root/reference/src/environment.rs:25-52).
"""

import numpy as np
import jax.numpy as jnp

from rpt_tpu import Camera, Environment, Renderer, Scene
from rpt_tpu.io.image import load_hdr, save_hdr


def _test_image(h=16, w=32, seed=0):
    rng = np.random.default_rng(seed)
    # Wide dynamic range incl. exact zeros and >1 values.
    img = rng.uniform(0.0, 1.0, (h, w, 3)) ** 2 * rng.choice(
        [0.01, 1.0, 40.0], (h, w, 1)
    )
    img[0, 0] = 0.0
    return img.astype(np.float32)


def test_hdr_roundtrip(tmp_path):
    img = _test_image()
    p = tmp_path / "fixture.hdr"
    save_hdr(p, img)
    back = load_hdr(p)
    assert back.shape == img.shape and back.dtype == np.float32
    # RGBE shares one 8-bit exponent across channels: error <= maxc/256 + lsb.
    maxc = np.broadcast_to(img.max(axis=-1, keepdims=True), img.shape)
    np.testing.assert_array_less(np.abs(back - img), maxc / 255.0 + 1e-6)
    assert (back[0, 0] == 0).all()


def _numpy_env_lookup(img, dirs):
    """Independent f64 oracle of Environment.get_color's equirect bilinear."""
    img = np.asarray(img, np.float64)
    h, w = img.shape[:2]
    d = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    azimuth = np.arctan2(d[..., 2], d[..., 0]) + np.pi
    polar = np.arccos(np.clip(d[..., 1], -1, 1))
    x = azimuth / (2 * np.pi) * (w - 1)
    y = polar / np.pi * (h - 1)
    x0 = np.clip(x.astype(np.int64), 0, w - 1)
    y0 = np.clip(y.astype(np.int64), 0, h - 1)
    x1 = (x0 + 1) % w  # azimuth seam wraps
    y1 = np.minimum(y0 + 1, h - 1)  # poles clamp
    ax, ay = (x - x0)[..., None], (y - y0)[..., None]
    top = img[y0, x0] * (1 - ax) + img[y0, x1] * ax
    bot = img[y1, x0] * (1 - ax) + img[y1, x1] * ax
    return top * (1 - ay) + bot * ay


def test_env_bilinear_matches_numpy_oracle(tmp_path):
    img = _test_image(h=12, w=24, seed=3)
    p = tmp_path / "env.hdr"
    save_hdr(p, img)
    env = Environment.from_hdri(load_hdr(p))

    rng = np.random.default_rng(1)
    dirs = rng.normal(size=(500, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # Include seam (azimuth ~ pi at -x axis) and pole directions explicitly.
    dirs = np.concatenate(
        [dirs, [[-1, 0, 1e-8], [-1, 0, -1e-8], [0, 1, 0], [0, -1, 0]]]
    )
    got = np.asarray(env.get_color(jnp.asarray(dirs, jnp.float32)))
    want = _numpy_env_lookup(env.hdri, dirs)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_render_reads_hdri(tmp_path):
    """An empty scene under a known HDRI: every camera ray misses, so the
    frame IS the env lookup of the camera directions (bounces=0, spp lets the
    jitter average; check against the oracle at pixel-center directions)."""
    img = np.zeros((8, 16, 3), np.float32)
    img[:, :, 1] = 2.5  # uniform green -> interpolation-free expectation
    p = tmp_path / "green.hdr"
    save_hdr(p, img)

    scene = Scene()
    scene.set_environment(Environment.from_hdri(load_hdr(p)))
    cam = Camera.look_at([0, 0, 5], [0, 0, 0], [0, 1, 0], np.pi / 4)
    r = Renderer(scene, cam, width=16, height=9, max_bounces=0, num_samples=2)
    frame = np.asarray(r.render_buffer().mean_image())
    expect = np.asarray(load_hdr(p))[0, 0]
    np.testing.assert_allclose(frame, np.broadcast_to(expect, frame.shape), rtol=2e-3)

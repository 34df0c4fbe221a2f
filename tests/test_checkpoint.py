"""Checkpoint/resume: an interrupted render resumes bit-identically.

SURVEY.md §5: the reference's only mitigation for a crash is the progressive
PNG dump (renderer.rs:103-115); the Buffer itself cannot be saved. Here the
(sum, sum_sq, count) sufficient statistics plus (seed, iteration) cursor
round-trip through an .npz, and fold_in(seed, i) per-iteration keys make the
resumed stream identical to the uninterrupted one.
"""

import numpy as np

from rpt_tpu import Buffer, Material, Object, PointLight, Renderer, Scene, hex_color, plane, sphere


def _scene():
    s = Scene()
    s.add(Object(sphere()).material(Material.diffuse(hex_color(0xBB4444))))
    s.add(Object(plane([0.0, 1.0, 0.0], -1.0)).material(Material.diffuse(hex_color(0x999999))))
    s.add(PointLight((40.0, 40.0, 40.0), (2.0, 6.0, 3.0)))
    return s


def _renderer(n):
    return Renderer(_scene(), width=32, height=24, max_bounces=1, num_samples=n, seed=11)


def test_resume_bit_identical(tmp_path):
    ck = str(tmp_path / "render.ckpt.npz")

    # Uninterrupted: 6 samples
    full = _renderer(6).iterative_render(2, lambda i, b: None)

    # Interrupted: stop after 4 samples (callback raises), then resume
    class Stop(Exception):
        pass

    def stopper(i, b):
        if i >= 4:
            raise Stop()

    try:
        _renderer(6).iterative_render(2, stopper, checkpoint_path=ck)
    except Stop:
        pass

    buf, seed, iteration = Buffer.load(ck)
    assert seed == 11 and iteration == 4
    assert int(buf.count) == 4

    resumed = _renderer(6).iterative_render(2, lambda i, b: None, checkpoint_path=ck)

    np.testing.assert_array_equal(np.asarray(resumed.sum), np.asarray(full.sum))
    np.testing.assert_array_equal(np.asarray(resumed.sum_sq), np.asarray(full.sum_sq))
    assert int(resumed.count) == int(full.count) == 6


def test_seed_mismatch_rejected(tmp_path):
    ck = str(tmp_path / "render.ckpt.npz")
    _renderer(2).iterative_render(2, lambda i, b: None, checkpoint_path=ck)
    bad = Renderer(_scene(), width=32, height=24, max_bounces=1, num_samples=4, seed=999)
    try:
        bad.iterative_render(2, lambda i, b: None, checkpoint_path=ck)
        assert False, "expected seed mismatch to raise"
    except ValueError:
        pass

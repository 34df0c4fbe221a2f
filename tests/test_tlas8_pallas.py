"""Parity tests: two-level WIDE (8-ary) Pallas TLAS vs. the XLA path.

Interpreter mode on the CPU mesh; Mosaic compilation is asserted on TPU by
bench.py's fractal_teapots parity check. Semantics match the reference's
nested kd-trees (/root/reference/src/kdtree.rs:128 + shape.rs:127-137).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rpt_tpu.ops.tlas import build_instanced, instanced_closest_hit
from rpt_tpu.ops.tlas8_pallas import (
    pack_tlas8_for_pallas,
    tlas8_closest_hit_pallas,
    tlas8_eligible,
    tlas8_occluded_pallas,
)
from test_tlas_pallas import _build_instanced_scene, _rays_at_instances


@pytest.mark.parametrize("n_meshes,n_instances", [(1, 5), (3, 17)])
def test_tlas8_matches_xla(n_meshes, n_instances):
    meshes, instances = _build_instanced_scene(n_meshes, n_instances)
    im = build_instanced(meshes, instances)
    assert tlas8_eligible(im)
    o, d = _rays_at_instances(333, meshes, instances)  # not a multiple of 128
    t_min = 1e-3

    ref = instanced_closest_hit(im, o, d, t_min)
    got = tlas8_closest_hit_pallas(im, o, d, t_min, interpret=True)

    hit_ref = np.isfinite(np.asarray(ref.t))
    assert hit_ref.sum() > 60, "test geometry too sparse to be meaningful"
    np.testing.assert_array_equal(np.isfinite(np.asarray(got.t)), hit_ref)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_ref], np.asarray(ref.t)[hit_ref],
        rtol=2e-5, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got.normal)[hit_ref], np.asarray(ref.normal)[hit_ref],
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(got.mat_id)[hit_ref], np.asarray(ref.mat_id)[hit_ref]
    )


def test_tlas8_active_mask_parks_lanes():
    meshes, instances = _build_instanced_scene(2, 7, seed=5)
    im = build_instanced(meshes, instances)
    o, d = _rays_at_instances(256, meshes, instances, seed=6)
    active = jnp.arange(256) % 2 == 0

    got = tlas8_closest_hit_pallas(im, o, d, 1e-3, active=active, interpret=True)
    full = tlas8_closest_hit_pallas(im, o, d, 1e-3, interpret=True)
    t = np.asarray(got.t)
    assert not np.isfinite(t[1::2]).any()
    np.testing.assert_allclose(t[0::2], np.asarray(full.t)[0::2], rtol=1e-6)


def test_tlas8_occlusion_matches_closest():
    meshes, instances = _build_instanced_scene(2, 11, seed=7)
    im = build_instanced(meshes, instances)
    o, d = _rays_at_instances(333, meshes, instances, seed=8)
    t_min = 1e-3

    ref_t = np.asarray(instanced_closest_hit(im, o, d, t_min).t)
    rng = np.random.default_rng(9)
    t_max = jnp.asarray(rng.uniform(6.0, 14.0, o.shape[0]), jnp.float32)

    got = tlas8_occluded_pallas(im, o, d, t_min, t_max, interpret=True)
    want = ref_t <= np.asarray(t_max)
    assert want.any() and (~want).any()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_tlas8_pack_structure():
    """Every instance appears exactly once as a TLAS child; every BLAS leaf
    start appears in the unified table; instance roots point at BLAS parts."""
    meshes, instances = _build_instanced_scene(2, 6, tris_per_mesh=30)
    im = build_instanced(meshes, instances)
    pack = pack_tlas8_for_pallas(im)
    from rpt_tpu.ops.tlas8_pallas import META_STRIDE

    Mw = pack.bounds.shape[0]
    meta = np.asarray(pack.meta).reshape(Mw, META_STRIDE)
    cb = meta[:, 1:16:2]
    ca = meta[:, 0:16:2]
    inst_children = ca[cb == -2]
    np.testing.assert_array_equal(np.sort(inst_children), np.arange(6))
    assert (cb > 0).sum() > 0  # triangle leaves exist
    # Instance wide-BLAS roots are valid node indices past the TLAS part.
    assert (np.asarray(pack.inst_i) >= 0).all()
    assert (np.asarray(pack.inst_i) < Mw).all()


def test_tlas8_dma_mode_matches_xla(monkeypatch):
    """Large-table ("dma") kernel parity: force the ring-DMA mode on a small
    fixture by shrinking the resident threshold, so the per-push node-tile
    copies + pop-time waits are exercised end to end (VERDICT r4 item 3:
    no silent cliff past the VMEM-resident budget)."""
    import rpt_tpu.ops.tlas8_pallas as t8

    monkeypatch.setattr(t8, "MAX_RESIDENT_WIDE_NODES", 2)
    meshes, instances = _build_instanced_scene(3, 17)
    im = build_instanced(meshes, instances)
    packed = t8.pack_tlas8_for_pallas(im)
    assert packed.mode == "dma"
    o, d = _rays_at_instances(333, meshes, instances)
    t_min = 1e-3

    ref = instanced_closest_hit(im, o, d, t_min)
    got = tlas8_closest_hit_pallas(im, o, d, t_min, packed=packed,
                                   interpret=True)
    hit_ref = np.isfinite(np.asarray(ref.t))
    assert hit_ref.sum() > 60
    np.testing.assert_array_equal(np.isfinite(np.asarray(got.t)), hit_ref)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit_ref], np.asarray(ref.t)[hit_ref],
        rtol=2e-5, atol=2e-5,
    )

    rng = np.random.default_rng(9)
    t_max = jnp.asarray(rng.uniform(6.0, 14.0, o.shape[0]), jnp.float32)
    occ = tlas8_occluded_pallas(im, o, d, t_min, t_max, packed=packed,
                                interpret=True)
    want = np.asarray(ref.t) <= np.asarray(t_max)
    np.testing.assert_array_equal(np.asarray(occ), want)


def test_tlas8_overflow_falls_back_loudly(monkeypatch):
    import warnings as w

    import rpt_tpu.ops.tlas8_pallas as t8

    monkeypatch.setattr(t8, "MAX_RESIDENT_WIDE_NODES", 2)
    monkeypatch.setattr(t8, "MAX_DMA_WIDE_NODES", 4)
    meshes, instances = _build_instanced_scene(3, 17)
    im = build_instanced(meshes, instances)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        packed = t8.pack_tlas8_for_pallas(im)
    assert packed is None
    assert any("binary" in str(r.message) for r in rec)

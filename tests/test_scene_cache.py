"""Scene.compile cache: content-addressed, so in-place shape mutation
recompiles (VERDICT r2 weak #4 — no id() in the key)."""

import numpy as np
import jax.numpy as jnp

from rpt_tpu import Material, Object, Scene, plane, sphere
from rpt_tpu.shapes import Mesh


def _scene():
    s = Scene()
    s.add(Object(sphere()))
    s.add(Object(plane([0.0, 1.0, 0.0], -1.0)).material(Material.diffuse((0.5, 0.5, 0.5))))
    return s


def test_cache_hit_when_unchanged():
    s = _scene()
    d1 = s.compile()
    d2 = s.compile()
    assert d1 is d2


def test_inplace_plane_mutation_invalidates():
    s = _scene()
    pl = s.objects[1].shape
    d1 = s.compile()
    pl.value = -2.0  # in-place: object identity unchanged
    d2 = s.compile()
    assert d1 is not d2
    assert float(d2.planes.value[0]) == -2.0


def test_inplace_mesh_mutation_invalidates():
    verts = np.array(
        [[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]]
    )
    mesh = Mesh(verts)
    s = Scene()
    s.add(Object(mesh))
    d1 = s.compile()
    mesh.vertices[0, 1, 0] = 5.0  # in-place element write
    d2 = s.compile()
    assert d1 is not d2
    assert float(jnp.max(d2.triangles.verts)) == 5.0


def test_dtype_part_of_key():
    s = _scene()
    d32 = s.compile(jnp.float32)
    d64 = s.compile(jnp.float64)  # cache was keyed on f32
    assert d32 is not d64

"""BVH traversal vs brute force, and asset loaders (OBJ/MTL/STL)."""

import io
import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rpt_tpu.ops import intersect as ops
from rpt_tpu.ops.bvh import build_bvh, bvh_closest_hit
from rpt_tpu.io.obj import load_obj, load_obj_with_mtl, load_mtl
from rpt_tpu.io.stl import load_stl


def random_triangle_soup(n=300, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n, 1, 3) * 2.0
    verts = centers + rng.randn(n, 3, 3) * 0.3
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    norms = np.repeat(fn[:, None], 3, axis=1)
    mats = rng.randint(0, 3, n).astype(np.int32)
    return verts, norms, mats


class TestBvh:
    def test_matches_brute_force(self):
        verts, norms, mats = random_triangle_soup(300)
        bvh = build_bvh(verts, norms, mats)

        rng = np.random.RandomState(1)
        o = jnp.asarray(rng.randn(500, 3) * 5.0, jnp.float32)
        d = rng.randn(500, 3)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        d = jnp.asarray(d, jnp.float32)

        hit_bvh = bvh_closest_hit(bvh, o, d, 1e-4)
        hit_brute = ops.intersect_triangles(
            o, d, 1e-4, jnp.asarray(verts, jnp.float32),
            jnp.asarray(norms, jnp.float32), jnp.asarray(mats),
        )
        np.testing.assert_allclose(
            np.asarray(hit_bvh.t), np.asarray(hit_brute.t), rtol=1e-4, atol=1e-5
        )
        valid = np.asarray(hit_brute.valid)
        np.testing.assert_allclose(
            np.asarray(hit_bvh.normal)[valid],
            np.asarray(hit_brute.normal)[valid],
            atol=1e-3,
        )
        np.testing.assert_array_equal(
            np.asarray(hit_bvh.mat_id)[valid], np.asarray(hit_brute.mat_id)[valid]
        )

    def test_single_triangle(self):
        verts = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float64)
        norms = np.repeat(np.array([[[0, 0, 1.0]]]), 3, axis=1)
        bvh = build_bvh(verts, norms, np.zeros(1, np.int32))
        o = jnp.asarray([[0.2, 0.2, 5.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = bvh_closest_hit(bvh, o, d, 1e-4)
        assert abs(float(hit.t[0]) - 5.0) < 1e-5


OBJ_TEXT = """
# a quad and a triangle with normals
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
f 1 2 3 4
f -4//-1 -3//-1 -2//-1
"""

MTL_TEXT = """
newmtl shiny
Kd 0.2 0.4 0.6
Ns 96
Ni 1.45
newmtl glassy
Kd 1 1 1
d 0.3
"""

OBJ_MTL_TEXT = """
v 0 0 0
v 1 0 0
v 0 1 0
usemtl shiny
f 1 2 3
usemtl glassy
f 1 3 2
"""


class TestObjLoader:
    def test_quad_fan_triangulation(self):
        mesh = load_obj(io.StringIO(OBJ_TEXT))
        # quad -> 2 triangles, plus the explicit triangle = 3
        assert mesh.num_triangles == 3
        np.testing.assert_allclose(mesh.vertices[0][0], [0, 0, 0])

    def test_negative_indices_and_normals(self):
        mesh = load_obj(io.StringIO(OBJ_TEXT))
        # third triangle used negative indices -4,-3,-2 = v1,v2,v3 with vn -1
        np.testing.assert_allclose(mesh.vertices[2], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
        np.testing.assert_allclose(mesh.normals[2], [[0, 0, 1]] * 3)

    def test_mtl_heuristics(self):
        mats = load_mtl(io.StringIO(MTL_TEXT))
        shiny = mats["shiny"]
        np.testing.assert_allclose(shiny.color, (0.2, 0.4, 0.6))
        assert abs(shiny.roughness - (2.0 / 98.0) ** 0.25) < 1e-9
        assert abs(shiny.index - 1.45) < 1e-9
        assert not shiny.transparent
        assert mats["glassy"].transparent

    def test_obj_with_mtl_split(self):
        objs = load_obj_with_mtl(io.StringIO(OBJ_MTL_TEXT), io.StringIO(MTL_TEXT))
        assert len(objs) == 2
        assert objs[0].mat.color == (0.2, 0.4, 0.6)
        assert objs[1].mat.transparent


def make_binary_stl(tris):
    buf = bytearray(b"\0" * 80)
    buf += struct.pack("<I", len(tris))
    for vn, v1, v2, v3 in tris:
        for vec in (vn, v1, v2, v3):
            buf += struct.pack("<3f", *vec)
        buf += b"\0\0"
    return bytes(buf)


class TestStlLoader:
    def test_binary(self):
        tris = [
            ((0, 0, 1), (0, 0, 0), (1, 0, 0), (0, 1, 0)),
            ((0, 1, 0), (0, 0, 0), (0, 0, 1), (1, 0, 0)),
        ]
        mesh = load_stl(io.BytesIO(make_binary_stl(tris)))
        assert mesh.num_triangles == 2
        np.testing.assert_allclose(mesh.normals[0], [[0, 0, 1]] * 3)
        np.testing.assert_allclose(mesh.vertices[1][1], [0, 0, 1])

    def test_ascii(self):
        text = b"""solid test
facet normal 0 0 1
outer loop
vertex 0 0 0
vertex 1 0 0
vertex 0 1 0
endloop
endfacet
endsolid test
"""
        mesh = load_stl(io.BytesIO(text))
        assert mesh.num_triangles == 1
        np.testing.assert_allclose(mesh.vertices[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])

    def test_reference_cylinder_stl(self):
        import os

        path = "/root/reference/examples/cylinder.stl"
        if not os.path.exists(path):
            pytest.skip("reference asset not available")
        mesh = load_stl(path)
        assert mesh.num_triangles > 10
        assert np.all(np.isfinite(mesh.vertices))

"""Native OBJ parser vs the pure-Python semantics oracle."""

import io

import numpy as np
import pytest

from rpt_tpu.native import native_available, parse_obj
from rpt_tpu.io.obj import _load_obj_py, load_obj, load_obj_with_mtl

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native parser"
)

OBJ = """
# comment
v 0 0 0
v 1 0 0
v 0 1 0
v 1.5 -2.25e-1 3
vn 0 0 1
vn 0 1 0
vt 0.5 0.5
f 1 2 3
f 1//1 2//1 3//2
f -4 -3 -2 -1
usemtl red
f 1 2 4
usemtl blue
f 2/1/1 3//2 4//1
usemtl red
f 1 3 4
"""


def test_native_matches_python_parser():
    nat = parse_obj(OBJ.encode())
    assert nat is not None
    verts, norms, run, names = nat
    mesh = _load_obj_py(OBJ)
    np.testing.assert_allclose(verts, np.asarray(mesh.vertices), rtol=1e-12)
    np.testing.assert_allclose(norms, np.asarray(mesh.normals), rtol=1e-12)
    # 2 tri faces + 1 quad (2 fan tris) + 3 single-tri usemtl runs = 7
    assert verts.shape[0] == 7
    assert names == ["red", "blue", "red"]
    assert run.tolist() == [0, 0, 0, 0, 1, 2, 3]


def test_load_obj_teapot_matches_python():
    data = open("/root/reference/examples/teapot.obj", "rb").read()
    nat = parse_obj(data)
    mesh_py = _load_obj_py(data.decode())
    verts, norms, run, names = nat
    assert verts.shape == np.asarray(mesh_py.vertices).shape
    np.testing.assert_allclose(verts, np.asarray(mesh_py.vertices), rtol=1e-9)
    np.testing.assert_allclose(norms, np.asarray(mesh_py.normals), rtol=1e-9)
    assert (run == 0).all() and names == []


def test_load_obj_filelike_and_path(tmp_path):
    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    m1 = load_obj(str(p))
    m2 = load_obj(io.StringIO(OBJ))
    np.testing.assert_allclose(np.asarray(m1.vertices), np.asarray(m2.vertices))


def test_load_obj_with_mtl_groups(tmp_path):
    mtl = tmp_path / "m.mtl"
    mtl.write_text("newmtl red\nKd 0.7 0 0\nnewmtl blue\nKd 0 0 0.7\n")
    obj = tmp_path / "m.obj"
    obj.write_text(OBJ)
    objs = load_obj_with_mtl(str(obj), str(mtl))
    # default-material group (4 tris) + red + blue + red
    assert len(objs) == 4
    counts = [np.asarray(o.shape.vertices).shape[0] for o in objs]
    assert counts == [4, 1, 1, 1]
    assert float(objs[1]._material.color[0]) > 0.5  # red Kd

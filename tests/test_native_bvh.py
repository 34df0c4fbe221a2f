"""Native C++ SAH builder: structural invariants + traversal parity with the
pure-Python median builder (same skip-link contract, different tree shape)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rpt_tpu.native import build_bvh_sah, native_available
from rpt_tpu.ops.bvh import LEAF_SIZE, BvhData, build_bvh, bvh_closest_hit
from test_tlas_pallas import _random_mesh, _rays_at_instances

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for the native builder"
)


def _mesh(n, seed=0):
    m = _random_mesh(n, seed=seed)
    return np.asarray(m.vertices), np.asarray(m.normals)


def _python_bvh(verts, norms, mats):
    """Force the pure-Python median path by monkeypatching the native hook."""
    import rpt_tpu.ops.bvh as bvh_mod
    import rpt_tpu.native as native_mod

    orig = native_mod.build_bvh_sah
    native_mod.build_bvh_sah = lambda *a, **k: None
    try:
        return build_bvh(verts, norms, mats)
    finally:
        native_mod.build_bvh_sah = orig


def test_sah_structure_invariants():
    verts, norms = _mesh(777, seed=2)
    tri_min = verts.min(1).astype(np.float32)
    tri_max = verts.max(1).astype(np.float32)
    out = build_bvh_sah(tri_min, tri_max, LEAF_SIZE)
    assert out is not None
    node_min, node_max, is_leaf, skip, leaf_start, leaf_count, perm = out
    M = node_min.shape[0]

    # Preorder + skip-link validity: leaves skip to nid+1; internal nodes
    # skip past a non-empty subtree; all skips land in (nid, M].
    for nid in range(M):
        if is_leaf[nid]:
            assert skip[nid] == nid + 1
            assert 1 <= leaf_count[nid] <= LEAF_SIZE
            assert leaf_start[nid] % LEAF_SIZE == 0
        else:
            assert nid + 1 < skip[nid] <= M

    # Every triangle appears exactly once among counted leaf slots.
    counted = []
    for nid in np.flatnonzero(is_leaf):
        s, c = leaf_start[nid], leaf_count[nid]
        counted.extend(perm[s : s + c])
    assert sorted(counted) == list(range(777))
    # Perm is leaf-size padded: one row block per leaf.
    assert perm.shape[0] == LEAF_SIZE * int(is_leaf.sum())

    # Node bounds contain their leaf triangles.
    for nid in np.flatnonzero(is_leaf)[:50]:
        s, c = leaf_start[nid], leaf_count[nid]
        tv = verts[perm[s : s + c]]
        assert (tv.min((0, 1)) >= node_min[nid] - 1e-5).all()
        assert (tv.max((0, 1)) <= node_max[nid] + 1e-5).all()


@pytest.mark.parametrize("n_tris", [5, 60, 900])
def test_native_traversal_matches_python_builder(n_tris):
    verts, norms = _mesh(n_tris, seed=3)
    mats = np.zeros(n_tris, np.int64)
    b_nat = build_bvh(verts, norms, mats)
    b_py = _python_bvh(verts, norms, mats)
    assert isinstance(b_nat, BvhData) and isinstance(b_py, BvhData)

    class _M:
        def __init__(s, v, n):
            s.vertices, s.normals = v, n

    o, d = _rays_at_instances(
        257, [_M(verts, norms)], [(0, np.eye(4), 0)], seed=4
    )
    h_nat = bvh_closest_hit(b_nat, o, d, 1e-3)
    h_py = bvh_closest_hit(b_py, o, d, 1e-3)
    hit = np.isfinite(np.asarray(h_py.t))
    assert hit.sum() > 50
    np.testing.assert_array_equal(np.isfinite(np.asarray(h_nat.t)), hit)
    np.testing.assert_allclose(
        np.asarray(h_nat.t)[hit], np.asarray(h_py.t)[hit], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(h_nat.normal)[hit], np.asarray(h_py.normal)[hit],
        rtol=1e-4, atol=1e-4,
    )


def test_degenerate_identical_centroids():
    """All triangles share a centroid: the SAH must still terminate and
    cover every triangle (the median-chop fallback path)."""
    tri = np.array([[[0.0, 0, 0], [1, 0, 0], [0, 1, 0]]])
    verts = np.repeat(tri, 50, axis=0).astype(np.float64)
    tri_min = verts.min(1).astype(np.float32)
    tri_max = verts.max(1).astype(np.float32)
    out = build_bvh_sah(tri_min, tri_max, LEAF_SIZE)
    assert out is not None
    _, _, is_leaf, _, leaf_start, leaf_count, perm = out
    total = sum(
        int(leaf_count[n]) for n in np.flatnonzero(is_leaf)
    )
    assert total == 50

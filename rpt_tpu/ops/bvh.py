"""Bounding-volume hierarchy for triangle meshes.

TPU-native replacement for the reference's kd-tree (/root/reference/src/
kdtree.rs). The reference uses a recursive, pointer-chasing kd-tree with
per-ray early-exit recursion (kdtree.rs:151-223) — great on a scalar CPU,
hostile to a vector machine. Here:

- The tree is built host-side in numpy (one-time cost, like kdtree.rs:108-119)
  as a binary BVH over triangle centroids (median split on the longest axis),
  then flattened in DFS preorder with *skip links*: traversal needs no stack —
  on a bbox hit you advance to node i+1, on a miss you jump to skip[i].
- Traversal runs all rays in lockstep inside one `lax.while_loop`: each ray
  carries its own node pointer; finished rays park at the sentinel. Leaves have
  a fixed triangle budget so every gather has a static shape.
- Triangle hit tests use the same plane + barycentric formulation as
  mesh.rs:49-82, so hit records agree with the brute-force path bit-for-bit.

Triangles are permuted at build time so each leaf's triangles are CONTIGUOUS:
the XLA path indexes them through `leaf_tris` gathers, while the Pallas packet
kernel (rpt_tpu/ops/bvh_pallas.py) loads a whole leaf as one dense (8, K)
vector read from VMEM — no per-lane gather, which TPUs do not have.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.vmath import dot, normalize
from .intersect import Hit, INF

__all__ = ["BvhData", "build_bvh", "bvh_closest_hit", "finalize_hit"]

LEAF_SIZE = 8


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BvhData:
    node_min: jnp.ndarray  # (M, 3)
    node_max: jnp.ndarray  # (M, 3)
    is_leaf: jnp.ndarray  # (M,) int32 {0,1}
    skip: jnp.ndarray  # (M,) int32: next node on bbox miss / after leaf
    leaf_tris: jnp.ndarray  # (M, LEAF_SIZE) int32 triangle ids, -1 padded
    leaf_start: jnp.ndarray  # (M,) int32 first triangle of leaf (0 internal)
    leaf_count: jnp.ndarray  # (M,) int32 triangles in leaf (0 internal)
    verts: jnp.ndarray  # (T, 3, 3) world space, leaf-contiguous order
    norms: jnp.ndarray  # (T, 3, 3)
    mat_id: jnp.ndarray  # (T,)

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    @property
    def num_tris(self) -> int:
        return self.verts.shape[0]


def build_bvh(verts: np.ndarray, norms: np.ndarray, mats: np.ndarray, dtype=jnp.float32) -> BvhData:
    """Host-side BVH build over world-space triangles.

    Prefers the native C++ binned-SAH builder (rpt_tpu/native, the analog of
    the reference's compiled SAH build at kdtree.rs:108-127) — SAH trees
    visit substantially fewer nodes per ray than median splits. Falls back
    to the pure-Python median builder below when no toolchain is available;
    both produce the identical skip-link preorder contract.
    """
    T = verts.shape[0]
    tri_min = verts.min(axis=1)  # (T,3)
    tri_max = verts.max(axis=1)

    from ..native import build_bvh_sah

    nat = build_bvh_sah(tri_min, tri_max, LEAF_SIZE) if T > 0 else None
    if nat is not None:
        node_min, node_max, is_leaf, skip, leaf_start, leaf_count, perm = nat
        M = node_min.shape[0]
        leaf_tris = np.full((M, LEAF_SIZE), -1, np.int32)
        leaves = np.flatnonzero(is_leaf)
        cols = np.arange(LEAF_SIZE)[None, :]
        ids = leaf_start[leaves][:, None] + cols
        mask = cols < leaf_count[leaves][:, None]
        rows = leaf_tris[leaves]
        rows[mask] = ids[mask].astype(np.int32)
        leaf_tris[leaves] = rows
        np_dtype = np.dtype(dtype)
        return BvhData(
            node_min=node_min.astype(np_dtype),
            node_max=node_max.astype(np_dtype),
            is_leaf=is_leaf,
            skip=skip,
            leaf_tris=leaf_tris,
            leaf_start=leaf_start,
            leaf_count=leaf_count,
            verts=np.asarray(verts)[perm].astype(np_dtype),
            norms=np.asarray(norms)[perm].astype(np_dtype),
            mat_id=np.asarray(mats)[perm].astype(np.int32),
        )

    centroids = (tri_min + tri_max) * 0.5

    node_min, node_max, is_leaf, leaf_lists, children = [], [], [], [], []

    def make_node(idx: np.ndarray) -> int:
        nid = len(node_min)
        node_min.append(tri_min[idx].min(axis=0))
        node_max.append(tri_max[idx].max(axis=0))
        if idx.shape[0] <= LEAF_SIZE:
            is_leaf.append(1)
            leaf_lists.append(idx)
            children.append(None)
            return nid
        is_leaf.append(0)
        leaf_lists.append(None)
        children.append(None)  # placeholder
        extent = node_max[nid] - node_min[nid]
        axis = int(np.argmax(extent))
        order = np.argsort(centroids[idx, axis], kind="stable")
        half = idx.shape[0] // 2
        left = make_node(idx[order[:half]])
        right = make_node(idx[order[half:]])
        children[nid] = (left, right)
        return nid

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        make_node(np.arange(T))
    finally:
        sys.setrecursionlimit(old_limit)

    M = len(node_min)
    # DFS preorder is construction order (root=0, left=parent+1), so the skip
    # link of node i is: for a leaf, i+1; for an internal node, the index just
    # past its subtree = skip of its right child chain. Compute via subtree
    # sizes.
    subtree_end = np.zeros(M, np.int32)

    def compute_end(nid: int) -> int:
        if children[nid] is None:
            subtree_end[nid] = nid + 1
        else:
            left, right = children[nid]
            compute_end(left)
            subtree_end[nid] = compute_end(right)
        return subtree_end[nid]

    sys.setrecursionlimit(max(sys.getrecursionlimit(), 10000))
    compute_end(0)

    # Permute triangles so every leaf's triangles are contiguous AND 8-row
    # aligned (each leaf padded to LEAF_SIZE by repeating its first triangle,
    # masked out by leaf_count). The Pallas kernel then loads a leaf with one
    # aligned dense (LEAF_SIZE, K) vector read.
    perm_parts = []
    leaf_start = np.zeros(M, np.int32)
    leaf_count = np.zeros(M, np.int32)
    leaf_tris = np.full((M, LEAF_SIZE), -1, np.int32)
    off = 0
    for nid, lst in enumerate(leaf_lists):
        if lst is not None:
            c = lst.shape[0]
            perm_parts.append(lst)
            if c < LEAF_SIZE:
                perm_parts.append(np.repeat(lst[:1], LEAF_SIZE - c))
            leaf_start[nid] = off
            leaf_count[nid] = c
            leaf_tris[nid, :c] = np.arange(off, off + c, dtype=np.int32)
            off += LEAF_SIZE
    perm = np.concatenate(perm_parts) if perm_parts else np.zeros(0, np.int64)
    verts = np.asarray(verts)[perm]
    norms = np.asarray(norms)[perm]
    mats = np.asarray(mats)[perm]

    # Host numpy arrays: embedded as jit constants via SceneData.to_device()
    # (one transfer with the program, not per-array device puts).
    np_dtype = np.dtype(dtype)
    return BvhData(
        node_min=np.stack(node_min).astype(np_dtype),
        node_max=np.stack(node_max).astype(np_dtype),
        is_leaf=np.asarray(is_leaf, np.int32),
        skip=np.asarray(subtree_end, np.int32),
        leaf_tris=leaf_tris,
        leaf_start=leaf_start,
        leaf_count=leaf_count,
        verts=verts.astype(np_dtype),
        norms=norms.astype(np_dtype),
        mat_id=mats.astype(np.int32),
    )


def _tri_hit_t(o, d, v0, v1, v2, t_min):
    """Hit times for per-ray triangle bundles: o,d (N,1,3); v* (N,K,3)."""
    e1 = v1 - v0
    e2 = v2 - v0
    pn = normalize(jnp.cross(e1, e2))
    cos = dot(pn, d)
    cos_safe = jnp.where(jnp.abs(cos) > 1e-8, cos, 1e-8)
    t = dot(pn, v0 - o) / cos_safe
    p = o + t[..., None] * d
    dd = p - v0
    d00 = dot(e1, e1)
    d01 = dot(e1, e2)
    d11 = dot(e2, e2)
    d20 = dot(dd, e1)
    d21 = dot(dd, e2)
    denom = d00 * d11 - d01 * d01
    denom_safe = jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
    v = (d11 * d20 - d01 * d21) / denom_safe
    w = (d00 * d21 - d01 * d20) / denom_safe
    u = 1.0 - v - w
    ok = (
        (jnp.abs(cos) >= 1e-8)
        & (t >= t_min)
        & (u >= 0.0)
        & (v >= 0.0)
        & (w >= 0.0)
    )
    return jnp.where(ok, t, INF), (u, v, w)


def bvh_closest_hit(bvh: BvhData, o: jnp.ndarray, d: jnp.ndarray, t_min, active=None) -> Hit:
    """Closest hit of N rays against the BVH triangles.

    All rays advance one node per iteration of a single while_loop; a ray's
    pointer jumps to `skip` on bbox miss or after a leaf, and parks at the
    sentinel M when traversal is done. The bbox test prunes against the
    running-best hit (`lo <= t_best`), the vector analog of the reference's
    early-exit (kdtree.rs:208-212).

    Lanes with `active=False` start parked at the sentinel, so the lockstep
    iteration count is the max over *live* lanes only.
    """
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)  # lift host-numpy BVHs
    N = o.shape[0]
    M = bvh.num_nodes
    d_safe = jnp.where(jnp.abs(d) > 1e-20, d, jnp.where(d < 0, -1e-20, 1e-20))
    inv_d = 1.0 / d_safe

    def cond(state):
        ptr, _, _ = state
        return jnp.any(ptr < M)

    def body(state):
        ptr, t_best, best_tri = state
        active = ptr < M
        p = jnp.minimum(ptr, M - 1)

        bmin = bvh.node_min[p]  # (N,3)
        bmax = bvh.node_max[p]
        t1 = (bmin - o) * inv_d
        t2 = (bmax - o) * inv_d
        lo = jnp.max(jnp.minimum(t1, t2), axis=-1)
        hi = jnp.min(jnp.maximum(t1, t2), axis=-1)
        box_hit = (lo <= hi) & (hi >= t_min) & (lo <= t_best)

        leaf = bvh.is_leaf[p] == 1
        process_leaf = active & leaf & box_hit

        tris = bvh.leaf_tris[p]  # (N,K)
        tri_ok = tris >= 0
        tid = jnp.maximum(tris, 0)
        tv = bvh.verts[tid]  # (N,K,3,3)
        t_hits, _ = _tri_hit_t(
            o[:, None, :], d[:, None, :], tv[:, :, 0], tv[:, :, 1], tv[:, :, 2], t_min
        )
        t_hits = jnp.where(tri_ok & process_leaf[:, None], t_hits, INF)
        k_best = jnp.argmin(t_hits, axis=1)
        t_leaf = jnp.take_along_axis(t_hits, k_best[:, None], 1)[:, 0]
        tri_leaf = jnp.take_along_axis(tid, k_best[:, None], 1)[:, 0]

        better = t_leaf < t_best
        t_best = jnp.where(better, t_leaf, t_best)
        best_tri = jnp.where(better, tri_leaf, best_tri)

        descend = active & box_hit & (~leaf)
        nxt = jnp.where(descend, ptr + 1, bvh.skip[p])
        ptr = jnp.where(active, nxt, ptr)
        return ptr, t_best, best_tri

    if active is None:
        ptr0 = jnp.zeros(N, jnp.int32)
    else:
        ptr0 = jnp.where(active, 0, M).astype(jnp.int32)
    t0 = jnp.full(N, INF, o.dtype)
    tri0 = jnp.zeros(N, jnp.int32)
    _, t_best, best_tri = jax.lax.while_loop(cond, body, (ptr0, t0, tri0))

    return finalize_hit(bvh, o, d, t_min, t_best, best_tri)


def finalize_hit(bvh: BvhData, o, d, t_min, t_best, best_tri) -> Hit:
    """Recompute barycentrics once for the winning triangle to get the
    smooth-interpolated normal (mesh.rs:77). Shared by the XLA and Pallas
    traversals — both return only (t, triangle id) from the hot loop.

    The verts / norms / mat_id lookups ride ONE row gather of a packed
    (T, 19) table: TPU row-gathers are row-count-bound (~5.5 ms per gather
    at 518k rays regardless of row width, PERF_NOTES r5), so one wide
    gather replaces three. The concat producing the packed table is
    loop-invariant in every render dispatch, so XLA hoists it out of the
    per-sample loop (mat_id rides as an f32 VALUE — exact, ids < 2^24 —
    never a bitcast, which TPU denormal flushing would destroy)."""
    T = bvh.verts.shape[0]
    dt = bvh.verts.dtype
    packed = jnp.concatenate(
        [
            bvh.verts.reshape(T, 9),
            bvh.norms.reshape(T, 9),
            bvh.mat_id.astype(dt)[:, None],
        ],
        axis=1,
    )
    g = packed[best_tri]  # (N, 19): the ONE gather
    tv = g[:, 0:9].reshape(-1, 3, 3)
    tn = g[:, 9:18].reshape(-1, 3, 3)
    t_fin, (u, v, w) = _tri_hit_t(o, d, tv[:, 0], tv[:, 1], tv[:, 2], t_min)
    n = normalize(u[:, None] * tn[:, 0] + v[:, None] * tn[:, 1] + w[:, None] * tn[:, 2])
    found = jnp.isfinite(t_best)
    return Hit(
        t=jnp.where(found, t_best, INF),
        normal=n,
        mat_id=g[:, 18].astype(jnp.int32),
    )

"""Two-level instanced BVH: TLAS over instances, shared BLAS per mesh.

TPU-native counterpart of the reference's nested kd-trees
(/root/reference/src/kdtree.rs:128 — a `KdTree` is itself a `Shape`, so trees
nest, as exercised by examples/fractal_teapots.rs:1). The reference re-enters
a child tree through the `Shape` vtable with a transformed ray
(shape.rs:127-137); here both levels are flattened into skip-link arrays and a
single `lax.while_loop` walks them in lockstep for every ray:

- The TLAS is a binary BVH over *instance* world bounding boxes (one instance
  per leaf). An instance = (affine inverse transform, normal matrix, material,
  BLAS id) — exactly the data `Transformed<KdTree<Triangle>>` carries
  (shape.rs:110-125), but in struct-of-arrays form.
- Every unique mesh gets ONE BLAS over its local-space triangles; all BLASes
  are concatenated so a per-ray integer pointer can jump into any of them.
- Each ray carries a mode flag: walking the TLAS with the world ray, or inside
  some instance's BLAS with the local-space ray (direction NOT normalized, so
  local hit times equal world hit times, shape.rs:64-71 convention).

Compared to baking instances into world-space triangles, memory is
O(unique mesh triangles + instances) instead of O(instances x triangles):
937 teapot instances share one 6.3k-triangle BLAS instead of 5.9M baked
triangles.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.vmath import normalize
from .intersect import Hit, INF
from .bvh import LEAF_SIZE, _tri_hit_t

__all__ = ["InstancedMeshes", "build_instanced", "instanced_closest_hit"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class InstancedMeshes:
    """Flattened two-level BVH over mesh instances."""

    # TLAS over instances (one instance per leaf)
    t_min: jnp.ndarray  # (Mt, 3) world-space
    t_max: jnp.ndarray  # (Mt, 3)
    t_leaf_inst: jnp.ndarray  # (Mt,) instance id at leaves, -1 internal
    t_skip: jnp.ndarray  # (Mt,)
    # Concatenated BLAS nodes (skip links are global indices)
    b_min: jnp.ndarray  # (Mb, 3) local-space
    b_max: jnp.ndarray  # (Mb, 3)
    b_is_leaf: jnp.ndarray  # (Mb,)
    b_skip: jnp.ndarray  # (Mb,)
    b_leaf_tris: jnp.ndarray  # (Mb, LEAF_SIZE) global triangle ids, -1 pad
    # Concatenated local-space triangles
    verts: jnp.ndarray  # (T, 3, 3)
    norms: jnp.ndarray  # (T, 3, 3)
    # Instances
    inst_inv: jnp.ndarray  # (K, 3, 4) world->local affine
    inst_nmat: jnp.ndarray  # (K, 3, 3) inverse-transpose linear
    inst_mat: jnp.ndarray  # (K,) material id
    inst_root: jnp.ndarray  # (K,) global BLAS root node of this instance
    inst_end: jnp.ndarray  # (K,) global index one past this instance's BLAS

    @property
    def num_tlas_nodes(self) -> int:
        return self.t_min.shape[0]


def _build_flat_bvh(prim_min: np.ndarray, prim_max: np.ndarray, leaf_size: int):
    """Median-split BVH over primitive AABBs, flattened in DFS preorder with
    skip links (same scheme as ops.bvh.build_bvh). Returns
    (node_min, node_max, skip, leaf_lists) where leaf_lists[i] is the
    primitive-index array at node i, or None for internal nodes.

    Iterative (explicit stack): instance/triangle counts can reach hundreds of
    thousands, past Python's recursion limit. In DFS preorder the subtree of
    node i is the contiguous range [i, end_i), so skip[i] = end_i falls out of
    a size counter when the subtree closes.

    Prefers the native binned-SAH builder (rpt_tpu/native) — SAH matters most
    exactly here: instance world boxes (fractal placements) overlap heavily,
    where median splits produce high-overlap siblings that packets must
    enter both of.
    """
    from ..native import build_bvh_sah  # rpt_tpu.native

    nat = build_bvh_sah(
        np.asarray(prim_min, np.float32), np.asarray(prim_max, np.float32),
        leaf_size,
    ) if prim_min.shape[0] > 0 else None
    if nat is not None:
        node_min, node_max, is_leaf, skip, leaf_start, leaf_count, perm = nat
        leaf_lists = [
            perm[leaf_start[i] : leaf_start[i] + leaf_count[i]]
            if is_leaf[i]
            else None
            for i in range(node_min.shape[0])
        ]
        return node_min, node_max, skip, leaf_lists

    centroids = (prim_min + prim_max) * 0.5
    node_min, node_max, leaf_lists = [], [], []
    subtree_end: List[int] = []

    # Stack entries: ("node", idx) creates a node; ("close", nid) records the
    # end of nid's subtree once all its descendants were emitted.
    stack: list = [("node", np.arange(prim_min.shape[0]))]
    close_stack: List[int] = []
    while stack:
        tag, payload = stack.pop()
        if tag == "close":
            subtree_end[payload] = len(node_min)
            continue
        idx = payload
        nid = len(node_min)
        node_min.append(prim_min[idx].min(axis=0))
        node_max.append(prim_max[idx].max(axis=0))
        subtree_end.append(-1)
        if idx.shape[0] <= leaf_size:
            leaf_lists.append(idx)
            subtree_end[nid] = nid + 1
            continue
        leaf_lists.append(None)
        extent = node_max[nid] - node_min[nid]
        axis = int(np.argmax(extent))
        order = np.argsort(centroids[idx, axis], kind="stable")
        half = idx.shape[0] // 2
        # DFS preorder: pop order is left, right, then close(nid)
        stack.append(("close", nid))
        stack.append(("node", idx[order[half:]]))
        stack.append(("node", idx[order[:half]]))

    return (
        np.stack(node_min),
        np.stack(node_max),
        np.asarray(subtree_end, np.int32),
        leaf_lists,
    )


def _transform_bbox(matrix: np.ndarray, p_min: np.ndarray, p_max: np.ndarray):
    """World AABB of a transformed local AABB via its 8 corners
    (shape.rs:153-176)."""
    corners = np.array(
        [
            [x, y, z]
            for x in (p_min[0], p_max[0])
            for y in (p_min[1], p_max[1])
            for z in (p_min[2], p_max[2])
        ]
    )
    world = corners @ matrix[:3, :3].T + matrix[:3, 3]
    return world.min(axis=0), world.max(axis=0)


def build_instanced(
    meshes: Sequence,  # list of Mesh (unique geometry)
    instances: Sequence[Tuple[int, np.ndarray, int]],  # (mesh_idx, 4x4 matrix, mat_id)
    dtype=jnp.float32,
) -> InstancedMeshes:
    """Build the two-level structure host-side (numpy)."""
    np_dtype = np.dtype(dtype)

    # --- BLAS per unique mesh, concatenated --------------------------------
    b_min_all, b_max_all, b_leaf_all, b_skip_all = [], [], [], []
    verts_all, norms_all = [], []
    blas_root, blas_end = [], []
    node_off = 0
    tri_off = 0
    blas_bounds = []
    for mesh in meshes:
        v = np.asarray(mesh.vertices, np.float64)
        nrm = np.asarray(mesh.normals, np.float64)
        tmin = v.min(axis=1)
        tmax = v.max(axis=1)
        nmin, nmax, skip, leaves = _build_flat_bvh(tmin, tmax, LEAF_SIZE)
        M = nmin.shape[0]
        leaf_tris = np.full((M, LEAF_SIZE), -1, np.int64)
        for nid, lst in enumerate(leaves):
            if lst is not None:
                leaf_tris[nid, : lst.shape[0]] = lst + tri_off
        b_min_all.append(nmin)
        b_max_all.append(nmax)
        b_skip_all.append(skip + node_off)
        b_leaf_all.append(leaf_tris)
        verts_all.append(v)
        norms_all.append(nrm)
        blas_root.append(node_off)
        blas_bounds.append((nmin[0], nmax[0]))
        node_off += M
        blas_end.append(node_off)
        tri_off += v.shape[0]

    b_min = np.concatenate(b_min_all)
    b_max = np.concatenate(b_max_all)
    b_skip = np.concatenate(b_skip_all)
    b_leaf_tris = np.concatenate(b_leaf_all)
    b_is_leaf = (b_leaf_tris[:, 0] >= 0).astype(np.int32)
    verts = np.concatenate(verts_all)
    norms = np.concatenate(norms_all)

    # --- Instances ----------------------------------------------------------
    K = len(instances)
    inst_inv = np.zeros((K, 3, 4))
    inst_nmat = np.zeros((K, 3, 3))
    inst_mat = np.zeros(K, np.int32)
    inst_root = np.zeros(K, np.int32)
    inst_end = np.zeros(K, np.int32)
    w_min = np.zeros((K, 3))
    w_max = np.zeros((K, 3))
    for k, (mesh_idx, matrix, mat_id) in enumerate(instances):
        matrix = np.asarray(matrix, np.float64)
        inv = np.linalg.inv(matrix)
        inst_inv[k] = inv[:3, :4]
        inst_nmat[k] = np.linalg.inv(matrix[:3, :3]).T
        inst_mat[k] = mat_id
        inst_root[k] = blas_root[mesh_idx]
        inst_end[k] = blas_end[mesh_idx]
        w_min[k], w_max[k] = _transform_bbox(matrix, *blas_bounds[mesh_idx])

    # --- TLAS over instance world boxes (one instance per leaf) -------------
    t_min, t_max, t_skip, t_leaves = _build_flat_bvh(w_min, w_max, 1)
    Mt = t_min.shape[0]
    t_leaf_inst = np.full(Mt, -1, np.int32)
    for nid, lst in enumerate(t_leaves):
        if lst is not None:
            t_leaf_inst[nid] = lst[0]

    return InstancedMeshes(
        t_min=t_min.astype(np_dtype),
        t_max=t_max.astype(np_dtype),
        t_leaf_inst=t_leaf_inst,
        t_skip=t_skip.astype(np.int32),
        b_min=b_min.astype(np_dtype),
        b_max=b_max.astype(np_dtype),
        b_is_leaf=b_is_leaf,
        b_skip=b_skip.astype(np.int32),
        b_leaf_tris=b_leaf_tris.astype(np.int32),
        verts=verts.astype(np_dtype),
        norms=norms.astype(np_dtype),
        inst_inv=inst_inv.astype(np_dtype),
        inst_nmat=inst_nmat.astype(np_dtype),
        inst_mat=inst_mat,
        inst_root=inst_root,
        inst_end=inst_end,
    )


def _slab(bmin, bmax, o, inv_d, t_min, t_best):
    t1 = (bmin - o) * inv_d
    t2 = (bmax - o) * inv_d
    lo = jnp.max(jnp.minimum(t1, t2), axis=-1)
    hi = jnp.min(jnp.maximum(t1, t2), axis=-1)
    return (lo <= hi) & (hi >= t_min) & (lo <= t_best)


def _safe_inv(d):
    d_safe = jnp.where(jnp.abs(d) > 1e-20, d, jnp.where(d < 0, -1e-20, 1e-20))
    return 1.0 / d_safe


def instanced_closest_hit(
    im: InstancedMeshes, o: jnp.ndarray, d: jnp.ndarray, t_min, active=None
) -> Hit:
    """Closest hit of N rays against every mesh instance.

    One while_loop; per iteration each ray takes either a TLAS step (world
    ray vs. instance boxes) or a BLAS step (local ray vs. the current
    instance's nodes/triangles), depending on its mode flag. Hit times stay in
    the world parameterization throughout (unnormalized local directions), so
    the running-best prune `lo <= t_best` is valid at both levels — the vector
    analog of the reference's early-exit recursion (kdtree.rs:151-223).
    """
    im = jax.tree_util.tree_map(jnp.asarray, im)
    N = o.shape[0]
    Mt = im.num_tlas_nodes
    inv_d = _safe_inv(d)

    def cond(state):
        in_blas, tptr = state[0], state[1]
        return jnp.any(in_blas | (tptr < Mt))

    def body(state):
        (in_blas, tptr, bptr, bend, inst, o_l, d_l, inv_dl, t_best, best_tri, best_inst) = state

        # ---- TLAS step (rays not inside a BLAS) ----------------------------
        t_active = (~in_blas) & (tptr < Mt)
        p = jnp.minimum(tptr, Mt - 1)
        hit_box = _slab(im.t_min[p], im.t_max[p], o, inv_d, t_min, t_best)
        leaf_inst = im.t_leaf_inst[p]
        is_leaf_t = leaf_inst >= 0
        enter = t_active & is_leaf_t & hit_box
        descend = t_active & (~is_leaf_t) & hit_box
        tptr_next = jnp.where(descend, p + 1, im.t_skip[p])
        tptr = jnp.where(t_active, tptr_next, tptr)

        # Entering rays: transform into instance-local space
        e_inst = jnp.maximum(leaf_inst, 0)
        A = im.inst_inv[e_inst]  # (N,3,4)
        o_e = jnp.einsum("nij,nj->ni", A[:, :, :3], o) + A[:, :, 3]
        d_e = jnp.einsum("nij,nj->ni", A[:, :, :3], d)
        inst = jnp.where(enter, e_inst, inst)
        o_l = jnp.where(enter[:, None], o_e, o_l)
        d_l = jnp.where(enter[:, None], d_e, d_l)
        inv_dl = jnp.where(enter[:, None], _safe_inv(d_e), inv_dl)
        bptr = jnp.where(enter, im.inst_root[e_inst], bptr)
        bend = jnp.where(enter, im.inst_end[e_inst], bend)
        in_blas = in_blas | enter

        # ---- BLAS step (rays inside a BLAS; `enter` rays start next iter) --
        b_active = in_blas & (~enter)
        q = jnp.minimum(bptr, im.b_min.shape[0] - 1)
        hit_b = _slab(im.b_min[q], im.b_max[q], o_l, inv_dl, t_min, t_best)
        leaf_b = im.b_is_leaf[q] == 1
        process = b_active & leaf_b & hit_b

        tris = im.b_leaf_tris[q]  # (N,K)
        tri_ok = tris >= 0
        tid = jnp.maximum(tris, 0)
        tv = im.verts[tid]  # (N,K,3,3)
        t_hits, _ = _tri_hit_t(
            o_l[:, None, :], d_l[:, None, :], tv[:, :, 0], tv[:, :, 1], tv[:, :, 2], t_min
        )
        t_hits = jnp.where(tri_ok & process[:, None], t_hits, INF)
        k_best = jnp.argmin(t_hits, axis=1)
        t_leaf = jnp.take_along_axis(t_hits, k_best[:, None], 1)[:, 0]
        tri_leaf = jnp.take_along_axis(tid, k_best[:, None], 1)[:, 0]
        better = t_leaf < t_best
        t_best = jnp.where(better, t_leaf, t_best)
        best_tri = jnp.where(better, tri_leaf, best_tri)
        best_inst = jnp.where(better, inst, best_inst)

        go_deeper = b_active & (~leaf_b) & hit_b
        bptr_next = jnp.where(go_deeper, q + 1, im.b_skip[q])
        bptr = jnp.where(b_active, bptr_next, bptr)
        # BLAS finished -> back to the TLAS (tptr already points past the leaf)
        in_blas = in_blas & ~(b_active & (bptr >= bend))

        return (in_blas, tptr, bptr, bend, inst, o_l, d_l, inv_dl, t_best, best_tri, best_inst)

    zeros_i = jnp.zeros(N, jnp.int32)
    if active is None:
        tptr0 = zeros_i
    else:
        # Inactive lanes park at the TLAS sentinel: no lockstep iterations.
        tptr0 = jnp.where(active, 0, Mt).astype(jnp.int32)
    state0 = (
        jnp.zeros(N, bool),
        tptr0,
        zeros_i,
        zeros_i,
        zeros_i,
        jnp.zeros_like(o),
        jnp.ones_like(d),
        jnp.ones_like(d),
        jnp.full(N, INF, o.dtype),
        zeros_i,
        zeros_i,
    )
    state = jax.lax.while_loop(cond, body, state0)
    t_best, best_tri, best_inst = state[8], state[9], state[10]

    # Recompute barycentrics for the winner in its instance's local frame,
    # interpolate shading normals (mesh.rs:77), lift by the inverse-transpose
    # (shape.rs:130-137).
    A = im.inst_inv[best_inst]
    o_w = jnp.einsum("nij,nj->ni", A[:, :, :3], o) + A[:, :, 3]
    d_w = jnp.einsum("nij,nj->ni", A[:, :, :3], d)
    tv = im.verts[best_tri]
    _, (u, v, w) = _tri_hit_t(o_w, d_w, tv[:, 0], tv[:, 1], tv[:, 2], t_min)
    tn = im.norms[best_tri]
    n_local = u[:, None] * tn[:, 0] + v[:, None] * tn[:, 1] + w[:, None] * tn[:, 2]
    n_world = normalize(
        jnp.einsum("nij,nj->ni", im.inst_nmat[best_inst], n_local)
    )
    return Hit(
        t=t_best,
        normal=n_world,
        mat_id=im.inst_mat[best_inst],
    )

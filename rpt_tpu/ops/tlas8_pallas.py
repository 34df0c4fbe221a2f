"""Pallas TPU kernel: two-level 8-ary wide-BVH traversal for instanced
meshes (wide-TLAS over instances + shared wide-BLAS per mesh).

Wide successor to the binary two-level kernel (tlas_pallas.py), transferring
the bvh8_pallas.py findings to the instanced path: the binary walk spends
~600 ns per node on the vector->scalar any() sync, so both levels now make
EIGHT descent decisions per sync (child boxes on sublanes, hit bits packed
into one integer, one scalar extract per opened node), and children are
visited near-to-far per direction octant — which at the TLAS level is the
near-to-far INSTANCE ordering of VERDICT r3 item 4 (heavily overlapped
fractal placements stop being visited in arbitrary preorder).

Both levels share ONE wide-node table (TLAS nodes first, then every unique
mesh's wide-BLAS), with child kind encoded per meta pair [a, b]:
b == 0 internal (a = global wide index), b > 0 triangle leaf (a = packed
leaf start), b == -2 instance (a = instance id), b == -1 empty. One
`lax.while_loop` drives the walk through a TAGGED scalar stack in SMEM (the
vector analog of the reference's nested recursion — a KdTree is itself a
Shape, kdtree.rs:128 + shape.rs:127-137):

  entry = node_index << 2 | tag
  tag 0: node slabbed with the WORLD rays (TLAS part)
  tag 1: node slabbed with the instance-LOCAL rays (BLAS part)
  tag 2: instance entry — drain the pending leaf (it belongs to the
         previous instance's frame), load the 3x4 world->local affine
         (12 scalar SMEM reads), re-express the packet in local space
         (direction unnormalized so local t == world t), push the mesh's
         wide-BLAS root with tag 1. LIFO discipline guarantees every tag-1
         entry above belongs to the current instance.

Triangle leaves run the same double-buffered leaf-DMA + deferred-test
pipeline as bvh8_pallas (identical swizzled (8,128) rows, local space,
shared by all instances). Result contract matches
tlas.instanced_closest_hit.

Table-size regimes (round 5, VERDICT r4 item 3 — the 1536-node cliff):
- <= MAX_RESIDENT_WIDE_NODES: the whole (Mw, 8, 128) bounds table lives in
  VMEM (6 MB at the cap) and node reads are plain vector loads.
- <= MAX_DMA_WIDE_NODES ("dma" mode, lego-class scenes): bounds stay in
  HBM; every PUSH of a tag-0/1 stack entry starts an async copy of that
  node's 4 KB tile into a VMEM ring slot addressed by the entry's stack
  position, and the pop waits it — by which time the intervening walk
  work has usually covered the DMA latency. VMEM cost is STACK_CAP tiles
  (512 KB) regardless of table size; the binding budget becomes the SMEM
  meta table (96 B/node). Instance entries (tag 2) carry no tile.
- beyond: loud warning + binary-TLAS fallback (pack returns None).
"""

from __future__ import annotations

import dataclasses
import functools
import warnings

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vmath import normalize
from .intersect import Hit, INF
from .bvh import _tri_hit_t
from .bvh_pallas import (
    DEFAULT_SUBS,
    KMAX,
    LANES,
    TRI_ROW,
    _BIG,
    _leaf_rows,
    _leaf_subgroup_t,
    _pack_rays,
    _swizzle_tris,
)
from .bvh8_pallas import BRANCH, META_STRIDE, STACK_CAP
from .tlas import InstancedMeshes

__all__ = [
    "tlas8_closest_hit_pallas",
    "tlas8_occluded_pallas",
    "pack_tlas8_for_pallas",
    "tlas8_eligible",
    "Tlas8Pack",
]

# Combined wide-node budget (TLAS + all BLAS) for the VMEM-RESIDENT kernel:
# bounds tiles are 4 KB each (fractal_teapots needs ~300 wide nodes total).
MAX_RESIDENT_WIDE_NODES = 1536
# "dma" mode cap: the whole meta table (96 B/node) + instance tables must fit
# the ~1 MB SMEM; bounds live in HBM and stream per-node through the ring.
MAX_DMA_WIDE_NODES = 8192


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Tlas8Pack:
    bounds: jnp.ndarray  # (Mw, 8, 128) f32 child boxes (world for TLAS part,
    #                      local for BLAS parts)
    meta: jnp.ndarray  # (Mw*24,) i32 child pairs + octant perms
    inst_f: jnp.ndarray  # (K*12,) f32 world->local affine rows
    inst_i: jnp.ndarray  # (K,) i32 global wide-BLAS root of each instance
    tri: jnp.ndarray  # (L, 8, 128) f32 swizzled local-space leaf blocks
    p_verts: jnp.ndarray  # (L*8, 3, 3) packed local verts
    p_norms: jnp.ndarray  # (L*8, 3, 3)
    # "resident" (bounds whole-VMEM) or "dma" (bounds HBM + per-node ring
    # copies); static pytree metadata — it selects the kernel.
    mode: str = dataclasses.field(
        default="resident", metadata=dict(static=True)
    )


def _collapse_wide(skip, is_leaf, payload_a, payload_b, root, out_nodes,
                   node_min, node_max):
    """Collapse the binary preorder subtree rooted at `root` into wide nodes
    appended to out_nodes (smallest-subtree-first frontier expansion, as in
    bvh8_pallas). Leaf children become (payload_a[f], payload_b[f]); internal
    children become (global wide index, 0). Returns the wide root index."""

    def expand(b):
        if is_leaf[b]:
            return [b]
        frontier = [b]
        while len(frontier) < BRANCH:
            cand = [j for j in frontier if not is_leaf[j]]
            if not cand:
                break
            j = min(cand, key=lambda n: int(skip[n]) - n)
            frontier.remove(j)
            frontier.extend([j + 1, int(skip[j + 1])])
        return frontier

    base = len(out_nodes)
    windex = {}
    stack = [root]
    frontiers = []
    while stack:
        b = stack.pop()
        windex[b] = base + len(frontiers)
        frontiers.append(None)  # reserve slot to keep DFS numbering
        frontiers[-1] = (b, expand(b))
        for f in reversed(frontiers[-1][1]):
            if not is_leaf[f]:
                stack.append(f)
    # Renumber: windex assigned in pop order equals append order above.
    for b, fr in frontiers:
        children = []
        for f in fr:
            if is_leaf[f]:
                children.append(
                    (node_min[f], node_max[f], int(payload_a[f]),
                     int(payload_b[f]))
                )
            else:
                children.append((node_min[f], node_max[f], windex[f], 0))
        out_nodes.append(children)
    return base


def _emit_wide(out_nodes):
    """out_nodes -> (bounds (Mw,8,128) f32, meta (Mw*24,) i32) with octant
    near-to-far permutation words computed from child centroids."""
    Mw = len(out_nodes)
    bounds = np.zeros((Mw, BRANCH, TRI_ROW), np.float32)
    bounds[:, :, 0:3] = _BIG
    bounds[:, :, 3:6] = -_BIG
    meta = np.zeros((Mw, META_STRIDE), np.int32)
    meta[:, 1:16:2] = -1
    signs = np.array(
        [[-1.0 if (o >> a) & 1 else 1.0 for a in range(3)] for o in range(8)]
    )
    ranks = np.arange(BRANCH, dtype=np.int64)
    for w, children in enumerate(out_nodes):
        cents = np.full((BRANCH, 3), 1e30)
        for c, (bmn, bmx, a, b) in enumerate(children):
            bounds[w, c, 0:3] = bmn
            bounds[w, c, 3:6] = bmx
            meta[w, 2 * c] = a
            meta[w, 2 * c + 1] = b
            cents[c] = 0.5 * (np.asarray(bmn) + np.asarray(bmx))
        keys = np.einsum("cx,ox->oc", cents, signs)
        order = np.argsort(keys, axis=-1, kind="stable")  # (8 oct, 8 child)
        words = (order.astype(np.int64) << (4 * ranks)[None, :]).sum(-1)
        meta[w, 16:24] = words.astype(np.int32)
    return bounds, meta.reshape(-1)


def _tlas_stack_need(out_nodes, inst_blas_root) -> int:
    """Exact worst-case SMEM stack requirement for the two-level walk.

    Popping a node pushes its hit internal + instance children; popping an
    instance entry replaces itself with its wide-BLAS root (net stack
    change 0), so an instance child contributes its BLAS root's need.
    BLAS parts are shared across instances — memoized; the TLAS -> BLAS
    graph is acyclic. The same bound caps the "dma" mode's ring (one VMEM
    tile per stack slot). Checked invariant per ADVICE r4 (the STACK_CAP
    comment alone guaranteed nothing)."""
    memo: dict = {}

    def need(w: int) -> int:
        if w in memo:
            return memo[w]
        memo[w] = 0  # breaks accidental cycles defensively
        targets = []
        for (_, _, a, b) in out_nodes[w]:
            if b == 0:
                targets.append(a)
            elif b == -2:
                targets.append(inst_blas_root[a])
        n_push = len(targets)
        peak = n_push
        for t in targets:
            peak = max(peak, n_push - 1 + need(t))
        memo[w] = peak
        return peak

    import sys

    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 100_000))
    try:
        return max(1, 1 + need(0))
    finally:
        sys.setrecursionlimit(old)


def tlas8_eligible(im: InstancedMeshes) -> bool:
    # Cheap pre-gate: the smallest-first collapse absorbs ~5-9 binary nodes
    # per wide node (measured 8.7 on the 192-mesh brick city); /5 is the
    # conservative end. A scene that squeaks past this but truly overflows
    # is still caught by pack_tlas8_for_pallas returning None (with a loud
    # warning) after the exact collapse.
    Mt = int(np.asarray(im.t_min).shape[0])
    Mb = int(np.asarray(im.b_min).shape[0])
    return (Mt + Mb) // 5 + 16 <= MAX_DMA_WIDE_NODES


def pack_tlas8_for_pallas(im: InstancedMeshes) -> Tlas8Pack:
    t_min_n = np.asarray(im.t_min, np.float32)
    t_max_n = np.asarray(im.t_max, np.float32)
    t_skip = np.asarray(im.t_skip, np.int64)
    t_leaf_inst = np.asarray(im.t_leaf_inst, np.int64)
    b_min_n = np.asarray(im.b_min, np.float32)
    b_max_n = np.asarray(im.b_max, np.float32)
    b_skip = np.asarray(im.b_skip, np.int64)
    b_leaf_tris = np.asarray(im.b_leaf_tris, np.int64)
    verts = np.asarray(im.verts, np.float64)
    norms = np.asarray(im.norms, np.float64)
    inst_root = np.asarray(im.inst_root, np.int64)
    inst_end = np.asarray(im.inst_end, np.int64)

    # Leaf-contiguous 8-aligned triangle packing (same as the binary TLAS
    # pack: one (8,128) block per BLAS leaf, local space, instance-shared).
    Mb = b_min_n.shape[0]
    b_leaf_start = np.zeros(Mb, np.int64)
    b_leaf_count = np.zeros(Mb, np.int64)
    perm_parts = []
    off = 0
    for nid in range(Mb):
        tris = b_leaf_tris[nid]
        tris = tris[tris >= 0]
        if tris.shape[0] == 0:
            continue
        c = tris.shape[0]
        perm_parts.append(tris)
        if c < KMAX:
            perm_parts.append(np.repeat(tris[:1], KMAX - c))
        b_leaf_start[nid] = off
        b_leaf_count[nid] = c
        off += KMAX
    perm = np.concatenate(perm_parts) if perm_parts else np.zeros(0, np.int64)
    p_verts = verts[perm]
    p_norms = norms[perm]
    tri = _swizzle_tris(p_verts)
    b_is_leaf = b_leaf_count > 0

    out_nodes: list = []
    # TLAS first (root = wide node 0): leaves are instances, meta [inst, -2].
    t_is_leaf = t_leaf_inst >= 0
    _collapse_wide(
        t_skip, t_is_leaf, t_leaf_inst, np.full_like(t_leaf_inst, -2), 0,
        out_nodes, t_min_n, t_max_n,
    )
    # One wide-BLAS per unique mesh segment; instances share by (root, end).
    wide_root_of = {}
    for r, e in sorted(set(zip(inst_root.tolist(), inst_end.tolist()))):
        wide_root_of[(r, e)] = _collapse_wide(
            b_skip, b_is_leaf, b_leaf_start, b_leaf_count, r, out_nodes,
            b_min_n, b_max_n,
        )
    bounds, meta = _emit_wide(out_nodes)

    K = np.asarray(im.inst_inv).shape[0]
    inst_blas_root = [
        wide_root_of[(int(inst_root[k]), int(inst_end[k]))] for k in range(K)
    ]
    if _tlas_stack_need(out_nodes, inst_blas_root) >= STACK_CAP:
        warnings.warn(
            "wide TLAS worst-case traversal stack exceeds STACK_CAP; "
            "falling back to the binary two-level kernel",
            stacklevel=2,
        )
        return None
    inst_f = np.asarray(im.inst_inv, np.float32).reshape(K * 12)
    inst_i = np.asarray(
        [wide_root_of[(int(inst_root[k]), int(inst_end[k]))] for k in range(K)],
        np.int32,
    )

    Mw = bounds.shape[0]
    if Mw <= MAX_RESIDENT_WIDE_NODES:
        mode = "resident"
    elif Mw <= MAX_DMA_WIDE_NODES:
        mode = "dma"
    else:
        warnings.warn(
            f"wide TLAS table ({Mw} wide nodes) exceeds MAX_DMA_WIDE_NODES="
            f"{MAX_DMA_WIDE_NODES}; falling back to the ~7x slower binary "
            "two-level kernel",
            stacklevel=2,
        )
        return None
    return Tlas8Pack(
        bounds=bounds, meta=meta, inst_f=inst_f, inst_i=inst_i, tri=tri,
        p_verts=p_verts.astype(np.float32),
        p_norms=p_norms.astype(np.float32),
        mode=mode,
    )


def _make_kernel_t8(occl: bool, resident: bool = True):
    """Build the closest-hit (occl=False) or any-hit (occl=True) kernel;
    `resident` selects whole-VMEM bounds vs the HBM + per-push ring-DMA
    large-table mode (module docstring)."""

    def kernel(meta_ref, inst_i, inst_f, tmin_ref, nb_ref, rays_ref, tri_ref,
               *out_and_scratch):
        if occl:
            outs, rest = out_and_scratch[:1], out_and_scratch[1:]
            (occ_ref,) = outs
        else:
            outs, rest = out_and_scratch[:3], out_and_scratch[3:]
            t_ref, id_ref, inst_ref = outs
        if resident:
            stack_ref, tri_scratch, dma_sem = rest
            node_dma = None
        else:
            stack_ref, ring, ring_sem, tri_scratch, dma_sem = rest

            def node_dma(idx, slot):
                return pltpu.make_async_copy(
                    nb_ref.at[idx], ring.at[slot], ring_sem.at[slot]
                )
        r = rays_ref[0]
        SUBS = r.shape[1]
        wox, woy, woz = r[0], r[1], r[2]
        wdx, wdy, wdz = r[3], r[4], r[5]
        act = r[6] > 0.5
        t_max = r[7]  # occl only; zeros otherwise
        t_min = tmin_ref[0]

        if occl:
            occ_ref[0] = jnp.zeros((SUBS, LANES), jnp.float32)
        else:
            t_ref[0] = jnp.full((SUBS, LANES), _BIG, jnp.float32)
            id_ref[0] = jnp.zeros((SUBS, LANES), jnp.int32)
            inst_ref[0] = jnp.zeros((SUBS, LANES), jnp.int32)

        def safe_inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20)
            )

        iwx, iwy, iwz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)
        pow2 = jnp.left_shift(
            jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (BRANCH, 1), 0)
        )

        # World-direction octant drives both levels' child ordering (the
        # affine may flip local signs; ordering is a heuristic, correctness
        # never depends on it).
        octv = (
            jnp.where(jnp.sum(wdx, keepdims=True) < 0, 1, 0)
            + jnp.where(jnp.sum(wdy, keepdims=True) < 0, 2, 0)
            + jnp.where(jnp.sum(wdz, keepdims=True) < 0, 4, 0)
        )
        oct_ = octv[0, 0]

        def test_pending(o3l, d3l, buf, start, count, cur_inst, acc):
            f = _leaf_rows(tri_scratch[buf])
            if occl:
                occ = acc
                occ_rows = []
                for g in range(SUBS):
                    th = _leaf_subgroup_t(f, row_k, o3l, d3l, g, t_min, count)
                    hit_lane = jnp.any(
                        th <= t_max[g:g + 1], axis=0, keepdims=True
                    )
                    occ_rows.append(jnp.where(hit_lane, 1.0, occ[g:g + 1]))
                occ = occ_rows[0] if SUBS == 1 else jnp.concatenate(
                    occ_rows, axis=0)
                return occ
            t_best, best_id, best_inst = acc
            t_rows, id_rows, in_rows = [], [], []
            for g in range(SUBS):
                th = _leaf_subgroup_t(f, row_k, o3l, d3l, g, t_min, count)
                t_leaf = jnp.min(th, axis=0, keepdims=True)
                k_best = jnp.min(
                    jnp.where(th == t_leaf, row_k, KMAX), axis=0, keepdims=True
                )
                tb = t_best[g:g + 1]
                better = t_leaf < tb
                id_rows.append(
                    jnp.where(better, start + k_best, best_id[g:g + 1]))
                in_rows.append(jnp.where(better, cur_inst, best_inst[g:g + 1]))
                t_rows.append(jnp.minimum(tb, t_leaf))
            cat = (lambda xs: xs[0]) if SUBS == 1 else (
                lambda xs: jnp.concatenate(xs, axis=0))
            return cat(t_rows), cat(id_rows), cat(in_rows)

        def cond(state):
            return state[0] > 0

        def body(state):
            (sp, acc, cur_inst, p_start, p_count, cur,
             lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz) = state
            sp = sp - 1
            e = stack_ref[sp]
            tag = e & 3
            idx = jax.lax.shift_right_logical(e, 2)
            is_inst = tag == 2
            is_blas = tag == 1

            def enter_inst(args):
                (acc, lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz, sp,
                 p_start, p_count, cur) = args

                # Drain the pending leaf in the PREVIOUS instance's frame.
                def drain(a):
                    pltpu.make_async_copy(
                        tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                        dma_sem.at[cur],
                    ).wait()
                    return test_pending(
                        (lox, loy, loz), (ldx, ldy, ldz), cur, p_start,
                        p_count, cur_inst, a,
                    )

                acc = jax.lax.cond(p_count > 0, drain, lambda a: a, acc)
                f = idx * 12
                a00, a01, a02, a03 = (inst_f[f], inst_f[f + 1], inst_f[f + 2],
                                      inst_f[f + 3])
                a10, a11, a12, a13 = (inst_f[f + 4], inst_f[f + 5],
                                      inst_f[f + 6], inst_f[f + 7])
                a20, a21, a22, a23 = (inst_f[f + 8], inst_f[f + 9],
                                      inst_f[f + 10], inst_f[f + 11])
                lox = a00 * wox + a01 * woy + a02 * woz + a03
                loy = a10 * wox + a11 * woy + a12 * woz + a13
                loz = a20 * wox + a21 * woy + a22 * woz + a23
                ldx = a00 * wdx + a01 * wdy + a02 * wdz
                ldy = a10 * wdx + a11 * wdy + a12 * wdz
                ldz = a20 * wdx + a21 * wdy + a22 * wdz
                ilx, ily, ilz = safe_inv(ldx), safe_inv(ldy), safe_inv(ldz)

                blas_root = inst_i[idx]
                stack_ref[sp] = jnp.left_shift(blas_root, 2) | 1
                if not resident:
                    node_dma(blas_root, sp).start()
                sp = sp + 1
                return (acc, lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz, sp,
                        jnp.int32(0), jnp.int32(0), cur)

            def node_step(args):
                (acc, lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz, sp,
                 p_start, p_count, cur) = args
                if resident:
                    b = nb_ref[idx]  # (8, 128)
                else:
                    # The tile was DMA'd at PUSH time into the ring slot
                    # addressed by this entry's stack position; the walk
                    # work since then usually covers the copy latency.
                    node_dma(idx, sp).wait()
                    b = ring[sp]
                bmnx, bmny, bmnz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
                bmxx, bmxy, bmxz = b[:, 3:4], b[:, 4:5], b[:, 5:6]

                if occl:
                    occ = acc
                    upper = lambda g: t_max[g:g + 1]
                    extra = lambda g: act[g:g + 1] & (occ[g:g + 1] < 0.5)
                else:
                    t_best = acc[0]
                    upper = lambda g: t_best[g:g + 1]
                    extra = lambda g: act[g:g + 1]

                hitc = None
                for g in range(SUBS):
                    oxg = jnp.where(is_blas, lox[g:g + 1], wox[g:g + 1])
                    oyg = jnp.where(is_blas, loy[g:g + 1], woy[g:g + 1])
                    ozg = jnp.where(is_blas, loz[g:g + 1], woz[g:g + 1])
                    ivxg = jnp.where(is_blas, ilx[g:g + 1], iwx[g:g + 1])
                    ivyg = jnp.where(is_blas, ily[g:g + 1], iwy[g:g + 1])
                    ivzg = jnp.where(is_blas, ilz[g:g + 1], iwz[g:g + 1])
                    t1x = (bmnx - oxg) * ivxg
                    t2x = (bmxx - oxg) * ivxg
                    t1y = (bmny - oyg) * ivyg
                    t2y = (bmxy - oyg) * ivyg
                    t1z = (bmnz - ozg) * ivzg
                    t2z = (bmxz - ozg) * ivzg
                    lo = jnp.maximum(
                        jnp.maximum(jnp.minimum(t1x, t2x),
                                    jnp.minimum(t1y, t2y)),
                        jnp.minimum(t1z, t2z),
                    )
                    hi = jnp.minimum(
                        jnp.minimum(jnp.maximum(t1x, t2x),
                                    jnp.maximum(t1y, t2y)),
                        jnp.maximum(t1z, t2z),
                    )
                    bh = (lo <= hi) & (hi >= t_min) & (lo <= upper(g)) & extra(g)
                    hg = jnp.any(bh, axis=1, keepdims=True)
                    hitc = hg if hitc is None else (hitc | hg)
                maskv = jnp.sum(
                    jnp.where(hitc, pow2, 0), axis=0, keepdims=True)
                mask = maskv[0, 0]  # the one sync for this node

                ms = idx * META_STRIDE
                pw = meta_ref[ms + 16 + oct_]
                # Pass 1 far-first: push internal children (same space tag)
                # and instance children (tag 2); LIFO pops them near-first.
                for k in range(BRANCH - 1, -1, -1):
                    ck = jax.lax.shift_right_logical(pw, 4 * k) & 7
                    hit_c = (jax.lax.shift_right_logical(mask, ck) & 1) == 1
                    a = meta_ref[ms + 2 * ck]
                    cb = meta_ref[ms + 2 * ck + 1]
                    child_tag = jnp.where(cb == -2, 2, tag).astype(jnp.int32)
                    is_push = hit_c & ((cb == 0) | (cb == -2))

                    @pl.when(is_push)
                    def _(a=a, child_tag=child_tag, sp=sp):
                        stack_ref[sp] = jnp.left_shift(a, 2) | child_tag

                    if not resident:
                        # Prefetch the pushed node's tile into its slot
                        # (instance entries, cb == -2, carry no tile).
                        @pl.when(is_push & (cb == 0))
                        def _(a=a, sp=sp):
                            node_dma(a, sp).start()

                    sp = sp + is_push.astype(jnp.int32)

                # Pass 2 near-first: triangle-leaf children (BLAS part only;
                # TLAS nodes have none) through the pending pipeline.
                for k in range(BRANCH):
                    ck = jax.lax.shift_right_logical(pw, 4 * k) & 7
                    hit_c = (jax.lax.shift_right_logical(mask, ck) & 1) == 1
                    a = meta_ref[ms + 2 * ck]
                    cb = meta_ref[ms + 2 * ck + 1]
                    leafc = hit_c & (cb > 0)

                    @pl.when(leafc)
                    def _(a=a, cur=cur):
                        pltpu.make_async_copy(
                            tri_ref.at[a // KMAX], tri_scratch.at[1 - cur],
                            dma_sem.at[1 - cur],
                        ).start()

                    def flush(args, p_start=p_start, p_count=p_count,
                              cur=cur):
                        pltpu.make_async_copy(
                            tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                            dma_sem.at[cur],
                        ).wait()
                        return test_pending(
                            (lox, loy, loz), (ldx, ldy, ldz), cur, p_start,
                            p_count, cur_inst, args,
                        )

                    acc = jax.lax.cond(
                        leafc & (p_count > 0), flush, lambda x: x, acc
                    )
                    p_start = jnp.where(leafc, a, p_start)
                    p_count = jnp.where(leafc, cb, p_count)
                    cur = jnp.where(leafc, 1 - cur, cur)
                return (acc, lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz, sp,
                        p_start, p_count, cur)

            packed_args = (acc, lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz,
                           sp, p_start, p_count, cur)
            (acc, lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz, sp, p_start,
             p_count, cur) = jax.lax.cond(
                is_inst, enter_inst, node_step, packed_args
            )
            cur_inst = jnp.where(is_inst, idx, cur_inst)
            # occl needs no explicit early exit: the slab's occ mask stops
            # opening boxes for occluded lanes, so the stack drains on its
            # own (a per-step liveness reduce was measured as a regression
            # on the binary kernels, PERF_NOTES round 3).
            return (sp, acc, cur_inst, p_start, p_count, cur,
                    lox, loy, loz, ldx, ldy, ldz, ilx, ily, ilz)

        zero_v = jnp.zeros((SUBS, LANES), jnp.float32)
        stack_ref[0] = jnp.int32(0)  # TLAS wide root, tag 0 (world rays)
        if not resident:
            node_dma(jnp.int32(0), jnp.int32(0)).start()
        acc0 = occ_ref[0] if occl else (t_ref[0], id_ref[0], inst_ref[0])
        init = (
            jnp.int32(1), acc0, jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0),
            zero_v, zero_v, zero_v, zero_v, zero_v, zero_v, zero_v, zero_v,
            zero_v,
        )
        out = jax.lax.while_loop(cond, body, init)
        (_, acc, cur_inst, p_start, p_count, cur,
         lox, loy, loz, ldx, ldy, ldz, _, _, _) = out

        def drain(a):
            pltpu.make_async_copy(
                tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                dma_sem.at[cur],
            ).wait()
            return test_pending(
                (lox, loy, loz), (ldx, ldy, ldz), cur, p_start, p_count,
                cur_inst, a,
            )

        acc = jax.lax.cond(p_count > 0, drain, lambda a: a, acc)
        if occl:
            occ_ref[0] = acc
        else:
            t_ref[0] = acc[0]
            id_ref[0] = acc[1]
            inst_ref[0] = acc[2]

    return kernel


_KERNELS_T8 = {
    (occl, resident): _make_kernel_t8(occl=occl, resident=resident)
    for occl in (False, True)
    for resident in (False, True)
}


def _t8_grid_spec(SUBS, n_out, resident):
    out_spec = pl.BlockSpec(
        (1, SUBS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    scratch = [pltpu.SMEM((STACK_CAP,), jnp.int32)]
    if not resident:
        scratch += [
            pltpu.VMEM((STACK_CAP, BRANCH, TRI_ROW), jnp.float32),  # ring
            pltpu.SemaphoreType.DMA((STACK_CAP,)),
        ]
    scratch += [
        pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    return dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_i
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_f
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min
            pl.BlockSpec(
                memory_space=pltpu.VMEM if resident else pl.ANY
            ),  # bounds (Mw,8,128)
            pl.BlockSpec(
                (1, 8, SUBS, LANES), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # tri blocks, HBM
        ],
        scratch_shapes=scratch,
        out_specs=[out_spec] * n_out,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def _traverse_t8(meta, inst_i, inst_f, bounds, tri_pack, rays, t_min, *,
                 mode="resident", interpret=False):
    G, _, SUBS, _ = rays.shape
    resident = mode == "resident"
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    spec = _t8_grid_spec(SUBS, 3, resident)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(G,), **spec
    )
    return pl.pallas_call(
        _KERNELS_T8[(False, resident)],
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, inst_i, inst_f, t_min_arr, bounds, rays, tri_pack)


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def _traverse_t8_occl(meta, inst_i, inst_f, bounds, tri_pack, rays, t_min, *,
                      mode="resident", interpret=False):
    G, _, SUBS, _ = rays.shape
    resident = mode == "resident"
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    spec = _t8_grid_spec(SUBS, 1, resident)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0, grid=(G,), **spec
    )
    (occ_out,) = pl.pallas_call(
        _KERNELS_T8[(True, resident)],
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32)],
        interpret=interpret,
    )(meta, inst_i, inst_f, t_min_arr, bounds, rays, tri_pack)
    return occ_out


def tlas8_closest_hit_pallas(
    im: InstancedMeshes,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    active=None,
    packed: Tlas8Pack = None,
    interpret: bool = False,
    subs: int | None = None,
) -> Hit:
    """Closest hit via the two-level wide kernel (Hit contract identical to
    tlas.instanced_closest_hit)."""
    if packed is None:
        packed = pack_tlas8_for_pallas(im)
    packed = jax.tree_util.tree_map(jnp.asarray, packed)
    im = jax.tree_util.tree_map(jnp.asarray, im)

    N = o.shape[0]
    rays = _pack_rays(o, d, jnp.zeros((N,), jnp.float32), active,
                      subs or DEFAULT_SUBS)
    t_out, id_out, inst_out = _traverse_t8(
        packed.meta, packed.inst_i, packed.inst_f, packed.bounds, packed.tri,
        rays, jnp.asarray(t_min), mode=packed.mode, interpret=interpret,
    )
    t_best = t_out.reshape(-1)[:N].astype(o.dtype)
    best_tri = id_out.reshape(-1)[:N]
    best_inst = inst_out.reshape(-1)[:N]
    t_best = jnp.where(t_best >= 1.0e38, INF, t_best)
    if active is not None:
        t_best = jnp.where(active, t_best, INF)
    best_tri = jnp.clip(best_tri, 0, packed.p_verts.shape[0] - 1)

    # Finalize with TWO packed row gathers (instance table + triangle
    # table): TPU row gathers are row-count-bound (~5.5 ms at 518k rays
    # whatever the row width, PERF_NOTES r5), so [inst_inv | inst_nmat |
    # inst_mat] and [p_verts | p_norms] each ride one gather instead of
    # five narrow ones. The concats are loop-invariant per dispatch
    # (hoisted by XLA); inst_mat rides as an f32 VALUE, never a bitcast.
    K = im.inst_inv.shape[0]
    dt = o.dtype
    inst_packed = jnp.concatenate(
        [
            im.inst_inv.reshape(K, 12).astype(dt),
            im.inst_nmat.reshape(K, 9).astype(dt),
            im.inst_mat.astype(dt)[:, None],
        ],
        axis=1,
    )
    gi = inst_packed[best_inst]  # (N, 22)
    A = gi[:, 0:12].reshape(-1, 3, 4)
    nmat = gi[:, 12:21].reshape(-1, 3, 3)
    T8 = packed.p_verts.shape[0]
    tri_packed = jnp.concatenate(
        [
            packed.p_verts.reshape(T8, 9).astype(dt),
            packed.p_norms.reshape(T8, 9).astype(dt),
        ],
        axis=1,
    )
    gt = tri_packed[best_tri]  # (N, 18)
    tv = gt[:, 0:9].reshape(-1, 3, 3)
    tn = gt[:, 9:18].reshape(-1, 3, 3)

    o_l = jnp.einsum("nij,nj->ni", A[:, :, :3], o) + A[:, :, 3]
    d_l = jnp.einsum("nij,nj->ni", A[:, :, :3], d)
    _, (u, v, w) = _tri_hit_t(o_l, d_l, tv[:, 0], tv[:, 1], tv[:, 2], t_min)
    n_local = u[:, None] * tn[:, 0] + v[:, None] * tn[:, 1] + w[:, None] * tn[:, 2]
    n_world = normalize(jnp.einsum("nij,nj->ni", nmat, n_local))
    return Hit(t=t_best, normal=n_world, mat_id=gi[:, 21].astype(jnp.int32))


def tlas8_occluded_pallas(
    im: InstancedMeshes,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max: jnp.ndarray,
    active=None,
    packed: Tlas8Pack = None,
    interpret: bool = False,
    subs: int | None = None,
) -> jnp.ndarray:
    """Any-hit shadow query against every instance; boolean-equal to
    `tlas8_closest_hit_pallas(...).t <= t_max`."""
    if packed is None:
        packed = pack_tlas8_for_pallas(im)
    packed = jax.tree_util.tree_map(jnp.asarray, packed)

    N = o.shape[0]
    tmax32 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    rays = _pack_rays(o, d, tmax32, active, subs or DEFAULT_SUBS)
    occ_out = _traverse_t8_occl(
        packed.meta, packed.inst_i, packed.inst_f, packed.bounds, packed.tri,
        rays, jnp.asarray(t_min), mode=packed.mode, interpret=interpret,
    )
    occ = occ_out.reshape(-1)[:N] > 0.5
    if active is not None:
        occ = occ & active
    return occ

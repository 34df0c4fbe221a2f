"""Pallas TPU kernel: 8-ary wide-BVH packet traversal.

Round-4 successor to the binary skip-link packet kernel (bvh_pallas.py),
built from a measured bottleneck: on TPU v5e the binary walk's per-step cost
is ~550-900 ns, of which ~46 ns is the ENTIRE rest of the step (scalar SMEM
loads + full-tile slab test + branch) and the remainder is the single
vector->scalar transfer (`jnp.any(box_hit)` feeding the next-pointer select)
— a pipeline-serializing sync that walk interleaving cannot hide (A/B'd:
I=2/4/8 interleaved walks = no change). The fix is architectural: make each
sync yield EIGHT descent decisions instead of one.

- The binary SAH BVH (ops/bvh.py, native builder) is collapsed host-side
  into 8-ary wide nodes: each wide node's children are a frontier of <= 8
  binary descendants (smallest-subtree-first expansion, so near-leaf
  structure dissolves into the parent's frontier), and one wide node
  summarizes ~3 binary levels.
- A wide node's 8 child boxes ride the 8 SUBLANES: bounds live in VMEM as
  one (8, 128) tile per wide node (child c's [min.xyz, max.xyz] in lanes
  0..5 of sublane c), loaded with a single dynamically-indexed vector read.
  The slab test is (8 children, 1) x (1, 128 rays) -> (8, 128) full-tile
  ops; per-child hit bits are packed into one integer by a lane+sublane
  reduce, and ONE scalar extract per opened node hands the scalar core all
  8 decisions (the reference's per-node recursion at kdtree.rs:151-223
  makes this decision one node at a time).
- The scalar core walks the wide tree with an explicit SMEM stack (the
  vector analog of kdtree.rs's recursion stack); hit internal children are
  pushed, hit leaf children enter the same double-buffered leaf-DMA +
  deferred-test pipeline as the binary kernel (triangle blocks are the
  identical (8, 128) swizzled rows from pack_bvh_for_pallas).
- Megameshes chunk exactly like the binary kernel, but on the BINARY tree
  first (reusing its proven subtree partitioner): each binary chunk is
  collapsed into an independent wide tree.
- Round 5: chunks are CULLED and ORDERED per packet (the chunk-level analog
  of the reference's front-to-back early exit, kdtree.rs:151-223). An XLA
  prepass slab-tests every chunk-root AABB against the packet and emits a
  near-to-far visit list (sorted by the packet's min entry distance); the
  kernel — now one grid step per PACKET — loops over that list, DMA-ing
  each live chunk's tables into double-buffered scratch itself (meta ->
  SMEM, bounds -> VMEM) and re-testing each chunk root against the RUNNING
  t_best before even starting its copy, so chunks pruned by nearer hits
  move zero bytes. (Round 4's Mosaic-pipelined chunk axis streamed every
  chunk's 4 MB bounds block on every grid step — G*C*Mc*4 KB of HBM
  traffic per traversal regardless of culling, measured at ~5.6 us/step by
  tools/gridstep_probe.py — which made the 44-chunk 871k-tri dragon
  streaming-bound.)

Result contract is identical to bvh_closest_hit / bvh_occluded_pallas.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit, INF
from .bvh import BvhData, finalize_hit
from .bvh_pallas import (
    DEFAULT_SUBS,
    KMAX,
    LANES,
    TRI_ROW,
    _BIG,
    _chunk_subtrees,
    _leaf_rows,
    _leaf_subgroup_t,
    _pack_rays,
    _swizzle_tris,
)

__all__ = [
    "bvh8_closest_hit_pallas",
    "bvh8_occluded_pallas",
    "pack_bvh8_for_pallas",
    "bvh8_eligible",
    "Bvh8Pack",
]

import os as _os

BRANCH = 8  # children per wide node == sublanes
# Wide nodes per chunk: the chunk's bounds block is Mc * 4 KB, double-
# buffered in VMEM scratch by the kernel's own DMA (1024 nodes => 8 MB of
# the ~16 MB VMEM). One wide node absorbs ~7 binary internal nodes with the
# smallest-first collapse, so 1024 wide nodes ~ an 8000-binary-node
# subtree; the 131k-tri dragon fits in 4 chunks. Env override for A/B.
CHUNK_WNODES = int(_os.environ.get("RPT_CHUNK_WNODES", "1024"))
MAX_CHUNKS = 128
MAX_TRIS = 2_000_000
# Scalar traversal stack (SMEM): worst case pushes BRANCH-1 per level over
# log8 depth; 128 entries covers a full 2M-triangle tree with margin.
STACK_CAP = 128
# Per wide node, wmeta holds 24 i32: 8 x [child_a, child_b] pairs
# (b>0: leaf, a=global leaf start; b==0: internal, a=wide index; b==-1:
# empty) followed by 8 octant permutation words (children packed 4 bits per
# rank, sorted near-to-far along each direction-sign octant).
META_STRIDE = 24


@jax.tree_util.register_pytree_node_class
class Bvh8Pack:
    """Kernel-layout arrays + STATIC chunk count (aux data so tree_map can't
    trace it — it parameterizes the pallas grid)."""

    def __init__(self, wbounds, wmeta, tri, roots, n_chunks: int):
        self.wbounds = wbounds  # (C, Mc, 8, 128) f32
        self.wmeta = wmeta  # (C*Mc*24,) i32
        self.tri = tri  # (L, 8, 128) f32
        self.roots = roots  # (C*8,) f32 chunk-root AABBs [min.xyz,max.xyz,0,0]
        self.n_chunks = int(n_chunks)

    def tree_flatten(self):
        return (self.wbounds, self.wmeta, self.tri, self.roots), self.n_chunks

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux)


def bvh8_eligible(bvh: BvhData) -> bool:
    # Wide node count is bounded by binary internal count / 3 + leaves / 1;
    # conservatively require the binary partition to fit the chunk grid.
    return bvh.num_tris <= MAX_TRIS and bvh.num_nodes <= CHUNK_WNODES * 8 * MAX_CHUNKS


def _collapse_range(skip, is_leaf, leaf_start, leaf_count, s, e):
    """Collapse the self-contained binary preorder subtree [s, e) into a
    wide tree (DFS order). Returns (bounds_idx (Mw,8) binary ids or -1,
    child_a (Mw,8), child_b (Mw,8)) where per child: b>0 -> leaf with
    a=global leaf start, b=count; b==0 -> internal, a=wide index; b==-1 ->
    empty slot."""

    def children2(i):
        l = i + 1
        return l, int(skip[l])

    def expand(b):
        """Frontier of <= BRANCH binary descendants of b (b itself if leaf).

        Expand the SMALLEST subtree first: near-leaf structure (an internal
        node over two leaves) dissolves into the parent's frontier instead
        of becoming a degenerate 2-child wide node, while large subtrees
        stay single children and collapse well recursively. Measured on the
        131k-tri dragon: 3705 wide nodes / 5.33 avg children vs 4716 / 4.40
        for largest-first."""
        if is_leaf[b]:
            return [b]
        frontier = [b]
        while len(frontier) < BRANCH:
            cand = [j for j in frontier if not is_leaf[j]]
            if not cand:
                break
            j = min(cand, key=lambda n: int(skip[n]) - n)
            frontier.remove(j)
            l, r = children2(j)
            frontier.extend([l, r])
        return frontier

    frontiers = []
    windex = {}
    stack = [s]
    order = []
    while stack:
        b = stack.pop()
        wid = len(frontiers)
        windex[b] = wid
        fr = expand(b)
        frontiers.append(fr)
        order.append(b)
        for f in reversed(fr):
            if not is_leaf[f]:
                stack.append(f)

    Mw = len(frontiers)
    bidx = np.full((Mw, BRANCH), -1, np.int64)
    ca = np.zeros((Mw, BRANCH), np.int32)
    cb = np.full((Mw, BRANCH), -1, np.int32)
    for wid, fr in enumerate(frontiers):
        for c, f in enumerate(fr):
            bidx[wid, c] = f
            if is_leaf[f]:
                ca[wid, c] = leaf_start[f]
                cb[wid, c] = leaf_count[f]
            else:
                ca[wid, c] = windex[f]
                cb[wid, c] = 0
    return bidx, ca, cb


def _stack_need(ca: np.ndarray, cb: np.ndarray) -> int:
    """Exact worst-case SMEM stack requirement for one chunk's wide tree.

    The kernel pops a node and pushes its hit INTERNAL children; the child
    visit order is octant- (data-) dependent, so we bound over ALL orders:
    after popping w, its n_int internal children sit on the stack, and a
    child explored while all its siblings are still stacked contributes
    need(child) on top of n_int - 1 residents. Iterative (reverse-DFS-order
    pass over the DFS-numbered wide nodes — children always have larger
    indices than their parent, so one backwards sweep suffices)."""
    Mw = ca.shape[0]
    need = np.zeros(Mw + 1, np.int64)
    for w in range(Mw - 1, -1, -1):
        internal = cb[w] == 0
        n_int = int(internal.sum())
        if n_int == 0:
            continue
        child_peak = int(need[ca[w][internal]].max())
        need[w] = max(n_int, n_int - 1 + child_peak)
    return int(max(1, need[0]))


def pack_bvh8_for_pallas(bvh: BvhData) -> Optional[Bvh8Pack]:
    """Host-side collapse + swizzle of a built binary BVH into the wide
    kernel's memory layout (see module doc).

    Returns None (caller falls back to the binary kernel) when the tree
    defeats the wide layout's static budgets: pathologically low collapse
    ratio, too many chunks, or a worst-case traversal stack that could
    overflow STACK_CAP."""
    node_min = np.asarray(bvh.node_min, np.float32)
    node_max = np.asarray(bvh.node_max, np.float32)
    skip = np.asarray(bvh.skip, np.int64)
    is_leaf = np.asarray(bvh.is_leaf).astype(bool)
    leaf_start = np.asarray(bvh.leaf_start, np.int64)
    leaf_count = np.asarray(bvh.leaf_count, np.int64)

    # Partition the BINARY tree (proven chunker), sized so each chunk's
    # collapsed wide tree stays under CHUNK_WNODES. The smallest-first
    # collapse absorbs ~8 binary nodes per wide node; start at 8x and
    # verify-and-halve (padding waste just costs a few % of streaming).
    budget = CHUNK_WNODES * 8
    while True:
        chunks = _chunk_subtrees(skip, is_leaf, budget)
        collapsed = [
            _collapse_range(skip, is_leaf, leaf_start, leaf_count, s, e)
            for s, e in chunks
        ]
        if max(c[0].shape[0] for c in collapsed) <= CHUNK_WNODES:
            break
        budget //= 2
        if budget < 8:
            return None  # collapse ratio pathologically low
    C = len(chunks)
    if C > MAX_CHUNKS:
        return None
    # Checked invariant instead of a "log8 depth" comment (ADVICE r4): the
    # exact worst-case DFS stack requirement, per chunk, must fit SMEM.
    if max(_stack_need(ca, cb) for _, ca, cb in collapsed) >= STACK_CAP:
        return None
    Mc = max(c[0].shape[0] for c in collapsed)
    # The kernel's manual meta DMA is a flat dynamic slice of Mc*24 i32;
    # Mosaic requires slice offsets/lengths aligned to the (8, 128) = 1024-
    # element tiling, so Mc is ALWAYS rounded to a multiple of 128 (Mc*24 is
    # then a 3072-multiple) — including the single-chunk case (a C == 1
    # wine_glass-class mesh hit exactly this as a Mosaic compile error).
    # Padded nodes are unreachable (meta count=-1, inverted boxes).
    Mc = -(-Mc // 128) * 128

    wbounds = np.zeros((C, Mc, BRANCH, TRI_ROW), np.float32)
    # Empty/padded children: inverted boxes never pass the slab test.
    wbounds[:, :, :, 0:3] = _BIG
    wbounds[:, :, :, 3:6] = -_BIG
    wmeta = np.zeros((C, Mc, META_STRIDE), np.int32)
    wmeta[:, :, 1:16:2] = -1
    # Octant signs: bit0 = dx<0, bit1 = dy<0, bit2 = dz<0.
    signs = np.array(
        [[-1.0 if (o >> a) & 1 else 1.0 for a in range(3)] for o in range(8)]
    )  # (8 octants, 3)
    ranks = np.arange(BRANCH, dtype=np.int64)
    for ci, (bidx, ca, cb) in enumerate(collapsed):
        m = bidx.shape[0]
        valid = bidx >= 0
        bi = np.where(valid, bidx, 0)
        wbounds[ci, :m, :, 0:3] = np.where(
            valid[..., None], node_min[bi], _BIG
        )
        wbounds[ci, :m, :, 3:6] = np.where(
            valid[..., None], node_max[bi], -_BIG
        )
        wmeta[ci, :m, 0:16:2] = ca
        wmeta[ci, :m, 1:16:2] = cb
        # Near-to-far child order per direction octant: ascending centroid
        # projection onto the octant's sign vector (empty children last).
        cent = 0.5 * (node_min[bi] + node_max[bi])  # (m, 8, 3)
        keys = np.einsum("mcx,ox->moc", cent, signs)  # (m, 8oct, 8child)
        keys = np.where(valid[:, None, :], keys, np.inf)
        order = np.argsort(keys, axis=-1, kind="stable")  # (m, 8, 8)
        words = (order << (4 * ranks)[None, None, :]).sum(-1)
        wmeta[ci, :m, 16:24] = words.astype(np.int32)

    # Chunk-root AABBs (the BINARY chunk root's box) for the per-packet
    # visit-plan prepass + in-kernel re-test. Flat SMEM layout, 8 f32/chunk.
    roots = np.zeros((C, 8), np.float32)
    for ci, (s, _) in enumerate(chunks):
        roots[ci, 0:3] = node_min[s]
        roots[ci, 3:6] = node_max[s]

    tri = _swizzle_tris(bvh.verts)
    return Bvh8Pack(wbounds, wmeta.reshape(-1), tri, roots.reshape(-1), C)


def _chunk_visit_plan(roots, rays, t_min, use_tmax: bool):
    """XLA prepass: per-packet chunk culling + near-to-far ordering.

    roots (C*8,) f32 chunk-root AABBs; rays (G, 8, SUBS, 128) packed packets.
    Slab-tests every chunk root against every ray, reduces per packet, and
    returns (visit (G*C,) i32, cnt (G,) i32): visit[i*C:(i+1)*C] lists the
    chunk ids some ray of packet i can enter, sorted by the packet's minimum
    entry distance (the chunk-level analog of the reference's front-to-back
    recursion order, kdtree.rs:175-205); positions past cnt[i] repeat the
    last live id so the kernel's scalar-prefetched block index maps keep
    returning the same block and Mosaic skips the copy entirely.

    `use_tmax`: bound entries by ray row 7 (the occlusion kernels' per-lane
    max distance) so shadow packets cull chunks beyond their lights.
    """
    C = roots.shape[0] // 8
    rb = roots.reshape(C, 8)
    bmin = rb[:, 0:3]  # (C, 3)
    bmax = rb[:, 3:6]
    o = rays[:, 0:3]  # (G, 3, SUBS, L)
    d = rays[:, 3:6]
    act = rays[:, 6] > 0.5  # (G, SUBS, L)
    inv = 1.0 / jnp.where(
        jnp.abs(d) > 1e-20, d, jnp.where(d < 0.0, -1e-20, 1e-20)
    )
    lo = hi = None
    for a in range(3):
        oa = o[:, a][:, None]  # (G, 1, SUBS, L)
        ia = inv[:, a][:, None]
        t1 = (bmin[None, :, a, None, None] - oa) * ia  # (G, C, SUBS, L)
        t2 = (bmax[None, :, a, None, None] - oa) * ia
        lo_a = jnp.minimum(t1, t2)
        hi_a = jnp.maximum(t1, t2)
        lo = lo_a if lo is None else jnp.maximum(lo, lo_a)
        hi = hi_a if hi is None else jnp.minimum(hi, hi_a)
    ok = (lo <= hi) & (hi >= t_min) & act[:, None]
    if use_tmax:
        ok = ok & (lo <= rays[:, 7][:, None])
    # ONE masked min-reduce instead of any() + min(): hit iff some lane's
    # masked entry is finite (the same i1-reduce cost lesson as the
    # analytic any-hit, PERF_NOTES r5).
    key = jnp.min(jnp.where(ok, lo, jnp.inf), axis=(2, 3))  # (G, C)
    hit = jnp.isfinite(key)
    order = jnp.argsort(key, axis=1).astype(jnp.int32)  # (G, C), misses last
    cnt = jnp.sum(hit, axis=1).astype(jnp.int32)
    last = jnp.take_along_axis(order, jnp.maximum(cnt - 1, 0)[:, None], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    visit = jnp.where(cols < cnt[:, None], order, last)
    # (G, 1, 128) + (G, 1, 1): the kernel streams ONE packet's row per
    # grid step, so SMEM holds 128 entries, not G*C (a 4k-res megamesh's
    # full table would bust the ~1 MB budget). The row is lane-padded to
    # 128 (= MAX_CHUNKS) with repeats of the last live id because Mosaic
    # requires SMEM block lanes to equal the array's minor dimension.
    pad = 128 - C
    if pad:
        visit = jnp.concatenate(
            [visit, jnp.broadcast_to(last, (visit.shape[0], pad))], axis=1
        )
    return visit[:, None, :], cnt[:, None, None]


def _make_kernel8(occl: bool):
    """Build the closest-hit (occl=False) or any-hit (occl=True) kernel.

    One grid step = one whole PACKET (grid (G,)): the kernel loops over the
    packet's near-to-far visit list, double-buffering each live chunk's node
    tables into scratch via EXPLICIT DMA (meta -> SMEM, bounds -> VMEM).
    Mosaic's pipeline streaming was measured (round 5, tools/gridstep_probe)
    to copy every (packet, chunk) block even when the scalar-prefetched
    block index repeats — ~5.6 us per 4 MB bounds block on EVERY grid step,
    live or dead, i.e. G*C*Mc*4 KB of HBM traffic per traversal no matter
    how well chunks were culled. Manual DMA moves exactly the chunks the
    packet can enter; a prefetch-time root re-test against the running
    per-lane bound additionally skips the copy of chunks pruned by hits
    found in nearer chunks — the chunk-level analog of the reference's
    front-to-back early exit (kdtree.rs:151-223). While one chunk is
    walked, the next live chunk's tables are already in flight."""

    def kernel(vi_ref, vc_ref, roots_ref, tmin_ref, rays_ref, wm_ref, wb_ref,
               tri_ref, *out_and_scratch):
        if occl:
            (occ_ref, stack_ref, meta_s, bounds_s, tri_scratch, meta_sem,
             bounds_sem, dma_sem) = out_and_scratch
        else:
            (t_ref, id_ref, stack_ref, meta_s, bounds_s, tri_scratch,
             meta_sem, bounds_sem, dma_sem) = out_and_scratch
        r = rays_ref[0]  # (8, SUBS, 128)
        SUBS = r.shape[1]
        ox, oy, oz = r[0], r[1], r[2]
        dx, dy, dz = r[3], r[4], r[5]
        act = r[6] > 0.5
        t_max = r[7]  # occl only; zeros otherwise
        t_min = tmin_ref[0]

        def safe_inv(c):
            return 1.0 / jnp.where(
                jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20)
            )

        ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)
        pow2 = jnp.left_shift(
            jnp.int32(1), jax.lax.broadcasted_iota(jnp.int32, (BRANCH, 1), 0)
        )
        o3 = (ox, oy, oz)
        d3 = (dx, dy, dz)

        cnt = vc_ref[0, 0, 0]

        # Packet direction octant (majority vote), ONE extract per packet:
        # child visit order within every walked chunk is near-to-far along
        # it (the vector analog of kdtree.rs:175-205's ordered recursion).
        octv = (
            jnp.where(jnp.sum(dx, keepdims=True) < 0, 1, 0)
            + jnp.where(jnp.sum(dy, keepdims=True) < 0, 2, 0)
            + jnp.where(jnp.sum(dz, keepdims=True) < 0, 4, 0)
        )
        oct_ = octv[0, 0]

        def root_enter(cid, upper, activ):
            """ONE extract: can any live lane enter chunk cid's root within
            its CURRENT per-lane upper bound?"""
            r8 = cid * 8
            t1x = (roots_ref[r8 + 0] - ox) * ivx
            t2x = (roots_ref[r8 + 3] - ox) * ivx
            t1y = (roots_ref[r8 + 1] - oy) * ivy
            t2y = (roots_ref[r8 + 4] - oy) * ivy
            t1z = (roots_ref[r8 + 2] - oz) * ivz
            t2z = (roots_ref[r8 + 5] - oz) * ivz
            lo = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            hi = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            ok = (lo <= hi) & (hi >= t_min) & (lo <= upper) & activ
            anyv = jnp.max(
                jnp.max(jnp.where(ok, 1, 0), axis=1, keepdims=True),
                axis=0, keepdims=True,
            )
            return anyv[0, 0] == 1

        Mc24 = meta_s.shape[0] // 2

        def start_copies(cid, buf):
            # wmeta rides flat 1-D on BOTH sides: 2-D (C, Mc*24) / (2, Mc*24)
            # arrays are (8/2, 128)-tiled and Mosaic rejects dim-0 slices of
            # width 1; flat dynamic slices are lane-aligned because Mc*24 is
            # a multiple of 128 whenever C > 1 (whole-array when C == 1).
            pltpu.make_async_copy(
                wm_ref.at[pl.ds(cid * Mc24, Mc24)],
                meta_s.at[pl.ds(buf * Mc24, Mc24)],
                meta_sem.at[buf],
            ).start()
            pltpu.make_async_copy(
                wb_ref.at[cid], bounds_s.at[buf], bounds_sem.at[buf]
            ).start()

        def wait_copies(cid, buf):
            pltpu.make_async_copy(
                wm_ref.at[pl.ds(cid * Mc24, Mc24)],
                meta_s.at[pl.ds(buf * Mc24, Mc24)],
                meta_sem.at[buf],
            ).wait()
            pltpu.make_async_copy(
                wb_ref.at[cid], bounds_s.at[buf], bounds_sem.at[buf]
            ).wait()

        def test_pending(lbuf, start, count, acc):
            """Fold the pending leaf (resident in tri_scratch[lbuf]) into
            the running accumulator, one full-tile pass per ray subgroup.

            MEASURED AND REJECTED (r5, VERDICT r4 item 2): per-subgroup
            leaf skip masks. Bits 8-15 of the per-node extract carried
            "subgroup g hit some child" at zero extra syncs, and a lax.cond
            per subgroup here skipped idle subgroups' triangle passes —
            dragon871k REGRESSED 4.67 -> 3.18 Mrays/s: eight scalar-
            predicated branches per leaf serialize the vector pipeline for
            at most ~0.45 us of savings, so the unconditional full-tile
            passes below are the fast form on this hardware."""
            f = _leaf_rows(tri_scratch[lbuf])
            if occl:
                occ = acc[0]
                occ_rows = []
                for g in range(SUBS):
                    th = _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count)
                    hit_lane = jnp.any(
                        th <= t_max[g:g + 1], axis=0, keepdims=True
                    )
                    occ_rows.append(jnp.where(hit_lane, 1.0, occ[g:g + 1]))
                occ = occ_rows[0] if SUBS == 1 else jnp.concatenate(
                    occ_rows, axis=0)
                # One reduce per LEAF (not per node): the while cond stays
                # scalar-only, exiting once every live lane is occluded.
                alive = jnp.any(act & (occ < 0.5))
                return occ, alive
            t_best, best_id = acc
            t_rows, id_rows = [], []
            for g in range(SUBS):
                th = _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count)
                t_leaf = jnp.min(th, axis=0, keepdims=True)
                k_best = jnp.min(
                    jnp.where(th == t_leaf, row_k, KMAX), axis=0,
                    keepdims=True,
                )
                tb = t_best[g:g + 1]
                better = t_leaf < tb
                id_rows.append(
                    jnp.where(better, start + k_best, best_id[g:g + 1]))
                t_rows.append(jnp.minimum(tb, t_leaf))
            cat = (lambda xs: xs[0]) if SUBS == 1 else (
                lambda xs: jnp.concatenate(xs, axis=0))
            return cat(t_rows), cat(id_rows)

        def walk_chunk(buf, acc):
            """Stack walk of the chunk resident in scratch half `buf`.

            Per opened wide node: one (8, 128) VMEM bounds read, SUBS
            full-tile slab passes, ONE vector->scalar mask extract, then
            pure scalar child dispatch (stack pushes + leaf DMA pipeline).
            """
            mbase = buf * Mc24  # this chunk's table within the flat scratch

            def cond(state):
                return state[0] > 0

            def body(state):
                sp, acc, p_start, p_count, lcur = state
                sp = sp - 1
                w = stack_ref[sp]
                b = bounds_s[buf, w]  # (8, 128): child c's bounds, lanes 0-5
                bmnx, bmny, bmnz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
                bmxx, bmxy, bmxz = b[:, 3:4], b[:, 4:5], b[:, 5:6]

                if occl:
                    occ = acc[0]
                    upper = lambda g: t_max[g:g + 1]
                    extra = lambda g: act[g:g + 1] & (occ[g:g + 1] < 0.5)
                else:
                    t_best = acc[0]
                    upper = lambda g: t_best[g:g + 1]
                    extra = lambda g: act[g:g + 1]

                hitc = None
                for g in range(SUBS):
                    oxg, oyg, ozg = ox[g:g + 1], oy[g:g + 1], oz[g:g + 1]
                    ivxg, ivyg, ivzg = (ivx[g:g + 1], ivy[g:g + 1],
                                        ivz[g:g + 1])
                    t1x = (bmnx - oxg) * ivxg  # (8, 128)
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
                    bh = ((lo <= hi) & (hi >= t_min) & (lo <= upper(g))
                          & extra(g))
                    hg = jnp.any(bh, axis=1, keepdims=True)  # (8, 1)
                    hitc = hg if hitc is None else (hitc | hg)
                maskv = jnp.sum(
                    jnp.where(hitc, pow2, 0), axis=0, keepdims=True
                )
                mask = maskv[0, 0]  # THE one sync for this node

                ms = mbase + w * META_STRIDE
                pw = meta_s[ms + 16 + oct_]  # octant child ranks
                # Pass 1: push hit INTERNAL children far-first, so the LIFO
                # stack pops them near-first.
                for k in range(BRANCH - 1, -1, -1):
                    ck = jax.lax.shift_right_logical(pw, 4 * k) & 7
                    hit_c = (jax.lax.shift_right_logical(mask, ck) & 1) == 1
                    a = meta_s[ms + 2 * ck]
                    cntc = meta_s[ms + 2 * ck + 1]
                    push = hit_c & (cntc == 0)

                    @pl.when(push)
                    def _(a=a, sp=sp):
                        stack_ref[sp] = a

                    sp = sp + push.astype(jnp.int32)

                # Pass 2: hit LEAF children near-first through the
                # double-buffered pending pipeline (earlier bound tightening
                # prunes later leaves).
                for k in range(BRANCH):
                    ck = jax.lax.shift_right_logical(pw, 4 * k) & 7
                    hit_c = (jax.lax.shift_right_logical(mask, ck) & 1) == 1
                    a = meta_s[ms + 2 * ck]
                    cntc = meta_s[ms + 2 * ck + 1]
                    leafc = hit_c & (cntc > 0)

                    @pl.when(leafc)
                    def _(a=a, lcur=lcur):
                        pltpu.make_async_copy(
                            tri_ref.at[a // KMAX], tri_scratch.at[1 - lcur],
                            dma_sem.at[1 - lcur],
                        ).start()

                    def flush(args, p_start=p_start, p_count=p_count,
                              lcur=lcur):
                        pltpu.make_async_copy(
                            tri_ref.at[p_start // KMAX], tri_scratch.at[lcur],
                            dma_sem.at[lcur],
                        ).wait()
                        return test_pending(lcur, p_start, p_count, args)

                    acc = jax.lax.cond(
                        leafc & (p_count > 0), flush, lambda x: x, acc
                    )
                    p_start = jnp.where(leafc, a, p_start)
                    p_count = jnp.where(leafc, cntc, p_count)
                    lcur = jnp.where(leafc, 1 - lcur, lcur)
                if occl:
                    # Early exit once every live lane is occluded.
                    sp = jnp.where(acc[1], sp, 0)
                return sp, acc, p_start, p_count, lcur

            stack_ref[0] = jnp.int32(0)
            init = (jnp.int32(1), acc, jnp.int32(0), jnp.int32(0),
                    jnp.int32(0))
            _, acc, p_start, p_count, lcur = jax.lax.while_loop(
                cond, body, init
            )

            def drain(args):
                pltpu.make_async_copy(
                    tri_ref.at[p_start // KMAX], tri_scratch.at[lcur],
                    dma_sem.at[lcur],
                ).wait()
                return test_pending(lcur, p_start, p_count, args)

            return jax.lax.cond(p_count > 0, drain, lambda a: a, acc)

        # ---- outer loop over the packet's visit list -----------------------
        @pl.when(cnt > 0)
        def _():
            start_copies(vi_ref[0, 0, 0], 0)

        if occl:
            acc0 = (jnp.zeros((SUBS, LANES), jnp.float32), jnp.bool_(True))
        else:
            acc0 = (jnp.full((SUBS, LANES), _BIG, jnp.float32),
                    jnp.zeros((SUBS, LANES), jnp.int32))

        def outer_cond(st):
            return st[0] < cnt

        def outer_body(st):
            s, pend, acc = st
            buf = s & 1
            cid = vi_ref[0, 0, s]

            # Prefetch slot s+1, skipping its COPY when the running bound
            # already prunes its root (t_best tightens monotonically, so a
            # prune decision here stays valid at use time).
            if occl:
                upper = t_max
                activ = act & (acc[0] < 0.5)
                pf_gate = (s + 1 < cnt) & acc[1]
            else:
                upper = acc[0]
                activ = act
                pf_gate = s + 1 < cnt

            def pf(_):
                cid1 = vi_ref[0, 0, s + 1]
                h = root_enter(cid1, upper, activ)

                @pl.when(h)
                def _():
                    start_copies(cid1, 1 - buf)

                return h

            pend_nxt = jax.lax.cond(pf_gate, pf, lambda _: jnp.bool_(False), 0)

            # Consume the current slot: wait its copies (sem accounting must
            # balance even if the walk is skipped), then walk.
            def consume(acc):
                wait_copies(cid, buf)
                if occl:
                    return jax.lax.cond(
                        acc[1], lambda a: walk_chunk(buf, a), lambda a: a, acc
                    )
                return walk_chunk(buf, acc)

            acc = jax.lax.cond(pend, consume, lambda a: a, acc)
            return s + 1, pend_nxt, acc

        _, _, acc = jax.lax.while_loop(
            outer_cond, outer_body, (jnp.int32(0), cnt > 0, acc0)
        )

        if occl:
            occ_ref[0] = acc[0]
        else:
            t_ref[0] = acc[0]
            id_ref[0] = acc[1]

    return kernel


_KERNEL8 = _make_kernel8(occl=False)
_KERNEL8_OCCL = _make_kernel8(occl=True)


def _specs8(Mc, SUBS, n_out):
    in_specs = [
        pl.BlockSpec(
            (1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        ),  # this packet's visit row (lane-padded to 128 = MAX_CHUNKS)
        pl.BlockSpec(
            (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        ),  # this packet's live-chunk count
        pl.BlockSpec(memory_space=pltpu.SMEM),  # chunk-root AABBs (C*8,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
        pl.BlockSpec(
            (1, 8, SUBS, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),  # rays
        pl.BlockSpec(memory_space=pl.ANY),  # wmeta (C*Mc*24,) i32 flat, HBM
        pl.BlockSpec(memory_space=pl.ANY),  # wbounds (C, Mc, 8, 128), HBM
        pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L, 8, 128), HBM
    ]
    scratch = [
        pltpu.SMEM((STACK_CAP,), jnp.int32),  # scalar traversal stack
        pltpu.SMEM((2 * Mc * META_STRIDE,), jnp.int32),  # chunk meta x2, flat
        pltpu.VMEM((2, Mc, BRANCH, TRI_ROW), jnp.float32),  # chunk bounds x2
        pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),  # double-buffered leaf
        pltpu.SemaphoreType.DMA((2,)),  # meta copies
        pltpu.SemaphoreType.DMA((2,)),  # bounds copies
        pltpu.SemaphoreType.DMA((2,)),  # leaf copies
    ]
    out_spec = pl.BlockSpec(
        (1, SUBS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return in_specs, scratch, [out_spec] * n_out


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks"))
def _traverse8(wbounds, wmeta, tri_pack, roots, rays, t_min, *, n_chunks,
               interpret=False):
    G, _, SUBS, _ = rays.shape
    Mc = wbounds.shape[1]
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    visit, cnt = _chunk_visit_plan(roots, rays, t_min, use_tmax=False)
    in_specs, scratch, out_specs = _specs8(Mc, SUBS, 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G,),
        in_specs=in_specs,
        scratch_shapes=scratch,
        out_specs=out_specs,
    )
    t_out, id_out = pl.pallas_call(
        _KERNEL8,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(visit, cnt, roots, t_min_arr, rays, wmeta, wbounds, tri_pack)
    return t_out, id_out


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks"))
def _traverse8_occl(wbounds, wmeta, tri_pack, roots, rays, t_min, *,
                    n_chunks, interpret=False):
    G, _, SUBS, _ = rays.shape
    Mc = wbounds.shape[1]
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    visit, cnt = _chunk_visit_plan(roots, rays, t_min, use_tmax=True)
    in_specs, scratch, out_specs = _specs8(Mc, SUBS, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G,),
        in_specs=in_specs,
        scratch_shapes=scratch,
        out_specs=out_specs,
    )
    (occ_out,) = pl.pallas_call(
        _KERNEL8_OCCL,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32)],
        interpret=interpret,
    )(visit, cnt, roots, t_min_arr, rays, wmeta, wbounds, tri_pack)
    return occ_out


def bvh8_closest_hit_pallas(
    bvh: BvhData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    active=None,
    packed: Bvh8Pack = None,
    interpret: bool = False,
    subs: int | None = None,
) -> Hit:
    """Closest hit via the wide-BVH packet kernel (same Hit contract as
    bvh_closest_hit: t=inf on miss, smooth world normal, material id)."""
    if packed is None:
        packed = pack_bvh8_for_pallas(bvh)
    wbounds = jnp.asarray(packed.wbounds)
    wmeta = jnp.asarray(packed.wmeta)
    tri_pack = jnp.asarray(packed.tri)
    roots = jnp.asarray(packed.roots)
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)

    N = o.shape[0]
    rays = _pack_rays(o, d, jnp.zeros((N,), jnp.float32), active,
                      subs or DEFAULT_SUBS)
    t_out, id_out = _traverse8(
        wbounds, wmeta, tri_pack, roots, rays, jnp.asarray(t_min),
        n_chunks=packed.n_chunks, interpret=interpret,
    )
    t_best = t_out.reshape(-1)[:N].astype(o.dtype)
    best_tri = id_out.reshape(-1)[:N]
    t_best = jnp.where(t_best >= 1.0e38, INF, t_best)
    if active is not None:
        t_best = jnp.where(active, t_best, INF)
    best_tri = jnp.clip(best_tri, 0, bvh.num_tris - 1)
    return finalize_hit(bvh, o, d, t_min, t_best, best_tri)


def bvh8_occluded_pallas(
    bvh: BvhData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max: jnp.ndarray,
    active=None,
    packed: Bvh8Pack = None,
    interpret: bool = False,
    subs: int | None = None,
) -> jnp.ndarray:
    """Any-hit shadow query via the wide-BVH kernel; boolean-equal to
    `bvh_closest_hit(...).t <= t_max`."""
    if packed is None:
        packed = pack_bvh8_for_pallas(bvh)
    wbounds = jnp.asarray(packed.wbounds)
    wmeta = jnp.asarray(packed.wmeta)
    tri_pack = jnp.asarray(packed.tri)
    roots = jnp.asarray(packed.roots)

    N = o.shape[0]
    tmax32 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    rays = _pack_rays(o, d, tmax32, active, subs or DEFAULT_SUBS)
    occ_out = _traverse8_occl(
        wbounds, wmeta, tri_pack, roots, rays, jnp.asarray(t_min),
        n_chunks=packed.n_chunks, interpret=interpret,
    )
    occ = occ_out.reshape(-1)[:N] > 0.5
    if active is not None:
        occ = occ & active
    return occ

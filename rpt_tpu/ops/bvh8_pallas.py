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
  binary descendants (largest-subtree-first expansion), so one wide node
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
  collapsed into an independent wide tree, whose (Mc, 8, 128) bounds block
  streams through VMEM per grid step while the packet's running best
  carries across chunks.

Result contract is identical to bvh_closest_hit / bvh_occluded_pallas.
"""

from __future__ import annotations

import functools

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

BRANCH = 8  # children per wide node == sublanes
# Wide nodes per chunk: the chunk's bounds block is Mc * 4 KB of VMEM and
# Mosaic double-buffers streamed blocks, so 1024 nodes => 8 MB of VMEM. One
# wide node absorbs ~7 binary internal nodes with the smallest-first
# collapse, so 1024 wide nodes ~ an 8000-binary-node subtree; the 131k-tri
# dragon fits in 4 chunks.
CHUNK_WNODES = 1024
MAX_CHUNKS = 64
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

    def __init__(self, wbounds, wmeta, tri, n_chunks: int):
        self.wbounds = wbounds  # (C, Mc, 8, 128) f32
        self.wmeta = wmeta  # (C*Mc*16,) i32
        self.tri = tri  # (L, 8, 128) f32
        self.n_chunks = int(n_chunks)

    def tree_flatten(self):
        return (self.wbounds, self.wmeta, self.tri), self.n_chunks

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


def pack_bvh8_for_pallas(bvh: BvhData) -> Bvh8Pack:
    """Host-side collapse + swizzle of a built binary BVH into the wide
    kernel's memory layout (see module doc)."""
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
        assert budget >= 8, "collapse ratio pathologically low"
    C = len(chunks)
    assert C <= MAX_CHUNKS, f"{C} chunks exceed MAX_CHUNKS={MAX_CHUNKS}"
    Mc = max(c[0].shape[0] for c in collapsed)
    if C > 1:
        # Mosaic rank-1 SMEM blocks must be whole-array or a multiple of the
        # tiling (observed 1024 elements on v5e, cf. bvh_pallas): Mc*24 a
        # multiple of 1024 => Mc a multiple of 128. Padded nodes are
        # unreachable (meta count=-1, inverted boxes).
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

    tri = _swizzle_tris(bvh.verts)
    return Bvh8Pack(wbounds, wmeta.reshape(-1), tri, C)


def _kernel8(wm_ref, wb_ref, tmin_ref, rays_ref, tri_ref, t_ref, id_ref,
             stack_ref, tri_scratch, dma_sem):
    """One (packet, chunk) grid step: SUBS*128 rays vs. one wide-tree chunk.

    Per opened wide node: one (8, 128) VMEM bounds read, SUBS full-tile slab
    passes (8 children x 128 rays each), ONE vector->scalar mask extract,
    then pure scalar child dispatch (stack pushes + leaf DMA pipeline)."""
    r = rays_ref[0]  # (8, SUBS, 128)
    SUBS = r.shape[1]
    ox, oy, oz = r[0], r[1], r[2]
    dx, dy, dz = r[3], r[4], r[5]
    act = r[6] > 0.5
    t_min = tmin_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        t_ref[0] = jnp.full((SUBS, LANES), _BIG, jnp.float32)
        id_ref[0] = jnp.zeros((SUBS, LANES), jnp.int32)

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

    def test_pending(buf, start, count, t_best, best_id):
        f = _leaf_rows(tri_scratch[buf])
        t_rows, id_rows = [], []
        for g in range(SUBS):
            th = _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count)
            t_leaf = jnp.min(th, axis=0, keepdims=True)
            k_best = jnp.min(
                jnp.where(th == t_leaf, row_k, KMAX), axis=0, keepdims=True
            )
            tb = t_best[g:g + 1]
            better = t_leaf < tb
            id_rows.append(jnp.where(better, start + k_best, best_id[g:g + 1]))
            t_rows.append(jnp.minimum(tb, t_leaf))
        t_best = t_rows[0] if SUBS == 1 else jnp.concatenate(t_rows, axis=0)
        best_id = id_rows[0] if SUBS == 1 else jnp.concatenate(id_rows, axis=0)
        return t_best, best_id

    # Packet direction octant (majority vote), ONE extract per packet: child
    # visit order is near-to-far along it (the vector analog of the
    # reference's ordered recursion at kdtree.rs:175-205).
    octv = (
        jnp.where(jnp.sum(dx, keepdims=True) < 0, 1, 0)
        + jnp.where(jnp.sum(dy, keepdims=True) < 0, 2, 0)
        + jnp.where(jnp.sum(dz, keepdims=True) < 0, 4, 0)
    )
    oct_ = octv[0, 0]

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, t_best, best_id, p_start, p_count, cur = state
        sp = sp - 1
        w = stack_ref[sp]
        b = wb_ref[0, w]  # (8, 128): child c's bounds in lanes 0..5
        bmnx, bmny, bmnz = b[:, 0:1], b[:, 1:2], b[:, 2:3]  # (8,1)
        bmxx, bmxy, bmxz = b[:, 3:4], b[:, 4:5], b[:, 5:6]

        hitc = None
        for g in range(SUBS):
            oxg, oyg, ozg = ox[g:g + 1], oy[g:g + 1], oz[g:g + 1]  # (1,128)
            ivxg, ivyg, ivzg = ivx[g:g + 1], ivy[g:g + 1], ivz[g:g + 1]
            t1x = (bmnx - oxg) * ivxg  # (8,128)
            t2x = (bmxx - oxg) * ivxg
            t1y = (bmny - oyg) * ivyg
            t2y = (bmxy - oyg) * ivyg
            t1z = (bmnz - ozg) * ivzg
            t2z = (bmxz - ozg) * ivzg
            lo = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            hi = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            bh = (
                (lo <= hi)
                & (hi >= t_min)
                & (lo <= t_best[g:g + 1])
                & act[g:g + 1]
            )
            hg = jnp.any(bh, axis=1, keepdims=True)  # (8,1) per-child
            hitc = hg if hitc is None else (hitc | hg)
        maskv = jnp.sum(
            jnp.where(hitc, pow2, 0), axis=0, keepdims=True
        )  # (1,1) int32
        mask = maskv[0, 0]  # THE one vector->scalar sync for this node

        ms = w * META_STRIDE
        pw = wm_ref[ms + 16 + oct_]  # this octant's near-to-far child ranks
        # Pass 1: push hit INTERNAL children far-first, so the LIFO stack
        # pops them near-first.
        for k in range(BRANCH - 1, -1, -1):
            ck = jax.lax.shift_right_logical(pw, 4 * k) & 7
            hit_c = (jax.lax.shift_right_logical(mask, ck) & 1) == 1
            a = wm_ref[ms + 2 * ck]
            cntc = wm_ref[ms + 2 * ck + 1]
            push = hit_c & (cntc == 0)

            @pl.when(push)
            def _(a=a, sp=sp):
                stack_ref[sp] = a

            sp = sp + push.astype(jnp.int32)

        # Pass 2: hit LEAF children near-first through the double-buffered
        # pending pipeline (earlier t_best tightening prunes later leaves).
        for k in range(BRANCH):
            ck = jax.lax.shift_right_logical(pw, 4 * k) & 7
            hit_c = (jax.lax.shift_right_logical(mask, ck) & 1) == 1
            a = wm_ref[ms + 2 * ck]
            cntc = wm_ref[ms + 2 * ck + 1]
            leafc = hit_c & (cntc > 0)

            @pl.when(leafc)
            def _(a=a, cur=cur):
                pltpu.make_async_copy(
                    tri_ref.at[a // KMAX], tri_scratch.at[1 - cur],
                    dma_sem.at[1 - cur],
                ).start()

            def flush(args, p_start=p_start, p_count=p_count, cur=cur):
                t_best, best_id = args
                pltpu.make_async_copy(
                    tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                    dma_sem.at[cur],
                ).wait()
                return test_pending(cur, p_start, p_count, t_best, best_id)

            t_best, best_id = jax.lax.cond(
                leafc & (p_count > 0), flush, lambda x: x, (t_best, best_id)
            )
            p_start = jnp.where(leafc, a, p_start)
            p_count = jnp.where(leafc, cntc, p_count)
            cur = jnp.where(leafc, 1 - cur, cur)
        return sp, t_best, best_id, p_start, p_count, cur

    stack_ref[0] = jnp.int32(0)
    init = (jnp.int32(1), t_ref[0], id_ref[0], jnp.int32(0), jnp.int32(0),
            jnp.int32(0))
    _, t_best, best_id, p_start, p_count, cur = jax.lax.while_loop(
        cond, body, init
    )

    def drain(args):
        t_best, best_id = args
        pltpu.make_async_copy(
            tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
        ).wait()
        return test_pending(cur, p_start, p_count, t_best, best_id)

    t_best, best_id = jax.lax.cond(
        p_count > 0, drain, lambda x: x, (t_best, best_id)
    )
    t_ref[0] = t_best
    id_ref[0] = best_id


def _kernel8_occl(wm_ref, wb_ref, tmin_ref, rays_ref, tri_ref, occ_ref,
                  stack_ref, tri_scratch, dma_sem):
    """Any-hit variant: ray row 7 carries the per-lane max distance, an
    occluded lane stops opening boxes, the walk exits once every live lane
    is occluded (liveness re-reduced once per LEAF test, as in the binary
    kernel, so the while cond stays scalar-only)."""
    r = rays_ref[0]
    SUBS = r.shape[1]
    ox, oy, oz = r[0], r[1], r[2]
    dx, dy, dz = r[3], r[4], r[5]
    act = r[6] > 0.5
    t_max = r[7]
    t_min = tmin_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        occ_ref[0] = jnp.zeros((SUBS, LANES), jnp.float32)

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

    def test_pending(buf, count, occ):
        f = _leaf_rows(tri_scratch[buf])
        occ_rows = []
        for g in range(SUBS):
            th = _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count)
            hit_lane = jnp.any(th <= t_max[g:g + 1], axis=0, keepdims=True)
            occ_rows.append(jnp.where(hit_lane, 1.0, occ[g:g + 1]))
        occ = occ_rows[0] if SUBS == 1 else jnp.concatenate(occ_rows, axis=0)
        alive = jnp.any(act & (occ < 0.5))
        return occ, alive

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, occ, alive, p_start, p_count, cur = state
        sp = sp - 1
        w = stack_ref[sp]
        b = wb_ref[0, w]
        bmnx, bmny, bmnz = b[:, 0:1], b[:, 1:2], b[:, 2:3]
        bmxx, bmxy, bmxz = b[:, 3:4], b[:, 4:5], b[:, 5:6]

        hitc = None
        for g in range(SUBS):
            oxg, oyg, ozg = ox[g:g + 1], oy[g:g + 1], oz[g:g + 1]
            ivxg, ivyg, ivzg = ivx[g:g + 1], ivy[g:g + 1], ivz[g:g + 1]
            t1x = (bmnx - oxg) * ivxg
            t2x = (bmxx - oxg) * ivxg
            t1y = (bmny - oyg) * ivyg
            t2y = (bmxy - oyg) * ivyg
            t1z = (bmnz - ozg) * ivzg
            t2z = (bmxz - ozg) * ivzg
            lo = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            hi = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            bh = (
                (lo <= hi)
                & (hi >= t_min)
                & (lo <= t_max[g:g + 1])
                & act[g:g + 1]
                & (occ[g:g + 1] < 0.5)
            )
            hg = jnp.any(bh, axis=1, keepdims=True)
            hitc = hg if hitc is None else (hitc | hg)
        maskv = jnp.sum(jnp.where(hitc, pow2, 0), axis=0, keepdims=True)
        mask = maskv[0, 0]

        ms = w * META_STRIDE
        for c in range(BRANCH):
            hit_c = ((jax.lax.shift_right_logical(mask, c) & 1) == 1) & alive
            a = wm_ref[ms + 2 * c]
            cntc = wm_ref[ms + 2 * c + 1]
            push = hit_c & (cntc == 0)
            leafc = hit_c & (cntc > 0)

            @pl.when(push)
            def _(a=a, sp=sp):
                stack_ref[sp] = a

            sp = sp + push.astype(jnp.int32)

            @pl.when(leafc)
            def _(a=a, cur=cur):
                pltpu.make_async_copy(
                    tri_ref.at[a // KMAX], tri_scratch.at[1 - cur],
                    dma_sem.at[1 - cur],
                ).start()

            def flush(args, p_start=p_start, p_count=p_count, cur=cur):
                occ, _ = args
                pltpu.make_async_copy(
                    tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                    dma_sem.at[cur],
                ).wait()
                return test_pending(cur, p_count, occ)

            occ, alive = jax.lax.cond(
                leafc & (p_count > 0), flush, lambda x: x, (occ, alive)
            )
            p_start = jnp.where(leafc, a, p_start)
            p_count = jnp.where(leafc, cntc, p_count)
            cur = jnp.where(leafc, 1 - cur, cur)
        # Early exit once every live lane is occluded.
        sp = jnp.where(alive, sp, 0)
        return sp, occ, alive, p_start, p_count, cur

    stack_ref[0] = jnp.int32(0)
    occ0 = occ_ref[0]
    alive0 = jnp.any(act & (occ0 < 0.5))
    init = (jnp.where(alive0, 1, 0).astype(jnp.int32), occ0, alive0,
            jnp.int32(0), jnp.int32(0), jnp.int32(0))
    _, occ, _, p_start, p_count, cur = jax.lax.while_loop(cond, body, init)

    def drain(args):
        occ, _ = args
        pltpu.make_async_copy(
            tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
        ).wait()
        return test_pending(cur, p_count, occ)

    occ, _ = jax.lax.cond(
        p_count > 0, drain, lambda x: x, (occ, jnp.bool_(True))
    )
    occ_ref[0] = occ


def _specs(Mc, Mc16, SUBS):
    in_specs = [
        pl.BlockSpec((Mc16,), lambda i, c: (c,), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, Mc, BRANCH, TRI_ROW), lambda i, c: (c, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),  # wide-node bounds: one chunk's block streams through VMEM
        pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
        pl.BlockSpec(
            (1, 8, SUBS, LANES), lambda i, c: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),  # rays
        pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
    ]
    scratch = [
        pltpu.SMEM((STACK_CAP,), jnp.int32),  # scalar traversal stack
        pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),  # double-buffered leaf
        pltpu.SemaphoreType.DMA((2,)),
    ]
    out_spec = pl.BlockSpec(
        (1, SUBS, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return in_specs, scratch, out_spec


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks"))
def _traverse8(wbounds, wmeta, tri_pack, rays, t_min, *, n_chunks,
               interpret=False):
    G, _, SUBS, _ = rays.shape
    C, Mc = wbounds.shape[0], wbounds.shape[1]
    Mc16 = wmeta.shape[0] // n_chunks
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    in_specs, scratch, out_spec = _specs(Mc, Mc16, SUBS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G, n_chunks),
        in_specs=in_specs,
        scratch_shapes=scratch,
        out_specs=[out_spec, out_spec],
    )
    t_out, id_out = pl.pallas_call(
        _kernel8,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(wmeta, wbounds, t_min_arr, rays, tri_pack)
    return t_out, id_out


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks"))
def _traverse8_occl(wbounds, wmeta, tri_pack, rays, t_min, *, n_chunks,
                    interpret=False):
    G, _, SUBS, _ = rays.shape
    C, Mc = wbounds.shape[0], wbounds.shape[1]
    Mc16 = wmeta.shape[0] // n_chunks
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    in_specs, scratch, out_spec = _specs(Mc, Mc16, SUBS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G, n_chunks),
        in_specs=in_specs,
        scratch_shapes=scratch,
        out_specs=[out_spec],
    )
    (occ_out,) = pl.pallas_call(
        _kernel8_occl,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32)],
        interpret=interpret,
    )(wmeta, wbounds, t_min_arr, rays, tri_pack)
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
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)

    N = o.shape[0]
    rays = _pack_rays(o, d, jnp.zeros((N,), jnp.float32), active,
                      subs or DEFAULT_SUBS)
    t_out, id_out = _traverse8(
        wbounds, wmeta, tri_pack, rays, jnp.asarray(t_min),
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

    N = o.shape[0]
    tmax32 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    rays = _pack_rays(o, d, tmax32, active, subs or DEFAULT_SUBS)
    occ_out = _traverse8_occl(
        wbounds, wmeta, tri_pack, rays, jnp.asarray(t_min),
        n_chunks=packed.n_chunks, interpret=interpret,
    )
    occ = occ_out.reshape(-1)[:N] > 0.5
    if active is not None:
        occ = occ & active
    return occ

"""Pallas TPU kernel: packet BVH traversal + batch triangle intersection.

This is the TPU-native replacement for the reference's hottest code — the
recursive kd-tree walk at /root/reference/src/kdtree.rs:151-223 feeding the
per-triangle test at /root/reference/src/shape/mesh.rs:49-82. A scalar CPU
chases one pointer per ray; a TPU has no per-lane gather, so per-ray pointer
chasing (the pure-XLA fallback in rpt_tpu/ops/bvh.py) pays an HBM gather per
ray per node. Here we traverse in *packets*:

- 128 rays ride the 128 VPU lanes; ONE scalar node pointer per packet walks
  the skip-link preorder in a `lax.while_loop` on the scalar core.
- The packet descends into a node iff ANY live lane's slab test passes
  (per-lane running-best prune `lo <= t_best` included) — the classic packet
  traversal, and the vector analog of the reference's early-exit recursion.
- Node bounds and skip/leaf metadata live in SMEM (scalar-indexed loads are
  the scalar core's bread and butter); triangles live in HBM, PRE-SWIZZLED
  host-side into 128-float rows [v0, e1, e2, pn, pn.v0, d00, d01, d11,
  inv_denom, pad...] so one leaf = one dense (8, 128) DMA.
- A leaf is tested as triangles-on-sublanes x rays-on-lanes: one (8, 128)
  elementwise pipeline intersects 8 triangles against 128 rays per VPU op,
  then a cross-sublane min picks each lane's best. This is the same plane +
  barycentric formulation as `_tri_hit_t`, so hits agree with the XLA path
  bit-for-bit (up to fused-op rounding).

Large meshes (dragon-class, /root/reference/examples/dragon.rs:11-22 —
871k triangles) exceed the ~1 MB SMEM budget for node metadata. Rather than
falling back to the gather-bound XLA path, the BVH is PARTITIONED host-side
into maximal subtrees of <= CHUNK_NODES nodes (each a self-contained
contiguous preorder slice with internal skip links) and the kernel runs on a
(packets, chunks) grid with the chunk axis innermost: Pallas streams each
chunk's node arrays through SMEM while the packet's output block stays
resident in VMEM, and the running-best hit carries ACROSS chunks, so chunk
k+1 is pruned by everything chunks 0..k already found. A one-chunk mesh
compiles to exactly the old single-SMEM-load kernel.

The kernel returns only (t_best, triangle id); the smooth-normal
reconstruction is shared with the XLA path (`bvh.finalize_hit`).
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

__all__ = [
    "bvh_closest_hit_pallas",
    "bvh_occluded_pallas",
    "pack_bvh_for_pallas",
    "pallas_eligible",
    "PallasPack",
]

LANES = 128  # rays per packet
KMAX = 8  # triangles per leaf (= bvh.LEAF_SIZE)
TRI_ROW = 128  # lanes per triangle row (DMA slices must be 128-aligned)
_BIG = 3.0e38  # in-kernel miss sentinel (avoid inf arithmetic)

# SMEM budget per chunk: node metadata lives in SMEM as FLAT 1-D arrays (2-D
# SMEM windows are lane-padded to 128, blowing a (M,4) i32 array up 32x past
# the ~1 MB SMEM budget); 48 B/node flat, and Pallas DOUBLE-BUFFERS streamed
# blocks (chunk k+1 prefetches while k runs), so the real cost is 96 B/node:
# 9k nodes/chunk = 864 KB of the 1 MB SMEM. Meshes with more nodes are split
# into subtree chunks streamed through SMEM (see module doc).
# Triangles stay in HBM — each visited leaf's 8-row block is DMA'd into a
# 4 KB VMEM scratch on demand — but their packed rows cost 512 B/tri of HBM,
# so MAX_TRIS caps the total at ~1 GB.
CHUNK_NODES = 9_000
MAX_CHUNKS = 64
MAX_TRIS = 2_000_000


@jax.tree_util.register_pytree_node_class
class PallasPack:
    """Kernel-layout arrays + STATIC chunk count. The chunk count is pytree
    aux data so SceneData.to_device()'s tree_map can't turn it into a tracer
    (it parameterizes the pallas grid, which must be static)."""

    def __init__(self, bounds, meta, tri, n_chunks: int):
        self.bounds = bounds
        self.meta = meta
        self.tri = tri
        self.n_chunks = int(n_chunks)

    def tree_flatten(self):
        return (self.bounds, self.meta, self.tri), self.n_chunks

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, aux)


def pallas_eligible(bvh: BvhData) -> bool:
    return (
        bvh.num_tris <= MAX_TRIS
        and bvh.num_nodes <= CHUNK_NODES * MAX_CHUNKS
    )


def _chunk_subtrees(skip: np.ndarray, is_leaf: np.ndarray, budget: int):
    """Partition a skip-link preorder BVH into maximal subtrees of <= budget
    nodes. Returns a list of (start, end) preorder ranges covering every leaf
    exactly once. A preorder subtree [s, e) is self-contained: every internal
    skip points inside (s, e]."""
    out = []
    stack = [0]
    M = skip.shape[0]
    while stack:
        n = stack.pop()
        e = int(skip[n])
        if e - n <= budget:
            out.append((n, e))
            continue
        assert not is_leaf[n], "leaf larger than chunk budget"
        left = n + 1
        right = int(skip[left])
        stack.append(right)  # preorder: left chunk first
        stack.append(left)
    out.sort()
    # Ranges are disjoint but NOT contiguous: each split's internal node
    # belongs to no chunk (its box test is re-done by both children's chunk
    # roots). Every leaf is covered exactly once.
    assert out and all(out[i][1] <= out[i + 1][0] for i in range(len(out) - 1))
    return out


def _swizzle_tris(verts: np.ndarray) -> np.ndarray:
    """(T, 3, 3) leaf-contiguous triangles -> (T//8, 8, 128) packed rows."""
    v = np.asarray(verts, np.float64)
    T = v.shape[0]
    v0, v1, v2 = v[:, 0], v[:, 1], v[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    pn = np.cross(e1, e2)
    nrm = np.linalg.norm(pn, axis=-1, keepdims=True)
    pn = pn / np.where(nrm > 1e-30, nrm, 1.0)
    d00 = np.einsum("ij,ij->i", e1, e1)
    d01 = np.einsum("ij,ij->i", e1, e2)
    d11 = np.einsum("ij,ij->i", e2, e2)
    denom = d00 * d11 - d01 * d01
    inv_denom = 1.0 / np.where(np.abs(denom) > 1e-20, denom, 1e-20)
    pv = np.einsum("ij,ij->i", pn, v0)

    assert T % KMAX == 0, "build_bvh must emit 8-aligned leaves"
    rows = np.zeros((T, TRI_ROW), np.float32)
    rows[:, 0:3] = v0
    rows[:, 3:6] = e1
    rows[:, 6:9] = e2
    rows[:, 9:12] = pn
    rows[:, 12] = pv
    rows[:, 13] = d00
    rows[:, 14] = d01
    rows[:, 15] = d11
    rows[:, 16] = inv_denom
    return rows.reshape(T // KMAX, KMAX, TRI_ROW)


def pack_bvh_for_pallas(bvh: BvhData):
    """Host-side swizzle of a built BVH into the kernel's memory layout.

    Returns (bounds, meta, tri_pack) as numpy arrays:
      bounds  (C*Mc*8,) f32 flat [min.xyz, max.xyz, 0, 0] per node -> one
        (Mc*8,) SMEM block per chunk
      meta    (C*Mc*4,) i32 flat [skip, leaf_start, leaf_count, 0] -> SMEM,
        skip links REBASED per chunk with the chunk-exit mapped to Mc
      tri_pack(L, 8, 128) f32: one (8, 128) block per LEAF — triangle k of
        the leaf on sublane k, its 17 swizzled fields on lanes 0..16 -> HBM,
        DMA'd per visited leaf (leaf_start stays GLOBAL across chunks).
    SMEM arrays are 1-D on purpose: 2-D SMEM windows are lane-padded to 128
    (a (M,4) i32 window allocates M*128*4 bytes), busting the ~1 MB budget.
    """
    node_min = np.asarray(bvh.node_min, np.float32)
    node_max = np.asarray(bvh.node_max, np.float32)
    skip = np.asarray(bvh.skip, np.int64)
    is_leaf = np.asarray(bvh.is_leaf)
    leaf_start = np.asarray(bvh.leaf_start, np.int64)
    leaf_count = np.asarray(bvh.leaf_count, np.int64)

    chunks = _chunk_subtrees(skip, is_leaf, CHUNK_NODES)
    C = len(chunks)
    Mc = max(e - s for s, e in chunks)
    if C > 1:
        # Mosaic constraint: a rank-1 block must either equal the whole array
        # or be a multiple of the array's tiling — observed as 1024 elements
        # for these SMEM arrays on v5e. Multi-chunk layouts use per-chunk
        # blocks of (Mc*4,) i32 and (Mc*8,) f32, so round Mc up to a multiple
        # of 256 (=> Mc*4 and Mc*8 are 1024-multiples); padded nodes are
        # unreachable (skip -> Mc).
        Mc = -(-Mc // 256) * 256

    bounds = np.zeros((C, Mc, 8), np.float32)
    # Padded nodes: inverted boxes (min=+BIG, max=-BIG) never pass the slab
    # test, and skip = Mc exits immediately — but they are unreachable anyway
    # because every real exit is remapped straight to Mc.
    bounds[:, :, 0:3] = _BIG
    bounds[:, :, 3:6] = -_BIG
    meta = np.zeros((C, Mc, 4), np.int32)
    meta[:, :, 0] = Mc
    for c, (s, e) in enumerate(chunks):
        m = e - s
        bounds[c, :m, 0:3] = node_min[s:e]
        bounds[c, :m, 3:6] = node_max[s:e]
        sk = skip[s:e] - s
        sk = np.where(sk >= m, Mc, sk)  # chunk exit -> padded sentinel
        meta[c, :m, 0] = sk
        meta[c, :m, 1] = leaf_start[s:e]
        meta[c, :m, 2] = leaf_count[s:e]

    tri = _swizzle_tris(bvh.verts)
    return PallasPack(bounds.reshape(-1), meta.reshape(-1), tri, C)


def _kernel(meta_ref, bounds_ref, tmin_ref, rays_ref, tri_ref, t_ref, id_ref,
            tri_scratch, dma_sem):
    """One (packet, chunk) grid step: 128 rays vs. one subtree chunk whose
    node metadata is SMEM-resident. Triangle rows live in HBM (tri_ref); each
    visited leaf's (8, 128) block is DMA'd into tri_scratch. The output block
    persists across the (innermost) chunk axis, carrying the running best hit
    so later chunks are pruned by earlier ones.

    Leaf DMAs are DOUBLE-BUFFERED: when the walk reaches a leaf it only
    STARTS the copy into the idle half of tri_scratch and keeps walking; the
    triangle test for that leaf runs when the NEXT leaf is found (or at
    drain), by which time the copy has landed. Leaf visits are ~20% of loop
    steps (tools/traversal_profile.py), so the serial start->wait stall this
    removes dominated mesh traversal time. Cost: the deferred test means one
    leaf's t_best update lags the box-test prune by one leaf — a few extra
    leaf visits, repaid many times over by the hidden latency."""
    M = meta_ref.shape[0] // 4
    r = rays_ref[0]  # (8, 128): ox oy oz dx dy dz active pad
    ox, oy, oz = r[0:1, :], r[1:2, :], r[2:3, :]
    dx, dy, dz = r[3:4, :], r[4:5, :], r[5:6, :]
    act = r[6:7, :] > 0.5
    t_min = tmin_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        t_ref[0] = jnp.full((1, LANES), _BIG, jnp.float32)
        id_ref[0] = jnp.zeros((1, LANES), jnp.int32)

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20))

    ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)

    def test_pending(buf, start, count, t_best, best_id):
        """Intersect the 8-triangle block already resident in scratch half
        `buf` against all 128 rays; fold into the running best."""
        tri = tri_scratch[buf]  # (8, 128): triangle k on sublane k
        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        pnx, pny, pnz = tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
        pv = tri[:, 12:13]
        d00, d01, d11 = tri[:, 13:14], tri[:, 14:15], tri[:, 15:16]
        inv_den = tri[:, 16:17]

        # (8,1) x (1,128) -> (8,128): 8 triangles vs 128 rays per op.
        cos = pnx * dx + pny * dy + pnz * dz
        cos_safe = jnp.where(jnp.abs(cos) > 1e-8, cos, 1e-8)
        t = (pv - (pnx * ox + pny * oy + pnz * oz)) / cos_safe
        ddx = ox + t * dx - v0x
        ddy = oy + t * dy - v0y
        ddz = oz + t * dz - v0z
        d20 = ddx * e1x + ddy * e1y + ddz * e1z
        d21 = ddx * e2x + ddy * e2y + ddz * e2z
        v = (d11 * d20 - d01 * d21) * inv_den
        w = (d00 * d21 - d01 * d20) * inv_den
        u = 1.0 - v - w
        ok = (
            (jnp.abs(cos) >= 1e-8)
            & (t >= t_min)
            & (u >= 0.0)
            & (v >= 0.0)
            & (w >= 0.0)
            & (row_k < count)
        )
        th = jnp.where(ok, t, _BIG)  # (8,128)
        t_leaf = jnp.min(th, axis=0, keepdims=True)  # (1,128)
        k_best = jnp.min(
            jnp.where(th == t_leaf, row_k, KMAX), axis=0, keepdims=True
        )
        better = t_leaf < t_best
        best_id = jnp.where(better, start + k_best, best_id)
        t_best = jnp.minimum(t_best, t_leaf)
        return t_best, best_id

    def cond(state):
        return state[0] < M

    def body(state):
        ptr, t_best, best_id, p_start, p_count, cur = state
        m4 = ptr * 4
        skip = meta_ref[m4]
        start = meta_ref[m4 + 1]
        count = meta_ref[m4 + 2]

        # Slab test on (1, 128): node bounds are packet-uniform scalars.
        b8 = ptr * 8
        t1x = (bounds_ref[b8 + 0] - ox) * ivx
        t2x = (bounds_ref[b8 + 3] - ox) * ivx
        t1y = (bounds_ref[b8 + 1] - oy) * ivy
        t2y = (bounds_ref[b8 + 4] - oy) * ivy
        t1z = (bounds_ref[b8 + 2] - oz) * ivz
        t2z = (bounds_ref[b8 + 5] - oz) * ivz
        lo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        hi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = (lo <= hi) & (hi >= t_min) & (lo <= t_best) & act
        hit_any = jnp.any(box_hit)
        new_leaf = hit_any & (count > 0)

        # Start the new leaf's copy into the idle half, then (overlapped with
        # that copy) test the previously pending leaf from the resident half.
        @pl.when(new_leaf)
        def _():
            pltpu.make_async_copy(
                tri_ref.at[start // KMAX], tri_scratch.at[1 - cur],
                dma_sem.at[1 - cur],
            ).start()

        def flush(args):
            t_best, best_id = args
            pltpu.make_async_copy(
                tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
            ).wait()
            return test_pending(cur, p_start, p_count, t_best, best_id)

        t_best, best_id = jax.lax.cond(
            new_leaf & (p_count > 0), flush, lambda a: a, (t_best, best_id)
        )
        p_start = jnp.where(new_leaf, start, p_start)
        p_count = jnp.where(new_leaf, count, p_count)
        cur = jnp.where(new_leaf, 1 - cur, cur)
        ptr = jnp.where(hit_any & (count == 0), ptr + 1, skip)
        return ptr, t_best, best_id, p_start, p_count, cur

    _, t_best, best_id, p_start, p_count, cur = jax.lax.while_loop(
        cond,
        body,
        (jnp.int32(0), t_ref[0], id_ref[0], jnp.int32(0), jnp.int32(0),
         jnp.int32(0)),
    )

    # Drain the last pending leaf.
    def drain(args):
        t_best, best_id = args
        pltpu.make_async_copy(
            tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
        ).wait()
        return test_pending(cur, p_start, p_count, t_best, best_id)

    t_best, best_id = jax.lax.cond(
        p_count > 0, drain, lambda a: a, (t_best, best_id)
    )
    t_ref[0] = t_best
    id_ref[0] = best_id


def _kernel_occl(meta_ref, bounds_ref, tmin_ref, rays_ref, tri_ref, occ_ref,
                 tri_scratch, dma_sem):
    """Occlusion (any-hit) variant of `_kernel` for NEE shadow rays
    (renderer.rs:191-197: a lane is occluded iff ANY hit has t <= dist).

    Differences from closest-hit:
    - ray row 7 carries the per-lane max distance (the light distance);
      the box prune uses it instead of a running best,
    - a lane that finds any hit is DONE: it stops opening boxes, and the
      packet exits the walk entirely once every live lane is occluded,
    - no triangle id / normal bookkeeping — the output is one 0/1 per lane.
    Leaf DMAs keep the closest-hit kernel's double-buffering."""
    M = meta_ref.shape[0] // 4
    r = rays_ref[0]  # (8, 128): ox oy oz dx dy dz active t_max
    ox, oy, oz = r[0:1, :], r[1:2, :], r[2:3, :]
    dx, dy, dz = r[3:4, :], r[4:5, :], r[5:6, :]
    act = r[6:7, :] > 0.5
    t_max = r[7:8, :]
    t_min = tmin_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        occ_ref[0] = jnp.zeros((1, LANES), jnp.float32)

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20))

    ivx, ivy, ivz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)

    def test_pending(buf, count, occ):
        tri = tri_scratch[buf]  # (8, 128): triangle k on sublane k
        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        pnx, pny, pnz = tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
        pv = tri[:, 12:13]
        d00, d01, d11 = tri[:, 13:14], tri[:, 14:15], tri[:, 15:16]
        inv_den = tri[:, 16:17]

        cos = pnx * dx + pny * dy + pnz * dz
        cos_safe = jnp.where(jnp.abs(cos) > 1e-8, cos, 1e-8)
        t = (pv - (pnx * ox + pny * oy + pnz * oz)) / cos_safe
        ddx = ox + t * dx - v0x
        ddy = oy + t * dy - v0y
        ddz = oz + t * dz - v0z
        d20 = ddx * e1x + ddy * e1y + ddz * e1z
        d21 = ddx * e2x + ddy * e2y + ddz * e2z
        v = (d11 * d20 - d01 * d21) * inv_den
        w = (d00 * d21 - d01 * d20) * inv_den
        u = 1.0 - v - w
        ok = (
            (jnp.abs(cos) >= 1e-8)
            & (t >= t_min)
            & (t <= t_max)
            & (u >= 0.0)
            & (v >= 0.0)
            & (w >= 0.0)
            & (row_k < count)
        )
        hit_lane = jnp.any(ok, axis=0, keepdims=True)  # (1,128)
        occ = jnp.where(hit_lane, 1.0, occ)
        # One vector->scalar reduce per LEAF (not per node step): the loop
        # cond stays scalar-only, exiting once every live lane is occluded.
        alive = jnp.any(act & (occ < 0.5))
        return occ, alive

    def cond(state):
        return state[0] < M

    def body(state):
        ptr, occ, alive, p_start, p_count, cur = state
        m4 = ptr * 4
        skip = meta_ref[m4]
        start = meta_ref[m4 + 1]
        count = meta_ref[m4 + 2]

        b8 = ptr * 8
        t1x = (bounds_ref[b8 + 0] - ox) * ivx
        t2x = (bounds_ref[b8 + 3] - ox) * ivx
        t1y = (bounds_ref[b8 + 1] - oy) * ivy
        t2y = (bounds_ref[b8 + 4] - oy) * ivy
        t1z = (bounds_ref[b8 + 2] - oz) * ivz
        t2z = (bounds_ref[b8 + 5] - oz) * ivz
        lo = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        hi = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        box_hit = (lo <= hi) & (hi >= t_min) & (lo <= t_max) & act & (occ < 0.5)
        hit_any = jnp.any(box_hit)
        new_leaf = hit_any & (count > 0)

        @pl.when(new_leaf)
        def _():
            pltpu.make_async_copy(
                tri_ref.at[start // KMAX], tri_scratch.at[1 - cur],
                dma_sem.at[1 - cur],
            ).start()

        def flush(args):
            occ, _ = args
            pltpu.make_async_copy(
                tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
            ).wait()
            return test_pending(cur, p_count, occ)

        occ, alive = jax.lax.cond(
            new_leaf & (p_count > 0), flush, lambda a: a, (occ, alive)
        )
        p_start = jnp.where(new_leaf, start, p_start)
        p_count = jnp.where(new_leaf, count, p_count)
        cur = jnp.where(new_leaf, 1 - cur, cur)
        ptr = jnp.where(hit_any & (count == 0), ptr + 1, skip)
        # Early exit: once every live lane is occluded, jump straight to the
        # preorder end (the drain below still waits any in-flight DMA).
        ptr = jnp.where(alive, ptr, M)
        return ptr, occ, alive, p_start, p_count, cur

    init_alive = jnp.any(act & (occ_ref[0] < 0.5))
    _, occ, _, p_start, p_count, cur = jax.lax.while_loop(
        cond,
        body,
        (jnp.where(init_alive, 0, M).astype(jnp.int32), occ_ref[0], init_alive,
         jnp.int32(0), jnp.int32(0), jnp.int32(0)),
    )

    def drain(args):
        occ, _ = args
        pltpu.make_async_copy(
            tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
        ).wait()
        return test_pending(cur, p_count, occ)

    occ, _ = jax.lax.cond(p_count > 0, drain, lambda a: a, (occ, jnp.bool_(True)))
    occ_ref[0] = occ


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks"))
def _traverse(bounds, meta, tri_pack, rays, t_min, *, n_chunks, interpret=False):
    G = rays.shape[0]
    Mc4 = meta.shape[0] // n_chunks
    Mc8 = bounds.shape[0] // n_chunks
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        # Chunk axis INNERMOST: the output block for packet i stays resident
        # in VMEM across its chunk steps (a standard Pallas reduction), while
        # each chunk's SMEM node blocks stream through.
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((Mc4,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Mc8,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
            pl.BlockSpec(
                (1, 8, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # rays
            pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),  # double-buffered leaf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_specs=[
            # (G, 1, 128) with a (1, 1, 128) block: Mosaic requires the last
            # two block dims to divide (8, 128) or equal the array dims.
            pl.BlockSpec((1, 1, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    t_out, id_out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, 1, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, 1, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, bounds, t_min_arr, rays, tri_pack)
    return t_out, id_out


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks"))
def _traverse_occl(bounds, meta, tri_pack, rays, t_min, *, n_chunks,
                   interpret=False):
    G = rays.shape[0]
    Mc4 = meta.shape[0] // n_chunks
    Mc8 = bounds.shape[0] // n_chunks
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G, n_chunks),
        in_specs=[
            pl.BlockSpec((Mc4,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Mc8,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
            pl.BlockSpec(
                (1, 8, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # rays
            pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    (occ_out,) = pl.pallas_call(
        _kernel_occl,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, 1, LANES), jnp.float32)],
        interpret=interpret,
    )(meta, bounds, t_min_arr, rays, tri_pack)
    return occ_out


def bvh_occluded_pallas(
    bvh: BvhData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max: jnp.ndarray,
    active=None,
    packed=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Any-hit shadow query: True where some triangle lies in [t_min, t_max]
    along the ray. Boolean-equal to `bvh_closest_hit(...).t <= t_max` but
    early-exits per lane on the first hit and per packet when every live
    lane is occluded."""
    if packed is None:
        packed = pack_bvh_for_pallas(bvh)
    bounds = jnp.asarray(packed.bounds)
    meta = jnp.asarray(packed.meta)
    tri_pack = jnp.asarray(packed.tri)
    n_chunks = packed.n_chunks

    N = o.shape[0]
    G = -(-N // LANES)
    pad = G * LANES - N
    o32 = o.astype(jnp.float32)
    d32 = d.astype(jnp.float32)
    if active is None:
        act = jnp.ones((N,), jnp.float32)
    else:
        act = active.astype(jnp.float32)
    tmax32 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    comp = jnp.stack(
        [o32[:, 0], o32[:, 1], o32[:, 2], d32[:, 0], d32[:, 1], d32[:, 2], act,
         tmax32],
        axis=0,
    )  # (8, N)
    if pad:
        comp = jnp.pad(comp, ((0, 0), (0, pad)))
    rays = comp.reshape(8, G, LANES).transpose(1, 0, 2)  # (G, 8, 128)

    occ_out = _traverse_occl(
        bounds, meta, tri_pack, rays, jnp.asarray(t_min),
        n_chunks=n_chunks, interpret=interpret,
    )
    occ = occ_out.reshape(-1)[:N] > 0.5
    if active is not None:
        occ = occ & active
    return occ


def bvh_closest_hit_pallas(
    bvh: BvhData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    active=None,
    packed=None,
    interpret: bool = False,
) -> Hit:
    """Closest hit of N rays via the Pallas packet kernel.

    Drop-in replacement for `bvh_closest_hit` (same Hit contract: t=inf on
    miss, smooth-interpolated world normal, material id). `packed` may carry
    the result of `pack_bvh_for_pallas` to avoid re-tracing the swizzle.
    """
    if packed is None:
        packed = pack_bvh_for_pallas(bvh)
    bounds = jnp.asarray(packed.bounds)
    meta = jnp.asarray(packed.meta)
    tri_pack = jnp.asarray(packed.tri)
    n_chunks = packed.n_chunks
    bvh = jax.tree_util.tree_map(jnp.asarray, bvh)

    N = o.shape[0]
    G = -(-N // LANES)
    pad = G * LANES - N
    o32 = o.astype(jnp.float32)
    d32 = d.astype(jnp.float32)
    if active is None:
        act = jnp.ones((N,), jnp.float32)
    else:
        act = active.astype(jnp.float32)
    comp = jnp.stack(
        [o32[:, 0], o32[:, 1], o32[:, 2], d32[:, 0], d32[:, 1], d32[:, 2], act,
         jnp.zeros((N,), jnp.float32)],
        axis=0,
    )  # (8, N)
    if pad:
        comp = jnp.pad(comp, ((0, 0), (0, pad)))
    rays = comp.reshape(8, G, LANES).transpose(1, 0, 2)  # (G, 8, 128)

    t_out, id_out = _traverse(
        bounds, meta, tri_pack, rays, jnp.asarray(t_min),
        n_chunks=n_chunks, interpret=interpret,
    )
    t_best = t_out.reshape(-1)[:N].astype(o.dtype)
    best_tri = id_out.reshape(-1)[:N]
    t_best = jnp.where(t_best >= 1.0e38, INF, t_best)
    if active is not None:
        # Inactive lanes ride the packet through leaves opened by live lanes;
        # report them as misses to match the XLA path's parked-lane contract.
        t_best = jnp.where(active, t_best, INF)
    # Padded dummy triangle rows are all-zero; clamp ids for the final gather.
    best_tri = jnp.clip(best_tri, 0, bvh.num_tris - 1)
    return finalize_hit(bvh, o, d, t_min, t_best, best_tri)

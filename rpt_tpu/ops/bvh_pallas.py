"""Pallas TPU kernel: packet BVH traversal + batch triangle intersection.

This is the TPU-native replacement for the reference's hottest code — the
recursive kd-tree walk at /root/reference/src/kdtree.rs:151-223 feeding the
per-triangle test at /root/reference/src/shape/mesh.rs:49-82. A scalar CPU
chases one pointer per ray; a TPU has no per-lane gather, so per-ray pointer
chasing (the pure-XLA fallback in rpt_tpu/ops/bvh.py) pays an HBM gather per
ray per node. Here we traverse in *packets*:

- A packet of SUBS*128 rays rides the FULL (8, 128) VPU tile (SUBS=8 ray
  subgroups on sublanes x 128 rays on lanes); ONE scalar node pointer per
  packet walks the skip-link preorder in a `lax.while_loop` on the scalar
  core. Each node's slab test is a single full-tile VPU op serving 1024
  rays — 8x the rays per scalar step of a 128-ray packet (round-3's layout,
  still available as SUBS=1), which tested boxes on (1, 128) registers and
  wasted 7/8 of the VPU.
- The packet descends into a node iff ANY live lane's slab test passes
  (per-lane running-best prune `lo <= t_best` included) — the classic packet
  traversal, and the vector analog of the reference's early-exit recursion.
- Node bounds and skip/leaf metadata live in SMEM (scalar-indexed loads are
  the scalar core's bread and butter); triangles live in HBM, PRE-SWIZZLED
  host-side into 128-float rows [v0, e1, e2, pn, pn.v0, d00, d01, d11,
  inv_denom, pad...] so one leaf = one dense (8, 128) DMA.
- A leaf is tested as triangles-on-sublanes x rays-on-lanes: one (8, 128)
  elementwise pipeline intersects 8 triangles against one 128-ray subgroup
  per VPU op (a static loop over the SUBS subgroups covers the packet), then
  a cross-sublane min picks each lane's best. This is the same plane +
  barycentric formulation as `_tri_hit_t`, so hits agree with the XLA path
  bit-for-bit (up to fused-op rounding). Leaf work per RAY is identical at
  any SUBS — the full tile is busy either way — but one leaf DMA and one
  traversal step now serve 8x the rays.

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

LANES = 128  # rays per sublane row of a packet
# Ray subgroups per packet (packet = SUBS*128 rays). 8 fills the (8, 128) VPU
# tile for node slab tests; 1 reproduces the round-3 narrow-packet layout.
# A/B-measured on TPU v5e (PERF_NOTES.md round 4). Env override for A/B
# runs: RPT_PACKET_SUBS=1.
import os as _os

DEFAULT_SUBS = int(_os.environ.get("RPT_PACKET_SUBS", "8"))
# Independent packet walks advanced per while_loop iteration. Hypothesis was
# that the walk is latency-bound and I overlapped chains would hide the
# per-step stall; MEASURED ON TPU v5e (round 4): il=2/4/8 performs the same
# as il=1 on teapot and dragon — the per-step cost is a serializing
# vector->scalar sync (the packet-wide any()), which interleaving cannot
# overlap. Default 1; the mechanism stays for future architectures.
DEFAULT_INTERLEAVE = int(_os.environ.get("RPT_PACKET_INTERLEAVE", "1"))
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


def _load_rays(rays_ref, i):
    """Unpack walk i's SoA components from the (I, 8, SUBS, 128) block."""
    r = rays_ref[i]  # (8, SUBS, 128): ox oy oz dx dy dz active extra
    ox, oy, oz = r[0], r[1], r[2]  # (SUBS, 128)
    dx, dy, dz = r[3], r[4], r[5]
    act = r[6] > 0.5
    extra = r[7]

    def safe_inv(c):
        return 1.0 / jnp.where(
            jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20)
        )

    inv = (safe_inv(dx), safe_inv(dy), safe_inv(dz))
    return (ox, oy, oz), (dx, dy, dz), inv, act, extra


def _slab(bounds_ref, b8, o3, iv3, t_min, t_upper, act):
    """Packet slab test vs. one node's scalar bounds; (SUBS, 128) result."""
    ox, oy, oz = o3
    ivx, ivy, ivz = iv3
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
    return (lo <= hi) & (hi >= t_min) & (lo <= t_upper) & act


def _leaf_rows(tri):
    """Split a resident (8, 128) leaf block into its swizzled (8, 1) fields."""
    return dict(
        v0=(tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]),
        e1=(tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]),
        e2=(tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]),
        pn=(tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]),
        pv=tri[:, 12:13],
        d00=tri[:, 13:14], d01=tri[:, 14:15], d11=tri[:, 15:16],
        inv_den=tri[:, 16:17],
    )


def _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count):
    """Hit times of the 8 resident triangles vs. ray subgroup g: (8, 128),
    _BIG on miss. (8,1) x (1,128) -> (8,128): full tile per op."""
    oxg, oyg, ozg = o3[0][g:g + 1], o3[1][g:g + 1], o3[2][g:g + 1]
    dxg, dyg, dzg = d3[0][g:g + 1], d3[1][g:g + 1], d3[2][g:g + 1]
    pnx, pny, pnz = f["pn"]
    v0x, v0y, v0z = f["v0"]
    e1x, e1y, e1z = f["e1"]
    e2x, e2y, e2z = f["e2"]
    cos = pnx * dxg + pny * dyg + pnz * dzg
    cos_safe = jnp.where(jnp.abs(cos) > 1e-8, cos, 1e-8)
    t = (f["pv"] - (pnx * oxg + pny * oyg + pnz * ozg)) / cos_safe
    ddx = oxg + t * dxg - v0x
    ddy = oyg + t * dyg - v0y
    ddz = ozg + t * dzg - v0z
    d20 = ddx * e1x + ddy * e1y + ddz * e1z
    d21 = ddx * e2x + ddy * e2y + ddz * e2z
    v = (f["d11"] * d20 - f["d01"] * d21) * f["inv_den"]
    w = (f["d00"] * d21 - f["d01"] * d20) * f["inv_den"]
    u = 1.0 - v - w
    ok = (
        (jnp.abs(cos) >= 1e-8)
        & (t >= t_min)
        & (u >= 0.0)
        & (v >= 0.0)
        & (w >= 0.0)
        & (row_k < count)
    )
    return jnp.where(ok, t, _BIG)


def _kernel(meta_ref, bounds_ref, tmin_ref, rays_ref, tri_ref, t_ref, id_ref,
            tri_scratch, dma_sem):
    """One (packet-block, chunk) grid step: I independent packets of
    SUBS*128 rays each vs. one subtree chunk whose node metadata is
    SMEM-resident. The output block persists across the (innermost) chunk
    axis, carrying the running best hit so later chunks are pruned by
    earlier ones.

    Two latency-hiding structures (round-4 probes on TPU v5e):

    - Node slab tests run on the full (SUBS, 128) register — with SUBS=8
      the whole VPU tile, 1024 rays per scalar-loop step.
    - The walk is LATENCY-bound: one packet's serial chain (scalar SMEM
      loads -> slab -> vector->scalar any() -> branch) leaves the VPU ~99%
      idle (a node-only walk measured as fast as the full kernel). So ONE
      while_loop advances I independent packet walks per iteration; their
      chains overlap, and the iteration count per block is the MAX of the
      walks' step counts, not the sum. A finished walk parks at the
      sentinel and rides along (its slab result is masked off).

    Leaf DMAs are DOUBLE-BUFFERED per walk: reaching a leaf only STARTS the
    copy into the idle half of that walk's scratch; the triangle test runs
    when the walk finds its NEXT leaf (or at drain), by which time the copy
    has landed. Cost: one leaf's t_best update lags the box-test prune by
    one leaf — a few extra visits, repaid by the hidden DMA latency."""
    M = meta_ref.shape[0] // 4
    I = rays_ref.shape[0]
    SUBS = rays_ref.shape[2]
    t_min = tmin_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        t_ref[:] = jnp.full((I, SUBS, LANES), _BIG, jnp.float32)
        id_ref[:] = jnp.zeros((I, SUBS, LANES), jnp.int32)

    rays = [_load_rays(rays_ref, i) for i in range(I)]
    row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)

    def test_pending(i, buf, start, count, t_best, best_id):
        """Fold walk i's pending leaf (resident in scratch half `buf`) into
        its running best, one full-tile pass per ray subgroup."""
        o3, d3 = rays[i][0], rays[i][1]
        f = _leaf_rows(tri_scratch[i, buf])
        t_rows, id_rows = [], []
        for g in range(SUBS):
            th = _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count)
            t_leaf = jnp.min(th, axis=0, keepdims=True)  # (1,128)
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

    def cond(state):
        ptrs = state[0]
        alive = ptrs[0] < M
        for i in range(1, I):
            alive = alive | (ptrs[i] < M)
        return alive

    def body(state):
        ptrs, t_bests, best_ids, p_starts, p_counts, curs = state
        out = ([], [], [], [], [], [])
        for i in range(I):
            ptr, t_best, best_id = ptrs[i], t_bests[i], best_ids[i]
            p_start, p_count, cur = p_starts[i], p_counts[i], curs[i]
            o3, d3, iv3, act, _ = rays[i]
            live = ptr < M
            p = jnp.minimum(ptr, M - 1)
            m4 = p * 4
            skip = meta_ref[m4]
            start = meta_ref[m4 + 1]
            count = meta_ref[m4 + 2]
            box_hit = _slab(bounds_ref, p * 8, o3, iv3, t_min, t_best, act)
            hit_any = jnp.any(box_hit) & live
            new_leaf = hit_any & (count > 0)

            # Start the new leaf's copy into the idle half, then (overlapped
            # with that copy) test the previously pending leaf.
            @pl.when(new_leaf)
            def _(start=start, cur=cur, i=i):
                pltpu.make_async_copy(
                    tri_ref.at[start // KMAX], tri_scratch.at[i, 1 - cur],
                    dma_sem.at[i, 1 - cur],
                ).start()

            def flush(args, i=i, p_start=p_start, p_count=p_count, cur=cur):
                t_best, best_id = args
                pltpu.make_async_copy(
                    tri_ref.at[p_start // KMAX], tri_scratch.at[i, cur],
                    dma_sem.at[i, cur],
                ).wait()
                return test_pending(i, cur, p_start, p_count, t_best, best_id)

            t_best, best_id = jax.lax.cond(
                new_leaf & (p_count > 0), flush, lambda a: a, (t_best, best_id)
            )
            p_start = jnp.where(new_leaf, start, p_start)
            p_count = jnp.where(new_leaf, count, p_count)
            cur = jnp.where(new_leaf, 1 - cur, cur)
            nxt = jnp.where(hit_any & (count == 0), p + 1, skip)
            ptr = jnp.where(live, nxt, ptr)
            for lst, v in zip(out, (ptr, t_best, best_id, p_start, p_count, cur)):
                lst.append(v)
        return tuple(tuple(x) for x in out)

    init = (
        tuple(jnp.int32(0) for _ in range(I)),
        tuple(t_ref[i] for i in range(I)),
        tuple(id_ref[i] for i in range(I)),
        tuple(jnp.int32(0) for _ in range(I)),
        tuple(jnp.int32(0) for _ in range(I)),
        tuple(jnp.int32(0) for _ in range(I)),
    )
    _, t_bests, best_ids, p_starts, p_counts, curs = jax.lax.while_loop(
        cond, body, init
    )

    # Drain each walk's last pending leaf.
    for i in range(I):
        def drain(args, i=i):
            t_best, best_id = args
            pltpu.make_async_copy(
                tri_ref.at[p_starts[i] // KMAX], tri_scratch.at[i, curs[i]],
                dma_sem.at[i, curs[i]],
            ).wait()
            return test_pending(
                i, curs[i], p_starts[i], p_counts[i], t_best, best_id
            )

        t_best, best_id = jax.lax.cond(
            p_counts[i] > 0, drain, lambda a: a, (t_bests[i], best_ids[i])
        )
        t_ref[i] = t_best
        id_ref[i] = best_id


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
    Leaf DMAs keep the closest-hit kernel's double-buffering, and the
    closest-hit kernel's I-way walk interleaving hides the step latency."""
    M = meta_ref.shape[0] // 4
    I = rays_ref.shape[0]
    SUBS = rays_ref.shape[2]
    t_min = tmin_ref[0]

    @pl.when(pl.program_id(1) == 0)
    def _():
        occ_ref[:] = jnp.zeros((I, SUBS, LANES), jnp.float32)

    rays = [_load_rays(rays_ref, i) for i in range(I)]
    row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)

    def test_pending(i, buf, count, occ):
        o3, d3 = rays[i][0], rays[i][1]
        act, t_max = rays[i][3], rays[i][4]
        f = _leaf_rows(tri_scratch[i, buf])
        occ_rows = []
        for g in range(SUBS):
            th = _leaf_subgroup_t(f, row_k, o3, d3, g, t_min, count)
            hit_lane = jnp.any(
                th <= t_max[g:g + 1], axis=0, keepdims=True
            )  # (1,128)
            occ_rows.append(jnp.where(hit_lane, 1.0, occ[g:g + 1]))
        occ = occ_rows[0] if SUBS == 1 else jnp.concatenate(occ_rows, axis=0)
        # One vector->scalar reduce per LEAF (not per node step): the loop
        # cond stays scalar-only, exiting once every live lane is occluded.
        alive = jnp.any(act & (occ < 0.5))
        return occ, alive

    def cond(state):
        ptrs = state[0]
        live = ptrs[0] < M
        for i in range(1, I):
            live = live | (ptrs[i] < M)
        return live

    def body(state):
        ptrs, occs, alives, p_starts, p_counts, curs = state
        out = ([], [], [], [], [], [])
        for i in range(I):
            ptr, occ, alive = ptrs[i], occs[i], alives[i]
            p_start, p_count, cur = p_starts[i], p_counts[i], curs[i]
            o3, d3, iv3, act, t_max = rays[i]
            live = ptr < M
            p = jnp.minimum(ptr, M - 1)
            m4 = p * 4
            skip = meta_ref[m4]
            start = meta_ref[m4 + 1]
            count = meta_ref[m4 + 2]
            box_hit = _slab(
                bounds_ref, p * 8, o3, iv3, t_min, t_max, act & (occ < 0.5)
            )
            hit_any = jnp.any(box_hit) & live
            new_leaf = hit_any & (count > 0)

            @pl.when(new_leaf)
            def _(start=start, cur=cur, i=i):
                pltpu.make_async_copy(
                    tri_ref.at[start // KMAX], tri_scratch.at[i, 1 - cur],
                    dma_sem.at[i, 1 - cur],
                ).start()

            def flush(args, i=i, p_start=p_start, p_count=p_count, cur=cur):
                occ, _ = args
                pltpu.make_async_copy(
                    tri_ref.at[p_start // KMAX], tri_scratch.at[i, cur],
                    dma_sem.at[i, cur],
                ).wait()
                return test_pending(i, cur, p_count, occ)

            occ, alive = jax.lax.cond(
                new_leaf & (p_count > 0), flush, lambda a: a, (occ, alive)
            )
            p_start = jnp.where(new_leaf, start, p_start)
            p_count = jnp.where(new_leaf, count, p_count)
            cur = jnp.where(new_leaf, 1 - cur, cur)
            nxt = jnp.where(hit_any & (count == 0), p + 1, skip)
            # Early exit: once every live lane of this walk is occluded, park
            # at the preorder end (the drain below still waits its DMA).
            nxt = jnp.where(alive, nxt, M)
            ptr = jnp.where(live, nxt, ptr)
            for lst, v in zip(out, (ptr, occ, alive, p_start, p_count, cur)):
                lst.append(v)
        return tuple(tuple(x) for x in out)

    init_ptrs, init_occs, init_alives = [], [], []
    for i in range(I):
        occ0 = occ_ref[i]
        act = rays[i][3]
        alive0 = jnp.any(act & (occ0 < 0.5))
        init_ptrs.append(jnp.where(alive0, 0, M).astype(jnp.int32))
        init_occs.append(occ0)
        init_alives.append(alive0)
    zeros = tuple(jnp.int32(0) for _ in range(I))
    _, occs, _, p_starts, p_counts, curs = jax.lax.while_loop(
        cond,
        body,
        (tuple(init_ptrs), tuple(init_occs), tuple(init_alives), zeros, zeros,
         zeros),
    )

    for i in range(I):
        def drain(args, i=i):
            occ, _ = args
            pltpu.make_async_copy(
                tri_ref.at[p_starts[i] // KMAX], tri_scratch.at[i, curs[i]],
                dma_sem.at[i, curs[i]],
            ).wait()
            return test_pending(i, curs[i], p_counts[i], occ)

        occ, _ = jax.lax.cond(
            p_counts[i] > 0, drain, lambda a: a, (occs[i], jnp.bool_(True))
        )
        occ_ref[i] = occ


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks", "interleave"))
def _traverse(bounds, meta, tri_pack, rays, t_min, *, n_chunks, interleave,
              interpret=False):
    G, _, SUBS, _ = rays.shape
    I = interleave
    Mc4 = meta.shape[0] // n_chunks
    Mc8 = bounds.shape[0] // n_chunks
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        # Chunk axis INNERMOST: the output block for packet-block i stays
        # resident in VMEM across its chunk steps (a standard Pallas
        # reduction), while each chunk's SMEM node blocks stream through.
        grid=(G // I, n_chunks),
        in_specs=[
            pl.BlockSpec((Mc4,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Mc8,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
            pl.BlockSpec(
                (I, 8, SUBS, LANES), lambda i, c: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # rays: I interleaved packets per block
            pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
        ],
        scratch_shapes=[
            # Double-buffered leaf blocks, one pair per interleaved walk.
            pltpu.VMEM((I, 2, KMAX, TRI_ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((I, 2)),
        ],
        out_specs=[
            # (G, SUBS, 128) with an (I, SUBS, 128) block: Mosaic requires
            # the last two block dims to divide (8, 128) or equal array dims.
            pl.BlockSpec((I, SUBS, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((I, SUBS, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    t_out, id_out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(meta, bounds, t_min_arr, rays, tri_pack)
    return t_out, id_out


@functools.partial(jax.jit, static_argnames=("interpret", "n_chunks", "interleave"))
def _traverse_occl(bounds, meta, tri_pack, rays, t_min, *, n_chunks,
                   interleave, interpret=False):
    G, _, SUBS, _ = rays.shape
    I = interleave
    Mc4 = meta.shape[0] // n_chunks
    Mc8 = bounds.shape[0] // n_chunks
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G // I, n_chunks),
        in_specs=[
            pl.BlockSpec((Mc4,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec((Mc8,), lambda i, c: (c,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
            pl.BlockSpec(
                (I, 8, SUBS, LANES), lambda i, c: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # rays
            pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((I, 2, KMAX, TRI_ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((I, 2)),
        ],
        out_specs=[
            pl.BlockSpec((I, SUBS, LANES), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    (occ_out,) = pl.pallas_call(
        _kernel_occl,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32)],
        interpret=interpret,
    )(meta, bounds, t_min_arr, rays, tri_pack)
    return occ_out


def _pack_rays(o, d, extra, active, subs, interleave=1):
    """SoA ray components -> (G, 8, SUBS, 128) packet blocks, with G padded
    to a multiple of `interleave` (padded packets carry active=0 everywhere
    and exit their walk at the root in one step)."""
    N = o.shape[0]
    pack = subs * LANES
    G = -(-N // pack)
    G = -(-G // interleave) * interleave
    pad = G * pack - N
    o32 = o.astype(jnp.float32)
    d32 = d.astype(jnp.float32)
    if active is None:
        act = jnp.ones((N,), jnp.float32)
    else:
        act = active.astype(jnp.float32)
    comp = jnp.stack(
        [o32[:, 0], o32[:, 1], o32[:, 2], d32[:, 0], d32[:, 1], d32[:, 2], act,
         extra],
        axis=0,
    )  # (8, N)
    if pad:
        comp = jnp.pad(comp, ((0, 0), (0, pad)))
    return comp.reshape(8, G, subs, LANES).transpose(1, 0, 2, 3)


def bvh_occluded_pallas(
    bvh: BvhData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max: jnp.ndarray,
    active=None,
    packed=None,
    interpret: bool = False,
    subs: int | None = None,
    interleave: int | None = None,
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
    I = interleave or DEFAULT_INTERLEAVE

    N = o.shape[0]
    tmax32 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    rays = _pack_rays(o, d, tmax32, active, subs or DEFAULT_SUBS, I)

    occ_out = _traverse_occl(
        bounds, meta, tri_pack, rays, jnp.asarray(t_min),
        n_chunks=n_chunks, interleave=I, interpret=interpret,
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
    subs: int | None = None,
    interleave: int | None = None,
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
    I = interleave or DEFAULT_INTERLEAVE

    N = o.shape[0]
    rays = _pack_rays(o, d, jnp.zeros((N,), jnp.float32), active,
                      subs or DEFAULT_SUBS, I)

    t_out, id_out = _traverse(
        bounds, meta, tri_pack, rays, jnp.asarray(t_min),
        n_chunks=n_chunks, interleave=I, interpret=interpret,
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

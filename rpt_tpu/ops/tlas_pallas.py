"""Pallas TPU kernel: two-level (TLAS+BLAS) packet traversal for instanced
meshes.

TPU-native counterpart of the reference's *nested* kd-trees — a `KdTree` is
itself a `Shape` (/root/reference/src/kdtree.rs:128), so `Transformed<Mesh>`
instances re-enter a child tree with a transformed ray (shape.rs:127-137)
inside the parent traversal (kdtree.rs:151-223). The pure-XLA fallback
(rpt_tpu/ops/tlas.py) walks both levels per ray and pays an HBM gather per ray
per step for node boxes, instance transforms and leaf triangles — the exact
pattern measured at ~10 ms per 500k rays on TPU. This kernel removes every
per-ray gather:

- 128 rays ride the VPU lanes; ONE scalar pointer per packet walks the TLAS
  skip-link preorder on the scalar core (node boxes + skip/instance metadata
  in SMEM, flat 1-D layouts — 2-D SMEM windows lane-pad to 128).
- A TLAS leaf holds one instance. When ANY live lane hits its world-space box,
  the packet enters the instance: the 3x4 world->local affine is 12 *scalar*
  SMEM loads broadcast against the resident world-ray vectors (9 mul + 9 add
  on (1,128) registers), and a nested while_loop walks that instance's BLAS
  with the local-space ray. Local directions are NOT normalized, so local hit
  times equal world hit times and the running-best prune `lo <= t_best` stays
  valid across both levels and across instances.
- BLAS leaves are tested exactly like the single-mesh packet kernel
  (bvh_pallas.py): triangles pre-swizzled host-side into (8, 128) rows, one
  leaf = one HBM->VMEM DMA, 8 triangles x 128 rays per VPU op.

The kernel returns (t, packed triangle id, instance id); smooth normals and
material ids are reconstructed outside with ONE gather per ray (not per
traversal step). Scenes whose combined node/instance tables exceed the SMEM
budget fall back to the XLA path (`tlas_pallas_eligible`).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.vmath import normalize
from .intersect import Hit, INF
from .bvh import _tri_hit_t
from .bvh_pallas import (
    DEFAULT_SUBS, LANES, KMAX, TRI_ROW, _BIG, _pack_rays, _swizzle_tris,
)
from .tlas import InstancedMeshes

__all__ = [
    "tlas_closest_hit_pallas",
    "tlas_occluded_pallas",
    "pack_tlas_for_pallas",
    "tlas_pallas_eligible",
    "TlasPack",
]

# SMEM budget: TLAS/BLAS nodes cost 48 B each (8 f32 bounds + 4 i32 meta),
# instances 64 B (12 f32 affine + 4 i32 meta). Keep the combined tables well
# under the ~1 MB SMEM budget; larger scenes take the XLA fallback.
MAX_SMEM_BYTES = 700_000


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TlasPack:
    """Kernel-layout arrays for the two-level packet kernel (all device-ready
    numpy/jnp; no static metadata — every shape flows from the arrays)."""

    t_bounds: jnp.ndarray  # (Mt*8,) f32 [min.xyz, max.xyz, 0, 0] per TLAS node
    t_meta: jnp.ndarray  # (Mt*4,) i32 [skip, leaf_inst(-1 internal), 0, 0]
    b_bounds: jnp.ndarray  # (Mb*8,) f32 per BLAS node (local space)
    b_meta: jnp.ndarray  # (Mb*4,) i32 [skip(global), leaf_start(packed), count, 0]
    inst_f: jnp.ndarray  # (K*12,) f32 world->local 3x4 affine, row-major
    inst_i: jnp.ndarray  # (K*4,) i32 [blas_root, blas_end, 0, 0]
    tri: jnp.ndarray  # (L, 8, 128) f32 swizzled leaf blocks (local space)
    p_verts: jnp.ndarray  # (L*8, 3, 3) local-space verts in packed order
    p_norms: jnp.ndarray  # (L*8, 3, 3)


def tlas_pallas_eligible(im: InstancedMeshes) -> bool:
    Mt = int(np.asarray(im.t_min).shape[0])
    Mb = int(np.asarray(im.b_min).shape[0])
    K = int(np.asarray(im.inst_inv).shape[0])
    return (Mt + Mb) * 48 + K * 64 <= MAX_SMEM_BYTES


def pack_tlas_for_pallas(im: InstancedMeshes) -> TlasPack:
    """Host-side swizzle of a built two-level structure into kernel layout.

    BLAS leaf triangles are permuted leaf-contiguous and 8-aligned (each
    leaf padded to KMAX by repeating its first triangle, masked by count) so
    one leaf = one dense (8, 128) DMA — the same discipline as
    bvh_pallas.pack_bvh_for_pallas, but in each mesh's LOCAL space so all
    instances share the blocks.
    """
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

    Mt = t_min_n.shape[0]
    t_bounds = np.zeros((Mt, 8), np.float32)
    t_bounds[:, 0:3] = t_min_n
    t_bounds[:, 3:6] = t_max_n
    t_meta = np.zeros((Mt, 4), np.int32)
    t_meta[:, 0] = t_skip
    t_meta[:, 1] = t_leaf_inst

    # Permute triangles leaf-contiguous + 8-aligned. Each triangle belongs to
    # exactly one leaf (the median-split build partitions indices), so the
    # packed table is at most 2x the original (pad-to-8 duplication only).
    Mb = b_min_n.shape[0]
    b_bounds = np.zeros((Mb, 8), np.float32)
    b_bounds[:, 0:3] = b_min_n
    b_bounds[:, 3:6] = b_max_n
    b_meta = np.zeros((Mb, 4), np.int32)
    b_meta[:, 0] = b_skip
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
        b_meta[nid, 1] = off
        b_meta[nid, 2] = c
        off += KMAX
    perm = np.concatenate(perm_parts) if perm_parts else np.zeros(0, np.int64)
    p_verts = verts[perm]
    p_norms = norms[perm]
    tri = _swizzle_tris(p_verts)

    K = np.asarray(im.inst_inv).shape[0]
    inst_f = np.asarray(im.inst_inv, np.float32).reshape(K * 12)
    inst_i = np.zeros((K, 4), np.int32)
    inst_i[:, 0] = np.asarray(im.inst_root)
    inst_i[:, 1] = np.asarray(im.inst_end)

    return TlasPack(
        t_bounds=t_bounds.reshape(-1),
        t_meta=t_meta.reshape(-1),
        b_bounds=b_bounds.reshape(-1),
        b_meta=b_meta.reshape(-1),
        inst_f=inst_f,
        inst_i=inst_i.reshape(-1),
        tri=tri,
        p_verts=p_verts.astype(np.float32),
        p_norms=p_norms.astype(np.float32),
    )


def _kernel(t_meta, t_bounds, b_meta, b_bounds, inst_i, inst_f, tmin_ref,
            rays_ref, tri_ref, t_ref, id_ref, inst_ref, tri_scratch, dma_sem):
    """One packet (SUBS*128 rays on the full (SUBS, 128) VPU register) vs.
    the whole two-level structure. Outer while_loop walks the TLAS preorder;
    a TLAS leaf whose instance box is hit by any live lane runs a nested
    while_loop over that instance's BLAS with the packet's rays re-expressed
    in instance-local space (12 scalar SMEM loads, no per-lane work). With
    SUBS=8 one instance entry — the 12-scalar affine load plus the whole
    BLAS subtree walk — is amortized over 1024 rays instead of 128."""
    Mt = t_meta.shape[0] // 4
    r = rays_ref[0]  # (8, SUBS, 128): ox oy oz dx dy dz active pad
    SUBS = r.shape[1]
    wox, woy, woz = r[0], r[1], r[2]  # (SUBS, 128)
    wdx, wdy, wdz = r[3], r[4], r[5]
    act = r[6] > 0.5
    t_min = tmin_ref[0]

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20))

    iwx, iwy, iwz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)

    def slab(bounds_ref, b8, ox, oy, oz, ivx, ivy, ivz, t_best):
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
        return (lo <= hi) & (hi >= t_min) & (lo <= t_best) & act

    def blas_walk(inst, t_best, best_id, best_inst):
        """Walk instance `inst`'s BLAS with the packet in local space."""
        i4 = inst * 4
        root = inst_i[i4]
        end = inst_i[i4 + 1]
        f = inst * 12
        # world->local affine rows (shape.rs:110-125, SoA'd): 12 scalars
        a00, a01, a02, a03 = inst_f[f + 0], inst_f[f + 1], inst_f[f + 2], inst_f[f + 3]
        a10, a11, a12, a13 = inst_f[f + 4], inst_f[f + 5], inst_f[f + 6], inst_f[f + 7]
        a20, a21, a22, a23 = inst_f[f + 8], inst_f[f + 9], inst_f[f + 10], inst_f[f + 11]
        lox = a00 * wox + a01 * woy + a02 * woz + a03
        loy = a10 * wox + a11 * woy + a12 * woz + a13
        loz = a20 * wox + a21 * woy + a22 * woz + a23
        # Direction unnormalized: local t == world t (shape.rs:64-71)
        ldx = a00 * wdx + a01 * wdy + a02 * wdz
        ldy = a10 * wdx + a11 * wdy + a12 * wdz
        ldz = a20 * wdx + a21 * wdy + a22 * wdz
        ilx, ily, ilz = safe_inv(ldx), safe_inv(ldy), safe_inv(ldz)

        def test_pending(buf, start, count, t_best, best_id, best_inst):
            """8-triangle block already resident in scratch half `buf`,
            against each 128-ray subgroup in turn (full tile per pass)."""
            tri = tri_scratch[buf]  # (8, 128): triangle k on sublane k
            v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
            e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
            e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
            pnx, pny, pnz = tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
            pv = tri[:, 12:13]
            d00, d01, d11 = tri[:, 13:14], tri[:, 14:15], tri[:, 15:16]
            inv_den = tri[:, 16:17]

            t_rows, id_rows, in_rows = [], [], []
            for g in range(SUBS):
                loxg, loyg, lozg = lox[g:g + 1], loy[g:g + 1], loz[g:g + 1]
                ldxg, ldyg, ldzg = ldx[g:g + 1], ldy[g:g + 1], ldz[g:g + 1]
                cos = pnx * ldxg + pny * ldyg + pnz * ldzg
                cos_safe = jnp.where(jnp.abs(cos) > 1e-8, cos, 1e-8)
                t = (pv - (pnx * loxg + pny * loyg + pnz * lozg)) / cos_safe
                ddx = loxg + t * ldxg - v0x
                ddy = loyg + t * ldyg - v0y
                ddz = lozg + t * ldzg - v0z
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
                tb = t_best[g:g + 1]
                better = t_leaf < tb
                id_rows.append(
                    jnp.where(better, start + k_best, best_id[g:g + 1])
                )
                in_rows.append(jnp.where(better, inst, best_inst[g:g + 1]))
                t_rows.append(jnp.minimum(tb, t_leaf))
            t_best = t_rows[0] if SUBS == 1 else jnp.concatenate(t_rows, axis=0)
            best_id = id_rows[0] if SUBS == 1 else jnp.concatenate(id_rows, axis=0)
            best_inst = in_rows[0] if SUBS == 1 else jnp.concatenate(in_rows, axis=0)
            return t_best, best_id, best_inst

        def bcond(state):
            return state[0] < end

        def bbody(state):
            bptr, t_best, best_id, best_inst, p_start, p_count, cur = state
            m4 = bptr * 4
            skip = b_meta[m4]
            start = b_meta[m4 + 1]
            count = b_meta[m4 + 2]
            box_hit = slab(b_bounds, bptr * 8, lox, loy, loz, ilx, ily, ilz, t_best)
            hit_any = jnp.any(box_hit)
            new_leaf = hit_any & (count > 0)

            # Double-buffered leaf DMA (see bvh_pallas._kernel): start the new
            # leaf's copy, test the previous one while it flies.
            @pl.when(new_leaf)
            def _():
                pltpu.make_async_copy(
                    tri_ref.at[start // KMAX], tri_scratch.at[1 - cur],
                    dma_sem.at[1 - cur],
                ).start()

            def flush(args):
                pltpu.make_async_copy(
                    tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                    dma_sem.at[cur],
                ).wait()
                return test_pending(cur, p_start, p_count, *args)

            t_best, best_id, best_inst = jax.lax.cond(
                new_leaf & (p_count > 0), flush, lambda a: a,
                (t_best, best_id, best_inst),
            )
            p_start = jnp.where(new_leaf, start, p_start)
            p_count = jnp.where(new_leaf, count, p_count)
            cur = jnp.where(new_leaf, 1 - cur, cur)
            bptr = jnp.where(hit_any & (count == 0), bptr + 1, skip)
            return bptr, t_best, best_id, best_inst, p_start, p_count, cur

        _, t_best, best_id, best_inst, p_start, p_count, cur = jax.lax.while_loop(
            bcond, bbody,
            (root, t_best, best_id, best_inst, jnp.int32(0), jnp.int32(0),
             jnp.int32(0)),
        )

        # Drain this instance's last pending leaf (local rays are per-instance,
        # so the pending test cannot cross the instance boundary).
        def drain(args):
            pltpu.make_async_copy(
                tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
            ).wait()
            return test_pending(cur, p_start, p_count, *args)

        t_best, best_id, best_inst = jax.lax.cond(
            p_count > 0, drain, lambda a: a, (t_best, best_id, best_inst)
        )
        return t_best, best_id, best_inst

    def cond(state):
        tptr = state[0]
        return tptr < Mt

    def body(state):
        tptr, t_best, best_id, best_inst = state
        m4 = tptr * 4
        skip = t_meta[m4]
        leaf_inst = t_meta[m4 + 1]
        box_hit = slab(t_bounds, tptr * 8, wox, woy, woz, iwx, iwy, iwz, t_best)
        hit_any = jnp.any(box_hit)
        is_leaf = leaf_inst >= 0
        t_best, best_id, best_inst = jax.lax.cond(
            hit_any & is_leaf,
            lambda a: blas_walk(leaf_inst, *a),
            lambda a: a,
            (t_best, best_id, best_inst),
        )
        tptr = jnp.where(hit_any & (~is_leaf), tptr + 1, skip)
        return tptr, t_best, best_id, best_inst

    _, t_best, best_id, best_inst = jax.lax.while_loop(
        cond,
        body,
        (
            jnp.int32(0),
            jnp.full((SUBS, LANES), _BIG, jnp.float32),
            jnp.zeros((SUBS, LANES), jnp.int32),
            jnp.zeros((SUBS, LANES), jnp.int32),
        ),
    )
    t_ref[0] = t_best
    id_ref[0] = best_id
    inst_ref[0] = best_inst


def _kernel_occl(t_meta, t_bounds, b_meta, b_bounds, inst_i, inst_f, tmin_ref,
                 rays_ref, tri_ref, occ_ref, tri_scratch, dma_sem):
    """Occlusion (any-hit) variant of the two-level kernel for NEE shadow
    rays. Ray row 7 carries the per-lane light distance (the box-prune
    bound); a lane with any hit inside it stops opening boxes, and both
    loops exit once every live lane is occluded. The liveness reduce runs
    once per leaf test so the while conds stay scalar-only (see
    bvh_pallas._kernel_occl)."""
    Mt = t_meta.shape[0] // 4
    r = rays_ref[0]  # (8, SUBS, 128): ox oy oz dx dy dz active t_max
    SUBS = r.shape[1]
    wox, woy, woz = r[0], r[1], r[2]  # (SUBS, 128)
    wdx, wdy, wdz = r[3], r[4], r[5]
    act = r[6] > 0.5
    t_max = r[7]
    t_min = tmin_ref[0]

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) > 1e-20, c, jnp.where(c < 0.0, -1e-20, 1e-20))

    iwx, iwy, iwz = safe_inv(wdx), safe_inv(wdy), safe_inv(wdz)
    row_k = jax.lax.broadcasted_iota(jnp.int32, (KMAX, LANES), 0)

    def slab(bounds_ref, b8, ox, oy, oz, ivx, ivy, ivz, occ):
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
        return (lo <= hi) & (hi >= t_min) & (lo <= t_max) & act & (occ < 0.5)

    def blas_walk(inst, occ, alive):
        i4 = inst * 4
        root = inst_i[i4]
        end = inst_i[i4 + 1]
        f = inst * 12
        a00, a01, a02, a03 = inst_f[f + 0], inst_f[f + 1], inst_f[f + 2], inst_f[f + 3]
        a10, a11, a12, a13 = inst_f[f + 4], inst_f[f + 5], inst_f[f + 6], inst_f[f + 7]
        a20, a21, a22, a23 = inst_f[f + 8], inst_f[f + 9], inst_f[f + 10], inst_f[f + 11]
        lox = a00 * wox + a01 * woy + a02 * woz + a03
        loy = a10 * wox + a11 * woy + a12 * woz + a13
        loz = a20 * wox + a21 * woy + a22 * woz + a23
        ldx = a00 * wdx + a01 * wdy + a02 * wdz
        ldy = a10 * wdx + a11 * wdy + a12 * wdz
        ldz = a20 * wdx + a21 * wdy + a22 * wdz
        ilx, ily, ilz = safe_inv(ldx), safe_inv(ldy), safe_inv(ldz)

        def test_pending(buf, count, occ):
            tri = tri_scratch[buf]  # (8, 128): triangle k on sublane k
            v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
            e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
            e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
            pnx, pny, pnz = tri[:, 9:10], tri[:, 10:11], tri[:, 11:12]
            pv = tri[:, 12:13]
            d00, d01, d11 = tri[:, 13:14], tri[:, 14:15], tri[:, 15:16]
            inv_den = tri[:, 16:17]

            occ_rows = []
            for g in range(SUBS):
                loxg, loyg, lozg = lox[g:g + 1], loy[g:g + 1], loz[g:g + 1]
                ldxg, ldyg, ldzg = ldx[g:g + 1], ldy[g:g + 1], ldz[g:g + 1]
                cos = pnx * ldxg + pny * ldyg + pnz * ldzg
                cos_safe = jnp.where(jnp.abs(cos) > 1e-8, cos, 1e-8)
                t = (pv - (pnx * loxg + pny * loyg + pnz * lozg)) / cos_safe
                ddx = loxg + t * ldxg - v0x
                ddy = loyg + t * ldyg - v0y
                ddz = lozg + t * ldzg - v0z
                d20 = ddx * e1x + ddy * e1y + ddz * e1z
                d21 = ddx * e2x + ddy * e2y + ddz * e2z
                v = (d11 * d20 - d01 * d21) * inv_den
                w = (d00 * d21 - d01 * d20) * inv_den
                u = 1.0 - v - w
                ok = (
                    (jnp.abs(cos) >= 1e-8)
                    & (t >= t_min)
                    & (t <= t_max[g:g + 1])
                    & (u >= 0.0)
                    & (v >= 0.0)
                    & (w >= 0.0)
                    & (row_k < count)
                )
                hit_lane = jnp.any(ok, axis=0, keepdims=True)  # (1,128)
                occ_rows.append(jnp.where(hit_lane, 1.0, occ[g:g + 1]))
            occ = occ_rows[0] if SUBS == 1 else jnp.concatenate(occ_rows, axis=0)
            alive = jnp.any(act & (occ < 0.5))
            return occ, alive

        def bcond(state):
            return state[0] < end

        def bbody(state):
            bptr, occ, alive, p_start, p_count, cur = state
            m4 = bptr * 4
            skip = b_meta[m4]
            start = b_meta[m4 + 1]
            count = b_meta[m4 + 2]
            box_hit = slab(b_bounds, bptr * 8, lox, loy, loz, ilx, ily, ilz, occ)
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
                    tri_ref.at[p_start // KMAX], tri_scratch.at[cur],
                    dma_sem.at[cur],
                ).wait()
                return test_pending(cur, p_count, occ)

            occ, alive = jax.lax.cond(
                new_leaf & (p_count > 0), flush, lambda a: a, (occ, alive)
            )
            p_start = jnp.where(new_leaf, start, p_start)
            p_count = jnp.where(new_leaf, count, p_count)
            cur = jnp.where(new_leaf, 1 - cur, cur)
            bptr = jnp.where(hit_any & (count == 0), bptr + 1, skip)
            bptr = jnp.where(alive, bptr, end)
            return bptr, occ, alive, p_start, p_count, cur

        _, occ, alive, p_start, p_count, cur = jax.lax.while_loop(
            bcond, bbody,
            (root, occ, alive, jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )

        def drain(args):
            occ, _ = args
            pltpu.make_async_copy(
                tri_ref.at[p_start // KMAX], tri_scratch.at[cur], dma_sem.at[cur]
            ).wait()
            return test_pending(cur, p_count, occ)

        occ, alive = jax.lax.cond(
            p_count > 0, drain, lambda a: a, (occ, alive)
        )
        return occ, alive

    def cond(state):
        return state[0] < Mt

    def body(state):
        tptr, occ, alive = state
        m4 = tptr * 4
        skip = t_meta[m4]
        leaf_inst = t_meta[m4 + 1]
        box_hit = slab(t_bounds, tptr * 8, wox, woy, woz, iwx, iwy, iwz, occ)
        hit_any = jnp.any(box_hit)
        is_leaf = leaf_inst >= 0
        occ, alive = jax.lax.cond(
            hit_any & is_leaf,
            lambda a: blas_walk(leaf_inst, *a),
            lambda a: a,
            (occ, alive),
        )
        tptr = jnp.where(hit_any & (~is_leaf), tptr + 1, skip)
        tptr = jnp.where(alive, tptr, Mt)
        return tptr, occ, alive

    occ0 = jnp.zeros((SUBS, LANES), jnp.float32)
    _, occ, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), occ0, jnp.any(act))
    )
    occ_ref[0] = occ


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse_occl(t_meta, t_bounds, b_meta, b_bounds, inst_i, inst_f,
                   tri_pack, rays, t_min, *, interpret=False):
    G, _, SUBS, _ = rays.shape
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # b_meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # b_bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_i
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_f
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
            pl.BlockSpec(
                (1, 8, SUBS, LANES), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # rays
            pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_specs=[
            pl.BlockSpec((1, SUBS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    (occ_out,) = pl.pallas_call(
        _kernel_occl,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32)],
        interpret=interpret,
    )(t_meta, t_bounds, b_meta, b_bounds, inst_i, inst_f, t_min_arr, rays,
      tri_pack)
    return occ_out


def tlas_occluded_pallas(
    im: InstancedMeshes,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    t_max: jnp.ndarray,
    active=None,
    packed: TlasPack = None,
    interpret: bool = False,
    subs: int | None = None,
) -> jnp.ndarray:
    """Any-hit shadow query against every mesh instance: True where some
    triangle lies in [t_min, t_max]. Boolean-equal to
    `tlas_closest_hit_pallas(...).t <= t_max` with per-lane early exit."""
    if packed is None:
        packed = pack_tlas_for_pallas(im)
    packed = jax.tree_util.tree_map(jnp.asarray, packed)

    N = o.shape[0]
    tmax32 = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (N,))
    rays = _pack_rays(o, d, tmax32, active, subs or DEFAULT_SUBS)

    occ_out = _traverse_occl(
        packed.t_meta, packed.t_bounds, packed.b_meta, packed.b_bounds,
        packed.inst_i, packed.inst_f, packed.tri, rays, jnp.asarray(t_min),
        interpret=interpret,
    )
    occ = occ_out.reshape(-1)[:N] > 0.5
    if active is not None:
        occ = occ & active
    return occ


@functools.partial(jax.jit, static_argnames=("interpret",))
def _traverse(t_meta, t_bounds, b_meta, b_bounds, inst_i, inst_f, tri_pack,
              rays, t_min, *, interpret=False):
    G, _, SUBS, _ = rays.shape
    t_min_arr = jnp.reshape(t_min.astype(jnp.float32), (1,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # b_meta
            pl.BlockSpec(memory_space=pltpu.SMEM),  # b_bounds
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_i
            pl.BlockSpec(memory_space=pltpu.SMEM),  # inst_f
            pl.BlockSpec(memory_space=pltpu.SMEM),  # t_min (1,)
            pl.BlockSpec(
                (1, 8, SUBS, LANES), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),  # rays
            pl.BlockSpec(memory_space=pl.ANY),  # tri_pack (L,8,128), HBM
        ],
        scratch_shapes=[
            pltpu.VMEM((2, KMAX, TRI_ROW), jnp.float32),  # double-buffered leaf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_specs=[
            pl.BlockSpec((1, SUBS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SUBS, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    t_out, id_out, inst_out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.float32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((G, SUBS, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(t_meta, t_bounds, b_meta, b_bounds, inst_i, inst_f, t_min_arr, rays, tri_pack)
    return t_out, id_out, inst_out


def tlas_closest_hit_pallas(
    im: InstancedMeshes,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_min,
    active=None,
    packed: TlasPack = None,
    interpret: bool = False,
    subs: int | None = None,
) -> Hit:
    """Closest hit of N rays against every mesh instance via the two-level
    packet kernel. Drop-in replacement for `tlas.instanced_closest_hit` (same
    Hit contract: t=inf on miss, smooth world normal, material id)."""
    if packed is None:
        packed = pack_tlas_for_pallas(im)
    packed = jax.tree_util.tree_map(jnp.asarray, packed)
    im = jax.tree_util.tree_map(jnp.asarray, im)

    N = o.shape[0]
    rays = _pack_rays(o, d, jnp.zeros((N,), jnp.float32), active,
                      subs or DEFAULT_SUBS)

    t_out, id_out, inst_out = _traverse(
        packed.t_meta, packed.t_bounds, packed.b_meta, packed.b_bounds,
        packed.inst_i, packed.inst_f, packed.tri, rays, jnp.asarray(t_min),
        interpret=interpret,
    )
    t_best = t_out.reshape(-1)[:N].astype(o.dtype)
    best_tri = id_out.reshape(-1)[:N]
    best_inst = inst_out.reshape(-1)[:N]
    t_best = jnp.where(t_best >= 1.0e38, INF, t_best)
    if active is not None:
        # Inactive lanes ride the packet; report misses (parked-lane contract).
        t_best = jnp.where(active, t_best, INF)
    best_tri = jnp.clip(best_tri, 0, packed.p_verts.shape[0] - 1)

    # Finalize with TWO packed row gathers (instance table + triangle
    # table) — barycentrics in local space, normal lifted by the
    # inverse-transpose (shape.rs:130-137, mesh.rs:77). Row gathers are
    # row-count-bound on TPU (PERF_NOTES r5), so the five narrow lookups
    # pack into two wide ones; concats are loop-invariant per dispatch.
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
    n_world = normalize(
        jnp.einsum("nij,nj->ni", gi[:, 12:21].reshape(-1, 3, 3), n_local)
    )
    return Hit(t=t_best, normal=n_world, mat_id=gi[:, 21].astype(jnp.int32))

"""Wavefront path-tracing integrator.

TPU-native counterpart of the recursive estimator in
/root/reference/src/renderer.rs:145-204. The per-pixel recursion becomes a
wavefront: all N rays advance through bounce depths together, and the
depth-d recursion

    L_d = emitted + direct + min(w_d * L_{d+1}, FIREFLY_CLAMP)   (per channel)

with w_d = f * |wi.n| / pdf (renderer.rs:156-168) is evaluated as a forward
sweep that records per-depth local radiance (emit + next-event estimation, or
environment on miss) and segment weights, followed by a reverse fold applying
the firefly clamp at every level — numerically identical to the reference's
post-recursion clamp, which cannot be expressed as a running forward product.

Terminated lanes (miss / invalid sample) simply carry zero weights: the
reverse fold multiplies any junk deeper values by 0, so compaction is never
needed for correctness.

Stream compaction (`compact=True`): at depth >= 1 the wavefront can be
partitioned live-first so dead lanes fill whole 128-ray packets, which then
exit the Pallas per-packet while_loops in a few skip steps. MEASURED AND
REJECTED as the default: path death is spatially coherent, so the same
all-dead packets already form under plain masking, and the partition's
per-depth prefix-sum + gathers cost more than they save (TPU v5e A/B at
6 bounces: 0.97x on dragon, 0.69x on teapot-glass — see _auto_compact and
tools/compaction_ab.py). The flag remains for scenes with genuinely
incoherent death; it is bit-identical to the masked path by construction.

Octant sorting (`compact="octant"`): additionally groups live lanes by
direction sign bits via a 9-bucket counting sort, a coherence proxy for
scattered bounce rays. ALSO MEASURED AND REJECTED as default on the same
A/B (dragon 6-bounce: 0.93x) — surviving deep lanes are already spatially
clustered, so the full-wavefront permutation gathers outweigh the packet
node-union reduction. Kept (bit-identical, tested) for genuinely
incoherent wavefronts.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .materials import bsdf, sample_f
from .utils.vmath import dot

__all__ = ["trace_paths", "FIREFLY_CLAMP"]


def _compaction_perm(active: jnp.ndarray):
    """Stable live-first partition WITHOUT a sort: two prefix sums give each
    lane its slot (`pos`, the inverse permutation), one scatter of arange
    gives the forward permutation. O(N) — cheaper than argsort on TPU.
    Returns (perm, pos) with sorted[i] = orig[perm[i]] and pos = perm^-1.
    """
    n = active.shape[0]
    n_alive = jnp.sum(active)
    pos_alive = jnp.cumsum(active) - 1
    pos_dead = n_alive + jnp.cumsum(~active) - 1
    pos = jnp.where(active, pos_alive, pos_dead).astype(jnp.int32)
    perm = (
        jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
    )
    return perm, pos


def _intersect_compacted(scene, o, d, t_min, active):
    """scene.intersect with the wavefront partitioned live-first.

    One gather in (rays), one gather out (hit fields); the traversal kernels
    in between see dead lanes concentrated into all-dead packets whose
    per-packet while_loops terminate in a few skip steps.
    """
    perm, pos = _compaction_perm(active)
    hit = scene.intersect(o[perm], d[perm], t_min, active=active[perm])
    return jax.tree_util.tree_map(lambda x: x[pos], hit)


def _octant_perm(d: jnp.ndarray, active: jnp.ndarray):
    """Stable 9-bucket counting sort of the wavefront: live lanes grouped by
    direction octant (sign of dx/dy/dz), dead lanes last. Packet traversal
    visits the union of its 128 lanes' node sets; bounce rays scattered by a
    diffuse BSDF destroy the spatial coherence that makes that union small,
    and octant grouping restores a cheap proxy for it. O(9N) adds/cumsums —
    no argsort. Returns (perm, pos) with sorted[i] = orig[perm[i]]."""
    n = d.shape[0]
    key = (
        (d[:, 0] < 0).astype(jnp.int32)
        + 2 * (d[:, 1] < 0).astype(jnp.int32)
        + 4 * (d[:, 2] < 0).astype(jnp.int32)
    )
    key = jnp.where(active, key, 8)
    onehot = key[:, None] == jnp.arange(9, dtype=jnp.int32)[None, :]  # (N,9)
    ranks = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1
    counts = jnp.sum(onehot, axis=0)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    rank = jnp.sum(jnp.where(onehot, ranks, 0), axis=1)
    pos = (offsets[key] + rank).astype(jnp.int32)
    perm = (
        jnp.zeros((n,), jnp.int32).at[pos].set(jnp.arange(n, dtype=jnp.int32))
    )
    return perm, pos


def _intersect_octsorted(scene, o, d, t_min, active):
    """scene.intersect with the wavefront octant-sorted (live lanes grouped
    by direction sign bits, dead lanes last). Bit-identical results to the
    masked path — permutation cannot change any lane's closest hit."""
    perm, pos = _octant_perm(d, active)
    hit = scene.intersect(o[perm], d[perm], t_min, active=active[perm])
    return jax.tree_util.tree_map(lambda x: x[pos], hit)


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so consecutive bits land 3 apart
    (standard Morton interleave)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _morton_perm(o: jnp.ndarray, d: jnp.ndarray, active: jnp.ndarray,
                 lo: jnp.ndarray, hi: jnp.ndarray):
    """Wavefront sort by (direction octant, 7-bit Morton cell of origin).

    Scattered bounce rays destroy packet coherence twice over: directions
    diverge AND origins spread across the surface, so a 1024-ray packet's
    node-set union approaches the sum over rays. Octant bits alone (the
    round-3 sort) fix directions; adding a Morton code of the ray origin
    quantized to the scene box groups each packet onto one surface cell,
    shrinking both the live-chunk list and each walked chunk's opened set.
    24-bit key = octant(3) | morton21(7 bits/axis); dead lanes sort last.
    O(N log N) argsort (~3 ms at 518k rays) vs ~100+ ms incoherent
    megamesh traversals. KEY ORDER A/B (r5, TPU): origin-major measured
    18% faster on an ISOLATED scattered-bounce closest-hit (129 -> 106 ms)
    but was end-to-end neutral on dragon871k/dragon/wine_glass and a 17%
    REGRESSION on lego (the two-level TLAS walk is direction-driven:
    near-to-far instance ordering needs octant-coherent packets), so
    octant-major is the shipped order. Returns (perm, pos), pos =
    perm^-1."""
    n = d.shape[0]
    octant = (
        (d[:, 0] < 0).astype(jnp.int32)
        + 2 * (d[:, 1] < 0).astype(jnp.int32)
        + 4 * (d[:, 2] < 0).astype(jnp.int32)
    )
    span = jnp.maximum(hi - lo, 1e-20)
    q = jnp.clip(((o - lo) / span) * 127.0, 0.0, 127.0).astype(jnp.int32)
    morton = (
        (_part1by2(q[:, 0]) << 2)
        | (_part1by2(q[:, 1]) << 1)
        | _part1by2(q[:, 2])
    )
    key = (octant << 21) | morton
    key = jnp.where(active, key, jnp.int32(1) << 26)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    # Inverse by a second argsort: a TPU scatter at this row count costs
    # ~24 ms where an argsort costs ~3 ms (r5 measurement).
    pos = jnp.argsort(perm).astype(jnp.int32)
    return perm, pos


def _gather_packed(perm, arrays):
    """Take rows `perm` of several (N,) / (N, k) arrays with ONE gather.

    TPU row-gathers are row-count-bound (~5.5 ms at 518k rows whether the
    row is 4 or 64 bytes, r5 measurement), so packing the columns into one
    matrix and gathering once replaces k gathers with one.

    Integer/bool columns ride as f32 VALUES, not bitcasts: f32 is exact
    for |v| < 2^24 (mat_id, bool flags — triangle counts here are ~2^20),
    while a bitcast turns small ints into DENORMAL bit patterns that TPU
    vector ops flush to zero — a bitcast active mask silently killed every
    bounce lane on real hardware (r5 bug; CPU, which doesn't flush, hid it
    from the interpret-mode tests)."""
    cols, specs = [], []
    for a in arrays:
        x = a
        if x.dtype != jnp.float32:
            x = x.astype(jnp.float32)
        if x.ndim == 1:
            x = x[:, None]
        specs.append((a.dtype, a.ndim))
        cols.append(x)
    packed = jnp.concatenate(cols, axis=1)[perm]
    out, off = [], 0
    for (dt, nd), c in zip(specs, cols):
        w = c.shape[1]
        sl = packed[:, off:off + w]
        off += w
        if dt == jnp.bool_:
            sl = sl > 0.5
        elif jnp.issubdtype(dt, jnp.integer):
            sl = sl.astype(dt)
        else:
            sl = sl.astype(dt)
        out.append(sl[:, 0] if nd == 1 else sl)
    return out


def _scene_box(scene):
    """Root bounds of the scene's mesh BVH (the interesting geometry for
    packet coherence); falls back to the TLAS root or a unit box."""
    if scene.bvh is not None:
        return scene.bvh.node_min[0], scene.bvh.node_max[0]
    if scene.instanced is not None:
        return scene.instanced.t_min[0], scene.instanced.t_max[0]
    z = jnp.zeros((3,), jnp.float32)
    return z, z + 1.0


def _intersect_mortonsorted(scene, o, d, t_min, active):
    """scene.intersect with the wavefront sorted by (octant, origin cell).
    Bit-identical to the masked path — a permutation cannot change any
    lane's closest hit."""
    from .ops.intersect import Hit

    lo, hi = _scene_box(scene)
    perm, pos = _morton_perm(o, d, active, lo, hi)
    o_p, d_p, act_p = _gather_packed(perm, (o, d, active))
    hit = scene.intersect(o_p, d_p, t_min, active=act_p)
    t_u, n_u, m_u = _gather_packed(pos, (hit.t, hit.normal, hit.mat_id))
    return Hit(t=t_u, normal=n_u, mat_id=m_u)


def _auto_compact(scene, max_bounces: int):
    """Plain masking for small scenes; morton wavefront sorting wherever a
    WIDE Pallas kernel traverses (bvh8 mesh or tlas8 instances).

    Compaction/octant modes were MEASURED OFF at dragon-120k scale in
    rounds 3-4, but that implementation was gather-bound (6 narrow row
    gathers + a scatter-built inverse per sorted traversal, ~55 ms at 518k
    rays). With the r5 packed-gather + argsort-inverse machinery the sort
    costs ~17 ms and the wins are decisive on every wide-kernel scene
    (TPU v5e, driver configs): dragon 5.8 -> 27.2, dragon871k 4.7 -> 16.6,
    pegasus 6.3 -> 14.8, wine_glass 23.0 -> 30.8, lego 2.7 -> 16.9
    Mrays/s. Depth-0 wavefronts (tile-coherent) are never sorted, so
    0-bounce workloads (teapot, fractal_teapots) are unaffected. Small
    brute-force/binary-kernel meshes keep plain masking (their traversals
    are cheaper than the sort). Env override RPT_COMPACT=0|1|octant|morton
    for A/B."""
    import os

    mode = os.environ.get("RPT_COMPACT")
    if mode is not None and mode != "":
        return mode if mode in ("octant", "morton") else bool(int(mode))
    if (getattr(scene, "bvh8_packed", None) is not None
            or getattr(scene, "instanced8_packed", None) is not None):
        return "morton"
    return False

# renderer.rs:15
FIREFLY_CLAMP = 100.0
# Guard: the reference divides by pdf with no check (renderer.rs:162); a pdf of
# exactly 0 there produces inf/NaN that its f64::min coerces to the clamp. We
# instead drop those measure-zero samples.
_PDF_EPS = 1e-10


def sample_lights(scene, mat, pos, n, wo, key, t_min, found, compact=False) -> jnp.ndarray:
    """Next-event estimation against every light (renderer.rs:177-204).

    One shadow ray per (ray, light) per bounce. `found` masks rays that
    actually hit a surface this depth.
    """
    from .lights import AmbientLightData

    total = jnp.zeros_like(pos)
    for i, light in enumerate(scene.lights):
        if isinstance(light, AmbientLightData):
            # Ambient shortcut: color * albedo, no shadow ray
            # (renderer.rs:187-188)
            total = total + light.color * mat.color
            continue
        k_i = jax.random.fold_in(key, i)
        intensity, wi, dist = light.illuminate(k_i, pos)
        # Shadow rays only matter for lanes that hit a surface; dead lanes
        # park immediately inside the BVH/TLAS traversal.
        if compact == "morton":
            lo, hi = _scene_box(scene)
            perm, pos_inv = _morton_perm(pos, wi, found, lo, hi)
            o_p, wi_p, dist_p, act_p = _gather_packed(
                perm, (pos, wi, dist, found))
            occ = scene.occluded(o_p, wi_p, t_min, dist_p, active=act_p)
            (vis_u,) = _gather_packed(pos_inv, (~occ,))
            visible = vis_u
        elif compact == "octant":
            perm, pos_inv = _octant_perm(wi, found)
            occ = scene.occluded(
                pos[perm], wi[perm], t_min, dist[perm], active=found[perm]
            )
            visible = ~occ[pos_inv]
        elif compact:
            # Compose compaction with the any-hit query (ADVICE r3): permute
            # live-first, run the early-exit occlusion kernels, un-permute —
            # so every compact mode shares the any-hit path.
            perm, pos_inv = _compaction_perm(found)
            occ = scene.occluded(
                pos[perm], wi[perm], t_min, dist[perm], active=found[perm]
            )
            visible = ~occ[pos_inv]
        else:
            # Any-hit query: boolean-equal to `closest.t <= dist` but the
            # packet kernels early-exit on the first occluder.
            visible = ~scene.occluded(pos, wi, t_min, dist, active=found)
        f = bsdf(mat, n, wo, wi)
        contrib = f * intensity * dot(wi, n)[..., None]
        total = total + jnp.where(visible[..., None], contrib, 0.0)
    return jnp.where(found[..., None], total, 0.0)


def trace_paths(
    scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    key: jax.Array,
    max_bounces: int,
    t_min: float,
    firefly_clamp: float = FIREFLY_CLAMP,
    compact: bool | str | None = None,
    want_stats: bool = False,
) -> jnp.ndarray:
    """Monte Carlo radiance estimate for N camera rays; returns (N, 3).

    Parity with trace_ray (renderer.rs:145-174): environment on miss, emitted
    + NEE at each vertex, BSDF-importance-sampled continuation with the
    one-sample-MIS mixture pdf, no Russian roulette, per-channel firefly clamp
    on each indirect contribution.

    `compact`: partition each post-camera wavefront live-first so dead lanes
    form all-dead packets (see module docstring); "octant" additionally
    groups live lanes by direction octant (coherence proxy for scattered
    bounce rays). Both are bit-identical to the masked path. None = auto.
    `want_stats`: also return {"found_frac", "cont_frac"} per depth — the
    live-lane occupancy counters behind rpt_tpu.profiling.depth_stats.
    """
    scene = scene.to_device()
    if compact is None:
        compact = _auto_compact(scene, max_bounces)
    locals_per_depth = []
    weights_per_depth = []
    active = jnp.ones(o.shape[0], bool)
    found_frac = []
    cont_frac = []

    for depth in range(max_bounces + 1):
        k_depth = jax.random.fold_in(key, depth)
        k_lights, k_bsdf = jax.random.split(k_depth)

        if depth == 0:
            hit = scene.intersect(o, d, t_min)
        elif compact == "morton":
            hit = _intersect_mortonsorted(scene, o, d, t_min, active)
        elif compact == "octant":
            hit = _intersect_octsorted(scene, o, d, t_min, active)
        elif compact:
            hit = _intersect_compacted(scene, o, d, t_min, active)
        else:
            # Dead lanes (missed / invalid sample at a previous depth) park
            # inside the BVH/TLAS traversal loops via the active mask. (A
            # lax.cond skipping whole depths was tried and reverted: on TPU
            # `conditional` breaks fusion and forces operand copies, costing
            # far more than it saves in the common some-lanes-alive case.)
            hit = scene.intersect(o, d, t_min, active=active)
        found = hit.valid
        env = scene.environment.get_color(d)

        t_safe = jnp.where(found, hit.t, 0.0)
        pos = o + t_safe[:, None] * d
        wo = -d
        mat = scene.materials.gather(hit.mat_id)

        if want_stats:
            found_frac.append(jnp.mean(found.astype(jnp.float32)))

        emitted = mat.emittance[:, None] * mat.color
        # Depth-0 shadow rays inherit the camera tiles' spatial coherence
        # (origins are primary hit points in tile order), so the morton
        # sort would be pure overhead there (~17 ms/light at 518k rays).
        shadow_compact = False if (depth == 0 and compact == "morton") else compact
        direct = sample_lights(
            scene, mat, pos, hit.normal, wo, k_lights, t_min, found,
            compact=shadow_compact,
        )
        local = jnp.where(found[:, None], emitted + direct, env)
        locals_per_depth.append(local)

        if depth < max_bounces:
            wi, pdf, valid = sample_f(k_bsdf, mat, hit.normal, wo)
            # Detached sampling: the sampled direction and its pdf are
            # treated as constants under differentiation, so parameter
            # gradients flow through the BSDF *evaluation* only — the
            # standard unbiased detached estimator for differentiable path
            # tracing (no-op for the primal computation).
            wi = jax.lax.stop_gradient(wi)
            pdf = jax.lax.stop_gradient(pdf)
            f = bsdf(mat, hit.normal, wo, wi)
            ok = found & valid & (pdf > _PDF_EPS)
            pdf_safe = jnp.where(ok, pdf, 1.0)
            w = f * (jnp.abs(dot(wi, hit.normal)) / pdf_safe)[:, None]
            w = jnp.where(ok[:, None], w, 0.0)
            weights_per_depth.append(w)
            o = pos
            d = wi
            active = ok
            if want_stats:
                cont_frac.append(jnp.mean(ok.astype(jnp.float32)))

    # Reverse fold with the per-level clamp (renderer.rs:162-167)
    radiance = locals_per_depth[-1]
    for depth in range(max_bounces - 1, -1, -1):
        indirect = jnp.minimum(weights_per_depth[depth] * radiance, firefly_clamp)
        radiance = locals_per_depth[depth] + indirect
    if want_stats:
        stats = {
            "found_frac": jnp.stack(found_frac),
            "cont_frac": (
                jnp.stack(cont_frac) if cont_frac else jnp.zeros((0,), jnp.float32)
            ),
        }
        return radiance, stats
    return radiance

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


def _auto_compact(scene, max_bounces: int) -> bool:
    """MEASURED OFF. Compaction could only pay where traversal is per-packet
    (the Pallas kernels) with live lanes scattered across packets — but
    wavefront death is spatially COHERENT (adjacent pixels' paths die
    together), so all-dead packets already early-exit under plain masking and
    the partition's per-depth prefix-sum + 6 wavefront gathers are pure
    overhead. A/B on TPU v5e (tools/compaction_ab.py, 6 bounces):
      dragon 960x540 (cont_frac 0.20→0.009):      compacted/masked = 0.97x
      teapot-glass 800x800 (cont_frac 0.09→0.003): compacted/masked = 0.69x
    The flag stays available (and parity-tested) for experimentation."""
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
        if compact == "octant":
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
        direct = sample_lights(
            scene, mat, pos, hit.normal, wo, k_lights, t_min, found,
            compact=compact,
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

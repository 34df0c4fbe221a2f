"""On-TPU isolation of the chunked wide-BVH kernel's per-grid-step costs.

Synthesizes a dragon871k-shaped Bvh8Pack (44 chunks x 1024 wide nodes) with
EMPTY nodes directly on the device (no host transfer, no relay bias) and
times _traverse8 at full bench packet count under three visit regimes:

  dead   — no packet can enter any chunk root: every (packet, chunk) grid
           step is a dead slot (cnt=0). Times the irreducible per-step cost
           (index-map eval + kernel preamble + skipped copies).
  all    — every chunk root is hit by every packet, but the chunk's wide
           root has no surviving children: every step streams its wmeta
           (SMEM) + wbounds (VMEM) blocks and opens exactly one node.
           Minus `dead`, this is the per-chunk STREAMING cost.
  one    — one live chunk per packet (the culled steady state).

Also times the XLA visit-plan prepass alone. Prints per-step microseconds.

Usage (on TPU): timeout 550 python tools/gridstep_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from rpt_tpu.ops.bvh8_pallas import (
        _chunk_visit_plan, _traverse8, BRANCH, META_STRIDE, _BIG,
    )
    from rpt_tpu.ops.bvh_pallas import TRI_ROW, KMAX

    C, Mc, G, SUBS = 44, 1024, 507, 8
    key = jax.random.PRNGKey(0)

    # Empty wide nodes: inverted child boxes, empty child meta.
    wbounds = jnp.broadcast_to(
        jnp.concatenate([
            jnp.full((3,), _BIG, jnp.float32),
            jnp.full((3,), -_BIG, jnp.float32),
            jnp.zeros((TRI_ROW - 6,), jnp.float32),
        ])[None, None, None, :],
        (C, Mc, BRANCH, TRI_ROW),
    )
    meta1 = np.zeros((META_STRIDE,), np.int32)
    meta1[1:16:2] = -1
    wmeta = jnp.broadcast_to(
        jnp.asarray(meta1)[None, :], (C * Mc, META_STRIDE)
    ).reshape(-1)
    tri = jnp.zeros((8, KMAX, TRI_ROW), jnp.float32)

    def roots_for(hit: bool):
        lo, hi = (-1e9, 1e9) if hit else (1e9, -1e9)
        r = np.zeros((C, 8), np.float32)
        r[:, 0:3], r[:, 3:6] = lo, hi
        return jnp.asarray(r.reshape(-1))

    def roots_one():
        # Chunk 0 open to everything, others inverted.
        r = np.zeros((C, 8), np.float32)
        r[:, 0:3], r[:, 3:6] = 1e9, -1e9
        r[0, 0:3], r[0, 3:6] = -1e9, 1e9
        return jnp.asarray(r.reshape(-1))

    o = jax.random.normal(key, (G * SUBS * 128, 3), jnp.float32)
    d = jax.random.normal(jax.random.fold_in(key, 1), (G * SUBS * 128, 3))
    from rpt_tpu.ops.bvh_pallas import _pack_rays

    rays = _pack_rays(o, d, jnp.zeros((G * SUBS * 128,), jnp.float32), None,
                      SUBS)
    t_min = jnp.asarray(1e-3, jnp.float32)

    prep = jax.jit(lambda ro, ra: _chunk_visit_plan(ro, ra, 1e-3, False))

    def bench(fn, *args, reps=6):
        jax.block_until_ready(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    for name, roots in (("dead", roots_for(False)), ("all", roots_for(True)),
                        ("one", roots_one())):
        dt = bench(
            lambda ro: _traverse8(wbounds, wmeta, tri, ro, rays, t_min,
                                  n_chunks=C),
            roots,
        )
        print(f"{name:5s}: {dt * 1e3:8.2f} ms total  "
              f"{dt / (G * C) * 1e6:6.3f} us/(packet,chunk) step  "
              f"{dt / G * 1e6:7.2f} us/packet")
    dt = bench(prep, roots_for(True), rays)
    print(f"prep : {dt * 1e3:8.2f} ms total  {dt / G * 1e6:7.2f} us/packet")


if __name__ == "__main__":
    main()

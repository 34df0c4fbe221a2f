"""Host-side simulation of the Pallas packet traversal: counts node steps
and leaf visits per 128-ray packet, to attribute kernel time (scalar loop
iterations vs leaf DMA waits) without instrumenting the kernel.

Usage: python tools/traversal_profile.py [--scene dragon|teapot] [--size 240]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--size", type=int, default=240)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import math

    from rpt_tpu import Camera
    from rpt_tpu.renderer import pixel_ndc

    if args.scene == "dragon":
        from dragon import build_scene

        scene = build_scene(None)
        camera = Camera.look_at((-2.5, 4.0, 6.5), (0.0, 0.0, 0.0),
                                (0.0, 1.0, 0.0), math.pi / 6)
    else:
        from teapot import build_scene

        scene = build_scene()
        camera = Camera()

    sd = scene.compile()
    bvh = sd.bvh
    M = bvh.num_nodes
    node_min = np.asarray(bvh.node_min)
    node_max = np.asarray(bvh.node_max)
    skip = np.asarray(bvh.skip)
    is_leaf = np.asarray(bvh.is_leaf).astype(bool)

    w = args.size
    h = int(args.size * 9 / 16)
    xg, yg, _ = pixel_ndc(w, h)
    o, d = camera.cast_rays(xg, yg, jax.random.PRNGKey(0))
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    N = o.shape[0]
    P = N // 128
    o = o[: P * 128].reshape(P, 128, 3)
    d = d[: P * 128].reshape(P, 128, 3)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)

    # Lockstep simulation over packets: each packet advances its own pointer.
    ptr = np.zeros(P, np.int64)
    steps = np.zeros(P, np.int64)
    leaves = np.zeros(P, np.int64)
    live = np.ones(P, bool)
    t0 = time.time()
    it = 0
    while live.any():
        it += 1
        cur = np.where(live, ptr, 0)
        bmin = node_min[cur][:, None, :]  # (P,1,3)
        bmax = node_max[cur][:, None, :]
        t1 = (bmin - o) * inv
        t2 = (bmax - o) * inv
        lo = np.minimum(t1, t2).max(-1)
        hi = np.maximum(t1, t2).min(-1)
        hit = ((lo <= hi) & (hi >= 1e-3)).any(-1)  # no t_best pruning: upper bound
        leaf = is_leaf[cur]
        steps += live
        leaves += live & hit & leaf
        nxt = np.where(hit & ~leaf, cur + 1, skip[cur])
        ptr = np.where(live, nxt, ptr)
        live = live & (ptr < M)
        if it > 10 * M:
            raise RuntimeError("no convergence")
    dt = time.time() - t0
    print(f"{args.scene}: {P} packets, {M} nodes, sim {dt:.1f}s")
    for name, arr in (("node steps", steps), ("leaf visits", leaves)):
        print(f"  {name}/packet: mean {arr.mean():.0f}  p50 {np.percentile(arr,50):.0f}"
              f"  p90 {np.percentile(arr,90):.0f}  max {arr.max()}")
    print(f"  totals: {steps.sum()} steps, {leaves.sum()} leaf DMAs "
          f"({leaves.sum()/max(steps.sum(),1)*100:.1f}% of steps)")


if __name__ == "__main__":
    main()

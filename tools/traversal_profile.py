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




def profile_wide(scene_name: str, size: int = 240, subs: int = 8):
    """Wide-BVH (bvh8) analog of main(): opened wide nodes + leaf-child
    tests per SUBS*128-ray packet, for the roofline in PERF_NOTES.md.
    Host-side simulation of ops/bvh8_pallas.py's stack walk (no t_best
    pruning: upper bound)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import math

    from rpt_tpu import Camera
    from rpt_tpu.renderer import pixel_ndc_tiled
    from rpt_tpu.ops.bvh8_pallas import pack_bvh8_for_pallas, META_STRIDE, BRANCH

    if scene_name == "dragon":
        from dragon import build_scene

        scene = build_scene(None)
        camera = Camera.look_at((-2.5, 4.0, 6.5), (0.0, 0.0, 0.0),
                                (0.0, 1.0, 0.0), math.pi / 6)
    else:
        from teapot import build_scene

        scene = build_scene()
        camera = Camera()

    sd = scene.compile()
    p8 = sd.bvh8_packed
    C, Mc = p8.wbounds.shape[0], p8.wbounds.shape[1]
    wb = np.asarray(p8.wbounds, np.float64)  # (C, Mc, 8, 128)
    wm = np.asarray(p8.wmeta).reshape(C, Mc, META_STRIDE)

    w = size
    h = int(size * 9 / 16)
    xg, yg, _, _ = pixel_ndc_tiled(w, h)
    o, d = camera.cast_rays(xg, yg, __import__("jax").random.PRNGKey(0))
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    pack = subs * 128
    P = o.shape[0] // pack
    o = o[: P * pack].reshape(P, pack, 3)
    d = d[: P * pack].reshape(P, pack, 3)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)

    opened = np.zeros(P, np.int64)
    leaf_tests = np.zeros(P, np.int64)
    t0 = time.time()
    for p in range(P):
        op, lt = 0, 0
        for c in range(C):
            stack = [0]
            while stack:
                nid = stack.pop()
                b = wb[c, nid]  # (8, 128)
                bmin = b[:, 0:3][:, None, :]
                bmax = b[:, 3:6][:, None, :]
                t1 = (bmin - o[p][None]) * inv[p][None]
                t2 = (bmax - o[p][None]) * inv[p][None]
                lo = np.minimum(t1, t2).max(-1)
                hi = np.maximum(t1, t2).min(-1)
                hitc = ((lo <= hi) & (hi >= 1e-3)).any(-1)  # (8,)
                op += 1
                for ch in range(BRANCH):
                    if not hitc[ch]:
                        continue
                    a, cb = wm[c, nid, 2 * ch], wm[c, nid, 2 * ch + 1]
                    if cb > 0:
                        lt += 1
                    elif cb == 0:
                        stack.append(a)
        opened[p] = op
        leaf_tests[p] = lt
    dt = time.time() - t0
    print(f"{scene_name} wide subs={subs}: {P} packets, {C} chunks, sim {dt:.1f}s")
    for name, arr in (("opened wide nodes", opened), ("leaf tests", leaf_tests)):
        print(f"  {name}/packet: mean {arr.mean():.1f}  p90 {np.percentile(arr, 90):.0f}"
              f"  max {arr.max()}  total {arr.sum()}")


if __name__ == "__main__":
    if "--wide" in sys.argv:
        sys.argv.remove("--wide")
        ap = argparse.ArgumentParser()
        ap.add_argument("--scene", default="dragon")
        ap.add_argument("--size", type=int, default=240)
        ap.add_argument("--subs", type=int, default=8)
        a = ap.parse_args()
        profile_wide(a.scene, a.size, a.subs)
    else:
        main()

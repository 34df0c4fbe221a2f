"""Host-side probe of the chunked wide-BVH at dragon871k scale: per-packet
live-chunk counts (the round-5 visit-plan prepass), padding waste per chunk,
and a sampled exact replay (with t_best carry + near-to-far chunk order +
root re-test) of opened nodes / leaf tests / chunks actually walked.

Feeds the PERF_NOTES roofline: per-packet time model is
  walked_chunks x max(bounds-stream, walk) with
  walk ~ opened x 0.6us sync + leaf_tests x leaf cost.

Usage: python tools/chunk_probe.py [--tris 871000] [--width 960] [--sample 32]
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
    ap.add_argument("--scene", default="dragon", choices=["dragon", "pegasus"])
    ap.add_argument("--tris", type=int, default=871_000)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--sample", type=int, default=32)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import math

    from rpt_tpu import Camera
    from rpt_tpu.renderer import pixel_ndc_tiled
    from rpt_tpu.ops.bvh8_pallas import META_STRIDE, BRANCH

    t0 = time.time()
    if args.scene == "dragon":
        from dragon import build_scene

        scene = build_scene(None, target_tris=args.tris)
        camera = Camera.look_at((-2.5, 4.0, 6.5), (0.0, 0.0, 0.0),
                                (0.0, 1.0, 0.0), math.pi / 6)
    else:
        from pegasus import DEFAULT_ZIP, build_scene

        scene = build_scene(DEFAULT_ZIP, target_tris=args.tris)
        camera = Camera.look_at((0.0, 1.5, 3.1), (0.0, 1.0, 0.0),
                                (0.0, 1.0, 0.0), math.pi / 4)
    sd = scene.compile()
    p8 = sd.bvh8_packed
    print(f"scene compiled in {time.time() - t0:.0f}s")

    C, Mc = p8.wbounds.shape[0], p8.wbounds.shape[1]
    wb = np.asarray(p8.wbounds, np.float64)
    wm = np.asarray(p8.wmeta).reshape(C, Mc, META_STRIDE)
    roots = np.asarray(p8.roots).reshape(C, 8)
    # Real node count per chunk: nodes whose meta is not the empty pad.
    real = (wm[:, :, 1:16:2] != -1).any(-1).sum(1)
    print(f"chunks C={C}  Mc={Mc} (block {Mc * 4096 / 1e6:.1f} MB)")
    print(f"  real wide nodes/chunk: mean {real.mean():.0f} p50 "
          f"{np.percentile(real, 50):.0f} max {real.max()} min {real.min()}"
          f"  padding waste {(1 - real.mean() / Mc) * 100:.0f}%")

    w = args.width
    h = int(args.width * 9 / 16)
    xg, yg, _, _ = pixel_ndc_tiled(w, h)
    o, d = camera.cast_rays(xg, yg, jax.random.PRNGKey(0))
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    pack = 8 * 128
    P = o.shape[0] // pack
    o = o[: P * pack].reshape(P, pack, 3)
    d = d[: P * pack].reshape(P, pack, 3)
    inv = 1.0 / np.where(np.abs(d) > 1e-20, d, 1e-20)

    # --- prepass live-chunk counts over ALL packets (vectorized) ---
    bmin = roots[:, 0:3]
    bmax = roots[:, 3:6]
    t1 = (bmin[None, :, None, :] - o[:, None, :, :]) * inv[:, None, :, :]
    t2 = (bmax[None, :, None, :] - o[:, None, :, :]) * inv[:, None, :, :]
    lo = np.minimum(t1, t2).max(-1)  # (P, C, pack)
    hi = np.maximum(t1, t2).min(-1)
    ok = (lo <= hi) & (hi >= 1e-3)
    hit = ok.any(-1)  # (P, C)
    entry = np.where(ok, lo, np.inf).min(-1)
    cnt = hit.sum(1)
    print(f"prepass live chunks/packet (primaries, no t_best): mean "
          f"{cnt.mean():.1f} p50 {np.percentile(cnt, 50):.0f} p90 "
          f"{np.percentile(cnt, 90):.0f} max {cnt.max()} of {C}")

    # --- sampled exact replay with t_best carry ---
    tri = np.asarray(p8.tri, np.float64)  # (L, 8, 128)
    rng = np.random.default_rng(0)
    sample = rng.choice(P, size=min(args.sample, P), replace=False)
    stats = []
    for p in sample:
        op_ = o[p]
        dp = d[p]
        ip = inv[p]
        t_best = np.full(pack, np.inf)
        order = np.argsort(np.where(hit[p], entry[p], np.inf))
        n_live = int(hit[p].sum())
        opened = leaf_tests = walked = 0
        for c in order[:n_live]:
            # root re-test vs running t_best
            rl = (roots[c, 0:3][None] - op_) * ip
            rh = (roots[c, 3:6][None] - op_) * ip
            lo_r = np.minimum(rl, rh).max(-1)
            hi_r = np.maximum(rl, rh).min(-1)
            if not ((lo_r <= hi_r) & (hi_r >= 1e-3) & (lo_r <= t_best)).any():
                continue
            walked += 1
            stack = [0]
            while stack:
                nid = stack.pop()
                b = wb[c, nid]
                t1n = (b[:, 0:3][:, None, :] - op_[None]) * ip[None]
                t2n = (b[:, 3:6][:, None, :] - op_[None]) * ip[None]
                lon = np.minimum(t1n, t2n).max(-1)
                hin = np.maximum(t1n, t2n).min(-1)
                hitc = ((lon <= hin) & (hin >= 1e-3) & (lon <= t_best)).any(-1)
                opened += 1
                for ch in range(BRANCH):
                    if not hitc[ch]:
                        continue
                    a, cb = wm[c, nid, 2 * ch], wm[c, nid, 2 * ch + 1]
                    if cb > 0:
                        leaf_tests += 1
                        blk = tri[a // 8]  # (8, 128) swizzled rows
                        v0 = blk[:, 0:3]
                        pn = blk[:, 9:12]
                        pv = blk[:, 12]
                        cos = pn @ dp.T  # (8, pack)
                        cos = np.where(np.abs(cos) > 1e-8, cos, 1e-8)
                        tt = (pv[:, None] - pn @ op_.T) / cos
                        pt = op_[None] + tt[..., None] * dp[None]
                        dd = pt - v0[:, None]
                        d20 = np.einsum("kpj,kj->kp", dd, blk[:, 3:6])
                        d21 = np.einsum("kpj,kj->kp", dd, blk[:, 6:9])
                        vv = (blk[:, 15, None] * d20 - blk[:, 14, None] * d21
                              ) * blk[:, 16, None]
                        ww = (blk[:, 13, None] * d21 - blk[:, 14, None] * d20
                              ) * blk[:, 16, None]
                        uu = 1.0 - vv - ww
                        okt = ((np.abs(cos) >= 1e-8) & (tt >= 1e-3)
                               & (uu >= 0) & (vv >= 0) & (ww >= 0)
                               & (np.arange(8)[:, None] < cb))
                        th = np.where(okt, tt, np.inf).min(0)
                        t_best = np.minimum(t_best, th)
                    elif cb == 0:
                        stack.append(a)
        stats.append((n_live, walked, opened, leaf_tests))
    st = np.array(stats)
    print(f"replay over {len(sample)} packets (t_best carry, near-to-far):")
    for i, name in enumerate(
            ("live chunks", "walked chunks", "opened nodes", "leaf tests")):
        col = st[:, i]
        print(f"  {name}/packet: mean {col.mean():.1f} p90 "
              f"{np.percentile(col, 90):.0f} max {col.max()}")
    # Time model per packet (1024 rays), v5e-ish constants.
    sync_us = 0.6
    stream_us = Mc * 4096 / 350e3  # bytes / (350 GB/s effective) in us
    walk_us = st[:, 2].mean() * sync_us
    leaf_us = st[:, 3].mean() * 0.45  # ~8 subgroup passes + DMA, measured r4
    print(f"model/packet: stream {st[:, 1].mean() * stream_us:.0f}us "
          f"(if not overlapped), walk {walk_us:.0f}us, leaf {leaf_us:.0f}us")


if __name__ == "__main__":
    main()

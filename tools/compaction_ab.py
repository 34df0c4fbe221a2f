"""A/B: stream compaction on/off for deep-bounce mesh workloads, on TPU.

VERDICT r2 item 6: measure what parked lanes cost at wine_glass (6 bounces)
and pegasus (8 bounces) class depths, and whether the live-first partition
(rpt_tpu.integrator, `compact=`) wins. Prints one JSON line per workload with
per-depth occupancy and both timings.

Usage:  python tools/compaction_ab.py [--passes 6] [--workloads dragon,teapot_glass]
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

import jax
import jax.numpy as jnp
import numpy as np


def _build(name):
    """(scene, camera, width, height, bounces, t_min)"""
    from rpt_tpu import Camera, Material, Object

    if name == "dragon":
        from dragon import build_scene

        cam = Camera.look_at(
            (-2.5, 4.0, 6.5), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), math.pi / 6
        )
        return build_scene(None), cam, 960, 540, 6, 1e-3
    if name == "teapot_glass":
        # wine_glass-class: a dielectric mesh at 6 bounces (wine_glass.rs:70-74)
        from teapot import build_scene

        scene = build_scene()
        # Re-material the mesh object to glass: transmission lobe keeps lanes
        # alive far deeper than diffuse.
        scene.objects[0] = Object(
            scene.objects[0].shape, Material.clear(1.5, 0.0001)
        )
        scene._compiled = None
        return scene, Camera(), 800, 800, 6, 1e-3
    raise ValueError(name)


def measure(name, passes):
    from rpt_tpu.integrator import trace_paths
    from rpt_tpu.renderer import pixel_ndc

    scene, camera, w, h, bounces, t_min = _build(name)
    sd = scene.compile()
    xg, yg, dim = pixel_ndc(w, h)
    tmin = jnp.asarray(t_min, jnp.float32)

    def make_fn(compact):
        @jax.jit
        def fn(key, n):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                kj, kc, kt = jax.random.split(k, 3)
                jit = jax.random.uniform(kj, (2, xg.shape[0]), xg.dtype,
                                         minval=-1.0 / dim, maxval=1.0 / dim)
                o, d = camera.cast_rays(xg + jit[0], yg + jit[1], kc)
                c = trace_paths(sd, o, d, kt, bounces, tmin, compact=compact)
                return acc + jnp.sum(c)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return fn

    key = jax.random.PRNGKey(0)
    out = {"workload": name, "resolution": f"{w}x{h}", "bounces": bounces,
           "device": jax.default_backend()}

    # Occupancy (the quantity compaction exploits)
    @jax.jit
    def occ():
        o, d = camera.cast_rays(xg, yg, jax.random.PRNGKey(1))
        _, stats = trace_paths(sd, o, d, jax.random.PRNGKey(2), bounces, tmin,
                               want_stats=True)
        return stats
    stats = jax.device_get(occ())
    out["cont_frac"] = [round(float(x), 4) for x in stats["cont_frac"]]

    for label, compact in (
        ("masked", False), ("compacted", True), ("octant", "octant")
    ):
        fn = make_fn(compact)
        jax.block_until_ready(fn(key, 1))  # compile + warm
        t0 = time.perf_counter()
        jax.block_until_ready(fn(key, passes))
        dt = time.perf_counter() - t0
        rays = w * h * (bounces + 1) * passes  # closest-hit rays (lower bound)
        out[label] = {"seconds": round(dt, 3),
                      "mrays_per_sec": round(rays / dt / 1e6, 3)}
    out["speedup"] = round(out["masked"]["seconds"] / out["compacted"]["seconds"], 3)
    out["speedup_octant"] = round(
        out["masked"]["seconds"] / out["octant"]["seconds"], 3
    )
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=6)
    ap.add_argument("--workloads", default="dragon,teapot_glass")
    args = ap.parse_args()
    for name in args.workloads.split(","):
        measure(name.strip(), args.passes)

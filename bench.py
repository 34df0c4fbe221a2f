"""Benchmark: rays/sec on the Cornell box at 960x540, 1 spp per pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Ray accounting: each camera sample traces (max_bounces+1) path-extension
scene intersections plus one shadow-ray intersection per non-ambient light per
path vertex (NEE at every depth, renderer.rs:177-204). For the Cornell config
(2 bounces, 1 area light) that is 6 full scene intersections per pixel sample.

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against an estimated 5 Mrays/s for rpt on a contemporary multicore CPU (its
README claims linear scaling to 96 cores; single-digit Mrays/s is typical for
a brute-force Rust path tracer on such hardware). This denominator is fixed so
round-over-round values are comparable.
"""

import json
import sys
import time

REFERENCE_RAYS_PER_SEC_ESTIMATE = 5.0e6

WIDTH, HEIGHT = 960, 540
MAX_BOUNCES = 2
N_LIGHTS = 1
WARMUP = 1
PASSES = 5


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    _log("importing scene")
    from examples.cornell import build_scene, make_camera
    from rpt_tpu import Renderer
    from rpt_tpu.renderer import render_pass

    _log("acquiring device")
    jax.block_until_ready(jnp.ones((8, 8)) + 1)
    _log("device acquired; compiling scene")

    scene = build_scene()
    camera = make_camera()
    renderer = Renderer(
        scene, camera, width=WIDTH, height=HEIGHT, max_bounces=MAX_BOUNCES,
        num_samples=1, epsilon=0.05,
    )
    scene_data, t_min, ev_scale = renderer._pass_args()
    base = jax.random.PRNGKey(0)

    def one_pass(i):
        key = jax.random.fold_in(base, i)
        return render_pass(
            scene_data, camera, key, WIDTH, HEIGHT, MAX_BOUNCES, t_min, ev_scale
        )

    # Warmup (compile)
    _log("warmup/compile")
    for i in range(WARMUP):
        one_pass(i).block_until_ready()
    _log("warm; timing")

    t0 = time.perf_counter()
    frames = [one_pass(WARMUP + i) for i in range(PASSES)]
    jax.block_until_ready(frames)
    dt = time.perf_counter() - t0
    _log(f"done: {dt:.2f}s for {PASSES} passes")

    rays_per_sample = (MAX_BOUNCES + 1) * (1 + N_LIGHTS)
    total_rays = WIDTH * HEIGHT * rays_per_sample * PASSES
    rays_per_sec = total_rays / dt

    print(
        json.dumps(
            {
                "metric": "cornell_960x540_rays_per_sec",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE,
            }
        )
    )


if __name__ == "__main__":
    main()

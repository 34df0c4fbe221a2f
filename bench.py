"""Benchmark: rays/sec on the Cornell box at 960x540, 1 spp per pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness: the TPU relay in this environment stalls intermittently (multi-
minute hangs acquiring the device grant or on host<->device transfers), and a
cold backend init can fail outright with UNAVAILABLE. The driver runs this
script exactly once, so the retry loop lives HERE: the measurement runs in a
child process under a hard timeout, retried several times on the TPU, then
falls back to a reduced-size CPU measurement so a JSON line is always emitted
with rc=0. A healthy relay completes the whole TPU measurement in well under
two minutes (compile ~10-40 s, passes < 1 s each).

Ray accounting: each camera sample traces (max_bounces+1) path-extension
scene intersections plus one shadow-ray intersection per non-ambient light per
path vertex (NEE at every depth, renderer.rs:177-204). For the Cornell config
(2 bounces, 1 area light) that is 6 full scene intersections per pixel sample.

Epsilon: 0.05 — the Cornell box is ~550 units across (examples/cornell.py), so
this is ~1e-4 *relative*, tighter than the renderer's 1e-3 default on
unit-scale scenes. It is the same value the cornell example itself renders
with, so the benched program is the validated program.

vs_baseline: the reference publishes no numbers (BASELINE.md); we normalize
against an estimated 5 Mrays/s for rpt on a contemporary multicore CPU (its
README claims linear scaling to 96 cores; single-digit Mrays/s is typical for
a brute-force Rust path tracer on such hardware). This denominator is fixed so
round-over-round values are comparable.
"""

import json
import os
import subprocess
import sys
import time

REFERENCE_RAYS_PER_SEC_ESTIMATE = 5.0e6

WIDTH, HEIGHT = 960, 540
MAX_BOUNCES = 2
N_LIGHTS = 1
WARMUP = 2
PASSES = 40

TPU_ATTEMPTS = 3
TPU_TIMEOUT_S = 420
CPU_TIMEOUT_S = 600


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def measure(platform: str) -> None:
    """Child-process entry: run the measurement and print the JSON line."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    _log(f"[child] importing scene (platform={platform})")
    from examples.cornell import build_scene, make_camera
    from rpt_tpu import Renderer

    # CPU fallback: shrink the frame so compile+run stays in budget; rays/s is
    # a rate, so the metric stays comparable (if sadly small).
    if platform == "cpu":
        width, height, passes = 480, 270, 2
    else:
        width, height, passes = WIDTH, HEIGHT, PASSES

    _log("[child] acquiring device")
    jax.block_until_ready(jnp.ones((8, 8)) + 1)
    _log("[child] device acquired; compiling scene")

    scene = build_scene()
    camera = make_camera()
    renderer = Renderer(
        scene, camera, width=width, height=height, max_bounces=MAX_BOUNCES,
        num_samples=1, epsilon=0.05,
    )
    scene_data, t_min, ev_scale = renderer._pass_args()
    base = jax.random.PRNGKey(0)
    from rpt_tpu.renderer import make_render_many_fn

    fn = make_render_many_fn(scene_data, width, height, MAX_BOUNCES)

    def run(start, n):
        return jax.block_until_ready(
            fn(camera, base, jnp.int32(start), jnp.int32(n), t_min, ev_scale)
        )

    _log("[child] warmup/compile")
    run(0, WARMUP)
    _log("[child] warm; timing")

    t0 = time.perf_counter()
    run(WARMUP, passes)
    dt = time.perf_counter() - t0
    _log(f"[child] done: {dt:.2f}s for {passes} passes")

    rays_per_sample = (MAX_BOUNCES + 1) * (1 + N_LIGHTS)
    total_rays = width * height * rays_per_sample * passes
    rays_per_sec = total_rays / dt

    print(
        json.dumps(
            {
                "metric": "cornell_960x540_rays_per_sec",
                "value": rays_per_sec,
                "unit": "rays/s",
                "vs_baseline": rays_per_sec / REFERENCE_RAYS_PER_SEC_ESTIMATE,
                "device": platform,
            }
        ),
        flush=True,
    )


def _attempt(platform: str, timeout_s: int):
    """Run one measurement attempt in a child process; return the JSON line or
    None. The child is its own process group so a hard-timeout kill cannot take
    anything else down, and a wedged TPU grant dies with it."""
    env = dict(os.environ)
    env["RPT_BENCH_CHILD"] = platform
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=sys.stderr,
            timeout=timeout_s,
            start_new_session=True,
        )
    except subprocess.TimeoutExpired:
        _log(f"attempt on {platform} timed out after {timeout_s}s")
        return None
    if proc.returncode != 0:
        _log(f"attempt on {platform} exited rc={proc.returncode}")
        return None
    for line in proc.stdout.decode().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                if "metric" in parsed:
                    return line
            except json.JSONDecodeError:
                continue
    _log(f"attempt on {platform} produced no JSON line")
    return None


def main():
    child_platform = os.environ.get("RPT_BENCH_CHILD")
    if child_platform:
        measure(child_platform)
        return

    for i in range(TPU_ATTEMPTS):
        _log(f"TPU attempt {i + 1}/{TPU_ATTEMPTS}")
        line = _attempt("tpu", TPU_TIMEOUT_S)
        if line is not None:
            print(line, flush=True)
            return
        time.sleep(5 * (i + 1))

    _log("all TPU attempts failed; falling back to CPU")
    line = _attempt("cpu", CPU_TIMEOUT_S)
    if line is not None:
        print(line, flush=True)
        return

    # Last resort: still emit a parseable line rather than crash the capture.
    _log("CPU fallback failed too; emitting sentinel")
    print(
        json.dumps(
            {
                "metric": "cornell_960x540_rays_per_sec",
                "value": 0.0,
                "unit": "rays/s",
                "vs_baseline": 0.0,
                "device": "none",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

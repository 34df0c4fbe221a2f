"""Marbles falling into a glass: RK4 physics driving per-frame renders.

Parity with /root/reference/examples/marbles.rs (25 marbles, MarblesSystem,
180 frames at 800x600/2000spp/9 bounces with DoF; TEST mode 200x150/1spp).
Defaults are the quick TEST-style config; --full selects the reference one.
The glass surface uses the analytic monomial primitive (the reference loads a
pre-meshed monomial.obj of the same surface).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math
import os
import subprocess
import time

import numpy as np
from PIL import Image

from rpt_tpu import (
    AmbientLight,
    Camera,
    Material,
    Object,
    ObjectLight,
    Renderer,
    Scene,
    hex_color,
    monomial_surface,
    polygon,
    sphere,
)
from rpt_tpu.ode import MarblesSystem, ParticleState
from rpt_tpu.ode.particle import monomial_closest_point

COLORS = [0x264653, 0x2A9D8F, 0xE9C46A, 0xF4A261, 0xE76F51]
N = 25
R = 0.15


def initial_state(seed=123) -> ParticleState:
    rng = np.random.RandomState(seed)
    pos = np.stack(
        [
            np.array(
                [
                    (i // 5) / 5.0 - 0.375,
                    rng.uniform(4.0, 6.0),
                    (i % 5) / 5.0 - 0.375,
                ]
            )
            for i in range(N)
        ]
    )
    return ParticleState.create(pos)


def build_scene(state: ParticleState, test_mode: bool) -> Scene:
    scene = Scene()
    if test_mode:
        scene.add(AmbientLight((0.01, 0.01, 0.01)))
    else:
        scene.add(
            ObjectLight(
                Object(
                    sphere().scale([1.5] * 3).translate([0.0, 5.0, 0.0])
                ).material(Material.light(hex_color(0xFFFFFF), 15.0))
            )
        )

    scene.add(
        Object(monomial_surface(2.0, 4.0)).material(Material.clear(1.5, 0.0001))
    )

    pos = np.asarray(state.pos)
    closest = np.asarray(monomial_closest_point(state.pos, 2.0, resolution=2001))
    for i in range(N):
        p = pos[i].copy()
        vec = p - closest[i]
        ln = np.linalg.norm(vec)
        if ln < R * 1.05 and ln > 0:
            p = closest[i] + vec / ln * R * 1.05
        p[1] = max(p[1], R - 0.06)
        scene.add(
            Object(sphere().scale([R] * 3).translate(p)).material(
                Material.specular(hex_color(COLORS[i % len(COLORS)]), 0.1)
            )
        )

    scene.add(
        Object(
            polygon(
                [
                    [20.0, -0.06, 20.0],
                    [20.0, -0.06, -20.0],
                    [-20.0, -0.06, -20.0],
                    [-20.0, -0.06, 20.0],
                ]
            )
        ).material(Material.diffuse(hex_color(0xAAAAAA)))
    )
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--full", action="store_true")
    parser.add_argument("--outdir", default="video")
    args = parser.parse_args()

    if args.full:
        frames, width, height, spp, bounces = 180, 800, 600, 2000, 9
    else:
        frames, width, height, spp, bounces = args.frames, 200, 150, 1, 7

    os.makedirs(args.outdir, exist_ok=True)
    camera = Camera.look_at(
        [0.0, 1.0, 6.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0], math.pi / 4
    ).focus([0.0, 1.0, 0.0], 0.02)

    state = initial_state()
    system = MarblesSystem(radius=R)
    for frame in range(frames):
        t0 = time.time()
        img = Renderer(
            build_scene(state, not args.full),
            camera,
            width=width,
            height=height,
            max_bounces=bounces,
            num_samples=spp,
            seed=frame,
            dynamic=True,  # same topology every frame: compile once
        ).render()
        Image.fromarray(img).save(f"{args.outdir}/image_{frame}.png")
        state = system.rk4_integrate(state, 1.0 / 16.0, 1.0 / 10000.0)
        print(f"frame {frame} in {time.time() - t0:.2f}s")

    try:
        subprocess.run(
            [
                "ffmpeg", "-y", "-i", f"{args.outdir}/image_%d.png",
                "-vcodec", "libx264", "-s", f"{width}x{height}",
                "-pix_fmt", "yuv420p", "marbles.mp4",
            ],
            check=True,
        )
        print("Saved marbles.mp4")
    except FileNotFoundError:
        print("ffmpeg not available; frames are in", args.outdir)


if __name__ == "__main__":
    main()

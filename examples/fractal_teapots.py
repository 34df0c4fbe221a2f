"""Recursive fractal of 937 teapot INSTANCES — the TLAS/instancing flagship.

Parity with /root/reference/examples/fractal_teapots.rs (800x600, 1 spp,
0 bounces): the reference nests kd-trees (a KdTree is itself a Shape,
kdtree.rs:128) so 937 transformed copies share one mesh. Here the scene
compiler detects the shared Mesh object and routes every placement through
the two-level instanced BVH (rpt_tpu/ops/tlas.py): one ~6k-triangle BLAS +
937 instance transforms instead of 5.9M baked triangles.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math
import time

import numpy as np
from PIL import Image

from rpt_tpu import (
    AmbientLight,
    Camera,
    DirectionalLight,
    Material,
    Object,
    PointLight,
    Renderer,
    Scene,
    group,
    hex_color,
    load_obj,
    plane,
)
from _fractal import LEVEL_COLORS, fractal_placements

DEFAULT_OBJ = "/root/reference/examples/teapot.obj"


def build_scene(obj_path, levels: int = 5) -> Scene:
    scene = Scene()
    teapot = load_obj(obj_path)  # ONE mesh shared by every instance
    print(f"Loaded {teapot.num_triangles} triangles (shared)")
    placements = fractal_placements(levels)
    total = 0
    for i, level in enumerate(placements):
        print(f"Level {i}: {len(level)} teapots")
        total += len(level)
        shapes = [
            teapot.scale([0.5, 0.5, 0.5]).scale([rad] * 3).translate(list(p))
            for p, rad in level
        ]
        scene.add(
            Object(group(shapes)).material(
                Material.specular(hex_color(LEVEL_COLORS[i]), 0.25)
            )
        )
    print(f"Total: {total} instances")
    scene.add(
        Object(plane([0.0, 0.0, 1.0], -6.0)).material(
            Material.diffuse(hex_color(0xFFCCCC))
        )
    )
    scene.add(AmbientLight((0.02, 0.02, 0.02)))
    d = np.array([0.0, -0.65, -1.0])
    scene.add(DirectionalLight((0.6, 0.6, 0.6), tuple(d / np.linalg.norm(d))))
    scene.add(PointLight((100.0, 100.0, 100.0), (0.0, 5.0, 5.0)))
    return scene


def make_camera() -> Camera:
    direction = np.array([-0.285714, -0.5, -1.0])
    up = np.array([0.0, 1.0, -0.5])
    return Camera(
        eye=(2.0, 3.5, 7.0),
        direction=tuple(direction / np.linalg.norm(direction)),
        up=tuple(up / np.linalg.norm(up)),
        fov=math.pi / 6,
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", default=DEFAULT_OBJ)
    parser.add_argument("--levels", type=int, default=5)
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--width", type=int, default=800)
    parser.add_argument("--height", type=int, default=600)
    parser.add_argument("--out", default="fractal_teapots.png")
    args = parser.parse_args()

    renderer = Renderer(
        build_scene(args.obj, args.levels),
        make_camera(),
        width=args.width,
        height=args.height,
        num_samples=args.spp,
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

"""The README scene: red sphere on a gray floor under a spherical area light.

Parity with /root/reference/examples/sphere.rs (960x540, 100 spp, 2 bounces).
Run: python examples/sphere.py [--spp N] [--out PATH]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math
import time

from PIL import Image

from rpt_tpu import (
    Camera,
    Material,
    Object,
    ObjectLight,
    Renderer,
    Scene,
    hex_color,
    plane,
    sphere,
)


def build_scene() -> Scene:
    scene = Scene()
    scene.add(Object(sphere()))  # default red material
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([2.0, 2.0, 2.0]).translate([0.0, 12.0, 0.0])
            ).material(Material.light(hex_color(0xFFFFFF), 40.0))
        )
    )
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--spp", type=int, default=100)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=540)
    parser.add_argument("--out", default="output.png")
    args = parser.parse_args()

    scene = build_scene()
    camera = Camera.look_at(
        [-2.5, 4.0, 6.5], [0.0, -0.25, 0.0], [0.0, 1.0, 0.0], math.pi / 4
    )
    renderer = Renderer(
        scene,
        camera,
        width=args.width,
        height=args.height,
        max_bounces=2,
        num_samples=args.spp,
    )
    t0 = time.time()
    img = renderer.render()
    dt = time.time() - t0
    print(f"Rendered {args.width}x{args.height} @ {args.spp} spp in {dt:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

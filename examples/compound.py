"""Compound of five cubes under three spherical lamps.

Parity with /root/reference/examples/compound.rs (1024x1024, 5 bounces,
50 spp).
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
    cube,
    hex_color,
    plane,
    sphere,
)


def lamp(x, y, z, r, e):
    return ObjectLight(
        Object(sphere().scale([r, r, r]).translate([x, y, z])).material(
            Material.light((1.0, 1.0, 1.0), e)
        )
    )


def build_scene() -> Scene:
    scene = Scene()
    magic_angle = math.acos((3.0 * math.sqrt(5.0) - 1.0) / 8.0)

    c_central = cube()
    c_green = cube().rotate(-magic_angle, [1.0, 1.0, 1.0])
    c_red = cube().rotate(-magic_angle, [1.0, 1.0, 1.0]).scale([-1.0, 1.0, 1.0])
    c_blue = cube().rotate(-magic_angle, [1.0, 1.0, 1.0]).scale([1.0, -1.0, 1.0])
    c_orange = (
        cube()
        .rotate(-magic_angle, [1.0, 1.0, 1.0])
        .scale([-1.0, 1.0, 1.0])
        .scale([1.0, -1.0, 1.0])
    )

    scene.add(Object(c_central).material(Material.specular(hex_color(0xC144EB), 0.4)))
    scene.add(Object(c_green).material(Material.specular(hex_color(0x45E542), 0.4)))
    scene.add(Object(c_red).material(Material.specular(hex_color(0xF55142), 0.4)))
    scene.add(Object(c_blue).material(Material.specular(hex_color(0x4275F5), 0.4)))
    scene.add(Object(c_orange).material(Material.specular(hex_color(0xF5BF42), 0.4)))

    scene.add(
        Object(plane([0.0, 1.0, 0.0], -0.80902)).material(
            Material.diffuse(hex_color(0xFFFFFF))
        )
    )

    scene.add(lamp(-2.0, 3.5, 0.5, 0.5, 60.0))
    scene.add(lamp(0.0, 0.5, 5.0, 1.0, 2.0))
    scene.add(lamp(2.0, 1.0, -5.0, 0.6, 10.0))
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--spp", type=int, default=50)
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--out", default="compound.png")
    args = parser.parse_args()

    camera = Camera.look_at(
        [-0.9, 1.2, 2.4], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], math.pi / 4
    )
    renderer = Renderer(
        build_scene(), camera, width=args.size, height=args.size,
        max_bounces=5, num_samples=args.spp,
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

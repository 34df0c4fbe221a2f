"""Monomial 'glass' surface among primitives.

Parity with /root/reference/examples/monomial_glass.rs (800x600, 1 bounce,
100 spp) — with a solid-color environment standing in for the runtime-
downloaded HDRI (this container has no network egress); pass --hdr for a
local equirectangular .hdr file.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math
import time

from PIL import Image

from rpt_tpu import (
    AmbientLight,
    Camera,
    Environment,
    Material,
    Object,
    PointLight,
    Renderer,
    Scene,
    cube,
    hex_color,
    monomial_surface,
    plane,
    sphere,
)


def build_scene(hdr_path=None) -> Scene:
    scene = Scene()
    if hdr_path:
        from rpt_tpu.io.image import load_hdr

        scene.set_environment(Environment.from_hdri(load_hdr(hdr_path)))
    else:
        scene.set_environment(Environment.from_color((0.4, 0.45, 0.5)))

    scene.add(
        Object(monomial_surface(2.0, 4.0).translate([0.0, -1.0, 0.0])).material(
            Material.metallic_mat(hex_color(0xFFFFFF), 0.0001)
        )
    )
    scene.add(
        Object(
            cube()
            .rotate_y(math.pi / 6.0)
            .scale([0.5, 0.3, 0.4])
            .translate([0.4, -0.8, 4.0])
        ).material(Material.specular(hex_color(0xFF00FF), 0.5))
    )
    scene.add(
        Object(sphere().scale([0.5] * 3).translate([1.5, -0.5, 1.0])).material(
            Material.specular(hex_color(0x0000FF), 0.1)
        )
    )
    scene.add(
        Object(sphere().scale([0.5] * 3).translate([-1.5, -0.5, 1.0])).material(
            Material.specular(hex_color(0x00FF00), 0.1)
        )
    )
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.specular(hex_color(0xAAAAAA), 0.5)
        )
    )
    scene.add(AmbientLight((0.01, 0.01, 0.01)))
    scene.add(PointLight((100.0, 100.0, 100.0), (0.0, 5.0, 5.0)))
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--spp", type=int, default=100)
    parser.add_argument("--hdr", default=None)
    parser.add_argument("--out", default="monomial_glass.png")
    args = parser.parse_args()

    renderer = Renderer(
        build_scene(args.hdr), Camera(), width=800, height=600,
        max_bounces=1, num_samples=args.spp,
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

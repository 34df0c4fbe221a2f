"""Basic primitives demo: spheres + cube + floor, ambient + point light.

Parity with /root/reference/examples/basic.rs (800x600, defaults).
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
    Material,
    Object,
    PointLight,
    Renderer,
    Scene,
    cube,
    hex_color,
    plane,
    sphere,
)


def build_scene() -> Scene:
    scene = Scene()
    scene.add(Object(sphere()))
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
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--out", default="basic.png")
    args = parser.parse_args()

    renderer = Renderer(build_scene(), Camera(), width=800, height=600,
                        num_samples=args.spp)
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

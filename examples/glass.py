"""Glass sphere with refraction over a checker-ish floor.

Parity with /root/reference/examples/glass.rs: a clear dielectric sphere,
6 bounces so light passes through entry + exit interfaces.
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
    Environment,
    Material,
    Object,
    ObjectLight,
    Renderer,
    Scene,
    hex_color,
    plane,
    sphere,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--spp", type=int, default=200)
    parser.add_argument("--out", default="glass.png")
    args = parser.parse_args()

    scene = Scene()
    scene.add(Object(sphere()).material(Material.clear(1.5, 0.0001)))
    scene.add(
        Object(sphere().scale([0.4] * 3).translate([-2.0, -0.6, -1.5])).material(
            Material.diffuse(hex_color(0xBC0000))
        )
    )
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([2.0] * 3).translate([4.0, 10.0, 4.0])
            ).material(Material.light(hex_color(0xFFFFFF), 50.0))
        )
    )
    scene.set_environment(Environment.from_color((0.1, 0.12, 0.15)))

    camera = Camera.look_at(
        [0.0, 1.2, 5.5], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], math.pi / 5
    )
    renderer = Renderer(
        scene, camera, width=800, height=600, max_bounces=6, num_samples=args.spp
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

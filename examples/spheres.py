"""Row of glossy spheres with thin-lens depth of field.

Parity with /root/reference/examples/spheres.rs: camera focused on the middle
sphere, aperture blur on the others.
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--spp", type=int, default=100)
    parser.add_argument("--out", default="spheres.png")
    args = parser.parse_args()

    scene = Scene()
    colors = [0xFF6F61, 0xFFD700, 0x6B8E23, 0x4169E1, 0x9370DB]
    for i, c in enumerate(colors):
        x = (i - 2) * 2.2
        scene.add(
            Object(sphere().translate([x, 0.0, -abs(i - 2) * 1.5])).material(
                Material.specular(hex_color(c), 0.2)
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
                sphere().scale([3.0, 3.0, 3.0]).translate([0.0, 14.0, 2.0])
            ).material(Material.light(hex_color(0xFFFFFF), 30.0))
        )
    )

    camera = Camera.look_at(
        [0.0, 2.5, 9.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0], math.pi / 5
    ).focus([0.0, 0.0, 0.0], 0.25)

    renderer = Renderer(
        scene, camera, width=960, height=540, max_bounces=2, num_samples=args.spp
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

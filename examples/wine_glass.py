"""Dielectric wine glass on a table under an area light.

Parity with /root/reference/examples/wine_glass.rs (1920x1080, 1000 spp,
6 bounces, progressive rendering with variance logging). The reference
streams an 8k HDRI from hdrihaven at runtime; this container has no egress,
so pass --hdr for a local file or a solid environment is used.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import time

import numpy as np
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
    load_obj,
    polygon,
    sphere,
)

DEFAULT_OBJ = "/root/reference/examples/wine_glass.obj"


def build_scene(obj_path, hdr_path=None) -> Scene:
    scene = Scene()
    if hdr_path:
        from rpt_tpu.io.image import load_hdr

        scene.set_environment(Environment.from_hdri(load_hdr(hdr_path)))
    else:
        scene.set_environment(Environment.from_color((0.25, 0.25, 0.28)))

    scene.add(Object(load_obj(obj_path)).material(Material.clear(1.5, 0.0001)))
    scene.add(
        Object(
            polygon(
                [[-5.0, 0.0, -5.0], [-5.0, 0.0, 5.0], [5.0, 0.0, 5.0], [5.0, 0.0, -5.0]]
            )
        ).material(Material.diffuse(hex_color(0x6F5D48)))
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([3.0] * 3).translate([11.15, 13.739, -4.9325])
            ).material(Material.light(hex_color(0xFFFFFF), 200.0))
        )
    )
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", default=DEFAULT_OBJ)
    parser.add_argument("--hdr", default=None)
    parser.add_argument("--spp", type=int, default=1000)
    parser.add_argument("--width", type=int, default=1920)
    parser.add_argument("--height", type=int, default=1080)
    parser.add_argument("--interval", type=int, default=10)
    parser.add_argument("--out", default="wine_glass.png")
    args = parser.parse_args()

    if not os.path.exists(args.obj):
        raise SystemExit(f"Mesh not found: {args.obj} (pass --obj PATH)")

    eye = np.array([5.530, 4.375, 5.384])
    camera = Camera.look_at(
        eye, eye + np.array([-0.6962, -0.3754, -0.6119]), [0.0, 1.0, 0.0], 0.6911
    )
    renderer = Renderer(
        build_scene(args.obj, args.hdr),
        camera,
        width=args.width,
        height=args.height,
        max_bounces=6,
        num_samples=args.spp,
    )

    state = {"t": time.time()}

    def callback(iteration, buffer):
        ms = (time.time() - state["t"]) * 1000
        print(
            f"Finished iteration {iteration}, took {ms:.0f} ms, "
            f"variance: {float(buffer.variance())}"
        )
        state["t"] = time.time()

    buffer = renderer.iterative_render(args.interval, callback)
    Image.fromarray(buffer.image(renderer.filter)).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

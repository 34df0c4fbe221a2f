"""Two metallic teapots, one mirror-shiny and one brushed, under an HDRI.

Parity with /root/reference/examples/metal.rs (1200x900, 20 spp, 5 bounces,
metallic white teapots at roughness 0.1 / 0.0001). The reference streams
ballroom_2k.hdr from hdrihaven; pass --hdr for a local file, otherwise a
procedural sky HDRI is used (same lookup path, different pixels).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

from PIL import Image

from rpt_tpu import (
    Camera,
    Environment,
    Material,
    Object,
    Renderer,
    Scene,
    hex_color,
    load_obj,
)

DEFAULT_OBJ = "/root/reference/examples/teapot.obj"


def build_scene(obj_path, hdr_path=None) -> Scene:
    scene = Scene()
    if hdr_path:
        from rpt_tpu.io.image import load_hdr

        scene.set_environment(Environment.from_hdri(load_hdr(hdr_path)))
    else:
        from _sky import procedural_sky

        scene.set_environment(Environment.from_hdri(procedural_sky()))

    teapot = load_obj(obj_path)
    scene.add(
        Object(
            teapot.scale([0.5, 0.5, 0.5]).translate([0.0, -1.7, 0.0])
        ).material(Material.metallic_mat(hex_color(0xFFFFFF), 0.1))
    )
    scene.add(
        Object(
            teapot.scale([0.5, 0.5, 0.5]).translate([0.0, 0.2, 0.0])
        ).material(Material.metallic_mat(hex_color(0xFFFFFF), 0.0001))
    )
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", default=DEFAULT_OBJ)
    parser.add_argument("--hdr", default=None)
    parser.add_argument("--spp", type=int, default=20)
    parser.add_argument("--width", type=int, default=1200)
    parser.add_argument("--height", type=int, default=900)
    parser.add_argument("--bounces", type=int, default=5)
    parser.add_argument("--out", default="metal.png")
    args = parser.parse_args()

    scene = build_scene(args.obj, args.hdr)
    renderer = Renderer(
        scene,
        Camera(),
        width=args.width,
        height=args.height,
        max_bounces=args.bounces,
        num_samples=args.spp,
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered {args.width}x{args.height} @ {args.spp} spp in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

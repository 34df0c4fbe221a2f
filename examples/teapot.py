"""Metallic teapot OBJ mesh on a diffuse floor (BVH-accelerated).

Parity with /root/reference/examples/teapot.rs (800x800, 1 spp, 0 bounces,
ambient + point light). The mesh path defaults to the reference's asset if
present; pass --obj for any other mesh.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
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
    hex_color,
    load_obj,
    plane,
)

DEFAULT_OBJ = "/root/reference/examples/teapot.obj"


def build_scene(obj_path: str = DEFAULT_OBJ) -> Scene:
    """teapot.rs:15-27: metallic teapot + gray floor + ambient/point light."""
    if not os.path.exists(obj_path):
        raise SystemExit(f"Mesh not found: {obj_path} (pass --obj PATH)")
    scene = Scene()
    mesh = load_obj(obj_path)
    print(f"Loaded {mesh.num_triangles} triangles")
    scene.add(
        Object(
            mesh.scale([0.5, 0.5, 0.5]).translate([0.0, -1.0, 0.0])
        ).material(Material.metallic_mat(hex_color(0xFF0000), 0.4))
    )
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(AmbientLight((0.02, 0.02, 0.02)))
    scene.add(PointLight((60.0, 60.0, 60.0), (0.0, 5.0, 5.0)))
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--obj", default=DEFAULT_OBJ)
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--size", type=int, default=800)
    parser.add_argument("--out", default="teapot.png")
    args = parser.parse_args()

    scene = build_scene(args.obj)

    renderer = Renderer(
        scene, Camera(), width=args.size, height=args.size, num_samples=args.spp
    )
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

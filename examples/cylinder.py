"""STL mesh demo: cylinder with ambient + point + directional lights.

Parity with /root/reference/examples/cylinder.rs (512x512, defaults).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import math
import os
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
    hex_color,
    load_stl,
    plane,
)

DEFAULT_STL = "/root/reference/examples/cylinder.stl"


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--stl", default=DEFAULT_STL)
    parser.add_argument("--spp", type=int, default=1)
    parser.add_argument("--out", default="cylinder.png")
    args = parser.parse_args()

    if not os.path.exists(args.stl):
        raise SystemExit(f"Mesh not found: {args.stl} (pass --stl PATH)")

    scene = Scene()
    scene.add(
        Object(
            load_stl(args.stl)
            .translate([-15.0, -15.0, -25.0])
            .scale([1.0 / 15.0, 1.0 / 15.0, 1.0 / 25.0])
            .rotate_y(math.pi / 4)
        )
    )
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(AmbientLight((0.02, 0.02, 0.02)))
    scene.add(PointLight((80.0, 80.0, 80.0), (0.0, 5.0, 5.0)))
    d = np.array([1.0, -1.0, 0.0])
    scene.add(DirectionalLight((2.0, 2.0, 2.0), d / np.linalg.norm(d)))

    renderer = Renderer(scene, Camera(), width=512, height=512, num_samples=args.spp)
    t0 = time.time()
    img = renderer.render()
    print(f"Rendered in {time.time() - t0:.2f}s")
    Image.fromarray(img).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()

"""Standard Cornell box (literal Cornell data) with progressive rendering.

Parity with /root/reference/examples/cornell.rs (1024x1024, 100 spp,
2 bounces, Box(1) filter, per-iteration variance logging).
Run: python examples/cornell.py [--spp N] [--size N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

from PIL import Image

from rpt_tpu import (
    Camera,
    Filter,
    Material,
    Object,
    ObjectLight,
    Renderer,
    Scene,
    cube,
    hex_color,
    polygon,
)

TWO_PI = 6.283185307179586


def build_scene() -> Scene:
    scene = Scene()

    white = Material.diffuse(hex_color(0xAAAAAA))
    red = Material.diffuse(hex_color(0xBC0000))
    green = Material.diffuse(hex_color(0x00BC00))
    light_mtl = Material.light(hex_color(0xFFFEFA), 100.0)

    floor = polygon(
        [[0, 0, 0], [0, 0, 559.2], [556, 0, 559.2], [556, 0, 0]]
    )
    ceiling = polygon(
        [[0, 548.9, 0], [556, 548.9, 0], [556, 548.9, 559.2], [0, 548.9, 559.2]]
    )
    light_rect = polygon(
        [
            [343.0, 548.8, 227.0],
            [343.0, 548.8, 332.0],
            [213.0, 548.8, 332.0],
            [213.0, 548.8, 227.0],
        ]
    )
    back_wall = polygon(
        [[0, 0, 559.2], [0, 548.9, 559.2], [556, 548.9, 559.2], [556, 0, 559.2]]
    )
    right_wall = polygon(
        [[0, 0, 0], [0, 548.9, 0], [0, 548.9, 559.2], [0, 0, 559.2]]
    )
    left_wall = polygon(
        [[556, 0, 0], [556, 0, 559.2], [556, 548.9, 559.2], [556, 548.9, 0]]
    )

    large_box = (
        cube()
        .scale([165.0, 330.0, 165.0])
        .rotate_y(TWO_PI * (-253.0 / 360.0))
        .translate([368.0, 165.0, 351.0])
    )
    small_box = (
        cube()
        .scale([165.0, 165.0, 165.0])
        .rotate_y(TWO_PI * (-197.0 / 360.0))
        .translate([185.0, 82.5, 169.0])
    )

    scene.add(Object(floor).material(white))
    scene.add(Object(ceiling).material(white))
    scene.add(Object(back_wall).material(white))
    scene.add(Object(left_wall).material(red))
    scene.add(Object(right_wall).material(green))
    scene.add(Object(large_box).material(white))
    scene.add(Object(small_box).material(white))
    scene.add(ObjectLight(Object(light_rect).material(light_mtl)))
    return scene


def make_camera() -> Camera:
    import jax.numpy as jnp

    return Camera(
        eye=jnp.asarray([278.0, 273.0, -800.0]),
        direction=jnp.asarray([0.0, 0.0, 1.0]),
        fov=jnp.float32(0.686),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--spp", type=int, default=100)
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--interval", type=int, default=10)
    parser.add_argument("--out", default="cornell.png")
    args = parser.parse_args()

    renderer = Renderer(
        build_scene(),
        make_camera(),
        width=args.size,
        height=args.size,
        filter=Filter.box(1),
        max_bounces=2,
        num_samples=args.spp,
        # The Cornell box is ~550 units across; scale the f32 epsilon
        epsilon=0.05,
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

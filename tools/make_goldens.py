"""Generate golden block-mean images with the f64 numpy oracle.

Writes tests/goldens/{sphere,cornell}.npz containing the oracle's mean
linear-radiance image, its per-block means, and the sampling config.
tests/test_golden.py re-renders the same scenes with rpt_tpu at equal spp
and asserts distribution-level agreement (SURVEY.md §7(d)).

Scene constants are the reference's (sphere.rs:6-33, cornell.rs:28-91) —
identical to examples/sphere.py and examples/cornell.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ref_renderer import (
    Cube,
    Material,
    ObjectEntry,
    Plane,
    RefScene,
    Sphere,
    Transformed,
    Triangles,
    render,
)

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "tests", "goldens")
SRGB_GAMMA = 2.2


def hex_color(h):
    r = ((h >> 16) & 0xFF) / 255.0
    g = ((h >> 8) & 0xFF) / 255.0
    b = (h & 0xFF) / 255.0
    return np.array([r, g, b]) ** SRGB_GAMMA


def scale_translate(s, t):
    m = np.eye(4)
    m[:3, :3] = np.diag(s)
    m[:3, 3] = t
    return m


def rot_y(theta):
    m = np.eye(4)
    c, s = np.cos(theta), np.sin(theta)
    m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
    return m


def quad(pts):
    """Fan triangulation of a polygon (io.rs:181)."""
    pts = np.asarray(pts, np.float64)
    tris = [
        np.stack([pts[0], pts[i], pts[i + 1]]) for i in range(1, len(pts) - 1)
    ]
    return Triangles(np.stack(tris))


def sphere_scene():
    """sphere.rs: red sphere + gray floor + spherical area light."""
    sc = RefScene()
    sc.objects.append(ObjectEntry(Transformed(Sphere(), np.eye(4)),
                                  Material.specular(hex_color(0xFF0000), 0.5)))
    sc.objects.append(ObjectEntry(Plane([0.0, 1.0, 0.0], -1.0),
                                  Material.diffuse(hex_color(0xAAAAAA))))
    light_shape = Transformed(Sphere(), scale_translate([2.0] * 3, [0.0, 12.0, 0.0]))
    sc.lights.append(("object", light_shape, Material.light(hex_color(0xFFFFFF), 40.0)))
    cam = dict(eye=[-2.5, 4.0, 6.5], fov=np.pi / 4)
    center = np.array([0.0, -0.25, 0.0])
    cam["direction"] = center - np.array(cam["eye"])
    cam["up"] = [0.0, 1.0, 0.0]
    return sc, cam


def cornell_scene():
    """cornell.rs:28-91 (literal Cornell data)."""
    sc = RefScene()
    white = Material.diffuse(hex_color(0xAAAAAA))
    red = Material.diffuse(hex_color(0xBC0000))
    green = Material.diffuse(hex_color(0x00BC00))
    light_mtl = Material.light(hex_color(0xFFFEFA), 100.0)

    sc.objects.append(ObjectEntry(quad([[0, 0, 0], [0, 0, 559.2], [556, 0, 559.2], [556, 0, 0]]), white))
    sc.objects.append(ObjectEntry(quad([[0, 548.9, 0], [556, 548.9, 0], [556, 548.9, 559.2], [0, 548.9, 559.2]]), white))
    sc.objects.append(ObjectEntry(quad([[0, 0, 559.2], [0, 548.9, 559.2], [556, 548.9, 559.2], [556, 0, 559.2]]), white))
    sc.objects.append(ObjectEntry(quad([[556, 0, 0], [556, 0, 559.2], [556, 548.9, 559.2], [556, 548.9, 0]]), red))
    sc.objects.append(ObjectEntry(quad([[0, 0, 0], [0, 548.9, 0], [0, 548.9, 559.2], [0, 0, 559.2]]), green))

    two_pi = 2.0 * np.pi
    large = scale_translate([1, 1, 1], [368.0, 165.0, 351.0]) @ rot_y(two_pi * (-253.0 / 360.0)) @ scale_translate([165.0, 330.0, 165.0], [0, 0, 0])
    small = scale_translate([1, 1, 1], [185.0, 82.5, 169.0]) @ rot_y(two_pi * (-197.0 / 360.0)) @ scale_translate([165.0, 165.0, 165.0], [0, 0, 0])
    sc.objects.append(ObjectEntry(Transformed(Cube(), large), white))
    sc.objects.append(ObjectEntry(Transformed(Cube(), small), white))

    light_shape = quad([
        [343.0, 548.8, 227.0],
        [343.0, 548.8, 332.0],
        [213.0, 548.8, 332.0],
        [213.0, 548.8, 227.0],
    ])
    sc.lights.append(("object", light_shape, light_mtl))
    cam = dict(eye=[278.0, 273.0, -800.0], direction=[0.0, 0.0, 1.0],
               up=[0.0, 1.0, 0.0], fov=0.686)
    return sc, cam


def teapot_scene():
    """teapot.rs:15-27: metallic teapot OBJ + gray floor + ambient/point
    light — golden coverage for the MESH path (kd-tree in the reference, BVH
    packet kernels here). The transform is baked host-side (uniform scale, so
    normals are unchanged)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from rpt_tpu.io.obj import load_obj

    mesh = load_obj("/root/reference/examples/teapot.obj")
    verts = np.asarray(mesh.vertices, np.float64) * 0.5 + np.array([0.0, -1.0, 0.0])
    norms = np.asarray(mesh.normals, np.float64)
    sc = RefScene()
    sc.objects.append(ObjectEntry(Triangles(verts, norms),
                                  Material.metallic(hex_color(0xFF0000), 0.4)))
    sc.objects.append(ObjectEntry(Plane([0.0, 1.0, 0.0], -1.0),
                                  Material.diffuse(hex_color(0xAAAAAA))))
    sc.lights.append(("ambient", np.array([0.02, 0.02, 0.02])))
    sc.lights.append(("point", np.array([60.0, 60.0, 60.0]), np.array([0.0, 5.0, 5.0])))
    cam = dict(eye=[0.0, 0.0, 10.0], direction=[0.0, 0.0, -1.0],
               up=[0.0, 1.0, 0.0], fov=np.pi / 6)
    return sc, cam


def glass_scene():
    """examples/glass.py (glass.rs-class): clear dielectric sphere at 6
    bounces — golden coverage for the TRANSMISSION lobe (material.rs:173-214
    BTDF + refraction sampling at 272-287)."""
    sc = RefScene()
    sc.objects.append(ObjectEntry(Transformed(Sphere(), np.eye(4)),
                                  Material.clear(1.5, 0.0001)))
    sc.objects.append(ObjectEntry(
        Transformed(Sphere(), scale_translate([0.4] * 3, [-2.0, -0.6, -1.5])),
        Material.diffuse(hex_color(0xBC0000))))
    sc.objects.append(ObjectEntry(Plane([0.0, 1.0, 0.0], -1.0),
                                  Material.diffuse(hex_color(0xAAAAAA))))
    light_shape = Transformed(Sphere(), scale_translate([2.0] * 3, [4.0, 10.0, 4.0]))
    sc.lights.append(("object", light_shape, Material.light(hex_color(0xFFFFFF), 50.0)))
    sc.env = np.array([0.1, 0.12, 0.15])
    cam = dict(eye=[0.0, 1.2, 5.5], fov=np.pi / 5)
    center = np.array([0.0, 0.0, 0.0])
    cam["direction"] = center - np.array(cam["eye"])
    cam["up"] = [0.0, 1.0, 0.0]
    return sc, cam


def block_means(img, b=8):
    h, w, _ = img.shape
    return img[: h // b * b, : w // b * b].reshape(h // b, b, w // b, b, 3).mean((1, 3))


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    only = sys.argv[1:] or None
    jobs = [
        ("sphere", sphere_scene, 96, 56, 512, 2),
        ("cornell", cornell_scene, 64, 64, 512, 2),
        ("teapot", teapot_scene, 56, 56, 128, 2),
        ("glass", glass_scene, 80, 60, 512, 6),
    ]
    if only:
        jobs = [j for j in jobs if j[0] in only]
    for name, build, w, h, spp, bounces in jobs:
        sc, cam = build()
        t0 = time.time()
        img = render(sc, cam["eye"], cam["direction"], cam["up"], cam["fov"],
                     w, h, spp, bounces, seed=1234)
        print(f"{name}: {w}x{h} @ {spp} spp in {time.time() - t0:.1f}s, "
              f"mean={img.mean():.4f}")
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, f"{name}.npz"),
            mean=img.astype(np.float32),
            blocks=block_means(img).astype(np.float32),
            width=w, height=h, spp=spp, bounces=bounces,
        )
    print("goldens written to", GOLDEN_DIR)


if __name__ == "__main__":
    main()

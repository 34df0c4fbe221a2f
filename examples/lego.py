"""Lego plane model via the OBJ+MTL pipeline (multi-material mesh).

Parity with /root/reference/examples/lego.rs (960x540, 20 spp, 5 bounces,
progressive render with per-iteration variance; objects scaled 0.002 and
recentred). The reference reads LEGO.Creator_Plane from examples/lego.zip —
an asset that ships with neither repo — so pass --zip for the real model.
Without it, a procedural multi-material toy brick plane (OBJ + MTL text
generated below) drives the identical load_obj_with_mtl -> per-usemtl
Objects -> render path, exercising the MTL->PBR heuristics (Kd/Ks/Ns/Ni/d,
io.rs:202-254) end-to-end.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import io
import math
import time
import zipfile

from PIL import Image

from rpt_tpu import (
    Camera,
    Material,
    Object,
    ObjectLight,
    Renderer,
    Scene,
    sphere,
)
from rpt_tpu.io.obj import load_obj_with_mtl

TOY_MTL = """
newmtl red_brick
Kd 0.8 0.1 0.1
Ks 0.5 0.5 0.5
Ns 96
newmtl white_brick
Kd 0.9 0.9 0.9
Ks 0.4 0.4 0.4
Ns 250
newmtl window
Kd 0.9 0.95 1.0
Ni 1.5
d 0.2
newmtl gray_metal
Kd 0.6 0.6 0.65
Ks 0.9 0.9 0.9
Ns 600
"""


def _box_obj(lines, x0, y0, z0, x1, y1, z1, base):
    """Append an axis-aligned box to OBJ text; returns next vertex base."""
    vs = [
        (x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
        (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1),
    ]
    for v in vs:
        lines.append(f"v {v[0]} {v[1]} {v[2]}")
    faces = [
        (1, 4, 3, 2), (5, 6, 7, 8), (1, 2, 6, 5),
        (2, 3, 7, 6), (3, 4, 8, 7), (4, 1, 5, 8),
    ]
    for f in faces:
        lines.append("f " + " ".join(str(base + i) for i in f))
    return base + 8


def toy_plane_obj():
    """A blocky toy airplane: fuselage, wings, tail, windows, engines."""
    lines = ["# procedural toy brick plane"]
    b = 0
    lines.append("usemtl red_brick")
    b = _box_obj(lines, -120, 80, -40, 280, 160, 40, b)      # fuselage
    b = _box_obj(lines, 240, 120, -30, 330, 200, 30, b)      # nose/cockpit top
    lines.append("usemtl white_brick")
    b = _box_obj(lines, -40, 120, -300, 120, 150, 300, b)    # main wing
    b = _box_obj(lines, -160, 150, -110, -90, 180, 110, b)   # tail wing
    b = _box_obj(lines, -160, 150, -15, -100, 280, 15, b)    # tail fin
    lines.append("usemtl window")
    b = _box_obj(lines, 150, 130, -45, 230, 170, 45, b)      # canopy
    lines.append("usemtl gray_metal")
    b = _box_obj(lines, 10, 90, -210, 110, 130, -150, b)     # engine L
    b = _box_obj(lines, 10, 90, 150, 110, 130, 210, b)       # engine R
    b = _box_obj(lines, -20, 40, -60, 40, 85, 60, b)         # landing gear
    return "\n".join(lines)


def load_lego(zip_path=None):
    if zip_path:
        with zipfile.ZipFile(zip_path) as zf:
            names = zf.namelist()
            print(f"Zip has contents: {names}")
            obj_name = next(n for n in names if n.lower().endswith(".obj"))
            mtl_name = next(n for n in names if n.lower().endswith(".mtl"))
            with zf.open(obj_name) as fo, zf.open(mtl_name) as fm:
                return load_obj_with_mtl(
                    io.TextIOWrapper(fo, encoding="utf-8", errors="replace"),
                    io.TextIOWrapper(fm, encoding="utf-8", errors="replace"),
                )
    print("No --zip given; using the procedural toy plane (same OBJ+MTL path)")
    return load_obj_with_mtl(io.StringIO(toy_plane_obj()), io.StringIO(TOY_MTL))


def build_scene(zip_path=None) -> Scene:
    scene = Scene()
    for obj in load_lego(zip_path):
        # Same "transform after load" hack as the reference (lego.rs:47-52)
        scene.add(
            Object(
                obj.shape.scale([0.002, 0.002, 0.002]).translate(
                    [-0.720, -0.243, -0.770]
                ),
                obj.mat,
            )
        )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([6.0, 6.0, 6.0]).translate([0.0, 20.0, 30.0])
            ).material(Material.light((1.0, 1.0, 1.0), 25.0))
        )
    )
    return scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--zip", default=None)
    parser.add_argument("--spp", type=int, default=20)
    parser.add_argument("--width", type=int, default=960)
    parser.add_argument("--height", type=int, default=540)
    parser.add_argument("--bounces", type=int, default=5)
    parser.add_argument("--out", default="lego.png")
    args = parser.parse_args()

    camera = Camera.look_at(
        (2.5, 2.0, 1.5), (0.0, 0.0, 0.0), (0.0, 1.0, 0.0), math.pi / 6
    )
    renderer = Renderer(
        build_scene(args.zip),
        camera,
        width=args.width,
        height=args.height,
        max_bounces=args.bounces,
        num_samples=args.spp,
    )

    start = time.time()

    def callback(iteration, buffer):
        ms = (time.time() - start) * 1000.0
        print(
            f"Finished iteration {iteration}, took {ms:.0f} ms, "
            f"variance: {float(buffer.variance()):.6f}"
        )

    buffer = renderer.iterative_render(5, callback)
    Image.fromarray(buffer.image()).save(args.out)
    print(f"Saved {args.out}")


if __name__ == "__main__":
    main()


def _stud_brick_tris(nx, nz, segments):
    """(T, 3, 3) float64 triangles for an nx x nz studded brick at the
    origin (unit stud pitch, LEGO-ish proportions). Distinct (nx, nz,
    segments) combinations give content-distinct meshes, so each compiles
    to its own wide-BLAS."""
    import numpy as np

    tris = []

    def quad(a, b, c, d):
        tris.append([a, b, c])
        tris.append([a, c, d])

    def box(x0, y0, z0, x1, y1, z1):
        v = [
            (x0, y0, z0), (x1, y0, z0), (x1, y1, z0), (x0, y1, z0),
            (x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1),
        ]
        quad(v[0], v[3], v[2], v[1])
        quad(v[4], v[5], v[6], v[7])
        quad(v[0], v[1], v[5], v[4])
        quad(v[1], v[2], v[6], v[5])
        quad(v[2], v[3], v[7], v[6])
        quad(v[3], v[0], v[4], v[7])

    h = 1.2
    box(0.0, 0.0, 0.0, float(nx), h, float(nz))
    r, top = 0.3, h + 0.35
    for i in range(nx):
        for j in range(nz):
            cx, cz = i + 0.5, j + 0.5
            for k in range(segments):
                a0 = 2.0 * math.pi * k / segments
                a1 = 2.0 * math.pi * (k + 1) / segments
                p0 = (cx + r * math.cos(a0), h, cz + r * math.sin(a0))
                p1 = (cx + r * math.cos(a1), h, cz + r * math.sin(a1))
                q0 = (p0[0], top, p0[2])
                q1 = (p1[0], top, p1[2])
                quad(p0, p1, q1, q0)
                tris.append([(cx, top, cz), q0, q1])

    import numpy as np

    return np.asarray(tris, np.float64)


def build_brick_city(n_instances=768, seed=0) -> Scene:
    """Lego-class INSTANCED stress scene (bench workload `lego`).

    The reference reaches this regime by loading LEGO.Creator_Plane
    (lego.rs:11-66, examples/lego.zip — absent from the reference repo
    itself): many parts, dozens of `usemtl` materials. Here: 96 unique
    studded-brick meshes (all (nx, nz, segments) combinations) SHARED by
    hundreds of transformed instances — the two-level wide TLAS past its
    VMEM-resident budget (>1536 wide nodes -> ring-DMA kernel) — plus 48
    materials (exercising the >32-material row-gather fallback), a ground
    plane and an area light."""
    import numpy as np

    from rpt_tpu import PointLight, plane
    from rpt_tpu.shapes import Mesh, Transformed

    rng = np.random.default_rng(seed)
    meshes = [
        Mesh(_stud_brick_tris(nx, nz, seg))
        for nx in (1, 2, 3, 4)
        for nz in (1, 2)
        for seg in range(14, 38)
    ]  # 192 unique brick types (content-distinct => one wide-BLAS each)
    mats = []
    for m in range(48):
        col = tuple(0.25 + 0.7 * rng.random(3))
        if m % 7 == 0:
            mats.append(Material.metallic_mat(col, 0.2 + 0.3 * rng.random()))
        elif m % 11 == 0:
            mats.append(Material.clear(1.5, 0.05))
        else:
            mats.append(Material.specular(col, 0.1 + 0.5 * rng.random()))

    scene = Scene()
    # Brick-wall towers on a grid: stacked rows with per-instance transforms.
    per_tower = 48
    n_towers = max(1, n_instances // per_tower)
    idx = 0
    for t in range(n_towers):
        bx = (t % 4 - 1.5) * 8.0
        bz = (t // 4 - 1.5) * 8.0
        for row in range(12):
            for col in range(4):
                if idx >= n_instances:
                    break
                mesh = meshes[rng.integers(len(meshes))]
                mat = mats[rng.integers(len(mats))]
                s = 0.45 + 0.15 * rng.random()
                node = (
                    Transformed(mesh, np.eye(4))
                    .scale([s, s, s])
                    .rotate_y(float(rng.random() * 0.3 - 0.15))
                    .translate([
                        bx + col * 2.0 + 0.2 * rng.random(),
                        row * 0.8,
                        bz + 0.2 * rng.random(),
                    ])
                )
                scene.add(Object(node, mat))
                idx += 1
    scene.add(
        Object(plane([0.0, 1.0, 0.0], 0.0)).material(
            Material.diffuse((0.6, 0.6, 0.62))
        )
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([5.0, 5.0, 5.0]).translate([10.0, 30.0, 20.0])
            ).material(Material.light((1.0, 1.0, 1.0), 40.0))
        )
    )
    scene.add(PointLight((30.0, 30.0, 30.0), [-12.0, 18.0, -8.0]))
    return scene

"""Multi-process (multi-host) rendering: N real OS processes, Gloo CPU
collectives, pixel wavefront sharded over the GLOBAL mesh.

Proves the SURVEY §5 'distributed comm backend' / §7 step 9 design without
pod hardware: 2 processes x 2 virtual devices render one frame as a single
SPMD program, tiles are gathered over the (simulated) DCN, and the result is
bit-identical to a single-process render on a mesh of the same total device
count — i.e. going multi-host changes the execution topology, not the image.
Replaces-the-reference note: this is the cross-machine scaling story rayon
cannot express (/root/reference/src/renderer.rs:117-129 is single-process).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from rpt_tpu import Camera, Material, Object, ObjectLight, Renderer, Scene, hex_color, plane, sphere

NPROC = 2
LOCAL_DEVICES = 2  # per process; global mesh = 4 devices


def make_renderer():
    """Tiny shared scene; MUST be identical in every process (SPMD)."""
    scene = Scene()
    scene.add(Object(sphere()).material(Material.specular(hex_color(0xB7410E), 0.3)))
    scene.add(
        Object(plane([0.0, 1.0, 0.0], -1.0)).material(
            Material.diffuse(hex_color(0xAAAAAA))
        )
    )
    scene.add(
        ObjectLight(
            Object(
                sphere().scale([2.0, 2.0, 2.0]).translate([0.0, 12.0, 0.0])
            ).material(Material.light(hex_color(0xFFFFFF), 40.0))
        )
    )
    cam = Camera.look_at(
        [-2.5, 4.0, 6.5], [0.0, -0.25, 0.0], [0.0, 1.0, 0.0], np.pi / 4
    )
    return Renderer(scene, cam, width=64, height=36, max_bounces=2, num_samples=3)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("nproc", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_multihost_matches_single_process(tmp_path, nproc):
    """2 processes in the default suite; the 4-process variant (VERDICT r3
    item 8) runs with --runslow (4 Gloo workers oversubscribe this box's 2
    cores, costing a couple of extra minutes)."""
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    # Every process must hold the SAME full frame after the tile gather.
    loaded = [np.load(tmp_path / f"mh_{i}.npz") for i in range(nproc)]
    for d in loaded[1:]:
        np.testing.assert_array_equal(d["sum"], loaded[0]["sum"])
        np.testing.assert_array_equal(d["sum_sq"], loaded[0]["sum_sq"])

    # And it must be bit-identical to a single-process render over a mesh of
    # the same TOTAL device count (4 or 8 of the conftest's 8 virtual
    # devices): multi-host changes topology, not results.
    from rpt_tpu.parallel import make_ray_mesh
    from rpt_tpu.parallel.multihost import render_multihost

    mesh = make_ray_mesh(nproc * LOCAL_DEVICES)
    ref = render_multihost(make_renderer(), mesh=mesh)
    np.testing.assert_array_equal(np.asarray(ref.sum), loaded[0]["sum"])
    np.testing.assert_array_equal(np.asarray(ref.sum_sq), loaded[0]["sum_sq"])
    assert int(loaded[0]["count"]) == 3

    mean = loaded[0]["sum"] / 3.0
    assert np.all(np.isfinite(mean)) and mean.mean() > 0.01


def test_init_multihost_single_process_noop():
    """No cluster env, no args → a no-op, and rendering still works."""
    from rpt_tpu.parallel.multihost import is_multihost, make_global_ray_mesh

    assert not is_multihost()
    mesh = make_global_ray_mesh()
    assert mesh.devices.size == len(jax.devices())

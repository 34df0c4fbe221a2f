"""Multi-process render scaling probe (VERDICT r3 item 8).

Fixed total pixels, N = 1/2/4 OS processes x 1 virtual CPU device, Gloo
collectives: each run times the sharded on-device render dispatch and the
cross-process tile all-gather separately, so the DCN-communication fraction
— the quantity that determines multi-host efficiency on a real pod, where
per-host COMPUTE scales by construction — is measured directly.

NOTE this box has 2 physical cores, so absolute rays/s CANNOT scale with N
here (all processes share the cores; at N=4 they are oversubscribed 2x).
The meaningful output is gather_time / total_time per N: on a pod slice,
1 - that fraction bounds the achievable 1->N host efficiency
(BASELINE.md's ">70% 1->4 hosts" metric).

Usage:  python tools/multihost_scaling.py [--procs 1,2,4] [--passes 4]
Worker: python tools/multihost_scaling.py --worker <pid> <nproc> <port>
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WIDTH, HEIGHT, SPP, BOUNCES = 320, 180, 4, 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def build_renderer():
    from rpt_tpu import (
        Camera, Material, Object, ObjectLight, Renderer, Scene, hex_color,
        plane, sphere,
    )
    import numpy as np

    scene = Scene()
    scene.add(Object(sphere()).material(Material.specular(hex_color(0xB7410E), 0.3)))
    scene.add(Object(plane([0.0, 1.0, 0.0], -1.0)).material(
        Material.diffuse(hex_color(0xAAAAAA))))
    scene.add(ObjectLight(Object(
        sphere().scale([2.0, 2.0, 2.0]).translate([0.0, 12.0, 0.0])
    ).material(Material.light(hex_color(0xFFFFFF), 40.0))))
    cam = Camera.look_at(
        [-2.5, 4.0, 6.5], [0.0, -0.25, 0.0], [0.0, 1.0, 0.0], np.pi / 4
    )
    return Renderer(scene, cam, width=WIDTH, height=HEIGHT,
                    max_bounces=BOUNCES, num_samples=SPP)


def worker(pid: int, nproc: int, port: int, passes: int) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, ROOT)

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from rpt_tpu.parallel.multihost import (
        init_multihost, make_global_ray_mesh, _replicate,
    )
    from rpt_tpu.parallel.sharding import make_sharded_many_fn

    if nproc > 1:
        init_multihost(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=pid)
    renderer = build_renderer()
    mesh = make_global_ray_mesh()
    scene_data, t_min, ev_scale = renderer._pass_args()
    fn = make_sharded_many_fn(scene_data, WIDTH, HEIGHT, BOUNCES, mesh)
    camera, base, start, n, t_min_g, ev_g = _replicate(
        (renderer.camera, jax.random.PRNGKey(0), jnp.int32(0),
         jnp.int32(SPP), t_min, ev_scale), mesh)

    def compute():
        return jax.block_until_ready(fn(camera, base, start, n, t_min_g, ev_g))

    def gather(s, ss):
        if nproc > 1:
            s = multihost_utils.process_allgather(s, tiled=True)
            ss = multihost_utils.process_allgather(ss, tiled=True)
        return s, ss

    s, ss = compute()
    gather(s, ss)  # warm both paths (compile + Gloo channel setup)

    ct, gt = 0.0, 0.0
    for _ in range(passes):
        t0 = time.perf_counter()
        s, ss = compute()
        ct += time.perf_counter() - t0
        t0 = time.perf_counter()
        gather(s, ss)
        gt += time.perf_counter() - t0
    if pid == 0:
        rays = WIDTH * HEIGHT * SPP * (BOUNCES + 1) * 2 * passes
        print(json.dumps({
            "procs": nproc, "compute_s": round(ct, 3), "gather_s": round(gt, 3),
            "gather_frac": round(gt / (ct + gt), 4),
            "rays_per_sec": round(rays / (ct + gt)),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--worker", nargs=3, type=int, default=None,
                    metavar=("PID", "NPROC", "PORT"))
    args = ap.parse_args()
    if args.worker is not None:
        worker(*args.worker, passes=args.passes)
        return

    for nproc in [int(x) for x in args.procs.split(",")]:
        port = _free_port()
        env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", str(i), str(nproc), str(port),
                 "--passes", str(args.passes)],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, text=True,
            )
            for i in range(nproc)
        ]
        outs = [p.communicate(timeout=600)[0] for p in procs]
        for p, out in zip(procs, outs):
            if p.returncode != 0:
                print(f"procs={nproc}: worker rc={p.returncode}", flush=True)
            for line in out.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)


if __name__ == "__main__":
    main()

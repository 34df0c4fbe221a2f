"""Worker process for the multi-host render test.

Each OS process joins a Gloo-backed CPU 'cluster'
(2 local virtual devices x N processes), renders the shared tiny scene with
the pixel wavefront sharded over the GLOBAL mesh, and writes the gathered
full-frame buffer so the parent test can assert every process saw the same
complete image. Usage:

    python tests/_multihost_worker.py <pid> <nproc> <port> <outdir>
"""

import os
import sys

# Platform selection must beat the first backend use (the image pre-imports
# jax via sitecustomize; config.update still works because backends
# initialize lazily — same pattern as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    pid, nproc, port, outdir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )
    from rpt_tpu.parallel.multihost import (
        init_multihost,
        is_multihost,
        render_multihost,
    )

    init_multihost(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert is_multihost() == (nproc > 1)
    assert len(jax.devices()) == 2 * nproc
    assert len(jax.local_devices()) == 2

    from test_multihost import make_renderer

    import numpy as np

    buf = render_multihost(make_renderer())
    np.savez(
        os.path.join(outdir, f"mh_{pid}.npz"),
        sum=np.asarray(buf.sum),
        sum_sq=np.asarray(buf.sum_sq),
        count=np.asarray(buf.count),
    )
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()

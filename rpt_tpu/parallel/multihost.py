"""Multi-host (multi-process) rendering over a global device mesh.

TPU-native replacement for scaling the reference's rayon scanline fan-out
(/root/reference/src/renderer.rs:117-129) past one machine: on a TPU pod each
host owns a slice of chips, `jax.distributed.initialize` stitches the
processes into one SPMD program, and the pixel wavefront is sharded over the
GLOBAL mesh. Per-pixel path tracing needs no collective at all during the
render — every chip owns disjoint pixels and the scene is replicated — so the
only cross-host (DCN) traffic is the final gather of finished tiles, exactly
the "cross-host gathers of finished tiles over DCN" design in SURVEY.md §5.
Intra-host sample accumulation stays on ICI/VMEM via the same on-device
fori_loop as the single-process path (sharding.make_sharded_many_fn).

Process topology notes:
- `jax.devices()` after `init_multihost` returns ALL devices across every
  process, ordered process-major, so a 1-D "rays" mesh is automatically
  host-contiguous: each host's pixel rows are adjacent, and the final
  tile gather moves each row group over DCN exactly once.
- Every process must build the SAME scene and call `render_multihost` with
  the SAME arguments (standard SPMD contract). Scene compilation is
  deterministic numpy, so identical sources give identical constants.

Tested without TPU hardware by spawning N real OS processes with the CPU
collectives (Gloo) backend — see tests/test_multihost.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import make_sharded_many_fn

__all__ = [
    "init_multihost",
    "is_multihost",
    "make_global_ray_mesh",
    "render_multihost",
]


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> None:
    """Join this process to a multi-process JAX run.

    Thin, idempotent wrapper over `jax.distributed.initialize`. On a real
    TPU pod slice all arguments are discovered from the environment
    (TPU_WORKER_HOSTNAMES et al.) and can be left None; for CPU-backed tests
    (or GPU clusters) pass them explicitly. Calling it twice, or in a
    single-process run with no arguments and no cluster env, is a no-op.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except (RuntimeError, ValueError) as e:
        # Idempotence + single-process no-op: double-init and "no cluster
        # environment detected" both land here; a real multi-process request
        # (explicit num_processes > 1) must not be swallowed.
        if num_processes is not None and num_processes > 1:
            raise
        if "already initialized" not in str(e).lower() and not isinstance(e, ValueError):
            raise


def is_multihost() -> bool:
    return jax.process_count() > 1


def make_global_ray_mesh() -> Mesh:
    """A 1-D mesh named 'rays' over every device of every process
    (process-major order, so pixel shards are host-contiguous)."""
    return Mesh(np.asarray(jax.devices()), ("rays",))


def _replicate(tree, mesh: Mesh):
    """Form fully-replicated GLOBAL arrays from identical per-process values.

    Multi-controller jit requires its inputs to be global `jax.Array`s; every
    process holds the same host value (SPMD contract), so replication is a
    local device_put with a replicated NamedSharding — no communication.
    """
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sh), tree
    )


def render_multihost(renderer, mesh: Mesh | None = None):
    """Render `renderer`'s frame with pixels sharded over the global mesh.

    Every process participates in ONE jitted SPMD dispatch (all samples
    accumulate on device, sharding.make_sharded_many_fn); the finished tiles
    are then gathered across hosts so the returned Buffer is full-frame and
    identical on every process. Bit-identical to the single-process
    `render_distributed` on a mesh of the same total device count.
    """
    from ..buffer import Buffer

    if mesh is None:
        mesh = make_global_ray_mesh()
    scene_data, t_min, ev_scale = renderer._pass_args()
    fn = make_sharded_many_fn(
        scene_data, renderer.width, renderer.height, renderer.max_bounces, mesh
    )
    camera, base, start, n, t_min_g, ev_g = _replicate(
        (
            renderer.camera,
            jax.random.PRNGKey(renderer.seed),
            jnp.int32(0),
            jnp.int32(renderer.num_samples),
            t_min,
            ev_scale,
        ),
        mesh,
    )
    s, ss = fn(camera, base, start, n, t_min_g, ev_g)
    if jax.process_count() > 1:
        # The jit outputs are global arrays whose shards live on remote hosts
        # too; one DCN all-gather per buffer brings the full frame everywhere.
        s = jnp.asarray(multihost_utils.process_allgather(s, tiled=True))
        ss = jnp.asarray(multihost_utils.process_allgather(ss, tiled=True))
    return Buffer(sum=s, sum_sq=ss, count=jnp.asarray(renderer.num_samples, jnp.int32))

"""Sample accumulation buffer with streaming variance and box filtering.

TPU-native counterpart of /root/reference/src/buffer.rs — with one deliberate
improvement flagged in SURVEY.md §2: the reference stores *every sample* per
pixel (O(spp) memory, buffer.rs:6-11); we keep the sufficient statistics
(sum, sum of squared magnitudes, count), which reproduce the reference's
`variance()` (buffer.rs:59-73) exactly and make the buffer a fixed-size pytree
that can be psum-reduced across chips and checkpointed.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .color import color_bytes

__all__ = ["Filter", "Buffer"]


@dataclasses.dataclass(frozen=True)
class Filter:
    """Box noise-reduction filter with a given radius (buffer.rs:98-108).
    Radius 0 is a no-op, the default (buffer.rs:104-107)."""

    radius: int = 0

    @staticmethod
    def box(radius: int) -> "Filter":
        return Filter(radius=radius)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Buffer:
    """Accumulates per-pixel sample statistics.

    sum: (H, W, 3) running sum of samples;
    sum_sq: (H, W) running sum of |sample|^2 (for variance);
    count: () number of samples per pixel (uniform, as in add_samples
    buffer.rs:32-40).
    """

    sum: jnp.ndarray
    sum_sq: jnp.ndarray
    count: jnp.ndarray

    @staticmethod
    def new(width: int, height: int, dtype=jnp.float32) -> "Buffer":
        return Buffer(
            sum=jnp.zeros((height, width, 3), dtype),
            sum_sq=jnp.zeros((height, width), dtype),
            count=jnp.zeros((), jnp.int32),
        )

    def add_samples(self, samples: jnp.ndarray) -> "Buffer":
        """Add one uniform frame of samples, shape (H, W, 3)."""
        return Buffer(
            sum=self.sum + samples,
            sum_sq=self.sum_sq + jnp.sum(samples * samples, axis=-1),
            count=self.count + 1,
        )

    def merge(self, other: "Buffer") -> "Buffer":
        return Buffer(
            sum=self.sum + other.sum,
            sum_sq=self.sum_sq + other.sum_sq,
            count=self.count + other.count,
        )

    def variance(self) -> jnp.ndarray:
        """Mean per-pixel sample variance with n-1 dof (buffer.rs:59-73)."""
        n = jnp.maximum(self.count, 2).astype(self.sum.dtype)
        mean_sq = jnp.sum(self.sum * self.sum, axis=-1) / n
        var = (self.sum_sq - mean_sq) / (n - 1.0)
        return jnp.mean(var)

    def mean_image(self, filter: Filter = Filter()) -> jnp.ndarray:
        """Filtered linear-radiance image, (H, W, 3).

        The box filter averages all samples in the (2r+1)^2 neighborhood
        (buffer.rs:75-93); with uniform counts that equals the windowed sum of
        per-pixel sums divided by the windowed pixel count (edges excluded).
        """
        n = jnp.maximum(self.count, 1).astype(self.sum.dtype)
        if filter.radius == 0:
            return self.sum / n
        r = filter.radius
        window = (2 * r + 1, 2 * r + 1, 1)
        summed = jax.lax.reduce_window(
            self.sum, 0.0, jax.lax.add, window, (1, 1, 1), "SAME"
        )
        counts = jax.lax.reduce_window(
            jnp.ones_like(self.sum_sq), 0.0, jax.lax.add, window[:2], (1, 1), "SAME"
        )
        return summed / (counts[..., None] * n)

    def image(self, filter: Filter = Filter()) -> np.ndarray:
        """Tone-mapped uint8 image (H, W, 3) on the host (buffer.rs:43-56)."""
        return color_bytes(jax.device_get(self.mean_image(filter)))

    # --- checkpoint / resume ------------------------------------------------
    # The reference's only "checkpoint" is the progressive PNG dump
    # (renderer.rs:103-115) — the accumulator itself cannot be saved. Here the
    # sufficient statistics + sampling cursor round-trip exactly, so a resumed
    # render is bit-identical to an uninterrupted one (same fold_in(seed, i)
    # stream per iteration).

    def save(self, path, *, seed: int, iteration: int) -> None:
        """Write the accumulator + sampling cursor to an .npz checkpoint."""
        np.savez_compressed(
            path,
            sum=jax.device_get(self.sum),
            sum_sq=jax.device_get(self.sum_sq),
            count=jax.device_get(self.count),
            seed=np.int64(seed),
            iteration=np.int64(iteration),
        )

    @staticmethod
    def load(path):
        """Read a checkpoint; returns (Buffer, seed, iteration)."""
        with np.load(path) as z:
            buf = Buffer(
                sum=jnp.asarray(z["sum"]),
                sum_sq=jnp.asarray(z["sum_sq"]),
                count=jnp.asarray(z["count"]),
            )
            return buf, int(z["seed"]), int(z["iteration"])

"""Environment lighting: solid color or HDRI equirectangular map.

TPU-native counterpart of /root/reference/src/environment.rs. The HDRI lookup
is a batched gather + bilinear blend over the whole miss-ray wavefront at once
(environment.rs:25-52). One intentional fix vs. the reference: the reference
indexes `x0 + 1` without clamping, which wraps into the next image row at the
seam (environment.rs:40-52); we wrap azimuthally (`(x0 + 1) % w`), the correct
equirectangular behavior — no seam column, no row bleed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from .utils.vmath import normalize

__all__ = ["Environment"]


# Neighbor-packed quad textures above this texel count are skipped (the
# packed table is 4x the image; an 8k HDRI would cost ~1.6 GB).
_QUAD_MAX_TEXELS = 2_097_152


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Environment:
    color: jnp.ndarray  # (3,) solid background color
    hdri: Optional[jnp.ndarray] = None  # (H, W, 3) linear RGB, or None
    # Neighbor-packed bilinear quad: row y*W+x holds [c00 c01 c10 c11] with
    # the azimuthal wrap / polar clamp baked in, so the per-ray lookup is
    # ONE row gather instead of four (TPU row gathers are row-count-bound,
    # ~5.5 ms per gather at 518k rays — the HDRI miss lookup runs at EVERY
    # bounce depth). None for oversized HDRIs (falls back to 4 gathers).
    hdri_quad: Optional[jnp.ndarray] = None  # (H*W, 12) or None

    @staticmethod
    def from_color(color) -> "Environment":
        # Host numpy: lifted to a jit constant via SceneData.to_device()
        import numpy as np

        return Environment(color=np.asarray(color, np.float32), hdri=None)

    @staticmethod
    def from_hdri(image) -> "Environment":
        import numpy as np

        img = np.asarray(image, np.float32)
        assert img.ndim == 3 and img.shape[-1] == 3
        quad = None
        h, w = img.shape[:2]
        if h * w <= _QUAD_MAX_TEXELS:
            right = np.roll(img, -1, axis=1)  # x+1 wraps azimuthally
            down = img[np.minimum(np.arange(h) + 1, h - 1)]  # y+1 clamps
            down_right = np.roll(down, -1, axis=1)
            quad = np.concatenate(
                [img, right, down, down_right], axis=-1
            ).reshape(h * w, 12)
        return Environment(
            color=np.zeros(3, np.float32), hdri=img, hdri_quad=quad
        )

    @staticmethod
    def black() -> "Environment":
        return Environment.from_color((0.0, 0.0, 0.0))

    def get_color(self, dirs: jnp.ndarray) -> jnp.ndarray:
        """Environment radiance for a batch of directions (N, 3)."""
        if self.hdri is None:
            return jnp.broadcast_to(jnp.asarray(self.color), dirs.shape)
        img = jnp.asarray(self.hdri)
        h, w = img.shape[0], img.shape[1]
        d = normalize(dirs)
        azimuth = jnp.arctan2(d[..., 2], d[..., 0]) + jnp.pi
        polar = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0))
        x = azimuth / (2.0 * jnp.pi) * (w - 1)
        y = polar / jnp.pi * (h - 1)
        x0 = jnp.clip(x.astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(y.astype(jnp.int32), 0, h - 1)
        ax = (x - x0)[..., None]
        ay = (y - y0)[..., None]
        if self.hdri_quad is not None:
            # One row gather: the quad texture pre-bakes the (x0+1) wrap
            # and (y0+1) clamp (bit-identical to the 4-gather form).
            q = jnp.asarray(self.hdri_quad)[y0 * w + x0]  # (N, 12)
            c00, c01 = q[..., 0:3], q[..., 3:6]
            c10, c11 = q[..., 6:9], q[..., 9:12]
        else:
            x1 = jnp.mod(x0 + 1, w)
            y1 = jnp.minimum(y0 + 1, h - 1)
            c00 = img[y0, x0]
            c01 = img[y0, x1]
            c10 = img[y1, x0]
            c11 = img[y1, x1]
        top = c00 * (1 - ax) + c01 * ax
        bot = c10 * (1 - ax) + c11 * ax
        return top * (1 - ay) + bot * ay

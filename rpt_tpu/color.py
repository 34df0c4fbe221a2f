"""Color primitives: linear RGB colors with sRGB gamma-2.2 conversion.

TPU-native counterpart of /root/reference/src/color.rs: a `Color` is just a
float array with trailing axis 3 (linear intensities); `hex_color` converts an
sRGB hex integer into linear space, `color_bytes` tone-maps a linear image back
to clamped sRGB bytes.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SRGB_GAMMA = 2.2

__all__ = ["SRGB_GAMMA", "hex_color", "color_bytes"]


def hex_color(x: int) -> jnp.ndarray:
    """sRGB hex integer -> linear-intensity color, gamma 2.2.

    Parity: /root/reference/src/color.rs:10-15.
    """
    r = ((x >> 16) & 0xFF) / 255.0
    g = ((x >> 8) & 0xFF) / 255.0
    b = (x & 0xFF) / 255.0
    return jnp.asarray(
        [r**SRGB_GAMMA, g**SRGB_GAMMA, b**SRGB_GAMMA], dtype=jnp.float32
    )


def color_bytes(color) -> np.ndarray:
    """Clamp a linear color (..., 3) to sRGB u8 (gamma 1/2.2).

    Parity: /root/reference/src/color.rs:18-24, except quantization rounds to
    nearest instead of truncating — the reference's truncation only
    round-trips hex colors because it stores f64; rounding differs by at most
    one code value and is exact for the f32 pipeline. Accepts any array-like
    and returns a host numpy uint8 array, since byte images live outside jit.
    """
    c = np.asarray(color, dtype=np.float64)
    c = np.clip(c, 0.0, 1.0) ** (1.0 / SRGB_GAMMA)
    return np.rint(c * 255.0).astype(np.uint8)

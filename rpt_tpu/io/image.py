"""Image IO outside the jit boundary: HDR (Radiance RGBE) and PNG.

The reference decodes HDRIs with the `image` crate's HdrDecoder
(examples/wine_glass.rs load_hdr) and saves PNGs via image::RgbImage. Here
imageio handles .hdr decode and PIL writes PNGs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_hdr", "save_png"]


def load_hdr(path) -> np.ndarray:
    """Load a Radiance .hdr equirectangular image -> (H, W, 3) float32
    linear RGB."""
    import imageio.v3 as iio

    img = np.asarray(iio.imread(path), dtype=np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img[..., :3]


def save_png(path, image_u8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(image_u8).save(path)

"""Image IO outside the jit boundary: HDR (Radiance RGBE) and PNG.

The reference decodes HDRIs with the `image` crate's HdrDecoder
(examples/wine_glass.rs load_hdr) and saves PNGs via image::RgbImage. Here
imageio handles .hdr decode and PIL writes PNGs.
"""

from __future__ import annotations

import numpy as np

__all__ = ["load_hdr", "save_hdr", "save_png"]


def _decode_rgbe(rgbe: np.ndarray) -> np.ndarray:
    """(..., 4) uint8 RGBE -> (..., 3) float32: rgb = m/256 * 2^(e-128),
    with e=0 meaning black (Radiance spec; matches the image crate's
    HdrDecoder the reference uses)."""
    e = rgbe[..., 3].astype(np.int32)
    scale = np.where(e == 0, 0.0, np.ldexp(1.0 / 256.0, e - 128))
    return (rgbe[..., :3].astype(np.float32) * scale[..., None].astype(np.float32))


def load_hdr(path) -> np.ndarray:
    """Load a Radiance RGBE .hdr equirectangular image -> (H, W, 3) float32
    linear RGB (counterpart of the reference's image::codecs::hdr decode in
    examples/wine_glass.rs load_hdr). Pure-numpy decoder: handles both flat
    scanlines and the 'new RLE' (0x02 0x02) encoding."""
    with open(path, "rb") as f:
        data = f.read()
    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError(f"{path}: not a Radiance RGBE file")
    # Header: lines until the blank line, then the resolution line.
    pos = 0
    fmt_ok = False
    while True:
        nl = data.index(b"\n", pos)
        line = data[pos:nl]
        pos = nl + 1
        if line.startswith(b"FORMAT="):
            fmt_ok = line.strip() == b"FORMAT=32-bit_rle_rgbe"
        if line == b"":
            break
    if not fmt_ok:
        raise ValueError(f"{path}: unsupported FORMAT (want 32-bit_rle_rgbe)")
    nl = data.index(b"\n", pos)
    res = data[pos:nl].split()
    pos = nl + 1
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"{path}: unsupported orientation {res}")
    h, w = int(res[1]), int(res[3])

    buf = np.frombuffer(data, np.uint8, offset=pos)
    out = np.empty((h, w, 4), np.uint8)
    i = 0
    for y in range(h):
        if w >= 8 and w < 32768 and buf[i] == 2 and buf[i + 1] == 2 and (
            (int(buf[i + 2]) << 8) | int(buf[i + 3])
        ) == w:
            # New RLE: 4 component planes, each a run/dump stream.
            i += 4
            for c in range(4):
                x = 0
                while x < w:
                    n = int(buf[i])
                    if n > 128:  # run of n-128 copies of the next byte
                        out[y, x : x + n - 128, c] = buf[i + 1]
                        x += n - 128
                        i += 2
                    else:  # dump of n literal bytes
                        out[y, x : x + n, c] = buf[i + 1 : i + 1 + n]
                        x += n
                        i += 1 + n
        else:
            # Flat scanline (also covers old-RLE-free files).
            out[y] = buf[i : i + 4 * w].reshape(w, 4)
            i += 4 * w
    return _decode_rgbe(out)


def save_hdr(path, image: np.ndarray) -> None:
    """Write (H, W, 3) linear RGB float as a Radiance RGBE .hdr file
    (flat, non-RLE scanlines — valid per the Radiance spec and readable by
    every decoder). Shared-exponent quantization: each pixel stores 8-bit
    mantissas scaled by 2^(e-136), so the roundtrip is exact to ~0.4%."""
    img = np.asarray(image, np.float64)
    assert img.ndim == 3 and img.shape[-1] == 3
    h, w = img.shape[:2]
    maxc = img.max(axis=-1)
    zero = maxc < 1e-32
    m, e = np.frexp(np.where(zero, 1.0, maxc))  # maxc = m * 2^e, m in [.5, 1)
    scale = m * 256.0 / np.where(zero, 1.0, maxc)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(img * scale[..., None] + 0.5, 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(zero, 0, e + 128).astype(np.uint8)
    rgbe[zero] = 0
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def save_png(path, image_u8: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(image_u8).save(path)

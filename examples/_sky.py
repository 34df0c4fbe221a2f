"""Procedural equirectangular sky HDRI for examples.

The reference's metal/pegasus examples stream .hdr files from hdrihaven at
runtime (metal.rs load_hdr, pegasus.rs load_hdr); this container has no
network egress, so examples fall back to this synthetic environment. It is a
real (H, W, 3) equirectangular map — the HDRI bilinear-lookup path is
exercised end-to-end, only the pixels differ.
"""

import numpy as np


def procedural_sky(height: int = 256, sun_azimuth: float = 1.9,
                   sun_polar: float = 1.1, sun_intensity: float = 40.0) -> np.ndarray:
    """Gradient sky + warm sun disk + dim ground, (H, 2H, 3) float32."""
    width = height * 2
    polar = (np.arange(height) + 0.5) / height * np.pi  # 0=up
    azim = (np.arange(width) + 0.5) / width * 2.0 * np.pi
    pol, az = np.meshgrid(polar, azim, indexing="ij")

    # Sky gradient: zenith blue to horizon haze
    t = np.clip(np.cos(pol), 0.0, 1.0)[..., None]
    zenith = np.array([0.22, 0.38, 0.78])
    horizon = np.array([0.85, 0.82, 0.75])
    sky = horizon + (zenith - horizon) * t

    # Ground: dim brown below the horizon
    ground = np.array([0.18, 0.15, 0.12])
    img = np.where((pol > np.pi / 2)[..., None], ground, sky)

    # Sun disk with a soft falloff
    cos_angle = (
        np.sin(pol) * np.sin(sun_polar) * np.cos(az - sun_azimuth)
        + np.cos(pol) * np.cos(sun_polar)
    )
    sun = np.exp((cos_angle - 1.0) * 1200.0)[..., None]
    img = img + sun * sun_intensity * np.array([1.0, 0.9, 0.75])
    return img.astype(np.float32)

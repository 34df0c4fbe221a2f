"""Physically-based materials: Cook–Torrance/Beckmann BSDF and sampling.

TPU-native counterpart of /root/reference/src/material.rs. Differences from the
reference are architectural, not physical:

- Materials live in a struct-of-arrays `MaterialTable`; per-hit parameters are
  gathered by material id so BSDF evaluation is one fused batch of VPU ops over
  every active ray at once.
- `bsdf` evaluates both the reflection and refraction branches branch-free and
  selects with masks; all denominators are guarded so masked lanes can never
  produce NaNs (which matters for reverse-mode gradients through `where`).
- `sample_f` draws the lobe choice, Beckmann half-vector, cosine hemisphere and
  refraction from a threefry key; it returns (wi, pdf, valid) where `valid` is
  False for total internal reflection (the reference returns `None` there,
  material.rs:281-284).

The estimator semantics (one-sample MIS over the lobe mixture with the summed
mixture pdf, material.rs:290-311) are preserved exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .utils.vmath import dot, normalize, from_local, safe_sqrt
from .sampling import uniform_disk

__all__ = ["Material", "MaterialTable", "MatParams", "bsdf", "sample_f"]

_PI = float(np.pi)
_TINY = 1e-9


# ---------------------------------------------------------------------------
# Host-side material description (scene-building API)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Material:
    """Host-side material spec; packed into a `MaterialTable` at compile time.

    Fields mirror material.rs:8-26; constructors mirror material.rs:36-105.
    """

    color: tuple = (1.0, 0.0, 0.0)
    index: float = 1.5
    roughness: float = 0.5
    metallic: float = 0.0
    emittance: float = 0.0
    transparent: bool = False

    @staticmethod
    def _color(c) -> tuple:
        arr = np.asarray(c, dtype=np.float64).reshape(3)
        return tuple(float(v) for v in arr)

    @classmethod
    def default(cls) -> "Material":
        # Default = specular red (material.rs:28-32)
        from .color import hex_color

        return cls.specular(hex_color(0xFF0000), 0.5)

    @classmethod
    def diffuse(cls, color) -> "Material":
        return cls(cls._color(color), 1.5, 1.0, 0.0, 0.0, False)

    @classmethod
    def specular(cls, color, roughness: float) -> "Material":
        return cls(cls._color(color), 1.5, float(roughness), 0.0, 0.0, False)

    @classmethod
    def clear(cls, index: float, roughness: float) -> "Material":
        return cls((1.0, 1.0, 1.0), float(index), float(roughness), 0.0, 0.0, True)

    @classmethod
    def transparent_colored(cls, color, index: float, roughness: float) -> "Material":
        return cls(cls._color(color), float(index), float(roughness), 0.0, 0.0, True)

    @classmethod
    def metallic_mat(cls, color, roughness: float) -> "Material":
        return cls(cls._color(color), 1.5, float(roughness), 1.0, 0.0, False)

    @classmethod
    def light(cls, color, emittance: float) -> "Material":
        return cls(cls._color(color), 1.0, 1.0, 0.0, float(emittance), False)


# ---------------------------------------------------------------------------
# Device-side SoA table + per-hit gathered params
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MatParams:
    """Per-hit material parameters (all leading axes broadcast)."""

    color: jnp.ndarray  # (..., 3)
    index: jnp.ndarray  # (...,)
    roughness: jnp.ndarray  # (...,)
    metallic: jnp.ndarray  # (...,)
    emittance: jnp.ndarray  # (...,)
    transparent: jnp.ndarray  # (...,) float flag in {0, 1}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """Struct-of-arrays material storage, gathered by material id per hit."""

    color: jnp.ndarray  # (M, 3)
    index: jnp.ndarray  # (M,)
    roughness: jnp.ndarray  # (M,)
    metallic: jnp.ndarray  # (M,)
    emittance: jnp.ndarray  # (M,)
    transparent: jnp.ndarray  # (M,)

    @staticmethod
    def pack(materials, dtype=jnp.float32) -> "MaterialTable":
        # Packed as HOST numpy arrays: compiled scenes are closed over by the
        # render jit and embedded as program constants, so no standalone
        # host->device transfers happen (each one is a round trip through the
        # TPU relay and a potential multi-second stall).
        np_dtype = np.dtype(dtype)
        mats = list(materials) or [Material.default()]
        return MaterialTable(
            color=np.asarray([m.color for m in mats], np_dtype),
            index=np.asarray([m.index for m in mats], np_dtype),
            roughness=np.asarray([m.roughness for m in mats], np_dtype),
            metallic=np.asarray([m.metallic for m in mats], np_dtype),
            emittance=np.asarray([m.emittance for m in mats], np_dtype),
            transparent=np.asarray(
                [1.0 if m.transparent else 0.0 for m in mats], np_dtype
            ),
        )

    # Above this many materials, the one-hot matmul's N x M x 8 flops exceed
    # the cost of a plain row gather (MTL-heavy scenes like lego can carry
    # dozens of `usemtl` groups, io.rs:83-149); below it, the matmul rides
    # the MXU and avoids the ~10 ms-per-500k-ray HBM gather penalty.
    ONE_HOT_MAX_MATERIALS = 32

    def gather(self, ids: jnp.ndarray) -> MatParams:
        # One-hot matmul instead of an HBM gather for small tables: per-ray
        # gathers cost ~10 ms at 500k rays on TPU, while a (N, M) x (M, 8)
        # matmul rides the MXU. Large tables (M > ONE_HOT_MAX_MATERIALS)
        # fall back to the row gather, whose fixed cost beats N*M*8 flops.
        # jnp.asarray lifts host numpy tables into traced constants.
        color = jnp.asarray(self.color)
        scalars = jnp.stack(
            [
                jnp.asarray(self.index),
                jnp.asarray(self.roughness),
                jnp.asarray(self.metallic),
                jnp.asarray(self.emittance),
                jnp.asarray(self.transparent),
            ],
            axis=1,
        )  # (M, 5)
        if color.shape[0] > self.ONE_HOT_MAX_MATERIALS:
            # Clip: a negative id would WRAP to the last material under
            # jax indexing (the one-hot path degrades to zeros instead).
            # Unreachable today (mat_id is 0 on miss), guarded per ADVICE
            # r4 so a future bad id degrades to material 0, not material
            # M-1. One packed (M, 8) gather instead of two — TPU row
            # gathers are row-count-bound (PERF_NOTES r5); the concat is
            # loop-invariant and hoisted per dispatch.
            ids = jnp.clip(ids, 0, color.shape[0] - 1)
            packed = jnp.concatenate([color, scalars], axis=1)[ids]
            c = packed[..., 0:3]
            s = packed[..., 3:8]
        else:
            onehot = jax.nn.one_hot(ids, color.shape[0], dtype=color.dtype)
            c = onehot @ color  # (..., 3)
            s = onehot @ scalars  # (..., 5)
        return MatParams(
            color=c,
            index=s[..., 0],
            roughness=s[..., 1],
            metallic=s[..., 2],
            emittance=s[..., 3],
            transparent=s[..., 4],
        )


# ---------------------------------------------------------------------------
# BSDF evaluation
# ---------------------------------------------------------------------------


def _safe(x, eps=_TINY):
    """Clamp a denominator away from zero, keeping its sign."""
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def _sin2_nh(n, h):
    """sin^2 of the angle between unit n and h via the cross product.

    1 - (n.h)^2 is catastrophically ill-conditioned near theta=0: in f32,
    cos^2 quantizes in steps of ~6e-8, so for mirror-like roughness
    (m2 = 1e-8, e.g. Material.clear(1.5, 1e-4)) the Beckmann exponent
    -tan^2/m2 jumps in steps of ~6 — and because bsdf() and the MIS pdf hit
    different steps, their ratio exploded by e^±6, which the firefly clamp
    then converted into a glowing glass ball. |n x h|^2 is LINEAR in theta,
    so its relative error stays ~eps and the exponent is smooth."""
    c = jnp.cross(n, h)
    return jnp.clip(dot(c, c), 0.0, 1.0)


def _beckmann_exponent(n, h, m2):
    """-tan^2(theta_h)/m2 from the well-conditioned sin^2, clamped for f32."""
    sin2 = _sin2_nh(n, h)
    cos2 = jnp.maximum(1.0 - sin2, 1e-12)
    return jnp.maximum(-sin2 / (cos2 * m2), -80.0), cos2


def _beckmann_d(n, h, m2):
    """Beckmann microfacet distribution D (material.rs:141-143).

    Evaluated in log space: the denominator m2*pi*cos^4 underflows f32 for
    grazing half-vectors, and its reverse-mode rule divides by its square ->
    inf * masked-zero = NaN. exp(expo - log_denom) is algebraically identical
    and stays finite in both passes. The exponent clamp at -80 makes
    degenerate lanes exactly-zero with zero gradient. The exponent itself
    comes from the cross-product sin^2 (see _sin2_nh) so mirror-like
    roughness stays numerically smooth in f32.
    """
    expo, cos2 = _beckmann_exponent(n, h, m2)
    log_denom = jnp.log(m2 * _PI) + 2.0 * jnp.log(cos2)
    return jnp.exp(jnp.minimum(expo - log_denom, 80.0))


def _pow5(x):
    x2 = x * x
    return x2 * x2 * x


def bsdf(mat: MatParams, n: jnp.ndarray, wo: jnp.ndarray, wi: jnp.ndarray) -> jnp.ndarray:
    """Batched BSDF evaluation; parity with material.rs:125-210.

    `n`, `wo`, `wi` are (..., 3) unit vectors (normal, toward viewer, toward
    incident light). Returns the (..., 3) linear BSDF value.
    """
    n_wi = dot(n, wi)
    n_wo = dot(n, wo)
    wi_out = n_wi >= 0.0
    wo_out = n_wo >= 0.0
    transparent = mat.transparent > 0.5
    m2 = jnp.maximum(mat.roughness * mat.roughness, 1e-12)

    f0s = ((mat.index - 1.0) / (mat.index + 1.0)) ** 2
    # glm::lerp(f0, color, metallic) componentwise (material.rs:152)
    f0 = f0s[..., None] * (1.0 - mat.metallic[..., None]) + mat.color * mat.metallic[..., None]

    # --- Same-side branch: Cook–Torrance + Lambert (material.rs:134-172) ---
    h = normalize(wi + wo)
    wo_h = dot(wo, h)
    n_h = dot(n, h)
    d = _beckmann_d(n, h, m2)

    # Total internal reflection check (material.rs:147-149)
    sin_t = safe_sqrt(1.0 - wo_h * wo_h)
    tir = (~wi_out) & (sin_t * mat.index > 1.0)
    fres = f0 + (1.0 - f0) * _pow5(1.0 - wo_h)[..., None]
    fres = jnp.where(tir[..., None], 1.0, fres)

    g = jnp.minimum(n_wi * n_h, n_wo * n_h)
    g = jnp.minimum(2.0 * g / _safe(wo_h), 1.0)

    spec = (d * g / _safe(4.0 * n_wo * n_wi))[..., None] * fres
    diff = (1.0 - fres) * mat.color / _PI
    refl = jnp.where(transparent[..., None], spec, spec + diff)

    # --- Opposite-side branch: Walter-style BTDF (material.rs:173-209) ---
    eta_t = jnp.where(wo_out, mat.index, 1.0 / mat.index)
    h2 = normalize(wi * eta_t[..., None] + wo)
    wi_h2 = dot(wi, h2)
    wo_h2 = dot(wo, h2)
    n_h2 = dot(n, h2)
    d2 = _beckmann_d(n, h2, m2)
    fres2 = f0 + (1.0 - f0) * _pow5(1.0 - jnp.abs(wi_h2))[..., None]
    g2 = jnp.minimum(jnp.abs(n_wi * n_h2), jnp.abs(n_wo * n_h2))
    g2 = jnp.minimum(2.0 * g2 / _safe(jnp.abs(wo_h2)), 1.0)
    scale = jnp.abs(wi_h2 * wo_h2 / _safe(n_wi * n_wo))
    denom = _safe((eta_t * wi_h2 + wo_h2) ** 2)
    btdf = (scale * d2 * g2 / denom)[..., None] * (1.0 - fres2) * mat.color
    refr = btdf

    same_side = wi_out == wo_out
    out = jnp.where(same_side[..., None], refl, refr)
    # Opaque materials do not transmit (material.rs:130-133)
    blocked = (~transparent) & ((~wi_out) | (~wo_out))
    return jnp.where(blocked[..., None], 0.0, out)


# ---------------------------------------------------------------------------
# BSDF importance sampling (one-sample MIS over the lobe mixture)
# ---------------------------------------------------------------------------


def _beckmann_pdf(n, h, m2):
    """Half-vector pdf p(h) = exp(-tan^2/m2) / (pi m2 cos^3) (material.rs:256-262).

    Log-space for the same f32-underflow reason as _beckmann_d, and the same
    cross-product sin^2 so the pdf lands on the SAME exponent value as the D
    in bsdf() — their ratio (the path weight) stays smooth even at
    mirror-like roughness where cos^2 quantizes in f32."""
    expo, cos2 = _beckmann_exponent(n, h, m2)
    log_denom = jnp.log(_PI * m2) + 1.5 * jnp.log(cos2)
    return jnp.exp(jnp.minimum(expo - log_denom, 80.0))


def sample_f(
    key: jax.Array, mat: MatParams, n: jnp.ndarray, wo: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample an incident direction wi; parity with material.rs:224-313.

    Returns (wi (...,3), pdf (...,), valid (...,) bool). `pdf` is the summed
    mixture probability over all lobes that could have produced wi (one-sample
    MIS). Invalid samples (total internal reflection for the transmission lobe)
    must contribute nothing.
    """
    k_lobe, k_theta, k_phi, k_disk = jax.random.split(key, 4)
    shape = n.shape[:-1]
    m2 = jnp.maximum(mat.roughness * mat.roughness, 1e-12)

    # Lobe probability from a Fresnel estimate (material.rs:232-235)
    f0s = ((mat.index - 1.0) / (mat.index + 1.0)) ** 2
    f_est = (1.0 - mat.metallic) * f0s + mat.metallic * jnp.mean(mat.color, axis=-1)
    f_est = f_est * 0.8 + 0.2  # glm::mix_scalar(f, 1.0, 0.2)

    n_wo = dot(wo, n)
    eta_t = jnp.where(n_wo > 0.0, mat.index, 1.0 / mat.index)

    # Beckmann half-vector by probability integral transform (material.rs:244-254)
    u = jax.random.uniform(k_theta, shape, minval=1e-7, maxval=1.0)
    theta = jnp.arctan(jnp.sqrt(-m2 * jnp.log(u)))
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    phi = jax.random.uniform(k_phi, shape, minval=0.0, maxval=2.0 * _PI)
    h_local = jnp.stack(
        [jnp.cos(phi) * sin_t, jnp.sin(phi) * sin_t, cos_t], axis=-1
    )
    h = from_local(n, h_local)

    # Specular lobe: wi = -reflect(wo, h) = 2 (h.wo) h - wo (material.rs:264-267)
    h_wo = dot(h, wo)
    wi_spec = 2.0 * h_wo[..., None] * h - wo

    # Diffuse lobe: Malley cosine sampling (material.rs:268-273)
    xy = uniform_disk(k_disk, shape)
    z = safe_sqrt(1.0 - jnp.sum(xy * xy, axis=-1))
    wi_diff = from_local(n, jnp.concatenate([xy, z[..., None]], axis=-1))

    # Transmission lobe (material.rs:274-288)
    wo_perp = wo - h * h_wo[..., None]
    wi_perp = -wo_perp / eta_t[..., None]
    sin2_ti = dot(wi_perp, wi_perp)
    tir = sin2_ti > 1.0
    cos_ti = safe_sqrt(1.0 - sin2_ti)
    wi_trans = -jnp.sign(h_wo)[..., None] * cos_ti[..., None] * h + wi_perp

    transparent = mat.transparent > 0.5
    pick_spec = jax.random.uniform(k_lobe, shape) < f_est
    wi_other = jnp.where(transparent[..., None], wi_trans, wi_diff)
    wi = jnp.where(pick_spec[..., None], wi_spec, wi_other)
    valid = ~((~pick_spec) & transparent & tir)

    # Mixture pdf (material.rs:290-311)
    n_wi = dot(wi, n)
    hs = normalize(wi + wo)
    p_spec = f_est * _beckmann_pdf(n, hs, m2) / _safe(4.0 * jnp.abs(dot(hs, wo)))

    p_diff = (1.0 - f_est) * jnp.maximum(n_wi, 0.0) / _PI

    ht = normalize(wi * eta_t[..., None] + wo)
    ht_wo = dot(ht, wo)
    ht_wi = dot(ht, wi)
    jac = jnp.abs(ht_wo) / _safe((eta_t * ht_wi + ht_wo) ** 2)
    p_trans = (1.0 - f_est) * _beckmann_pdf(n, ht, m2) * jac
    opposite = (n_wo >= 0.0) != (n_wi >= 0.0)
    p_trans = jnp.where(opposite, p_trans, 0.0)

    pdf = p_spec + jnp.where(transparent, p_trans, p_diff)
    return wi, pdf, valid

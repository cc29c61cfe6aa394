"""Point-wise intensity transforms.

Semantics follow the documented contracts of the reference's pinned deps
(SURVEY.md section 2b D1/D6): ``skimage.exposure.adjust_gamma/adjust_log/
adjust_sigmoid/rescale_intensity`` and the [N] HU-windowing formula
``clip((hu - (c - w/2)) / w, 0, 1)`` (SURVEY.md section 4 item 1).

All functions are pure, shape-polymorphic, and fuse into the surrounding
XLA program — on TPU these are single-pass VPU work that XLA folds into
neighboring stages for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def adjust_gamma(img: Array, gamma: float = 1.0, gain: float = 1.0) -> Array:
    """Gamma correction: ``gain * img ** gamma`` (skimage semantics).

    Input is assumed non-negative (float [0,1] pipeline convention).
    """
    return gain * jnp.power(img, gamma)


def adjust_log(img: Array, gain: float = 1.0, inv: bool = False) -> Array:
    """Logarithmic correction: ``gain * log2(1 + img)``.

    With ``inv=True``: ``gain * (2**img - 1)`` (inverse-log), matching
    skimage.exposure.adjust_log.
    """
    if inv:
        return gain * (jnp.exp2(img) - 1.0)
    return gain * jnp.log2(1.0 + img)


def adjust_sigmoid(
    img: Array, cutoff: float = 0.5, gain: float = 10.0, inv: bool = False
) -> Array:
    """Sigmoid (S-curve) contrast: ``1 / (1 + exp(gain * (cutoff - img)))``."""
    s = 1.0 / (1.0 + jnp.exp(gain * (cutoff - img)))
    if inv:
        return 1.0 - s
    return s


def invert(img: Array) -> Array:
    """Photometric inversion for float [0,1] images: ``1 - img``."""
    return 1.0 - img


def normalize_minmax(img: Array, eps: float = 1e-12) -> Array:
    """Affine rescale of the image's own range to [0, 1]."""
    lo = jnp.min(img)
    hi = jnp.max(img)
    return (img - lo) / jnp.maximum(hi - lo, eps)


def rescale_intensity(
    img: Array,
    in_range: tuple[float, float] | None = None,
    out_range: tuple[float, float] = (0.0, 1.0),
) -> Array:
    """skimage.exposure.rescale_intensity semantics.

    ``in_range=None`` means the image's own (min, max). Values are clipped
    to ``in_range`` before the affine map to ``out_range``.
    """
    if in_range is None:
        imin, imax = jnp.min(img), jnp.max(img)
    else:
        imin = jnp.asarray(in_range[0], img.dtype)
        imax = jnp.asarray(in_range[1], img.dtype)
    omin, omax = out_range
    x = jnp.clip(img, imin, imax)
    scale = (omax - omin) / jnp.maximum(imax - imin, 1e-12)
    return (x - imin) * scale + omin


def adjust_brightness(img: Array, factor: float = 0.0) -> Array:
    """kornia.enhance.adjust_brightness: ``clip(img + factor, 0, 1)``."""
    return jnp.clip(img + factor, 0.0, 1.0)


def adjust_contrast(img: Array, factor: float = 1.0) -> Array:
    """kornia.enhance.adjust_contrast: ``clip(img * factor, 0, 1)``."""
    return jnp.clip(img * factor, 0.0, 1.0)


def solarize(img: Array, threshold: float = 0.5) -> Array:
    """Invert pixels above the threshold (kornia/PIL semantics)."""
    return jnp.where(img >= threshold, 1.0 - img, img)


def posterize(img: Array, bits: int = 4) -> Array:
    """Reduce to ``bits`` bits per pixel (kornia/PIL semantics on the
    uint8 lattice): mask off the low (8 - bits) bits of round(x*255)."""
    if not 1 <= int(bits) <= 8:
        raise ValueError("bits must be in [1, 8]")
    keep = 256 - (1 << (8 - int(bits)))
    u = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)
    return (u & keep).astype(jnp.float32) / 255.0


def sharpness(img: Array, factor: float = 1.0) -> Array:
    """kornia.enhance.sharpness-style blend: lerp between a 3x3
    smoothed image (PIL SMOOTH kernel: [[1,1,1],[1,5,1],[1,1,1]]/13,
    interior only) and the original by ``factor``; factor 0 = smoothed,
    1 = original, >1 over-sharpens. Clipped to [0, 1]."""
    from mies_tpu.ops.filters import _pad2d

    p = _pad2d(img.astype(jnp.float32), 1, 1, "nearest")
    h, w = img.shape
    k = [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]
    acc = jnp.zeros((h, w), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + np.float32(k[dy][dx] / 13.0) * jax.lax.dynamic_slice(
                p, (dy, dx), (h, w)
            )
    # PIL applies the smooth kernel to INTERIOR pixels only
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    interior = (row > 0) & (row < h - 1) & (col > 0) & (col < w - 1)
    smoothed = jnp.where(interior, acc, img)
    return jnp.clip(smoothed + factor * (img - smoothed), 0.0, 1.0)


def is_low_contrast(
    img: Array,
    fraction_threshold: float = 0.05,
    lower_percentile: float = 1.0,
    upper_percentile: float = 99.0,
) -> Array:
    """skimage.exposure.is_low_contrast for float [0,1] images: the
    1-99 percentile span, as a fraction of the full [0,1] range, falls
    below the threshold. Returns a scalar bool array (jit-safe)."""
    lo, hi = jnp.percentile(
        img.astype(jnp.float32),
        jnp.asarray([lower_percentile, upper_percentile]),
    )
    return (hi - lo) < fraction_threshold


# Standard clinical CT windows (center, width) in Hounsfield units.
HU_PRESETS: dict[str, tuple[float, float]] = {
    "soft_tissue": (40.0, 400.0),
    "lung": (-600.0, 1500.0),
    "bone": (400.0, 1800.0),
    "brain": (40.0, 80.0),
    "liver": (60.0, 160.0),
    "mediastinum": (50.0, 350.0),
    "stroke": (40.0, 40.0),
    "subdural": (75.0, 215.0),
    "abdomen": (50.0, 400.0),
}


def window_hu(
    hu: Array,
    center: float | None = None,
    width: float | None = None,
    preset: str | None = None,
) -> Array:
    """CT Hounsfield-unit windowing to float [0, 1].

    ``clip((hu - (center - width/2)) / width, 0, 1)`` — the [N] contract
    (SURVEY.md section 3.3). Accepts int16 or float input; computes in
    float32 so the whole window+chain fuses into one XLA program with the
    int16->f32 cast happening on-device.

    ``preset`` names a standard clinical window (HU_PRESETS:
    soft_tissue, lung, bone, brain, liver, mediastinum, stroke,
    subdural, abdomen); explicit center/width override the preset's.
    """
    if preset is not None:
        if preset not in HU_PRESETS:
            raise ValueError(
                f"unknown HU preset {preset!r}; available: "
                f"{sorted(HU_PRESETS)}"
            )
        pc, pw = HU_PRESETS[preset]
        center = pc if center is None else center
        width = pw if width is None else width
    if center is None or width is None:
        raise ValueError("window_hu needs center+width or a preset")
    x = hu.astype(jnp.float32)
    lo = center - width / 2.0
    return jnp.clip((x - lo) / width, 0.0, 1.0)

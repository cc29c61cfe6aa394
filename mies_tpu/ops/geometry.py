"""Geometric ops: resize / crop / flip / rotate.

Covers the kornia-rs (resize) and torchvision.transforms roles of the
reference stack (SURVEY.md section 2b D2/D4) with jax-native
implementations — ``jax.image.resize`` lowers to XLA convolutions /
gathers that the TPU handles natively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def resize(
    img: Array,
    height: int,
    width: int,
    method: str = "bilinear",
    antialias: bool = True,
) -> Array:
    """Resize [H, W] to [height, width] (bilinear/nearest/cubic/lanczos3)."""
    return jax.image.resize(
        img, (height, width), method=method, antialias=antialias
    ).astype(img.dtype)


def center_crop(img: Array, height: int, width: int) -> Array:
    """Crop the central [height, width] window (torchvision semantics:
    pad with zeros if the crop is larger than the image)."""
    h, w = img.shape
    if height > h or width > w:
        ph, pw = max(height - h, 0), max(width - w, 0)
        img = jnp.pad(
            img,
            ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)),
            mode="constant",
        )
        h, w = img.shape
    top = (h - height) // 2
    left = (w - width) // 2
    return img[top : top + height, left : left + width]


def flip(img: Array, horizontal: bool = True, vertical: bool = False) -> Array:
    """Mirror the image along the requested axes."""
    if horizontal:
        img = img[:, ::-1]
    if vertical:
        img = img[::-1, :]
    return img


def rot90(img: Array, k: int = 1) -> Array:
    """Rotate by k * 90 degrees counter-clockwise."""
    return jnp.rot90(img, k=int(k) % 4)


def normalize_meanstd(
    img: Array, mean: float = 0.5, std: float = 0.5
) -> Array:
    """kornia.enhance.normalize semantics: (x - mean) / std."""
    return (img - mean) / std


def denormalize_meanstd(
    img: Array, mean: float = 0.5, std: float = 0.5
) -> Array:
    """Inverse of normalize_meanstd: x * std + mean."""
    return img * std + mean

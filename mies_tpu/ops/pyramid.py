"""Multiscale Laplacian-pyramid ops: cv2-exact pyrDown / pyrUp and
MUSICA contrast enhancement.

MUSICA (MUltiscale Image Contrast Amplification, Vuylsteke & Schoeters,
SPIE 2167, 1994) is the canonical digital-radiography enhancement: the
image decomposes into a Laplacian pyramid, each detail band passes
through a compressive power-law ``y = gain * M * sign(x) * (|x|/M)^p``
(p < 1 amplifies LOW-contrast detail more than already-strong edges),
and the pyramid reconstructs. It is what commercial DR processing
(Agfa MUSICA, Philips UNIQUE) builds on — the reference's kornia/
torchvision surface (`/root/reference/pyproject.toml:8,16`) provides the
pyramid primitives (``kornia.geometry.transform.build_laplacian_pyramid``
/ ``pyrdown`` / ``pyrup``); the enhancement composite is this module's
north-star addition.

Pyramid semantics are pinned to OpenCV (tests compare against the REAL
cv2, which ships in the test environment):

  * ``pyr_down``: Burt-Adelson 5-tap [1,4,6,4,1]/16 per axis with
    BORDER_REFLECT_101 (this codebase's 'mirror'), then even-index
    decimation — output ceil(n/2) per axis, == cv2.pyrDown.
  * ``pyr_up``: zero-insertion to the FULL (2h, 2w) grid, the same
    separable filter scaled by 4 (2 per axis), computed on that grid
    and then cropped to ``out_shape`` — cv2.pyrUp computes odd dstsize
    this way (verified empirically: cropping AFTER filtering matches;
    filtering the odd grid directly does not).

TPU design: each level is 2 shifted-add VPU passes (`_conv1d_shifted`,
the same fused dataflow as gaussian_blur) + a static strided slice; the
whole pyramid is a handful of fused elementwise passes over a
geometrically shrinking series — ~2.7x one full-resolution blur in
total work. No gathers, no dynamic shapes; every level's extent is
static at trace time.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import Array

from mies_tpu.ops.filters import _conv1d_shifted

# Burt-Adelson generating kernel (cv2.pyrDown/pyrUp's fixed filter)
_BURT = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0


def _burt2(x: Array) -> Array:
    """Separable 5-tap Burt filter, BORDER_REFLECT_101 (= our 'mirror')."""
    return _conv1d_shifted(_conv1d_shifted(x, _BURT, 0, "mirror"),
                           _BURT, 1, "mirror")


def pyr_down(img: Array) -> Array:
    """cv2.pyrDown: Burt blur + even-index decimation -> ceil(n/2)."""
    if min(img.shape) < 2:
        raise ValueError(f"pyr_down needs dims >= 2, got {img.shape}")
    return _burt2(img.astype(jnp.float32))[::2, ::2]


def pyr_up(img: Array, out_shape: tuple[int, int] | None = None) -> Array:
    """cv2.pyrUp: zero-insert to (2h, 2w), Burt blur x4, crop to
    ``out_shape`` (default (2h, 2w); odd sizes crop AFTER filtering the
    full even grid — cv2's dstsize semantics)."""
    h, w = img.shape
    if out_shape is None:
        out_shape = (2 * h, 2 * w)
    oh, ow = out_shape
    if not (2 * h - 1 <= oh <= 2 * h and 2 * w - 1 <= ow <= 2 * w):
        raise ValueError(
            f"out_shape {out_shape} incompatible with pyr_up from "
            f"({h}, {w}): each dim must be 2n or 2n-1"
        )
    z = jnp.zeros((2 * h, 2 * w), jnp.float32)
    z = z.at[::2, ::2].set(img.astype(jnp.float32))
    return (4.0 * _burt2(z))[:oh, :ow]


def laplacian_pyramid(img: Array, levels: int) -> list[Array]:
    """[L_0 .. L_{levels-1}, G_levels]: L_k = G_k - pyr_up(G_{k+1})
    cropped to G_k's shape; the last entry is the low-pass residual.
    ``sum(pyr_up chain) + bands`` reconstructs exactly."""
    if levels < 1:
        raise ValueError("levels must be >= 1")
    g = [img.astype(jnp.float32)]
    for _ in range(levels):
        g.append(pyr_down(g[-1]))
    out = [
        g[k] - pyr_up(g[k + 1], g[k].shape) for k in range(levels)
    ]
    out.append(g[levels])
    return out


def musica(
    img: Array,
    levels: int = 4,
    p: float = 0.5,
    gain: float | tuple = 1.0,
    m: float = 1.0,
    clip: bool = True,
) -> Array:
    """MUSICA multiscale contrast amplification on a 2-D slice.

    Each Laplacian band maps through
    ``gain_k * m * sign(l) * (|l| / m)**p`` — the Vuylsteke-Schoeters
    power law with amplitude bound ``m`` (1.0 for [0, 1] inputs).
    ``p < 1`` boosts subtle structures (trabeculae, septal lines, soft
    lesion rims) relatively MORE than strong edges, which equalizes
    detail contrast across the dynamic range; ``p = 1`` with per-level
    ``gain`` degenerates to plain band weighting. ``gain`` may be one
    number or one per level (finest first). The low-pass residual
    passes through unchanged, preserving global tone.

    Golden: tests/goldens/golden_ops.py::musica (REAL cv2 pyramids +
    the same nonlinearity in float64). Spatial sharding is rejected —
    the decimated grids don't tile along rows (use batch sharding).
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    if m <= 0:
        raise ValueError("m must be > 0")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    if min(img.shape) < 2 ** levels:
        raise ValueError(
            f"image {img.shape} too small for {levels} pyramid levels"
        )
    gains = (list(gain) if isinstance(gain, (tuple, list))
             else [float(gain)] * levels)
    if len(gains) != levels:
        raise ValueError(
            f"gain must be one number or {levels} (one per level), "
            f"got {len(gains)}"
        )
    bands = laplacian_pyramid(img, levels)
    out = bands[levels]  # low-pass residual, untouched
    p32 = np.float32(p)
    m32 = np.float32(m)
    for k in reversed(range(levels)):
        lk = bands[k]
        if p == 1.0:
            enh = np.float32(gains[k]) * lk
        else:
            enh = (np.float32(gains[k]) * m32 * jnp.sign(lk)
                   * (jnp.abs(lk) / m32) ** p32)
        out = pyr_up(out, lk.shape) + enh
    return jnp.clip(out, 0.0, 1.0) if clip else out

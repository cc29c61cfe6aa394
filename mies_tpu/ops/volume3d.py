"""Volumetric (3-D) enhancement ops: 3-D CLAHE and 3-D Gaussian.

Beyond-parity feature motivated by "Multidimensional Contrast Limited
Adaptive Histogram Equalization" (arXiv:1906.11355, PAPERS.md): slice-
by-slice CLAHE produces inter-slice flicker in CT/MRI volumes because
each slice gets independent LUTs; 3-D CLAHE computes histograms over
VOLUMETRIC tiles and interpolates TRILINEARLY between the 8 neighboring
tile LUTs, giving z-consistent contrast.

Conventions mirror the 2-D op (mies_tpu.ops.histogram.clahe): OpenCV
clip semantics extended to 3-D tiles ('opencv') or fraction-of-tile
clipping ('fraction'); weights use the same f32-reciprocal rule per
axis. Golden: tests/goldens/golden_ops.py::clahe3d_fraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mies_tpu.ops import histogram as H

NBINS = 256


def _tile_hists_3d(u8: Array, grid: tuple[int, int, int]) -> Array:
    gz, gy, gx = grid
    z, h, w = u8.shape
    tz, th, tw = z // gz, h // gy, w // gx
    tiles = (
        u8.reshape(gz, tz, gy, th, gx, tw)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(gz * gy * gx, tz * th * tw)
    )
    bins = jnp.arange(NBINS, dtype=jnp.int32)
    oh = (tiles[:, :, None] == bins[None, None, :]).astype(jnp.bfloat16)
    ones = jnp.ones((tz * th * tw,), jnp.bfloat16)
    return jnp.einsum("tpb,p->tb", oh, ones, preferred_element_type=jnp.float32)


def _axis_weights(n: int, t: int, g: int):
    """OpenCV-style per-axis interpolation: clamped lo/hi indices + frac."""
    inv = np.float32(1.0) / np.float32(t)
    f = jnp.arange(n, dtype=jnp.float32) * inv - np.float32(0.5)
    lo_f = jnp.floor(f)
    a = f - lo_f
    lo = jnp.maximum(lo_f.astype(jnp.int32), 0)
    hi = jnp.minimum(lo_f.astype(jnp.int32) + 1, g - 1)
    return lo, hi, a


@functools.partial(
    jax.jit, static_argnames=("grid_size", "clip_limit", "convention")
)
def clahe3d(
    vol: Array,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int, int] = (4, 8, 8),
    convention: str = "opencv",
) -> Array:
    """3-D CLAHE on a float [0,1] volume [Z, H, W].

    Z, H, W must be divisible by grid_size. Returns float32 [Z, H, W].
    """
    if vol.ndim != 3:
        raise ValueError(f"clahe3d expects [Z, H, W]; got {vol.shape}")
    gz, gy, gx = grid_size
    z, h, w = vol.shape
    if z % gz or h % gy or w % gx:
        raise ValueError(f"volume {vol.shape} not divisible by grid {grid_size}")
    tz, th, tw = z // gz, h // gy, w // gx
    tile_vox = tz * th * tw

    u8 = jnp.clip(jnp.round(vol.astype(jnp.float32) * 255.0), 0, 255).astype(
        jnp.int32
    )
    hists = _tile_hists_3d(u8, grid_size)

    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_vox / NBINS), 1))
        hists = H._clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = jnp.clip(jnp.rint(cdf * (jnp.float32(NBINS - 1) / tile_vox)), 0, 255)
    elif convention == "fraction":
        clip_value = jnp.float32(max(clip_limit * tile_vox, 1.0))
        hists = H._clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = cdf / tile_vox
    else:
        raise ValueError(f"unknown CLAHE convention: {convention!r}")
    luts = luts.reshape(gz, gy, gx, NBINS)

    zlo, zhi, za = _axis_weights(z, tz, gz)
    ylo, yhi, ya = _axis_weights(h, th, gy)
    xlo, xhi, xa = _axis_weights(w, tw, gx)

    za = za[:, None, None]
    ya = ya[None, :, None]
    xa = xa[None, None, :]
    Z1 = zlo[:, None, None]
    Z2 = zhi[:, None, None]
    Y1 = ylo[None, :, None]
    Y2 = yhi[None, :, None]
    X1 = xlo[None, None, :]
    X2 = xhi[None, None, :]

    def corner(Zi, Yi, Xi):
        return luts[Zi, Yi, Xi, u8]

    # trilinear: blend x, then y, then z (OpenCV op-order per axis)
    c00 = corner(Z1, Y1, X1) * (1.0 - xa) + corner(Z1, Y1, X2) * xa
    c01 = corner(Z1, Y2, X1) * (1.0 - xa) + corner(Z1, Y2, X2) * xa
    c10 = corner(Z2, Y1, X1) * (1.0 - xa) + corner(Z2, Y1, X2) * xa
    c11 = corner(Z2, Y2, X1) * (1.0 - xa) + corner(Z2, Y2, X2) * xa
    c0 = c00 * (1.0 - ya) + c01 * ya
    c1 = c10 * (1.0 - ya) + c11 * ya
    res = c0 * (1.0 - za) + c1 * za

    if convention == "opencv":
        out = jnp.clip(jnp.rint(res), 0, 255) / 255.0
    else:
        out = jnp.clip(res, 0.0, 1.0)
    return out.astype(jnp.float32)


def gaussian_blur3d(
    vol: Array, sigma: float = 1.0, truncate: float = 4.0, mode: str = "nearest"
) -> Array:
    """Separable 3-D Gaussian over [Z, H, W] (scipy tap order per axis)."""
    from mies_tpu.ops.filters import _PAD_MODE, gaussian_kernel1d

    if sigma <= 0:
        return vol
    radius = int(truncate * float(sigma) + 0.5)
    k = gaussian_kernel1d(float(sigma), radius)
    x = vol.astype(jnp.float32)
    for axis in range(3):
        pads = [(0, 0)] * 3
        pads[axis] = (radius, radius)
        xp = jnp.pad(x, pads, mode=_PAD_MODE[mode])
        acc = np.float32(k[0]) * jax.lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis)
        for t in range(1, len(k)):
            acc = acc + np.float32(k[t]) * jax.lax.slice_in_dim(
                xp, t, t + x.shape[axis], axis=axis
            )
        x = acc
    return x

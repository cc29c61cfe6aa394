"""Histogram-based contrast ops: global equalization and CLAHE.

Two CLAHE conventions exist in the reference's dependency set and they
differ numerically (SURVEY.md section 4 item 1):

* ``convention="opencv"`` — OpenCV / kornia ``equalize_clahe`` semantics:
  integer uint8 histograms, ``clip_limit`` is a multiple of the uniform
  bin level (default 2.0 .. 40.0), OpenCV's exact clip-redistribution and
  rounding. This path is validated BIT-EXACTLY against ``cv2.createCLAHE``
  in tests/test_clahe.py.
* ``convention="fraction"`` — scikit-image ``equalize_adapthist`` flavor:
  ``clip_limit`` is a fraction of tile pixels (default 0.01), float CDF
  LUTs. Exact semantics documented in tests/goldens/golden_ops.py (the
  behavioral contract — skimage itself is not installable here).

The pure-jnp implementation below is the correctness reference; the
Pallas kernel in ``mies_tpu.kernels.clahe`` is the performance path and
must match it exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

NBINS = 256


# ---------------------------------------------------------------------------
# Global histogram equalization (skimage.exposure.equalize_hist semantics)
# ---------------------------------------------------------------------------


def _global_hist_onehot(idx_flat: Array, nbins: int) -> Array:
    """Histogram of int32 indices via onehot reduce (exact f32 counts).

    TPUs have no fast scatter; the gatherless form — compare against an
    iota of bins and reduce — is 20-50x faster on the VPU/MXU (measured,
    SURVEY.md section 7 hard part #2). Out-of-range indices (< 0) are
    counted nowhere, which the padding below exploits.
    """
    n = idx_flat.shape[0]
    pad = (-n) % 512
    if pad:
        idx_flat = jnp.concatenate(
            [idx_flat, jnp.full((pad,), -1, jnp.int32)]
        )
    chunks = idx_flat.reshape(-1, 512)
    bins = jnp.arange(nbins, dtype=jnp.int32)
    oh = chunks[:, :, None] == bins[None, None, :]
    return jnp.sum(oh, axis=(0, 1), dtype=jnp.float32)


def equalize_hist(img: Array, nbins: int = NBINS) -> Array:
    """Global histogram equalization, skimage semantics.

    Histogram over ``nbins`` bins spanning the image's own [min, max],
    normalized CDF, output = piecewise-linear interpolation of the CDF
    against bin centers — float in [0, 1]. Mirrors
    ``skimage.exposure.equalize_hist`` (SURVEY.md section 4 item 1);
    golden: tests/goldens/golden_ops.py::equalize_hist.

    Both the histogram and the CDF lookup are gatherless (onehot
    compare + reduce / selection-by-matmul) — the TPU-native forms.
    """
    img = img.astype(jnp.float32)
    lo = jnp.min(img)
    hi = jnp.max(img)
    span = jnp.maximum(hi - lo, 1e-12)
    # Bin index per pixel; pixels at `hi` land in the last bin.
    idx = jnp.clip(((img - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = _global_hist_onehot(idx.ravel(), nbins)
    cdf = jnp.cumsum(hist)
    cdf = cdf / cdf[-1]

    # interp(img, bin_centers, cdf): xi = position in bin-center space;
    # out = cdf[i] + frac * (cdf[i+1] - cdf[i]), clamped at the ends.
    width = span / nbins
    c0 = lo + 0.5 * width
    xi = (img - c0) / width
    i = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, nbins - 2)
    frac = jnp.clip(xi - i.astype(jnp.float32), 0.0, 1.0)

    # gatherless cdf[i], cdf[i+1]: onehot selection via HIGHEST-precision
    # matmul (0/1 x table is exact under the bf16x3 decomposition).
    n = i.size
    pad = (-n) % 512
    i_flat = i.ravel()
    if pad:
        i_flat = jnp.concatenate([i_flat, jnp.zeros((pad,), jnp.int32)])
    chunks = i_flat.reshape(-1, 512)
    bins = jnp.arange(nbins, dtype=jnp.int32)
    oh = (chunks[:, :, None] == bins[None, None, :]).astype(jnp.float32)
    table = jnp.stack([cdf, jnp.concatenate([cdf[1:], cdf[-1:]])], axis=1)
    sel = jnp.einsum(
        "cpb,bk->cpk", oh, table, precision=jax.lax.Precision.HIGHEST
    )
    sel = sel.reshape(-1, 2)[:n]
    c_lo = sel[:, 0].reshape(img.shape)
    c_hi = sel[:, 1].reshape(img.shape)
    return c_lo + frac * (c_hi - c_lo)


# ---------------------------------------------------------------------------
# CLAHE
# ---------------------------------------------------------------------------


def _pad_reflect101(img: Array, grid: tuple[int, int]) -> tuple[Array, int, int]:
    """Pad H, W up to multiples of the tile grid with BORDER_REFLECT_101.

    OpenCV pads on the bottom/right only (``copyMakeBorder(src, 0, dy, 0,
    dx, BORDER_REFLECT_101)``); numpy/jnp mode='reflect' matches
    REFLECT_101 (edge pixel not duplicated).
    """
    h, w = img.shape
    gy, gx = grid
    ph = (gy - h % gy) % gy
    pw = (gx - w % gx) % gx
    if ph or pw:
        img = jnp.pad(img, ((0, ph), (0, pw)), mode="reflect")
    return img, ph, pw


def _tile_histograms(u8: Array, grid: tuple[int, int]) -> Array:
    """Per-tile 256-bin histograms, shape [gy*gx, 256] (float32 counts)."""
    gy, gx = grid
    h, w = u8.shape
    th, tw = h // gy, w // gx
    tiles = u8.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3).reshape(gy * gx, th * tw)

    def one_hist(t: Array) -> Array:
        return jnp.zeros((NBINS,), jnp.float32).at[t].add(1.0)

    return jax.vmap(one_hist)(tiles)


def _clip_redistribute_opencv(hist: Array, clip_value: Array) -> Array:
    """OpenCV's exact integer clip + redistribution, vectorized per tile.

    hist: [T, 256] float32 integer-valued counts. OpenCV:
      1. excess = sum(max(h - clip, 0)); h = min(h, clip)
      2. h += excess // 256
      3. residual = excess % 256; step = max(256 // residual, 1);
         h[i] += 1 for i = 0, step, 2*step, ... while residual lasts
         (and i < 256 — leftover residual beyond that is dropped).
    """
    excess = jnp.sum(jnp.maximum(hist - clip_value, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, clip_value)
    batch_incr = jnp.floor(excess / NBINS)
    residual = excess - batch_incr * NBINS  # [T, 1]
    hist = hist + batch_incr
    # Residual spread: increments land at i = k*step for k < residual.
    step = jnp.maximum(jnp.floor(NBINS / jnp.maximum(residual, 1.0)), 1.0)
    i = jnp.arange(NBINS, dtype=jnp.float32)[None, :]
    k = jnp.floor(i / step)
    gets_one = (jnp.mod(i, step) == 0) & (k < residual)
    return hist + gets_one.astype(jnp.float32)


def _clip_redistribute_fraction(hist: Array, clip_value: Array) -> Array:
    """Fraction-convention clip: one-pass uniform float redistribution.

    excess is spread equally over ALL bins (float), so total mass is
    conserved exactly. Bins may exceed the clip value after redistribution
    (single pass — documented contract, see module docstring).
    """
    excess = jnp.sum(jnp.maximum(hist - clip_value, 0.0), axis=1, keepdims=True)
    return jnp.minimum(hist, clip_value) + excess / NBINS


def _bilinear_lut_apply(
    u8: Array,
    luts: Array,
    grid: tuple[int, int],
    tile_shape: tuple[int, int] | None = None,
    y_offset=0,
) -> Array:
    """Bilinearly interpolate per-pixel between the 4 neighboring tile LUTs.

    u8:   [H, W] int32 bin indices (padded image, or a row band of it
          when ``y_offset`` gives the band's global starting row).
    luts: [gy, gx, 256] float32 — always the FULL tile grid.
    Returns float32 [H, W] of interpolated LUT values (un-rounded).

    OpenCV weight computation: ``txf = x / tw - 0.5; tx1 = floor(txf);
    xa = txf - tx1; tx1 = max(tx1, 0); tx2 = min(tx1 + 1, gx - 1)``.
    """
    gy, gx = grid
    h, w = u8.shape
    th, tw = tile_shape if tile_shape is not None else (h // gy, w // gx)

    # OpenCV uses integer pixel coords times an f32 RECIPROCAL:
    # txf = x * (1.0f / tw) - 0.5f. Multiplying by the rounded reciprocal
    # (not dividing) matters for bit-exactness when tw is not a power of 2.
    inv_th = np.float32(1.0) / np.float32(th)
    inv_tw = np.float32(1.0) / np.float32(tw)
    yg = jnp.arange(h, dtype=jnp.float32) + jnp.float32(y_offset)
    yf = yg * inv_th - np.float32(0.5)
    xf = jnp.arange(w, dtype=jnp.float32) * inv_tw - np.float32(0.5)

    ty1f = jnp.floor(yf)
    tx1f = jnp.floor(xf)
    ya = (yf - ty1f)[:, None]  # [H,1]
    xa = (xf - tx1f)[None, :]  # [1,W]
    # OpenCV: tx2 = UNCLIPPED floor + 1, then min-clamped; tx1 max-clamped.
    ty1 = jnp.maximum(ty1f.astype(jnp.int32), 0)
    tx1 = jnp.maximum(tx1f.astype(jnp.int32), 0)
    ty2 = jnp.minimum(ty1f.astype(jnp.int32) + 1, gy - 1)
    tx2 = jnp.minimum(tx1f.astype(jnp.int32) + 1, gx - 1)

    ty1 = ty1[:, None]
    ty2 = ty2[:, None]
    tx1 = tx1[None, :]
    tx2 = tx2[None, :]

    v11 = luts[ty1, tx1, u8]
    v12 = luts[ty1, tx2, u8]
    v21 = luts[ty2, tx1, u8]
    v22 = luts[ty2, tx2, u8]
    top = v11 * (1.0 - xa) + v12 * xa
    bot = v21 * (1.0 - xa) + v22 * xa
    return top * (1.0 - ya) + bot * ya


@functools.partial(
    jax.jit, static_argnames=("grid_size", "clip_limit", "convention", "nbins")
)
def clahe(
    img: Array,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int] = (8, 8),
    convention: str = "opencv",
    nbins: int = NBINS,
) -> Array:
    """Contrast-Limited Adaptive Histogram Equalization on float [0,1].

    convention="opencv": quantize to uint8 levels, run OpenCV's exact
    integer algorithm (clip = max(int(clip_limit * tile_area / 256), 1),
    integer redistribution, uint8 LUT via rint, bilinear blend, final
    rint) and return float levels / 255. Bit-exact vs cv2.createCLAHE.

    convention="fraction": clip = max(clip_limit * tile_area, 1) float
    counts, single-pass uniform redistribution, CDF LUT normalized to
    [0,1], bilinear blend, float output (no quantization loss beyond the
    256-bin index).
    """
    if img.ndim != 2:
        raise ValueError(f"clahe expects [H, W]; got shape {img.shape}")
    if nbins != NBINS:
        raise NotImplementedError("only nbins=256 is supported")
    gy, gx = grid_size
    h0, w0 = img.shape

    u8 = jnp.clip(jnp.round(img.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.int32)
    u8, ph, pw = _pad_reflect101(u8, (gy, gx))
    h, w = u8.shape
    th, tw = h // gy, w // gx
    tile_area = th * tw

    hists = _tile_histograms(u8, (gy, gx))  # [T, 256]

    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_area / NBINS), 1))
        hists = _clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        lut_scale = jnp.float32(NBINS - 1) / tile_area
        # cvRound == round-half-to-even == rint
        luts = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255)  # uint8-valued f32
        luts = luts.reshape(gy, gx, NBINS)
        out = _bilinear_lut_apply(u8, luts, (gy, gx))
        out = jnp.clip(jnp.rint(out), 0, 255)
        out = out[:h0, :w0] / 255.0
    elif convention == "fraction":
        clip_value = jnp.float32(max(clip_limit * tile_area, 1.0))
        hists = _clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = (cdf / tile_area).reshape(gy, gx, NBINS)
        out = _bilinear_lut_apply(u8, luts, (gy, gx))
        out = jnp.clip(out[:h0, :w0], 0.0, 1.0)
    else:
        raise ValueError(f"unknown CLAHE convention: {convention!r}")
    return out.astype(img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32)

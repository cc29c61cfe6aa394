"""Histogram-based contrast ops: global equalization and CLAHE.

Four CLAHE conventions exist (SURVEY.md section 4 item 1; the
reference's dependency set pins two different libraries whose CLAHE
algorithms differ numerically):

* ``convention="opencv"`` — OpenCV uint8 CLAHE semantics:
  integer uint8 histograms, ``clip_limit`` is a multiple of the uniform
  bin level (default 2.0 .. 40.0), OpenCV's exact clip-redistribution and
  rounding. This path is validated BIT-EXACTLY against ``cv2.createCLAHE``
  in tests/test_clahe.py.
* ``convention="skimage"`` — true ``skimage.exposure.equalize_adapthist``
  (0.26) semantics: 14-bit internal gray, both-sides reflect padding,
  half-kernel-offset histogram regions, ITERATIVE integer
  clip-redistribution, truncating integer maps, and min-max stretches on
  the way in and out. Golden:
  tests/goldens/golden_ops.py::equalize_adapthist_skimage (a faithful
  transcription — skimage is not installable in this environment).
* ``convention="fraction"`` — a SELF-DEFINED hybrid kept for speed and
  backward compatibility (it shares the Pallas apply kernel with the
  opencv path): ``clip_limit`` is a fraction of tile pixels (default
  0.01), float CDF LUTs, single-pass uniform redistribution, OpenCV
  tiling/weights. It does NOT claim skimage lineage — use "skimage" for
  parity with ``equalize_adapthist``. Contract:
  tests/goldens/golden_ops.py::clahe_fraction.
* ``convention="kornia"`` — ``kornia.enhance.equalize_clahe`` (0.8.2)
  float-native semantics (the reference pyproject's pinned dep): even-
  ceil reflect-padded tiles, ``torch.histc`` binning, float clip at
  ``clip_limit * P // 256``, floor()ed 255/P CDF LUTs, half-tile
  interpolation grid with ``linspace(0, 1)`` blend weights, float
  output with NO uint8 quantization. Contract:
  tests/goldens/golden_ops.py::equalize_clahe_kornia (a transcription
  — kornia is not installable here; tools/verify_kornia_golden.py pins
  it against the real library when available).

The pure-jnp implementation below is the correctness reference; the
Pallas kernel in ``mies_tpu.kernels.clahe`` is the performance path for
the opencv/fraction conventions and must match it exactly.
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
    """Histogram of int32 indices via nibble OUTER PRODUCT (exact f32).

    TPUs have no fast scatter; the gatherless form is 20-50x faster
    (measured, SURVEY.md section 7 hard part #2). For 256 bins the
    nibble decomposition — hist[hi*16+lo] = sum_p onehot4(v>>4)[hi] *
    onehot4(v&15)[lo], one [16, n] x [n, 16] matmul — needs 32
    compares/pixel instead of 256 (same trick as the CLAHE tile
    histogram kernel). Out-of-range indices (< 0) are counted nowhere,
    which the padding below exploits (-1 >> 4 == -1 matches no bin).
    """
    n = idx_flat.shape[0]
    pad = (-n) % 512
    if pad:
        idx_flat = jnp.concatenate(
            [idx_flat, jnp.full((pad,), -1, jnp.int32)]
        )
    if nbins == 256:
        i16 = jnp.arange(16, dtype=jnp.int32)
        # negative padding indices: x >> 4 < 0 matches no hi bin, so the
        # outer product counts them nowhere (x & 15 alone would alias)
        ohh = (idx_flat >> 4)[:, None] == i16
        ohl = (idx_flat & 15)[:, None] == i16
        h2 = jnp.einsum(
            "ph,pl->hl",
            ohh.astype(jnp.bfloat16),
            ohl.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return h2.reshape(nbins)
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
    return _equalize_from_hist(img, lo, span, hist, nbins)


def _equalize_from_hist(
    img: Array, lo: Array, span: Array, hist: Array, nbins: int
) -> Array:
    """CDF + interpolation half of ``equalize_hist``, split out so the
    z-sharded volume path (parallel/volume_shard.py) can feed a
    psum-combined global histogram through the IDENTICAL arithmetic
    (integer counts sum exactly in f32, so sharded == unsharded bit
    for bit)."""
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


def _lut_select(idx: Array, table: Array) -> Array:
    """Gatherless table[idx] for a [*, ...] int32 index array and a
    [nbins] float32 table: onehot selection via HIGHEST-precision matmul
    (exact — 0/1 rows select single f32 entries)."""
    nbins = table.shape[0]
    n = idx.size
    flat = idx.ravel()
    pad = (-n) % 512
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    chunks = flat.reshape(-1, 512)
    bins = jnp.arange(nbins, dtype=jnp.int32)
    oh = (chunks[:, :, None] == bins).astype(jnp.float32)
    sel = jnp.einsum(
        "cpb,b->cp", oh, table, precision=jax.lax.Precision.HIGHEST
    )
    return sel.reshape(-1)[:n].reshape(idx.shape)


def equalize(img: Array) -> Array:
    """kornia.enhance.equalize / PIL ImageOps.equalize: INTEGER-LUT
    global histogram equalization (reference pyproject.toml:8 — kornia;
    distinct from the float-CDF ``equalize_hist``):

        step   = (sum(hist) - last_nonzero_bin) // 255
        lut[i] = clamp((step//2 + sum(hist[:i])) // step, 0, 255)

    with the identity mapping when ``step == 0``. All arithmetic is
    exact int32; output is lut levels / 255. Golden:
    tests/goldens/golden_ops.py::equalize_pil (cross-checked bit-exactly
    vs the real PIL.ImageOps.equalize in tests).
    """
    u8 = jnp.clip(jnp.rint(img.astype(jnp.float32) * 255.0), 0, 255).astype(
        jnp.int32
    )
    hist = _global_hist_onehot(u8.ravel(), NBINS).astype(jnp.int32)
    bins = jnp.arange(NBINS, dtype=jnp.int32)
    total = jnp.sum(hist)
    last_idx = jnp.max(jnp.where(hist > 0, bins, -1))
    last = jnp.sum(jnp.where(bins == last_idx, hist, 0))
    step = (total - last) // 255
    prev = jnp.cumsum(hist) - hist  # sum of bins strictly below i
    lut = jnp.clip((prev + step // 2) // jnp.maximum(step, 1), 0, 255)
    lut = jnp.where(step > 0, lut, bins)  # PIL identity when step == 0
    out = _lut_select(u8, lut.astype(jnp.float32))
    return (out / 255.0).astype(
        img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    )


def _nibble_hist_batched(idx: Array) -> Array:
    """Per-image 256-bin histograms of [B, P] int32 indices via the
    nibble outer product (32 compares/pixel; exact f32 counts).
    Out-of-range indices (< 0) are counted nowhere."""
    i16 = jnp.arange(16, dtype=jnp.int32)
    ohh = (idx >> 4)[..., None] == i16  # [B, P, 16]
    ohl = (idx & 15)[..., None] == i16
    h2 = jnp.einsum(
        "bph,bpl->bhl",
        ohh.astype(jnp.bfloat16),
        ohl.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return h2.reshape(idx.shape[0], NBINS)


def _nibble_select_batched(idx: Array, tables: Array) -> Array:
    """Gatherless per-image table lookup via the nibble decomposition.

    idx [B, P] int32 in [0, 256); tables [B, 256, K] f32 -> [B, P, K].
    out[p, k] = sum_hi ohh[p, hi] * (sum_lo ohl[p, lo] * T[hi, lo, k])
    — 32 compares/pixel plus one [P, 16] x [16, 16K] matmul per image
    instead of the 256-compare full onehot. Exactly one term is nonzero
    at each level, so HIGHEST precision reproduces every f32 table
    entry bit-for-bit (pure selection, no partial-sum mixing).
    """
    b, p = idx.shape
    k = tables.shape[-1]
    i16 = jnp.arange(16, dtype=jnp.int32)
    ohh = ((idx >> 4)[..., None] == i16).astype(jnp.float32)  # [B, P, 16]
    ohl = ((idx & 15)[..., None] == i16).astype(jnp.float32)
    t2 = tables.reshape(b, 16, 16, k)
    inner = jnp.einsum(
        "bpl,bhlk->bphk", ohl, t2, precision=jax.lax.Precision.HIGHEST
    )  # inner[p, hi, k] = T[hi, lo_p, k]
    # the h-contraction also carries f32 table values — HIGHEST here too
    # (default precision could demote to bf16 on TPU; CLAUDE.md rule)
    return jnp.einsum(
        "bph,bphk->bpk", ohh, inner, precision=jax.lax.Precision.HIGHEST
    )


def equalize_hist_batched(batch: Array, nbins: int = NBINS) -> Array:
    """Natively-batched equalize_hist: [B, H, W] -> [B, H, W].

    Bit-identical arithmetic to ``equalize_hist`` per image (same
    histogram, same CDF, same interpolation expression), with the
    256-compare onehot CDF lookup replaced by the nibble selection
    (32 compares + a [P,16]x[16,32] matmul per image) — the form the
    pipeline compiler routes ``equalize_hist`` stages through
    (BASELINE workload 1; VERDICT r2 weak #1).
    """
    if nbins != NBINS:
        return jax.vmap(functools.partial(equalize_hist, nbins=nbins))(batch)
    x = batch.astype(jnp.float32)
    b = x.shape[0]
    flat = x.reshape(b, -1)
    lo = jnp.min(flat, axis=1, keepdims=True)
    hi = jnp.max(flat, axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip(
        ((flat - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1
    )
    hist = _nibble_hist_batched(idx)
    cdf = jnp.cumsum(hist, axis=1)
    cdf = cdf / cdf[:, -1:]

    width = span / nbins
    c0 = lo + 0.5 * width
    xi = (flat - c0) / width
    i = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, nbins - 2)
    frac = jnp.clip(xi - i.astype(jnp.float32), 0.0, 1.0)

    table = jnp.stack(
        [cdf, jnp.concatenate([cdf[:, 1:], cdf[:, -1:]], axis=1)], axis=2
    )  # [B, 256, 2]: (cdf[i], cdf[i+1])
    sel = _nibble_select_batched(i, table)
    c_lo = sel[..., 0]
    c_hi = sel[..., 1]
    return (c_lo + frac * (c_hi - c_lo)).reshape(batch.shape)


def equalize_batched(batch: Array) -> Array:
    """Natively-batched kornia/PIL ``equalize``: [B, H, W] -> [B, H, W].

    Same exact int32 LUT arithmetic as ``equalize`` per image; the LUT
    application uses the nibble selection instead of the full-onehot
    ``_lut_select``.
    """
    img_dtype = (
        batch.dtype
        if jnp.issubdtype(batch.dtype, jnp.floating)
        else jnp.float32
    )
    b = batch.shape[0]
    u8 = jnp.clip(
        jnp.rint(batch.astype(jnp.float32) * 255.0), 0, 255
    ).astype(jnp.int32)
    flat = u8.reshape(b, -1)
    hist = _nibble_hist_batched(flat).astype(jnp.int32)
    bins = jnp.arange(NBINS, dtype=jnp.int32)
    total = jnp.sum(hist, axis=1, keepdims=True)
    last_idx = jnp.max(
        jnp.where(hist > 0, bins[None, :], -1), axis=1, keepdims=True
    )
    last = jnp.sum(
        jnp.where(bins[None, :] == last_idx, hist, 0), axis=1, keepdims=True
    )
    step = (total - last) // 255
    prev = jnp.cumsum(hist, axis=1) - hist
    lut = jnp.clip((prev + step // 2) // jnp.maximum(step, 1), 0, 255)
    lut = jnp.where(step > 0, lut, bins[None, :])
    out = _nibble_select_batched(flat, lut.astype(jnp.float32)[..., None])
    return (out[..., 0] / 255.0).reshape(batch.shape).astype(img_dtype)


def reference_cdf(ref: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """Host-side half of histogram matching: the reference image's
    (unique values, cumulative quantiles) — skimage
    ``_match_cumulative_cdf``'s template side, computed once at chain
    build time and baked into the program as constants."""
    values, counts = np.unique(np.asarray(ref).ravel(), return_counts=True)
    quantiles = np.cumsum(counts) / ref.size
    return values.astype(np.float32), quantiles.astype(np.float32)


def match_histograms(img: Array, ref_values, ref_quantiles) -> Array:
    """skimage.exposure.match_histograms semantics on float [0,1] input
    quantized to 256 levels (the framework's uint8 contract; u8-sourced
    images match the library exactly — tests/goldens).

    Per-pixel quantile = inclusive CDF of the pixel's level over THIS
    image; output = the reference value at that quantile
    (``np.interp(q, ref_quantiles, ref_values)``). Everything is
    gatherless: nibble histogram, a 256-entry on-device LUT through
    ``jnp.interp`` (tiny), nibble selection to apply it. The classic
    cross-scanner intensity harmonization op
    (reference pyproject.toml:12 — skimage exposure surface).
    """
    u8 = jnp.clip(jnp.rint(img.astype(jnp.float32) * 255.0), 0, 255).astype(
        jnp.int32
    )
    flat = u8.ravel()[None, :]  # [1, P] for the batched helpers
    hist = _nibble_hist_batched(flat)[0]
    q = jnp.cumsum(hist) / jnp.float32(u8.size)  # inclusive CDF per level
    lut = jnp.interp(
        q, jnp.asarray(ref_quantiles), jnp.asarray(ref_values)
    ).astype(jnp.float32)
    out = _nibble_select_batched(flat, lut[None, :, None])
    return out[0, :, 0].reshape(img.shape)


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
    """Per-tile 256-bin histograms, shape [gy*gx, 256] (float32 counts).

    On TPU the scatter form lowers to sort-based scatter (the 74 ms
    disaster of round 1) — this jnp path serves Pallas-unsupported
    shapes on TPU too, so it switches to the gatherless onehot
    histogram there; CPU keeps the (faster there) scatter-add."""
    gy, gx = grid
    h, w = u8.shape
    th, tw = h // gy, w // gx
    tiles = u8.reshape(gy, th, gx, tw).transpose(0, 2, 1, 3).reshape(gy * gx, th * tw)

    if jax.default_backend() == "tpu":
        return _region_hists_onehot(tiles, NBINS).astype(jnp.float32)

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


def _bilinear_lut_apply_selection(
    u8: Array,
    luts: Array,
    grid: tuple[int, int],
    tile_shape: tuple[int, int] | None = None,
    y_offset=0,
    integer_luts: bool = False,
) -> Array:
    """Gatherless twin of _bilinear_lut_apply (selection-by-matmul).

    Same signature, same OpenCV weight arithmetic and blend order, but
    the 4-corner LUT lookup runs through _select_blocks on the
    half-tile-shifted CELLS decomposition instead of advanced-indexing
    gathers — on TPU the gather form measured 910 ms for a 4096² band
    program (XLA lowers it to gather loops); this form rides the MXU.
    Requires H % th == 0, W % tw == 0, and y_offset % th == 0 (the
    tile-aligned band contract of parallel.clahe_shard; y_offset may be
    traced — the corner slices are dynamic).
    """
    gy, gx = grid
    h, w = u8.shape
    th, tw = tile_shape if tile_shape is not None else (h // gy, w // gx)
    py, px = th // 2, tw // 2
    ny1, nx1 = h // th + 1, w // tw + 1
    p_px = th * tw
    nb = ny1 * nx1
    m_row = y_offset // th

    up = jnp.pad(u8, ((py, th - py), (px, tw - px)), mode="edge")

    def to_blocks(x):
        return (
            x.reshape(ny1, th, nx1, tw).transpose(0, 2, 1, 3).reshape(nb, p_px)
        )

    blocks = to_blocks(up)
    # edge-padded LUT grid folds OpenCV's index clamping into slicing:
    # cell row i's ty1 = max(m+i-1, 0) = lp[m+i], ty2 = min(m+i, gy-1)
    # = lp[m+i+1]; same for x. Corner order matches v11,v12,v21,v22.
    lp = jnp.pad(luts, ((1, 1), (1, 1), (0, 0)), mode="edge")
    corners = [
        jax.lax.dynamic_slice(
            lp, (m_row + ey, ex, 0), (ny1, nx1, NBINS)
        )
        for ey in range(2)
        for ex in range(2)
    ]
    m4 = jnp.stack(corners, axis=2).reshape(nb, 4, NBINS)

    # the EXACT frac arithmetic of _bilinear_lut_apply, relocated into
    # cell blocks (arange values equal the original integer coords)
    inv_th = np.float32(1.0) / np.float32(th)
    inv_tw = np.float32(1.0) / np.float32(tw)
    ygp = jnp.arange(-py, h + th - py, dtype=jnp.float32) + jnp.float32(
        y_offset
    )
    yfp = ygp * inv_th - np.float32(0.5)
    yap = yfp - jnp.floor(yfp)
    xfp = jnp.arange(-px, w + tw - px, dtype=jnp.float32) * inv_tw - np.float32(0.5)
    xap = xfp - jnp.floor(xfp)
    shape_p = (h + th, w + tw)
    yab = to_blocks(jnp.broadcast_to(yap[:, None], shape_p))
    xab = to_blocks(jnp.broadcast_to(xap[None, :], shape_p))

    if jax.default_backend() == "tpu":
        from mies_tpu.kernels.clahe import blocks4_fracs_apply, blocks8_supported

        if blocks8_supported(p_px):
            res = blocks4_fracs_apply(blocks, m4, yab, xab, integer_luts)
            resp = (
                res.reshape(ny1, nx1, th, tw)
                .transpose(0, 2, 1, 3)
                .reshape(*shape_p)
            )
            return resp[py : py + h, px : px + w]

    # fraction-convention LUTs are non-integer: they need HIGHEST, not
    # the bf16x3 integer fast path (same omission the 3-D caller fixed)
    sels = _select_blocks(
        blocks, m4, NBINS, integer_maps=integer_luts
    )  # [NB, P, 4]
    top = sels[:, :, 0] * (1.0 - xab) + sels[:, :, 1] * xab
    bot = sels[:, :, 2] * (1.0 - xab) + sels[:, :, 3] * xab
    res = top * (1.0 - yab) + bot * yab
    resp = (
        res.reshape(ny1, nx1, th, tw).transpose(0, 2, 1, 3).reshape(*shape_p)
    )
    return resp[py : py + h, px : px + w]


# ---------------------------------------------------------------------------
# skimage equalize_adapthist convention
# ---------------------------------------------------------------------------

NR_OF_GRAY = 2**14  # skimage's internal 14-bit gray resolution


def _region_hists_onehot(idx: Array, nbins: int) -> Array:
    """[R, P] int32 bin indices -> [R, nbins] int32 counts, gatherless.

    Same compare-against-iota trick as _global_hist_onehot, batched over
    regions (TPU has no fast scatter; SURVEY.md section 7 hard part 2).
    """
    r, p = idx.shape
    pad = (-p) % 512
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.full((r, pad), -1, jnp.int32)], axis=1
        )
    chunks = idx.reshape(r, -1, 512)
    bins = jnp.arange(nbins, dtype=jnp.int32)
    oh = chunks[:, :, :, None] == bins
    return jnp.sum(oh, axis=(1, 2), dtype=jnp.int32)


def _clip_histogram_skimage(hist: Array, clim: int, nbins: int) -> Array:
    """skimage clip_histogram on a batch of integer histograms [R, nbins].

    Phases 1-2 (clip + uniform spread + top-up of near-limit bins) are
    vectorized; phase 3 — the iterative strided redistribution sweep —
    is a per-region lax.while_loop (vmapped), one loop step per sweep
    index, exactly mirroring the golden's sequential semantics.
    """
    hist = hist.astype(jnp.int32)
    clim_i = jnp.int32(clim)

    excess_mask = hist > clim_i
    n_excess = jnp.sum(jnp.where(excess_mask, hist - clim_i, 0), axis=1)
    hist = jnp.minimum(hist, clim_i)

    bin_incr = n_excess // nbins  # [R]
    upper = (clim_i - bin_incr)[:, None]
    low_mask = hist < upper
    n_excess = n_excess - jnp.sum(low_mask, axis=1) * bin_incr
    hist = hist + jnp.where(low_mask, bin_incr[:, None], 0)

    # NB: evaluated on the UPDATED hist, like skimage — just-incremented
    # low bins that crossed `upper` are topped up to the limit too
    mid_mask = (hist >= upper) & (hist < clim_i)
    n_excess = n_excess - jnp.sum(jnp.where(mid_mask, clim_i - hist, 0), axis=1)
    hist = jnp.where(mid_mask, clim_i, hist)

    pos = jnp.arange(nbins, dtype=jnp.int32)

    def sweep(h, ne):
        def cond(s):
            _, n, _, _, stalled = s
            return (n > 0) & jnp.logical_not(stalled)

        def body(s):
            h, n, sweep_start, index, _ = s
            under = h < clim_i
            n_under = jnp.sum(under.astype(jnp.int32))
            step = jnp.maximum(n_under // jnp.maximum(n, 1), 1)
            sel = under & (pos >= index) & (jnp.mod(pos - index, step) == 0)
            h = h + sel.astype(jnp.int32)
            n = n - jnp.sum(sel.astype(jnp.int32))
            index = index + 1
            wrapped = index == nbins
            stalled = wrapped & (n == sweep_start)
            sweep_start = jnp.where(wrapped, n, sweep_start)
            index = jnp.where(wrapped, 0, index)
            return (h, n, sweep_start, index, stalled)

        out, *_ = jax.lax.while_loop(
            cond, body, (h, ne, ne, jnp.int32(0), jnp.bool_(False))
        )
        return out

    return jax.vmap(sweep)(hist, n_excess)


def _select_blocks(
    blocks: Array, maps: Array, nbins: int, integer_maps: bool = True
) -> Array:
    """Gatherless batched LUT selection: blocks [NB, P] int32 bin
    indices x maps [NB, E, nbins] f32 -> sels [NB, P, E].

    The lookup is a selection-by-matmul (onehot @ maps, exact under
    HIGHEST precision for integer-valued maps) scanned in block chunks
    to bound the onehot working set. Shared by the skimage paths and
    the 3-D OpenCV/fraction trilinear apply. ``integer_maps=False``
    (fraction-convention LUTs) forces HIGHEST precision — the bf16x3
    exactness argument below only holds for integer-valued maps.
    """
    nb, p = blocks.shape
    e_corners = maps.shape[1]
    prec = (
        jax.lax.Precision.HIGH if integer_maps else jax.lax.Precision.HIGHEST
    )
    # chunk so the materialized onehot stays ~4 MB
    ch = max(1, min(nb, (1 << 20) // max(p, 1)))
    pad = (-nb) % ch
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, p), blocks.dtype)], axis=0
        )
        maps = jnp.concatenate(
            [maps, jnp.zeros((pad, e_corners, nbins), maps.dtype)], axis=0
        )

    def step(_, inp):
        blk, m = inp  # [ch, P], [ch, E, nbins]
        oh = (blk[:, :, None] == jnp.arange(nbins, dtype=jnp.int32)).astype(
            jnp.float32
        )
        # For INTEGER-valued maps, HIGH (bf16x3) is EXACT and 2x
        # cheaper than HIGHEST (bf16x6): exactly one onehot term per
        # row is nonzero, and the 3-term bf16 split carries >= 24
        # mantissa bits — every integer map value <= 2^24 is reproduced
        # bit-for-bit. For non-integer maps (fraction-convention LUTs)
        # partial-sum ordering matters, so those callers pass
        # integer_maps=False and get HIGHEST.
        sel = jnp.einsum("bpc,bec->bpe", oh, m, precision=prec)
        return None, sel

    _, sels = jax.lax.scan(
        step,
        None,
        (blocks.reshape(-1, ch, p), maps.reshape(-1, ch, e_corners, nbins)),
    )
    return sels.reshape(-1, p, e_corners)[:nb]  # [NB, P, E]


def _apply_maps_selection_blocks(
    blocks: Array, maps: Array, coeffs: list[Array], nbins: int
) -> Array:
    """Multilinear interpolation core shared by the 2-D and 3-D skimage
    paths: blocks [NB, P] int32 bin indices, maps [NB, E, nbins] f32
    integer-valued region maps (E = 2^ndim corners), coeffs: E arrays of
    [P] f32 weights. Per-term f32 accumulation and a truncating floor,
    like the goldens.
    """
    nb, p = blocks.shape
    e_corners = maps.shape[1]
    sels = _select_blocks(blocks, maps, nbins)
    acc = jnp.zeros((nb, p), jnp.float32)
    for e in range(e_corners):
        acc = acc + sels[:, :, e] * coeffs[e][None, :]
    return jnp.floor(acc)  # float32 -> uint16 cast truncates (values >= 0)


def _apply_maps_selection(
    binned: Array, map_array: Array, kr: int, kc: int, nbins: int
) -> Array:
    """Bilinear interpolation between the 4 neighboring region maps.

    binned:    [H, W] int32 (H, W multiples of kr, kc — the padded image)
    map_array: [nbr+1, nbc+1, nbins] float32 integer-valued maps,
               edge-replicated (skimage's np.pad(..., mode='edge')).
    Weights are skimage's arange(k)/k block offsets.
    """
    h, w = binned.shape
    nbr, nbc = h // kr, w // kc
    p = kr * kc
    nb = nbr * nbc
    blocks = (
        binned.reshape(nbr, kr, nbc, kc).transpose(0, 2, 1, 3).reshape(nb, p)
    )
    m4 = jnp.stack(
        [
            map_array[0:nbr, 0:nbc],
            map_array[0:nbr, 1 : nbc + 1],
            map_array[1 : nbr + 1, 0:nbc],
            map_array[1 : nbr + 1, 1 : nbc + 1],
        ],
        axis=2,
    ).reshape(nb, 4, nbins)

    wy = jnp.arange(kr, dtype=jnp.float32) / kr
    wx = jnp.arange(kc, dtype=jnp.float32) / kc
    coeffs = [
        ((1.0 - wy)[:, None] * (1.0 - wx)[None, :]).reshape(p),
        ((1.0 - wy)[:, None] * wx[None, :]).reshape(p),
        (wy[:, None] * (1.0 - wx)[None, :]).reshape(p),
        (wy[:, None] * wx[None, :]).reshape(p),
    ]
    result = _apply_maps_selection_blocks(blocks, m4, coeffs, nbins)
    return (
        result.reshape(nbr, nbc, kr, kc).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _skimage_scale_in(img: Array) -> Array:
    """img_as_uint + rescale_intensity to 14-bit gray (int32), shared by
    the 2-D and 3-D skimage paths. f32 where skimage uses f64 — isolated
    rint ties can flip one 14-bit level (test outlier contract)."""
    x = img.astype(jnp.float32)
    u16 = jnp.clip(jnp.rint(x * 65535.0), 0, 65535)
    vmin = jnp.min(u16)
    vmax = jnp.max(u16)
    span = vmax - vmin
    scaled = jnp.where(
        span > 0,
        (u16 - vmin) / jnp.maximum(span, 1.0) * (NR_OF_GRAY - 1),
        jnp.clip(u16, 0, NR_OF_GRAY - 1),
    )
    return jnp.rint(scaled).astype(jnp.int32)


def _skimage_maps(hists: Array, k_elems: int) -> Array:
    """map_histogram: scaled CDF, clipped, TRUNCATED to int (f32)."""
    maps = jnp.cumsum(hists.astype(jnp.float32), axis=1) * jnp.float32(
        (NR_OF_GRAY - 1) / k_elems
    )
    return jnp.floor(jnp.minimum(maps, NR_OF_GRAY - 1))


def _skimage_stretch_out(result: Array) -> Array:
    """img_as_float + final rescale_intensity (the /65535 cancels)."""
    rmin = jnp.min(result)
    rmax = jnp.max(result)
    out = jnp.where(
        rmax > rmin,
        (result - rmin) / jnp.maximum(rmax - rmin, 1.0),
        jnp.clip(result / 65535.0, 0.0, 1.0),
    )
    return out.astype(jnp.float32)


def _clahe_skimage(
    img: Array, kernel_size: tuple[int, int], clip_limit: float, nbins: int
) -> Array:
    """True skimage.exposure.equalize_adapthist semantics on float [0,1].

    Mirrors tests/goldens/golden_ops.py::equalize_adapthist_skimage
    step-for-step (see its docstring for the algorithm); computations run
    in f32 instead of skimage's f64, which can flip isolated rint/trunc
    ties — bounded by the test tolerance (1 uint8 ULP).
    """
    image = _skimage_scale_in(img)

    kr, kc = kernel_size
    h0, w0 = image.shape
    pr0, pc0 = kr // 2, kc // 2
    pr1 = (kr - h0 % kr) % kr + -(-kr // 2)
    pc1 = (kc - w0 % kc) % kc + -(-kc // 2)
    image = jnp.pad(image, ((pr0, pr1), (pc0, pc1)), mode="reflect")
    h, w = image.shape

    bin_size = 1 + NR_OF_GRAY // nbins
    binned = image // bin_size

    nr, nc = h // kr - 1, w // kc - 1
    k_elems = kr * kc
    clim = int(np.clip(clip_limit * k_elems, 1, None))
    regions = binned[pr0 : pr0 + nr * kr, pc0 : pc0 + nc * kc]
    regions = (
        regions.reshape(nr, kr, nc, kc).transpose(0, 2, 1, 3).reshape(nr * nc, k_elems)
    )
    hists = _region_hists_onehot(regions, nbins)
    hists = _clip_histogram_skimage(hists, clim, nbins)

    maps = _skimage_maps(hists, k_elems).reshape(nr, nc, nbins)
    map_array = jnp.pad(maps, ((1, 1), (1, 1), (0, 0)), mode="edge")

    result = _apply_maps_selection(binned, map_array, kr, kc, nbins)
    result = result[pr0 : h - pr1, pc0 : w - pc1]
    return _skimage_stretch_out(result)


# ---------------------------------------------------------------------------
# kornia equalize_clahe convention
# ---------------------------------------------------------------------------


def _kornia_tile_geometry(
    shape: tuple[int, int], grid: tuple[int, int]
) -> tuple[int, int, int, int]:
    """kornia _compute_tiles(even_tile_size=True): tile = ceil(side /
    grid) rounded UP to even; reflect pad must stay < dim."""
    h, w = shape
    gh, gw = grid
    th = -(-h // gh)
    th += th % 2
    tw = -(-w // gw)
    tw += tw % 2
    pv, pw = th * gh - h, tw * gw - w
    if pv >= h or pw >= w:
        raise ValueError(
            f"image size {shape} and grid size {grid} mismatch for the "
            f"kornia convention (reflect padding needs pad < dim)"
        )
    return th, tw, pv, pw


def _clahe_kornia(
    img: Array, clip_limit: float, grid_size: tuple[int, int]
) -> Array:
    """kornia.enhance.equalize_clahe (0.8.2) float-native semantics.

    Mirrors tests/goldens/golden_ops.py::equalize_clahe_kornia step for
    step (see its docstring for the transcribed algorithm; kornia is
    the reference pyproject's pinned dep — /root/reference/
    pyproject.toml:8). TPU runs the gatherless selection-by-matmul LUT
    lookup (_select_blocks — integer-valued LUTs are exact under the
    bf16x3 path); CPU keeps advanced-indexing gathers. Border interp
    tiles fold into ONE bilinear formula by clamping the neighbor-LUT
    indices AND zeroing the border-axis weight: ``t*(1-0) + b*0 == t``
    bit-exactly in f32, so corner/edge tiles reproduce kornia's
    direct-assignment branches without separate code paths.
    """
    x = img.astype(jnp.float32)
    h0, w0 = x.shape
    gh, gw = grid_size
    th, tw, pv, pw = _kornia_tile_geometry((h0, w0), (gh, gw))
    p = jnp.pad(x, ((0, pv), (0, pw)), mode="reflect") if (pv or pw) else x
    p_px = th * tw

    # per-tile torch.histc(_, 256, 0, 1): floor(x*256), x == 1 in bin 255
    idx256 = jnp.minimum(jnp.floor(p * 256.0), 255.0).astype(jnp.int32)
    tiles = (
        idx256.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3)
        .reshape(gh * gw, p_px)
    )
    if jax.default_backend() == "tpu":
        hist = _region_hists_onehot(tiles, NBINS).astype(jnp.float32)
    else:
        hist = jax.vmap(
            lambda t: jnp.zeros((NBINS,), jnp.float32).at[t].add(1.0)
        )(tiles)
    if clip_limit > 0:
        # float clip at max(clip * P // 256, 1); even redistribution
        # with the first (excess % 256) bins topped up by one
        max_val = jnp.float32(max(clip_limit * p_px // NBINS, 1.0))
        hist = jnp.minimum(hist, max_val)
        clipped = jnp.float32(p_px) - jnp.sum(hist, axis=1, keepdims=True)
        residual = jnp.mod(clipped, NBINS)
        hist = hist + (clipped - residual) / NBINS
        hist = hist + (
            jnp.arange(NBINS, dtype=jnp.float32)[None, :] < residual
        ).astype(jnp.float32)
    lut = jnp.cumsum(hist, axis=1) * jnp.float32(255.0 / p_px)
    luts = jnp.floor(jnp.clip(lut, 0.0, 255.0)).reshape(gh, gw, NBINS)

    # half-tile interpolation grid; pixel bin = trunc(x * 255)
    th2, tw2 = th // 2, tw // 2
    nr, nc = 2 * gh, 2 * gw
    nb, blk_px = nr * nc, th2 * tw2
    idx255 = jnp.clip(jnp.floor(p * 255.0), 0.0, 255.0).astype(jnp.int32)
    blocks = (
        idx255.reshape(nr, th2, nc, tw2).transpose(0, 2, 1, 3)
        .reshape(nb, blk_px)
    )
    cy1 = np.clip((np.arange(nr) - 1) // 2, 0, gh - 1)
    cy2 = np.clip((np.arange(nr) + 1) // 2, 0, gh - 1)
    cx1 = np.clip((np.arange(nc) - 1) // 2, 0, gw - 1)
    cx2 = np.clip((np.arange(nc) + 1) // 2, 0, gw - 1)
    m4 = jnp.stack(
        [
            luts[cy1[:, None], cx1[None, :]],
            luts[cy1[:, None], cx2[None, :]],
            luts[cy2[:, None], cx1[None, :]],
            luts[cy2[:, None], cx2[None, :]],
        ],
        axis=2,
    ).reshape(nb, 4, NBINS)

    # linspace(0,1) weights; zeroed along a border tile's clamped axis
    wy = np.broadcast_to(
        np.linspace(0.0, 1.0, th2, dtype=np.float32)[None, :], (nr, th2)
    ).copy()
    wy[0] = 0.0
    wy[-1] = 0.0
    wx = np.broadcast_to(
        np.linspace(0.0, 1.0, tw2, dtype=np.float32)[None, :], (nc, tw2)
    ).copy()
    wx[0] = 0.0
    wx[-1] = 0.0
    wyb = jnp.asarray(
        np.broadcast_to(
            wy[:, None, :, None], (nr, nc, th2, tw2)
        ).reshape(nb, blk_px)
    )
    wxb = jnp.asarray(
        np.broadcast_to(
            wx[None, :, None, :], (nr, nc, th2, tw2)
        ).reshape(nb, blk_px)
    )

    if jax.default_backend() == "tpu":
        sels = _select_blocks(blocks, m4, NBINS)  # [NB, P, 4]
    else:
        sels = jax.vmap(lambda m, b: m[:, b])(m4, blocks).transpose(0, 2, 1)
    top = sels[:, :, 0] * (1.0 - wxb) + sels[:, :, 1] * wxb
    bot = sels[:, :, 2] * (1.0 - wxb) + sels[:, :, 3] * wxb
    res = top * (1.0 - wyb) + bot * wyb
    out = (
        res.reshape(nr, nc, th2, tw2).transpose(0, 2, 1, 3)
        .reshape(gh * th, gw * tw)
        / 255.0
    )
    return out[:h0, :w0]


@functools.partial(
    jax.jit,
    static_argnames=("grid_size", "clip_limit", "convention", "nbins", "kernel_size"),
)
def clahe(
    img: Array,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int] = (8, 8),
    convention: str = "opencv",
    nbins: int = NBINS,
    kernel_size: tuple[int, int] | None = None,
) -> Array:
    """Contrast-Limited Adaptive Histogram Equalization on float [0,1].

    convention="opencv": quantize to uint8 levels, run OpenCV's exact
    integer algorithm (clip = max(int(clip_limit * tile_area / 256), 1),
    integer redistribution, uint8 LUT via rint, bilinear blend, final
    rint) and return float levels / 255. Bit-exact vs cv2.createCLAHE.

    convention="skimage": true skimage.exposure.equalize_adapthist
    semantics (see _clahe_skimage). ``clip_limit`` is a FRACTION of
    kernel pixels (skimage default 0.01). ``kernel_size`` is skimage's
    region size; None derives it from ``grid_size`` as
    (max(H // gy, 1), max(W // gx, 1)) — the default grid (8, 8)
    reproduces skimage's default ``kernel_size = shape // 8``.

    convention="fraction": self-defined fast hybrid (module docstring) —
    clip = max(clip_limit * tile_area, 1) float counts, single-pass
    uniform redistribution, CDF LUT normalized to [0,1], OpenCV-style
    bilinear blend, float output.

    convention="kornia": kornia.enhance.equalize_clahe float-native
    semantics (see _clahe_kornia; kornia's own default clip_limit is
    40.0 — the same multiple-of-uniform parameterization as opencv).

    ``nbins``: skimage's equalize_adapthist exposes it (any value
    >= 2); the other conventions are 256-bin by definition (opencv and
    kornia hard-code 256 in cv2/kornia).
    """
    if img.ndim != 2:
        raise ValueError(f"clahe expects [H, W]; got shape {img.shape}")
    if nbins != NBINS and convention != "skimage":
        raise NotImplementedError(
            f"nbins={nbins}: only the skimage convention supports "
            f"nbins != 256 (cv2/kornia hard-code 256 bins)"
        )
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    gy, gx = grid_size
    h0, w0 = img.shape

    if convention == "skimage":
        if kernel_size is None:
            kernel_size = (max(h0 // gy, 1), max(w0 // gx, 1))
        return _clahe_skimage(img, kernel_size, clip_limit, nbins).astype(
            img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
        )
    if convention == "kornia":
        return _clahe_kornia(img, clip_limit, grid_size).astype(
            img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
        )

    u8 = jnp.clip(jnp.round(img.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.int32)
    u8, ph, pw = _pad_reflect101(u8, (gy, gx))
    h, w = u8.shape
    th, tw = h // gy, w // gx
    tile_area = th * tw

    hists = _tile_histograms(u8, (gy, gx))  # [T, 256]

    # gatherless apply on TPU (advanced-indexing gather lowers to ~100 ms
    # loops there; this path serves Pallas-unsupported shapes on TPU too)
    if jax.default_backend() == "tpu":
        apply = functools.partial(
            _bilinear_lut_apply_selection,
            integer_luts=(convention == "opencv"),
        )
    else:
        apply = _bilinear_lut_apply
    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_area / NBINS), 1))
        hists = _clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        lut_scale = jnp.float32(NBINS - 1) / tile_area
        # cvRound == round-half-to-even == rint
        luts = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255)  # uint8-valued f32
        luts = luts.reshape(gy, gx, NBINS)
        out = apply(u8, luts, (gy, gx))
        out = jnp.clip(jnp.rint(out), 0, 255)
        out = out[:h0, :w0] / 255.0
    elif convention == "fraction":
        clip_value = jnp.float32(max(clip_limit * tile_area, 1.0))
        hists = _clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = (cdf / tile_area).reshape(gy, gx, NBINS)
        out = apply(u8, luts, (gy, gx))
        out = jnp.clip(out[:h0, :w0], 0.0, 1.0)
    else:
        raise ValueError(f"unknown CLAHE convention: {convention!r}")
    return out.astype(img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32)

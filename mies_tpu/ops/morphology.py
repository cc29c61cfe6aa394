"""Grayscale morphology: erode / dilate and their composites.

Semantics mirror the reference's pinned dependency surface (SURVEY.md
section 2b D1 — kornia.morphology; no reference code exists, section 0):
cv2-compatible flat structuring elements and border handling, verified
against the locally available ``cv2`` in ``tests/test_filters.py``:

  * erode / dilate  -> cv2.erode / cv2.dilate with
    ``cv2.getStructuringElement(shape, (k, k))`` (rect / ellipse /
    cross rasterized identically, including cvRound's
    half-to-even rounding on the ellipse rows)
  * morph_open/close/gradient, top_hat, black_hat
                    -> cv2.morphologyEx MORPH_OPEN / CLOSE / GRADIENT /
                       TOPHAT / BLACKHAT
  * mode='ignore' (default) -> cv2's default morphology border: the
    outside of the image never wins the min/max (+inf pad for erode,
    -inf for dilate — cv2.morphologyDefaultBorderValue). Any
    ``filters._PAD_MODE`` name selects an explicit border instead
    (e.g. 'nearest' == cv2.BORDER_REPLICATE).

Clinical use: top-hat pulls small bright structures (vessels,
microcalcifications) off a slowly varying background; gradient outlines
bone/organ boundaries; open/close suppress speckle while preserving
morphology-scale anatomy.

TPU notes: a flat min/max stencil is the ideal VPU shape — static
shifted-window extrema with no data-dependent control flow, which XLA
fuses into a tree of elementwise mins/maxes (the same pattern as the
Batcher-network median, filters.py:173). Rect elements are separable
(rows pass then columns pass: 2k instead of k*k window reads); ellipse
and cross run over the masked window list.

All functions take float32 [H, W] in [0, 1] and return the same
(composites stay in [0, 1]; gradient/top-hat/black-hat are >= 0 and
<= 1 by construction for inputs in [0, 1]).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from mies_tpu.ops.filters import _pad2d

_SE_SHAPES = ("rect", "ellipse", "cross")
# cv2's default morphology border: a constant the reduction ignores
_IGNORE = "ignore"


@functools.lru_cache(maxsize=64)
def structuring_element(kernel_size: int, shape: str = "rect") -> tuple:
    """cv2.getStructuringElement for a square (k, k) element, as a
    tuple-of-tuples bool mask (hashable for the lru cache).

    The ellipse rasterization replicates cv2's algorithm exactly: per
    row at dy from center, half-width dx = cvRound(r*sqrt(1-(dy/r)^2))
    with cvRound's round-half-to-even (np.rint matches).
    """
    k = int(kernel_size)
    if k < 1 or k % 2 != 1:
        raise ValueError("kernel_size must be an odd int >= 1")
    if shape not in _SE_SHAPES:
        raise ValueError(f"shape must be one of {_SE_SHAPES}")
    r = k // 2
    se = np.zeros((k, k), dtype=bool)
    if shape == "rect" or k == 1:
        se[:] = True
    elif shape == "cross":
        se[r, :] = True
        se[:, r] = True
    else:  # ellipse
        inv_r2 = 1.0 / (r * r) if r else 0.0
        for i in range(k):
            dy = i - r
            if abs(dy) <= r:
                dx = int(np.rint(r * np.sqrt((r * r - dy * dy) * inv_r2)))
                se[i, max(r - dx, 0): min(r + dx + 1, k)] = True
    return tuple(map(tuple, se.tolist()))


def _sliding_red(p: Array, k: int, red, axis: int) -> Array:
    """red over every length-k window along ``axis`` of the padded
    array (output length = p.shape[axis] - k + 1, 'valid'). Flat chain
    for small k; doubling chain (idempotent reductions only) otherwise.
    """
    n_out = p.shape[axis] - k + 1

    def sl(a, start, length):
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(start, start + length)
        return a[tuple(idx)]

    if k <= 9:
        out = sl(p, 0, n_out)
        for d in range(1, k):
            out = red(out, sl(p, d, n_out))
        return out
    m = 1
    f = p
    while m * 2 <= k:
        f = red(sl(f, 0, f.shape[axis] - m), sl(f, m, f.shape[axis] - m))
        m *= 2
    if m == k:
        return sl(f, 0, n_out)
    return red(sl(f, 0, n_out), sl(f, k - m, n_out))


def _extremum(
    img: Array, kernel_size: int, shape: str, mode: str, maximum: bool
) -> Array:
    """min/max over the structuring element's shifted windows."""
    k = int(kernel_size)
    se = np.asarray(structuring_element(k, shape), dtype=bool)
    r = k // 2
    if r == 0:
        return img
    h, w = img.shape
    red = jnp.maximum if maximum else jnp.minimum
    if mode == _IGNORE:
        fill = np.float32(-np.inf if maximum else np.inf)
        p = jnp.pad(img, ((r, r), (r, r)), mode="constant",
                    constant_values=fill)
    else:
        p = _pad2d(img, r, r, mode)
    if shape == "rect":
        # separable: rows pass then columns pass. Small k uses the flat
        # 2k-read chain; large k (background top-hats, k = 15..31) uses
        # the van Herk-style DOUBLING chain — min/max are idempotent, so
        # f_m[i] = red(p[i..i+m-1]) builds in log2(k) steps and the
        # window of width k is red(f_M[i], f_M[i + k - M]) for the
        # largest power of two M <= k: ~2*log2(k) reads per axis,
        # bit-identical (same values, reassociation-insensitive).
        # 'valid' over the (h+2r, w+2r) pad is exactly (h, w) for odd k
        rows = _sliding_red(p, k, red, axis=1)
        return _sliding_red(rows, k, red, axis=0)
    if k > 9:
        # ellipse/cross rows are contiguous CENTERED spans, so the SE
        # decomposes into per-row 1-D sliding extrema: one doubling
        # chain per DISTINCT row width (<= k/2 + 1 of them), then k
        # vertical combines — k*log2(k)-ish reads instead of the ~k^2/2
        # masked-window loop. Bit-identical (same values reduced).
        widths = [int(se[dy].sum()) for dy in range(k)]
        by_width = {}
        for wd in set(widths):
            by_width[wd] = _sliding_red(p, wd, red, axis=1)
        out = None
        for dy in range(k):
            wd = widths[dy]
            d = wd // 2
            v = by_width[wd][dy: dy + h, r - d: r - d + w]
            out = v if out is None else red(out, v)
        return out
    out = None
    for dy in range(k):
        for dx in range(k):
            if not se[dy, dx]:
                continue
            v = lax.dynamic_slice(p, (dy, dx), (h, w))
            out = v if out is None else red(out, v)
    return out


def erode(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """Grayscale erosion (cv2.erode): min over the structuring element."""
    return _extremum(img, kernel_size, shape, mode, maximum=False)


def dilate(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """Grayscale dilation (cv2.dilate): max over the structuring element."""
    return _extremum(img, kernel_size, shape, mode, maximum=True)


def morph_open(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """Opening: dilate(erode(img)) — removes small bright specks."""
    return dilate(erode(img, kernel_size, shape, mode),
                  kernel_size, shape, mode)


def morph_close(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """Closing: erode(dilate(img)) — fills small dark gaps."""
    return erode(dilate(img, kernel_size, shape, mode),
                 kernel_size, shape, mode)


def morph_gradient(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """Morphological gradient: dilate - erode (edge outlines)."""
    return (dilate(img, kernel_size, shape, mode)
            - erode(img, kernel_size, shape, mode))


def top_hat(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """White top-hat: img - open(img) — small bright structures."""
    return img - morph_open(img, kernel_size, shape, mode)


def black_hat(
    img: Array, kernel_size: int = 3, shape: str = "rect",
    mode: str = _IGNORE,
) -> Array:
    """Black top-hat: close(img) - img — small dark structures."""
    return morph_close(img, kernel_size, shape, mode) - img


# ---------------------------------------------------------------------------
# Rolling-ball background (Sternberg 1983) — non-flat ball morphology
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _ball_table(radius: float, intensity: float) -> np.ndarray:
    """[k, k] float32 ellipsoid heights ``intensity * sqrt(1 -
    d^2/r^2)`` (skimage.restoration.ellipsoid_kernel; ``intensity ==
    radius`` is exactly the ball ``sqrt(r^2 - d^2)``) with ``-inf``
    OUTSIDE the support ``d^2 <= r^2`` — the single encoding that masks
    both passes: erosion reads ``img - s`` (-inf becomes +inf, never
    wins the min), dilation reads ``e + s`` (-inf never wins the
    max)."""
    R = int(np.ceil(radius))
    dy, dx = np.mgrid[-R:R + 1, -R:R + 1].astype(np.float64)
    d2 = (dy * dy + dx * dx) / (radius * radius)
    s = intensity * np.sqrt(np.maximum(1.0 - d2, 0.0))
    s[d2 > 1.0] = -np.inf
    return s.astype(np.float32)


def _rb_pass(rows_padded: Array, table: np.ndarray, maximum: bool) -> Array:
    """One non-flat erode/dilate pass. ``rows_padded`` is [h + 2R, W]
    with the ROW border already applied (+inf rows for the min pass,
    -inf for the max — morphology's 'ignore' convention: the outside
    never wins); columns pad here. Returns [h, W].

    fori_loop over the kernel's k rows; each body is k unrolled
    shifted adds + mins over one [h, W + 2R] row slab, which XLA fuses
    into a single VPU pass — O(k) HLO size for the k^2-tap non-flat
    stencil (an unrolled k^2 loop at radius 24 would emit ~2400 ops).
    min/max trees are reassociation-insensitive, so the band-sharded
    form (same function on halo-extended rows) is bit-exact.
    """
    k = table.shape[0]
    R = k // 2
    h = rows_padded.shape[0] - 2 * R
    w = rows_padded.shape[1]
    fill = np.float32(-np.inf if maximum else np.inf)
    p = jnp.pad(rows_padded, ((0, 0), (R, R)), mode="constant",
                constant_values=fill)
    tab = jnp.asarray(table)
    red = jnp.maximum if maximum else jnp.minimum

    def body(i, acc):
        slab = lax.dynamic_slice(p, (i, 0), (h, w + 2 * R))
        hrow = lax.dynamic_slice(tab, (i, 0), (1, k))[0]
        m = None
        for dx in range(k):
            v = (slab[:, dx:dx + w] + hrow[dx] if maximum
                 else slab[:, dx:dx + w] - hrow[dx])
            m = v if m is None else red(m, v)
        return red(acc, m)

    return lax.fori_loop(0, k, body, jnp.full((h, w), fill, jnp.float32))


def _imagej_shrink(radius: float) -> int:
    """ImageJ's RollingBall shrink schedule (BackgroundSubtracter's
    legacy-compatible ball construction): radius <= 10 runs exact,
    larger radii are computed on a 2/4/8x shrunken image. The
    background is smooth by construction so the shrink loses nothing
    visible; it is what ImageJ itself ALWAYS does at these radii."""
    if radius <= 10:
        return 1
    if radius <= 30:
        return 2
    if radius <= 100:
        return 4
    return 8


def _resolve_downscale(downscale, radius: float) -> int:
    if downscale == "auto":
        return _imagej_shrink(float(radius))
    if not (isinstance(downscale, int) and not isinstance(downscale, bool)
            and downscale >= 1 and downscale & (downscale - 1) == 0):
        raise ValueError(
            "downscale must be 'auto' or a power-of-two int >= 1, "
            f"got {downscale!r}"
        )
    return downscale


def rolling_ball(
    img: Array,
    radius: float = 25.0,
    intensity: float | None = None,
    downscale: int | str = 1,
) -> Array:
    """Background estimate by the rolling-ball algorithm (Sternberg,
    IEEE Computer 1983; skimage.restoration.rolling_ball's contract,
    ImageJ's "Subtract Background"): grayscale OPENING by the non-flat
    ball ``s(o) = sqrt(r^2 - |o|^2)`` — the surface a ball of radius
    ``r`` rolled under the intensity landscape can reach. Structures
    smaller than the ball (vessels, microcalcifications, bone edges)
    are excluded from the background; subtracting it flattens detector
    shading and anatomical background. Border: the outside never wins
    either reduction (+inf/-inf pads — the module's 'ignore'
    convention).

    The pure ball's HEIGHT scale equals its pixel radius — on [0, 1]
    images a radius-25 ball towers 25 intensity units over a 1.0-range
    landscape and pokes into every narrow structure. ``intensity``
    (skimage's ellipsoid_kernel generalization) sets the height
    independently; ``None`` keeps the exact skimage ball
    (``intensity == radius``).

    ``downscale`` (1, 2, 4, 8, ... or ``"auto"``) is ImageJ's
    large-radius strategy: the background is smooth BY CONSTRUCTION
    (nothing narrower than the ball survives), so it is computed on a
    ``pyr_down``-shrunken image with ``radius / downscale`` and
    ``pyr_up``-expanded back — O(k^2 / downscale^4) work. ``"auto"``
    applies ImageJ's own shrink schedule (``_imagej_shrink``: <=10 ->
    1, <=30 -> 2, <=100 -> 4, else 8). The default stays 1 here
    because THIS op's contract is skimage.restoration.rolling_ball,
    which is exact at every radius; ``subtract_background`` (the
    ImageJ-contract op) defaults to ``"auto"``. The heights
    (``intensity``) stay in the intensity domain, unscaled. Golden:
    tests/goldens/golden_ops.py::rolling_ball (same composition over
    cv2 pyramids)."""
    if not (isinstance(radius, (int, float)) and radius > 0):
        raise ValueError(f"radius must be a number > 0, got {radius!r}")
    if intensity is None:
        intensity = float(radius)
    if not (isinstance(intensity, (int, float)) and intensity > 0):
        raise ValueError(
            f"intensity must be a number > 0, got {intensity!r}"
        )
    downscale = _resolve_downscale(downscale, radius)
    x = img.astype(jnp.float32)
    if downscale > 1:
        from mies_tpu.ops.pyramid import pyr_down, pyr_up

        shapes = [x.shape]
        small = x
        for _ in range(downscale.bit_length() - 1):
            small = pyr_down(small)
            shapes.append(small.shape)
        bg = rolling_ball(small, radius / downscale, float(intensity))
        for target in reversed(shapes[:-1]):
            bg = pyr_up(bg, target)
        return bg
    table = _ball_table(float(radius), float(intensity))
    R = table.shape[0] // 2
    pe = jnp.pad(x, ((R, R), (0, 0)), mode="constant",
                 constant_values=np.float32(np.inf))
    e = _rb_pass(pe, table, maximum=False)
    pd = jnp.pad(e, ((R, R), (0, 0)), mode="constant",
                 constant_values=np.float32(-np.inf))
    return _rb_pass(pd, table, maximum=True)


def subtract_background(
    img: Array,
    radius: float = 25.0,
    intensity: float | None = None,
    light_background: bool = False,
    downscale: int | str = "auto",
) -> Array:
    """ImageJ-style background subtraction: ``clip(img -
    rolling_ball(img), 0, 1)`` for dark-background images; for
    ``light_background`` the image is inverted, flattened, and
    re-inverted (bright field / light-background radiographs).

    Default ``intensity = radius / 255`` — ImageJ's 8-bit equivalence
    (its legacy ball's heights are the radius in 0-255 COUNTS, i.e.
    radius/255 of the dynamic range), which keeps the ball shallow
    enough to roll under small bright structures on [0, 1] images.

    Default ``downscale="auto"`` — ImageJ's own shrink schedule
    (radius <= 10 exact, <= 30 on a half-size image, <= 100 quarter,
    else eighth; see ``_imagej_shrink``). ImageJ NEVER rolls the exact
    ball at these radii; matching its schedule is more faithful to the
    named contract than the exact opening, and turns the default
    radius-25 call from ~220 ms to ~15 ms per batch-32 512^2 on the
    chip. Pass an int (1 disables) to override."""
    if intensity is None:
        if not (isinstance(radius, (int, float)) and radius > 0):
            raise ValueError(
                f"radius must be a number > 0, got {radius!r}"
            )
        intensity = float(radius) / 255.0
    downscale = _resolve_downscale(downscale, radius)
    x = img.astype(jnp.float32)
    if light_background:
        inv = 1.0 - x
        return 1.0 - jnp.clip(
            inv - rolling_ball(inv, radius, intensity, downscale),
            0.0, 1.0,
        )
    return jnp.clip(
        x - rolling_ball(x, radius, intensity, downscale), 0.0, 1.0
    )

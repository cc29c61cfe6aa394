"""Canny edge detection — the skimage.feature surface (SURVEY.md
section 2b D6; kornia.filters.canny is the same declared role, D1).

Algorithm (skimage.feature.canny 0.26 semantics, reimplemented
TPU-first):
  1. Gaussian smooth (``sigma``, border ``mode``, cval 0) — the shared
     scipy-tap-order separable conv (ops.filters).
  2. scipy-convention Sobel gradients (ndi.sobel: [-1,0,1] derivative x
     [1,2,1] smoothing, 'reflect' border, unnormalized), magnitude =
     sqrt(gy^2 + gx^2).
  3. Non-maximum suppression with INTERPOLATED neighbors: skimage's
     four sector formulas are algebraically one bilinear sample of the
     magnitude at p +/- u, where u is the gradient L-inf-normalized so
     the step lands on the neighboring pixel ring (u = (sign(gy),
     gx/|gy|) when |gy| >= |gx|, transposed otherwise). A pixel
     survives if both interpolated neighbors are <= its magnitude
     (plateaus kept, as skimage). Expressed DENSELY as shifted-window
     blends — no per-sector boolean indexing, one fused VPU pass; on
     sector boundaries (|gy| == |gx| or a zero component) the blend
     degenerates to the same corner value in every adjacent sector, so
     the dense form is order-independent where skimage's sequential
     sector overwrites were not observable.
  4. Double threshold (absolute, or quantiles of the magnitude when
     ``use_quantiles``) and hysteresis: weak edges survive iff
     8-connected to a strong edge. skimage labels components
     host-side; here the strong mask is propagated through the weak
     mask by iterated 3x3 dilation inside ONE ``lax.while_loop``
     (fixpoint detection on the survivor count — a psum-free scalar),
     which is the XLA-native flood fill.

Border pixels are never maxima (skimage erodes its all-ones mask by
one pixel). Returns float32 {0, 1}; the chain quantize maps it to a
0/255 edge overlay. Golden: tests/goldens/golden_ops.py::canny_edges —
real scipy gaussian_filter/sobel/label with the NMS sectors transcribed
in their original octant form (an independent formulation of step 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from mies_tpu.ops.filters import _sep_conv2d, gaussian_blur


def _sobel_scipy(x: Array, axis: int) -> Array:
    """scipy.ndimage.sobel: [-1, 0, 1] along ``axis``, [1, 2, 1] along
    the other, 'reflect' border, no normalization."""
    deriv = np.array([-1.0, 0.0, 1.0], np.float32)
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    # _sep_conv2d correlates; scipy.ndimage.sobel is also a correlation
    ky, kx = (deriv, smooth) if axis == 0 else (smooth, deriv)
    return _sep_conv2d(x, ky, kx, "reflect")


def _nms_interpolated(gy: Array, gx: Array, mag: Array) -> Array:
    """Dense non-maximum suppression (module docstring step 3)."""
    h, w = mag.shape
    ay, ax = jnp.abs(gy), jnp.abs(gx)
    # L-inf normalized step: primary axis gets +/-1, secondary gets
    # frac in [0, 1]; s flips the secondary sign for opposite-sign
    # gradients (sectors 90-180)
    y_major = ay >= ax
    denom = jnp.where(y_major, ay, ax)
    frac = jnp.where(y_major, ax, ay) / jnp.maximum(denom, 1e-30)
    same_sign = (gy * gx) >= 0

    mp = jnp.pad(mag, 1)  # zero border: border pixels are masked out

    def sh(dy, dx):  # magnitude shifted so [y, x] reads (y+dy, x+dx)
        return lax.dynamic_slice(mp, (1 + dy, 1 + dx), (h, w))

    # y-major: neighbors (+/-1, +/-frac); corner column sign = s
    # x-major: neighbors (+/-frac, +/-1); corner row sign = s
    def blend(straight, corner):
        return corner * frac + straight * (1.0 - frac)

    ym_plus = blend(sh(1, 0), jnp.where(same_sign, sh(1, 1), sh(1, -1)))
    ym_minus = blend(sh(-1, 0),
                     jnp.where(same_sign, sh(-1, -1), sh(-1, 1)))
    xm_plus = blend(sh(0, 1), jnp.where(same_sign, sh(1, 1), sh(-1, 1)))
    xm_minus = blend(sh(0, -1),
                     jnp.where(same_sign, sh(-1, -1), sh(1, -1)))
    c_plus = jnp.where(y_major, ym_plus, xm_plus)
    c_minus = jnp.where(y_major, ym_minus, xm_minus)
    keep = (c_plus <= mag) & (c_minus <= mag) & (mag > 0)
    # erode the border (skimage's eroded all-ones mask)
    keep = keep.at[0, :].set(False).at[-1, :].set(False)
    keep = keep.at[:, 0].set(False).at[:, -1].set(False)
    return keep


def _hysteresis(strong: Array, weak: Array) -> Array:
    """Propagate ``strong`` through ``weak`` by 8-connected dilation to
    a fixpoint: one lax.while_loop, survivor-count convergence test."""
    h, w = strong.shape

    def dilate8(m):
        p = jnp.pad(m, 1)
        acc = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                acc = acc | lax.dynamic_slice(p, (1 + dy, 1 + dx), (h, w))
        return acc

    def cond(state):
        m, n = state
        return jnp.sum(m) != n

    def body(state):
        m, _ = state
        return dilate8(m) & weak, jnp.sum(m)

    out, _ = lax.while_loop(cond, body, (strong & weak, jnp.int32(-1)))
    return out


def canny(
    img: Array,
    sigma: float = 1.0,
    low_threshold: float | None = None,
    high_threshold: float | None = None,
    use_quantiles: bool = False,
    mode: str = "constant",
) -> Array:
    """skimage.feature.canny on a float [0, 1] slice (see the module
    docstring). Defaults: ``low_threshold=0.1``, ``high_threshold=0.2``
    (fractions of the float dtype max, i.e. absolute values here);
    ``use_quantiles=True`` reads them as quantiles of the gradient
    magnitude instead (a GLOBAL statistic either way — canny is
    rejected by spatial sharding because hysteresis is global
    connectivity). Returns float32 {0, 1}."""
    if low_threshold is None:
        low_threshold = 0.1
    if high_threshold is None:
        high_threshold = 0.2
    if use_quantiles and not (
        0.0 <= low_threshold <= 1.0 and 0.0 <= high_threshold <= 1.0
    ):
        raise ValueError("quantile thresholds must be in [0, 1]")
    if low_threshold > high_threshold:
        raise ValueError(
            f"low_threshold ({low_threshold}) must be <= high_threshold "
            f"({high_threshold})"
        )
    x = img.astype(jnp.float32)
    sm = gaussian_blur(x, float(sigma), 4.0, mode)
    gy = _sobel_scipy(sm, 0)
    gx = _sobel_scipy(sm, 1)
    mag = jnp.sqrt(gy * gy + gx * gx)
    maxima = _nms_interpolated(gy, gx, mag)
    if use_quantiles:
        lo = jnp.quantile(mag, float(low_threshold))
        hi = jnp.quantile(mag, float(high_threshold))
    else:
        lo = jnp.float32(low_threshold)
        hi = jnp.float32(high_threshold)
    weak = maxima & (mag >= lo)
    strong = weak & (mag >= hi)
    return _hysteresis(strong, weak).astype(jnp.float32)

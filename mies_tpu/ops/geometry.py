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


def _bilinear_sample(
    img: Array, iy: Array, ix: Array, mode: str, cval: float
) -> Array:
    """Sample ``img`` at float coords (iy, ix), scipy order=1 semantics.

    mode='nearest': the input is edge-replicated, so coordinates clamp
    to [0, n-1] before interpolation. mode='constant': any sample point
    outside the input extent reads ``cval`` with NO interpolation
    against edge values (scipy's 'constant', not 'grid-constant').
    """
    from jax import lax

    h, w = img.shape
    img = img.astype(jnp.float32)
    if mode == "nearest":
        iy = jnp.clip(iy, 0.0, h - 1.0)
        ix = jnp.clip(ix, 0.0, w - 1.0)
    elif mode != "constant":
        raise ValueError(f"unsupported warp mode {mode!r}")
    y0 = jnp.floor(iy)
    x0 = jnp.floor(ix)
    fy = iy - y0
    fx = ix - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    # Corner fetches ride TWO (1, 2)-row-pair gathers (top corner row /
    # bottom corner row), each pulling the horizontally adjacent pair at
    # clip(x0, w-2) in one slice, + per-corner selects for the x clamp.
    # Chip A/B vs the naive four point gathers (benchmarks/warp_ab.py,
    # r5): 12.09 -> 7.58 ms per batch-32 512x512 rotate (1.6x); the
    # single 2x2-patch-gather variant was a 44x DEAD END (534.8 ms —
    # XLA:TPU lowers multi-dim slice gathers catastrophically; (1, 2)
    # row slices keep the fast lane path). Bit-exact vs the four-gather
    # form: same fetched values, same float combine (verified
    # exhaustively on CPU by warp_ab --verify).
    xb = jnp.clip(x0i, 0, w - 2)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def row_pair(yi):
        yc = jnp.clip(yi, 0, h - 1)
        starts = jnp.stack([yc.reshape(-1), xb.reshape(-1)], axis=-1)
        return lax.gather(
            img, starts, dn, slice_sizes=(1, 2),
            mode=lax.GatherScatterMode.CLIP,
        ).reshape(iy.shape + (2,))

    sx0 = (jnp.clip(x0i, 0, w - 1) >= xb + 1)[..., None]
    sx1 = (jnp.clip(x0i + 1, 0, w - 1) >= xb + 1)[..., None]
    r0 = row_pair(y0i)
    r1 = row_pair(y0i + 1)
    tl = jnp.where(sx0, r0[..., 1:2], r0[..., 0:1])[..., 0]
    tr = jnp.where(sx1, r0[..., 1:2], r0[..., 0:1])[..., 0]
    bl = jnp.where(sx0, r1[..., 1:2], r1[..., 0:1])[..., 0]
    br = jnp.where(sx1, r1[..., 1:2], r1[..., 0:1])[..., 0]
    top = tl * (1.0 - fx) + tr * fx
    bot = bl * (1.0 - fx) + br * fx
    out = top * (1.0 - fy) + bot * fy
    if mode == "constant":
        inside = (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
        out = jnp.where(inside, out, jnp.float32(cval))
    return out


def affine_warp(
    img: Array,
    matrix,
    offset,
    mode: str = "constant",
    cval: float = 0.0,
) -> Array:
    """scipy.ndimage.affine_transform(order=1) semantics on [H, W]:
    out[o] = in[matrix @ o + offset] with bilinear interpolation.

    ``matrix`` is the 2x2 OUTPUT->INPUT map (row-major [[myy, myx],
    [mxy, mxx]]), ``offset`` the 2-vector added after it — exactly the
    parameters scipy's affine_transform takes, so goldens compare
    directly. Covers the torchvision transforms.v2 / kornia geometry
    affine role (reference pyproject.toml:16,8; VERDICT r2 missing #3).
    """
    import numpy as np

    h, w = img.shape
    m = np.asarray(matrix, dtype=np.float64)
    off = np.asarray(offset, dtype=np.float64)
    # per-axis coordinate terms precomputed host-side in f64 (matrix and
    # offset are static), so the only f32 rounding vs scipy's f64
    # coordinates is the single on-device add — boundary flips at the
    # 'constant' edge would otherwise appear from accumulated f32 error
    oy = np.arange(h, dtype=np.float64)
    ox = np.arange(w, dtype=np.float64)
    ay = jnp.asarray((m[0, 0] * oy + off[0]).astype(np.float32))[:, None]
    by = jnp.asarray((m[0, 1] * ox).astype(np.float32))[None, :]
    ax = jnp.asarray((m[1, 0] * oy + off[1]).astype(np.float32))[:, None]
    bx = jnp.asarray((m[1, 1] * ox).astype(np.float32))[None, :]
    return _bilinear_sample(img, ay + by, ax + bx, mode, cval)


def rotate(
    img: Array,
    angle: float,
    mode: str = "constant",
    cval: float = 0.0,
) -> Array:
    """Arbitrary-angle rotation about the image center, bilinear,
    output shape preserved — ``scipy.ndimage.rotate(angle, reshape=False,
    order=1)`` semantics (angle in degrees; positive rotates counter-
    clockwise in array (row, col) coordinates, like scipy)."""
    import numpy as np

    h, w = img.shape
    if float(angle) % 90.0 == 0.0:
        # exact multiples of 90 are knife-edge for the sampled form:
        # every coordinate is mathematically an integer, and f64 cos/sin
        # noise (~1e-16) flips inside/outside at the 'constant' border.
        # Use the exact permutation where it preserves the shape.
        k = int(round(float(angle) / 90.0)) % 4
        if k == 0:
            return img.astype(jnp.float32)
        if k == 2 or h == w:
            return jnp.rot90(img, k).astype(jnp.float32)
        if (h - w) % 2 == 0:
            # non-square 90/270 with even h-w: coordinates are exact
            # integers — out[y, x] = rot90(img, k)[y - d1, x + d1]
            # (verified against scipy), cval outside; the sampled path
            # would knife-edge these integer boundaries
            d1 = (h - w) // 2
            rot = jnp.rot90(img, k).astype(jnp.float32)  # [w, h]
            out = jnp.full((h, w), jnp.float32(cval))
            y0, y1 = max(0, d1), min(h, d1 + w)
            x0, x1 = max(0, -d1), min(w, h - d1)
            if y1 > y0 and x1 > x0:
                out = out.at[y0:y1, x0:x1].set(
                    rot[y0 - d1 : y1 - d1, x0 + d1 : x1 + d1]
                )
            if mode == "nearest":
                # edge replication instead of cval: the sampled 'nearest'
                # clamps coordinates, so out-of-extent pixels read the
                # nearest edge of the rotated content — fall through to
                # sampling for that case (no knife-edge there: clamped
                # coords are interior)
                pass
            else:
                return out
    a = np.deg2rad(float(angle))
    c, s = np.cos(a), np.sin(a)
    # scipy builds the output->input matrix [[cos, sin], [-sin, cos]]
    # and offset = center - matrix @ center (rot2d about the center)
    m = np.array([[c, s], [-s, c]], dtype=np.float64)
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    off = center - m @ center
    return affine_warp(img, m, off, mode=mode, cval=cval)


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


def perspective_warp(
    img: Array,
    matrix,
    mode: str = "constant",
    cval: float = 0.0,
) -> Array:
    """Projective (homography) warp on [H, W], bilinear, output shape
    preserved — the torchvision transforms.v2 ``perspective`` / kornia
    ``warp_perspective`` role (reference pyproject.toml:16,8) in
    scipy (row, col) convention.

    ``matrix`` is the 3x3 OUTPUT->INPUT homography in homogeneous
    (row, col, 1) coordinates: ``[yi, xi, wi] = matrix @ [yo, xo, 1]``
    and the sample point is ``(yi/wi, xi/wi)`` — exactly the mapping
    ``scipy.ndimage.geometric_transform(order=1)`` computes with the
    same callable, which is the golden
    (tests/goldens/golden_ops.py::perspective_warp). An affine matrix
    in the top two rows with [0, 0, 1] below reproduces ``affine_warp``.

    TPU note: the numerator/denominator of each coordinate are rank-1
    row+column sums, precomputed per-axis HOST-side in f64 (matrix is
    static) like ``affine_warp``; device work is one add + one divide
    per coordinate, then the shared bilinear sampler (geometry warps
    are batch-sharded, not spatially sharded — a warped pixel can read
    anywhere).
    """
    import numpy as np

    m = np.asarray(matrix, dtype=np.float64)
    if m.shape != (3, 3):
        raise ValueError(f"matrix must be 3x3, got {m.shape}")
    if m[2, 2] == 0.0:
        raise ValueError("matrix[2, 2] must be nonzero")
    h, w = img.shape
    oy = np.arange(h, dtype=np.float64)
    ox = np.arange(w, dtype=np.float64)

    def terms(row):
        a = jnp.asarray((m[row, 0] * oy + m[row, 2]).astype(np.float32))
        b = jnp.asarray((m[row, 1] * ox).astype(np.float32))
        return a[:, None] + b[None, :]

    den = terms(2)
    iy = terms(0) / den
    ix = terms(1) / den
    return _bilinear_sample(img, iy, ix, mode, cval)

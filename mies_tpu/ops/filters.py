"""Spatial filters: Gaussian / box / median / bilateral / unsharp / edges.

Semantics mirror the reference's pinned dependency surface (SURVEY.md
section 2b D1/D6):
  * gaussian_blur  -> skimage.filters.gaussian (truncate=4.0, mode
    'nearest' by default) / kornia.filters.gaussian_blur2d
  * unsharp_mask   -> skimage.filters.unsharp_mask:
    img + amount * (img - gaussian(img, sigma=radius)), clipped
  * median_blur    -> skimage.filters.median with odd square footprint /
    kornia.filters.median_blur
  * bilateral_blur -> kornia.filters.bilateral_blur (explicit kernel
    size) / skimage.restoration.denoise_bilateral (sigma-derived window)

TPU notes: the Gaussian is separable and lowered through
``lax.conv_general_dilated`` so XLA maps it onto the convolution path and
fuses the surrounding elementwise work. Median and bilateral are
stencil ops expressed as static shifted-window gathers — XLA-friendly
(static shapes, no data-dependent control flow); their Pallas versions
live in ``mies_tpu.kernels``.

All functions take float32 [H, W] in [0, 1] and return the same.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

_PAD_MODE = {
    "nearest": "edge",
    "edge": "edge",  # alias (skimage spelling of 'nearest')
    "reflect": "symmetric",  # scipy 'reflect' (d c b a | a b c d) == np 'symmetric'
    "mirror": "reflect",  # scipy 'mirror'  (d c b | a b c d | c b a) == np 'reflect'
    "constant": "constant",
    "wrap": "wrap",
}


def _pad2d(img: Array, ry: int, rx: int, mode: str) -> Array:
    if ry == 0 and rx == 0:
        return img
    return jnp.pad(img, ((ry, ry), (rx, rx)), mode=_PAD_MODE[mode])


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    """scipy.ndimage-compatible 1-D Gaussian taps (host-side, static)."""
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    return k.astype(np.float32)


def _conv1d_shifted(x: Array, taps: np.ndarray, axis: int, mode: str) -> Array:
    """1-D correlation along ``axis`` as an explicit shifted-add chain.

    acc = k[0]*x[..-r..] ; acc += k[1]*x[..]; ... — the exact summation
    order of scipy.ndimage.correlate1d, INDEPENDENT of the array size.
    That last property is load-bearing: halo-sharded bands and the full
    image produce bit-identical values (mies_tpu.parallel.halo), which
    neither XLA conv nor a banded matmul guarantees (their reduction
    trees change with the contraction size). It is also the fastest form
    on TPU for short kernels: 2*len(taps) fused VPU ops over the image,
    no conv-lowering overhead (measured 11.4 -> ~1 ms for the sigma=1.5
    unsharp batch-32 at 512^2).
    """
    r = len(taps) // 2
    h, w = x.shape
    if axis == 0:
        xp = jnp.pad(x, ((r, r), (0, 0)), mode=_PAD_MODE[mode])
        acc = np.float32(taps[0]) * lax.dynamic_slice(xp, (0, 0), (h, w))
        for t in range(1, len(taps)):
            acc = acc + np.float32(taps[t]) * lax.dynamic_slice(xp, (t, 0), (h, w))
    else:
        xp = jnp.pad(x, ((0, 0), (r, r)), mode=_PAD_MODE[mode])
        acc = np.float32(taps[0]) * lax.dynamic_slice(xp, (0, 0), (h, w))
        for t in range(1, len(taps)):
            acc = acc + np.float32(taps[t]) * lax.dynamic_slice(xp, (0, t), (h, w))
    return acc


_MATMUL_TAP_MIN = 33  # crossover: shifted-add ~0.05 ms/tap-pass per b32
# 512² on v5e vs ~0.3 ms for one HIGHEST-precision 512x512 operator
# matmul — the MXU wins once a 1-D kernel has ~2x16+1 taps or more


@functools.lru_cache(maxsize=128)
def _correlate1d_op_matrix(
    n: int, taps_key: bytes, ntaps: int, mode: str
) -> np.ndarray:
    """The 1-D correlation-with-border as an explicit [n, n] operator:
    ``A[i, j] = sum of taps t with border-resolved index(i + t - r) == j``.
    Built host-side from the SAME np.pad index semantics the shifted-add
    path uses (_PAD_MODE), so every border mode — nearest/reflect/mirror/
    wrap/constant (dropped weight) — is exact by construction."""
    taps = np.frombuffer(taps_key, np.float32).astype(np.float64)
    r = ntaps // 2
    rows = np.arange(n)
    if _PAD_MODE[mode] == "constant":
        idx = np.concatenate(
            [np.full(r, -1), np.arange(n), np.full(r, -1)]
        )
    else:
        idx = np.pad(np.arange(n), r, mode=_PAD_MODE[mode])
    a = np.zeros((n, n), np.float64)
    for t in range(ntaps):
        cols = idx[rows + t]
        valid = cols >= 0
        np.add.at(a, (rows[valid], cols[valid]), taps[t])
    return a.astype(np.float32)


def _correlate1d_auto(x: Array, taps: np.ndarray, axis: int, mode: str) -> Array:
    """1-D correlation that picks the right TPU lowering by kernel size.

    Short kernels keep ``_conv1d_shifted`` — scipy's exact tap order,
    size-INdependent, the halo-sharding bit-exactness contract. Long
    kernels (>= _MATMUL_TAP_MIN taps) on TPU run as ONE banded-operator
    matmul on the MXU (``A @ x`` / ``x @ A.T``, HIGHEST precision): the
    round-8 census measured the shifted-add chain at ~0.05 ms per
    tap-pass per b32 512² (retinex's sigma=30 blur alone is 482 passes),
    while the [512, 512] operator matmul is a fixed ~0.3 ms. The matmul
    reduction order differs from the sequential adds at the few-ULP
    level and depends on n — so ops dispatching here are atol-level
    (not bit) against their CPU form on TPU, the same stance as the
    FFT-dispatched dense kernels (_dense_conv2d); the chip gates in
    tests/tpu_consistency_driver.py pin the actual deviation. CPU keeps
    the shifted-add path everywhere — the 8-virtual-device sharding
    suite stays bit-exact.
    """
    taps = np.asarray(taps, np.float32)
    r = len(taps) // 2
    n = x.shape[axis]
    if (
        jax.default_backend() == "tpu"
        and len(taps) >= _MATMUL_TAP_MIN
        and r <= n - 1  # np.pad reflect/symmetric limit, as the jnp path
    ):
        a = jnp.asarray(
            _correlate1d_op_matrix(n, taps.tobytes(), len(taps), mode)
        )
        if axis == 0:
            return jnp.matmul(a, x, precision=lax.Precision.HIGHEST)
        return jnp.matmul(x, a.T, precision=lax.Precision.HIGHEST)
    return _conv1d_shifted(x, taps, axis, mode)


def _sep_conv2d(img: Array, ky: np.ndarray, kx: np.ndarray, mode: str) -> Array:
    """Separable 2-D correlation: per-axis border pad + shifted-add.

    Border mode is applied PER 1-D PASS to match scipy.ndimage's
    sequential correlate1d semantics exactly.
    """
    x = img.astype(jnp.float32)
    if len(ky) > 1:
        x = _conv1d_shifted(x, np.asarray(ky, np.float32), 0, mode)
    if len(kx) > 1:
        x = _conv1d_shifted(x, np.asarray(kx, np.float32), 1, mode)
    return x


def gaussian_blur(
    img: Array,
    sigma: float = 1.0,
    truncate: float = 4.0,
    mode: str = "nearest",
) -> Array:
    """Gaussian blur, skimage.filters.gaussian semantics.

    Kernel radius = int(truncate * sigma + 0.5) (scipy.ndimage). sigma=0
    is the identity.
    """
    if sigma <= 0:
        return img
    radius = int(truncate * float(sigma) + 0.5)
    k = gaussian_kernel1d(float(sigma), radius)
    return _sep_conv2d(img, k, k, mode)


def box_blur(img: Array, kernel_size: int = 3, mode: str = "reflect") -> Array:
    """Normalized box (mean) filter with odd square window."""
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    k = np.full((kernel_size,), 1.0 / kernel_size, np.float32)
    return _sep_conv2d(img, k, k, mode)


def unsharp_mask(
    img: Array,
    radius: float = 1.0,
    amount: float = 1.0,
    mode: str = "nearest",
    clip: bool = True,
) -> Array:
    """Unsharp masking, skimage.filters.unsharp_mask semantics.

    ``img + amount * (img - gaussian(img, sigma=radius))``; XLA fuses the
    residual add/scale into the blur's epilogue.
    """
    blurred = gaussian_blur(img, sigma=radius, mode=mode)
    out = img + amount * (img - blurred)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def _window_stack(img: Array, k: int, mode: str) -> Array:
    """Stack the k*k shifted neighborhoods: [k*k, H, W] (static shapes)."""
    r = k // 2
    p = _pad2d(img, r, r, mode)
    h, w = img.shape
    views = [
        lax.dynamic_slice(p, (dy, dx), (h, w))
        for dy in range(k)
        for dx in range(k)
    ]
    return jnp.stack(views, axis=0)


@functools.lru_cache(maxsize=32)
def _batcher_network(n: int) -> tuple:
    """Batcher odd-even mergesort comparator pairs for arbitrary n."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


def median_blur(img: Array, kernel_size: int = 3, mode: str = "nearest") -> Array:
    """Median filter with an odd square footprint.

    skimage.filters.median(behavior='ndimage', mode='nearest') semantics.
    Implemented as an explicit Batcher sorting network of min/max pairs
    over the k^2 shifted-window stack: every comparator is one VPU
    min+max over the whole image — no data movement, no generic sort
    (measured ~7x faster than jnp.sort on TPU for k=3).
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    win = _window_stack(img, kernel_size, mode)
    n = kernel_size * kernel_size
    vals = [win[i] for i in range(n)]
    for i, j in _batcher_network(n):
        lo = jnp.minimum(vals[i], vals[j])
        hi = jnp.maximum(vals[i], vals[j])
        vals[i], vals[j] = lo, hi
    return vals[n // 2]


def bilateral_blur(
    img: Array,
    kernel_size: int = 5,
    sigma_color: float = 0.1,
    sigma_space: float = 1.5,
    mode: str = "reflect",
) -> Array:
    """Bilateral filter, kornia.filters.bilateral_blur semantics.

    weight(p, q) = exp(-(|p-q|^2) / (2 sigma_space^2))
                 * exp(-(I(p)-I(q))^2 / (2 sigma_color^2))
    out(p) = sum_q w * I(q) / sum_q w   over the odd square window.

    Static shifted-window formulation: k^2 fused multiply-adds over the
    image — pure VPU work with no gathers. Exactly the self-guided case
    of ``joint_bilateral_blur`` (identical expressions, tested
    bit-equal) — one windowed-bilateral implementation to maintain.
    """
    return joint_bilateral_blur(
        img, img, kernel_size, sigma_color, sigma_space, mode
    )


def joint_bilateral_blur(
    img: Array,
    guide: Array,
    kernel_size: int = 5,
    sigma_color: float = 0.1,
    sigma_space: float = 1.5,
    mode: str = "reflect",
) -> Array:
    """Joint/cross bilateral filter, kornia.filters.joint_bilateral_blur
    semantics: range weights come from the GUIDE image, values from
    ``img``. With ``guide is img`` this is exactly ``bilateral_blur``
    (tested). Library function — a single-image pipeline stage has no
    second input, so the registry op for edge-preserving smoothing with
    a structure prior is ``guided_blur``.
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    r = kernel_size // 2
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    spatial = np.exp(
        -(dy**2 + dx**2) / (2.0 * float(sigma_space) ** 2)
    ).astype(np.float32).ravel()

    win = _window_stack(img, kernel_size, mode)
    gwin = _window_stack(guide, kernel_size, mode)
    diff = gwin - guide[None]
    rng = jnp.exp(-(diff * diff) / (2.0 * float(sigma_color) ** 2))
    w = rng * jnp.asarray(spatial)[:, None, None]
    return jnp.sum(w * win, axis=0) / jnp.sum(w, axis=0)


def _guided_dataflow(box, x: Array, eps: float, box2=None) -> Array:
    """SELF-guided He-et-al dataflow: shared by guided_blur (2-D),
    guided_blur3d, and the sharded band branch in parallel/halo.py —
    each caller supplies its own box-mean function, so a formula fix
    propagates to all three.

    ``box2(u, v) -> (box(u), box(v))`` lets a caller box two same-shape
    arrays in one go (the sharded band pairs them to HALVE its halo
    collectives); the default is two independent calls."""
    if box2 is None:
        def box2(u, v):
            return box(u), box(v)

    mean_i, corr_i = box2(x, x * x)
    var_i = corr_i - mean_i * mean_i
    a = var_i / (var_i + jnp.float32(eps))
    b = mean_i - a * mean_i
    fa, fb = box2(a, b)
    return fa * x + fb


def guided_blur(
    img: Array,
    kernel_size: int = 3,
    eps: float = 1e-2,
    mode: str = "reflect",
    guide: Array | None = None,
) -> Array:
    """Guided filter (He et al. 2010), kornia.filters.guided_blur
    semantics, self-guided by default (the classic edge-preserving
    denoiser; O(1) in kernel size).

    Pure box filters — separable shifted-add chains, zero gathers, the
    ideal TPU shape: XLA fuses the whole 5-box dataflow into a few
    passes. ``eps`` regularizes the per-window variance (larger = closer
    to a plain box blur). Golden:
    tests/goldens/golden_ops.py::guided_blur.
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")

    def f(x):
        return box_blur(x, kernel_size, mode)

    if guide is None:
        return _guided_dataflow(f, img, eps)
    g = guide
    mean_i = f(g)
    mean_p = f(img)
    corr_i = f(g * g)
    corr_ip = f(g * img)
    var_i = corr_i - mean_i * mean_i
    cov_ip = corr_ip - mean_i * mean_p
    a = cov_ip / (var_i + jnp.float32(eps))
    b = mean_p - a * mean_i
    return f(a) * g + f(b)


def denoise_bilateral(
    img: Array,
    sigma_color: float = 0.1,
    sigma_spatial: float = 1.0,
    mode: str = "edge",
) -> Array:
    """skimage.restoration.denoise_bilateral-style entry point.

    Window radius derived from sigma_spatial: ``max(1, round(3 * sigma))``
    (skimage uses win = max(5, 2*ceil(3*sigma_spatial)+1)).
    """
    win = max(5, 2 * int(np.ceil(3.0 * float(sigma_spatial))) + 1)
    return bilateral_blur(
        img,
        kernel_size=win,
        sigma_color=sigma_color,
        sigma_space=sigma_spatial,
        mode="edge" if mode == "edge" else mode,
    )


_SOBEL_Y = np.array([[1.0], [2.0], [1.0]], np.float32)
_SOBEL_D = np.array([[-1.0], [0.0], [1.0]], np.float32)


def sobel_edges(img: Array, mode: str = "reflect") -> Array:
    """Sobel gradient magnitude (skimage.filters.sobel semantics).

    Normalization 1/4 per axis kernel then sqrt((gx^2+gy^2)/2)... skimage
    uses kernels scaled so output is in [0,1]: smooth=[1,2,1]/4,
    edge=[-1,0,1]/2, magnitude = sqrt(gx^2 + gy^2) / sqrt(2).
    """
    smooth = (_SOBEL_Y / 4.0).ravel()
    edge = (_SOBEL_D / 2.0).ravel()
    gy = _sep_conv2d(img, edge, smooth, mode)
    gx = _sep_conv2d(img, smooth, edge, mode)
    return jnp.sqrt(gx * gx + gy * gy) / np.sqrt(2.0).astype(np.float32)


def _edge_magnitude(
    img: Array, smooth: np.ndarray, edge: np.ndarray, mode: str
) -> Array:
    """sqrt(gy^2 + gx^2) / sqrt(2) over separable smooth x derivative
    taps — the skimage.filters gradient-magnitude convention shared by
    sobel/scharr/prewitt/farid (each axis kernel is the outer product
    smooth (x) edge; the sign of the derivative cancels in the square,
    so correlate-vs-convolve orientation is unobservable here)."""
    gy = _sep_conv2d(img, edge, smooth, mode)
    gx = _sep_conv2d(img, smooth, edge, mode)
    return jnp.sqrt(gx * gx + gy * gy) / np.sqrt(2.0).astype(np.float32)


def scharr_edges(img: Array, mode: str = "reflect") -> Array:
    """Scharr gradient magnitude (skimage.filters.scharr semantics:
    axis kernels [3,10,3]/16 (x) [-1,0,1]/2 == the HSCHARR/32 weights,
    rotation-optimal 3x3 derivative). Golden:
    tests/goldens/golden_ops.py::scharr_edges (real scipy correlate1d
    over the documented skimage 0.26 constants)."""
    smooth = np.array([3.0, 10.0, 3.0], np.float32) / 16.0
    edge = (_SOBEL_D / 2.0).ravel()
    return _edge_magnitude(img, smooth, edge, mode)


def prewitt_edges(img: Array, mode: str = "reflect") -> Array:
    """Prewitt gradient magnitude (skimage.filters.prewitt semantics:
    axis kernels [1,1,1]/3 (x) [-1,0,1]/2 == HPREWITT/6)."""
    smooth = np.array([1.0, 1.0, 1.0], np.float32) / 3.0
    edge = (_SOBEL_D / 2.0).ravel()
    return _edge_magnitude(img, smooth, edge, mode)


# Farid & Simoncelli (2004) optimal 5-tap pair at full published
# precision: interpolator p sums to 1, d1 is its matched derivative.
# skimage 0.26 (filters/edges.py) ships 6-decimal TRUNCATIONS of these
# taps (~1e-7 apart); tools/verify_skimage_golden.py pins the actual
# deviation when a skimage env is available.
_FARID_P = np.array(
    [0.0376593171958126, 0.249153396177344, 0.426374573253687,
     0.249153396177344, 0.0376593171958126], np.float32,
)
_FARID_D1 = np.array(
    [0.109603762960254, 0.276690988455557, 0.0,
     -0.276690988455557, -0.109603762960254], np.float32,
)


def farid_edges(img: Array, mode: str = "reflect") -> Array:
    """Farid gradient magnitude (skimage.filters.farid semantics: the
    Farid-Simoncelli optimal 5-tap interpolator/derivative pair — the
    most rotation-invariant of the family)."""
    return _edge_magnitude(img, _FARID_P, _FARID_D1, mode)


def roberts_edges(img: Array, mode: str = "reflect") -> Array:
    """Roberts cross gradient magnitude (skimage.filters.roberts
    semantics). The two 2x2 cross kernels are not separable; with
    scipy.ndimage.convolve's even-kernel alignment (center index
    size//2 == 1) they reduce to the pixel's forward cross
    differences:

        pos[i,j] = x[i+1,j+1] - x[i,j]     (ROBERTS_PD)
        neg[i,j] = x[i+1,j]   - x[i,j+1]   (ROBERTS_ND)

    on the ``mode``-padded extension, magnitude sqrt(pos^2+neg^2) /
    sqrt(2) (the same [0,1]-bounding scale as the rest of the family).
    Golden: real scipy ndi.convolve over the documented 2x2 weights."""
    h, w = img.shape
    x = _pad2d(img.astype(jnp.float32), 1, 1, mode)
    c = lax.dynamic_slice(x, (1, 1), (h, w))
    se = lax.dynamic_slice(x, (2, 2), (h, w))
    s = lax.dynamic_slice(x, (2, 1), (h, w))
    e = lax.dynamic_slice(x, (1, 2), (h, w))
    pos = se - c
    neg = s - e
    return jnp.sqrt(pos * pos + neg * neg) / np.sqrt(2.0).astype(
        np.float32
    )


def laplace(img: Array, mode: str = "reflect") -> Array:
    """4-neighbor Laplacian, scipy.ndimage.laplace semantics: the sum
    of per-axis [1,-2,1] second differences (center -4). NB
    skimage.filters.laplace(ksize=3) applies the NEGATED kernel
    (restoration.uft.laplacian, center +4) — its output is ``-laplace``
    of this op. The RAW operator — ``laplacian_sharpen`` below is
    the enhancement composite. Golden: real ndi.laplace."""
    taps = np.array([1.0, -2.0, 1.0], np.float32)
    one = np.ones(1, np.float32)
    return _sep_conv2d(img, taps, one, mode) + _sep_conv2d(
        img, one, taps, mode
    )


def laplacian_sharpen(img: Array, alpha: float = 0.2, mode: str = "reflect") -> Array:
    """Sharpen via 4-neighbor Laplacian: img - alpha * lap(img), clipped."""
    p = _pad2d(img, 1, 1, mode)
    h, w = img.shape
    lap = (
        lax.dynamic_slice(p, (0, 1), (h, w))
        + lax.dynamic_slice(p, (2, 1), (h, w))
        + lax.dynamic_slice(p, (1, 0), (h, w))
        + lax.dynamic_slice(p, (1, 2), (h, w))
        - 4.0 * img
    )
    return jnp.clip(img - alpha * lap, 0.0, 1.0)


def difference_of_gaussians(
    img: Array,
    low_sigma: float = 1.0,
    high_sigma: float | None = None,
    truncate: float = 4.0,
    mode: str = "nearest",
) -> Array:
    """Band-pass via Gaussian difference
    (skimage.filters.difference_of_gaussians semantics, SURVEY.md
    section 2b D6): ``gaussian(img, low_sigma) - gaussian(img,
    high_sigma)``, with skimage's default ``high_sigma = 1.6 *
    low_sigma`` (the Marr-Hildreth LoG approximation ratio). Output is
    a signed detail band — the chain's final uint8 quantize clamps.
    Golden: tests/goldens/golden_ops.py::difference_of_gaussians
    (two real scipy gaussian_filter calls — an exact cross-check).
    """
    if high_sigma is None:
        high_sigma = float(low_sigma) * 1.6
    if high_sigma < low_sigma:
        raise ValueError(
            f"high_sigma ({high_sigma}) must be >= low_sigma ({low_sigma})"
        )
    x = img.astype(jnp.float32)
    return gaussian_blur(x, float(low_sigma), truncate, mode) - gaussian_blur(
        x, float(high_sigma), truncate, mode
    )


def _gabor_sigma_prefactor(bandwidth: float) -> float:
    b = float(bandwidth)
    return (
        1.0 / np.pi * np.sqrt(np.log(2.0) / 2.0)
        * (2.0**b + 1.0) / (2.0**b - 1.0)
    )


@functools.lru_cache(maxsize=64)
def gabor_kernel(
    frequency: float,
    theta: float = 0.0,
    bandwidth: float = 1.0,
    sigma_x: float | None = None,
    sigma_y: float | None = None,
    n_stds: int = 3,
    offset: float = 0.0,
) -> np.ndarray:
    """Complex 2-D Gabor kernel (skimage.filters.gabor_kernel
    transcription — same sigma-from-bandwidth prefactor, rotated
    support ceil(max(n_stds*sigma_x*|cos|, n_stds*sigma_y*|sin|, 1)),
    same 1/(2*pi*sx*sy) normalization). Host-side, float64 complex;
    static under jit."""
    if sigma_x is None:
        sigma_x = _gabor_sigma_prefactor(bandwidth) / float(frequency)
    if sigma_y is None:
        sigma_y = _gabor_sigma_prefactor(bandwidth) / float(frequency)
    ct, st = np.cos(float(theta)), np.sin(float(theta))
    x0 = int(np.ceil(max(abs(n_stds * sigma_x * ct),
                         abs(n_stds * sigma_y * st), 1.0)))
    y0 = int(np.ceil(max(abs(n_stds * sigma_y * ct),
                         abs(n_stds * sigma_x * st), 1.0)))
    y, x = np.meshgrid(
        np.arange(-y0, y0 + 1, dtype=np.float64),
        np.arange(-x0, x0 + 1, dtype=np.float64),
        indexing="ij",
    )
    rotx = x * ct + y * st
    roty = -x * st + y * ct
    g = np.exp(-0.5 * (rotx**2 / sigma_x**2 + roty**2 / sigma_y**2))
    g /= 2.0 * np.pi * sigma_x * sigma_y
    return g * np.exp(1j * (2.0 * np.pi * float(frequency) * rotx
                            + float(offset)))


def _dense_conv2d(
    xp: Array, kernels: "np.ndarray", out_h: int, out_w: int
) -> Array:
    """VALID ``scipy.ndimage.convolve`` of a border-padded image with a
    stack of dense 2-D kernels: xp [Hp, Wp] f32, kernels [C, kh, kw]
    (unflipped, float64 host-side) -> [C, out_h, out_w] f32.

    TPU: ONE shared ``rfft2`` of the image, a batched spectral multiply
    with the host-precomputed kernel FFTs, one batched ``irfft2`` —
    circular convolution with the kernel at the origin; the linear
    'valid' window sits at [kh-1:, kw-1:] and the wrap-around only
    contaminates rows/cols before it. The round-8 census caught the
    previous ``lax.conv_general_dilated`` lowering at 598.9 ms per
    batch-32 512² for the default 33x33 gabor pair (XLA:TPU's
    single-input-channel spatial conv is the documented 20x trap, and
    it compounds with kernel area); this form measured **9.6 ms** —
    62x — at max 7e-8 vs the conv values (benchmarks/gabor_ab.py; the
    flip bookkeeping is pinned by the asymmetric-kernel golden tests —
    offset != 0 breaks the even/odd symmetry that would hide it).

    CPU keeps the XLA conv (fine there, and the goldens compare f64
    scipy against BOTH backends at the same atol).
    """
    kernels = np.asarray(kernels)
    c, kh, kw = kernels.shape
    hp, wp = xp.shape
    if jax.default_backend() == "tpu":
        # FFT sizes stay at the MINIMAL hp = h + kh - 1. Rounding up to
        # 5-smooth sizes was measured SLOWER at the op level (round 9:
        # gabor 9.49 -> 10.66 ms, gabor_bank 69.3 -> 84.2, motion_blur
        # 5.59 -> 5.83, stable across runs) even though a bare
        # rfft2+irfft2 probe preferred 576 over 545 — XLA:TPU's FFT does
        # not Bluestein-penalize awkward sizes enough to pay for the
        # +12% pixels through the spectral multiply and epilogue.
        kf = np.zeros((c, hp, wp), np.float64)
        kf[:, :kh, :kw] = kernels
        spec = jnp.asarray(np.fft.rfft2(kf, axes=(-2, -1)).astype(np.complex64))
        f = jnp.fft.rfft2(xp.astype(jnp.float32))
        out = jnp.fft.irfft2(f[None] * spec, s=(hp, wp), axes=(-2, -1))
        return out[:, kh - 1:kh - 1 + out_h, kw - 1:kw - 1 + out_w]
    taps = jnp.asarray(
        kernels[:, None, ::-1, ::-1].astype(np.float32)
    )  # conv == correlation with flipped taps
    return lax.conv_general_dilated(
        xp.astype(jnp.float32)[None, None], taps, (1, 1), "VALID",
        precision=lax.Precision.HIGHEST,
    )[0]


def gabor_response(
    img: Array,
    frequency: float,
    theta: float = 0.0,
    bandwidth: float = 1.0,
    sigma_x: float | None = None,
    sigma_y: float | None = None,
    n_stds: int = 3,
    offset: float = 0.0,
    mode: str = "reflect",
) -> tuple[Array, Array]:
    """(real, imag) Gabor responses — skimage.filters.gabor semantics:
    scipy.ndimage.convolve of the image with the kernel's real and
    imaginary parts (convolution, so the taps are flipped before the
    correlation below).

    TPU note: both parts run through ``_dense_conv2d`` — one shared
    rfft2 + batched spectral multiply (598.9 -> 9.6 ms per b32 512² at
    the defaults; the census caught the old single-channel conv
    lowering). Golden: tests/goldens/golden_ops.py::gabor_response.
    """
    g = gabor_kernel(
        float(frequency), float(theta), float(bandwidth),
        None if sigma_x is None else float(sigma_x),
        None if sigma_y is None else float(sigma_y),
        int(n_stds), float(offset),
    )
    ry, rx = g.shape[0] // 2, g.shape[1] // 2
    h0, w0 = img.shape
    xp = _pad2d(img.astype(jnp.float32), ry, rx, mode)
    out = _dense_conv2d(xp, np.stack([g.real, g.imag]), h0, w0)
    return out[0], out[1]


def gabor(
    img: Array,
    frequency: float = 0.1,
    theta: float = 0.0,
    bandwidth: float = 1.0,
    sigma_x: float | None = None,
    sigma_y: float | None = None,
    n_stds: int = 3,
    offset: float = 0.0,
    mode: str = "reflect",
    output: str = "magnitude",
) -> Array:
    """Gabor texture filter as a chain stage. skimage's ``gabor``
    returns the (real, imag) pair (available as ``gabor_response``);
    a pipeline stage needs one image, so ``output`` selects
    ``magnitude`` (sqrt(re^2 + im^2) — the standard Gabor texture
    energy, phase-invariant), ``real``, or ``imag``."""
    re, im = gabor_response(
        img, frequency, theta, bandwidth, sigma_x, sigma_y,
        n_stds, offset, mode,
    )
    if output == "magnitude":
        return jnp.sqrt(re * re + im * im)
    if output == "real":
        return re
    if output == "imag":
        return im
    raise ValueError(
        f"output must be 'magnitude', 'real' or 'imag', got {output!r}"
    )


@functools.lru_cache(maxsize=64)
def motion_blur_kernel(
    kernel_size: int, angle: float, direction: float = 0.0
) -> np.ndarray:
    """Directional motion-blur PSF (the kornia.filters.motion_blur
    kernel recipe): a horizontal line of linspace weights — uniform at
    ``direction=0``, ramping toward the leading/trailing end at +/-1 —
    rotated ``angle`` degrees counter-clockwise about the kernel center
    (bilinear, shape preserved; scipy.ndimage.rotate order=1) and
    normalized to sum 1. Host-side, float64; static under jit."""
    from scipy import ndimage as _ndi

    k = int(kernel_size)
    if k % 2 != 1 or k < 3:
        raise ValueError("kernel_size must be odd and >= 3")
    d = (min(max(float(direction), -1.0), 1.0) + 1.0) / 2.0
    kern = np.zeros((k, k), np.float64)
    kern[k // 2, :] = np.linspace(d, 1.0 - d, k)
    if float(angle) % 360.0 != 0.0:
        kern = _ndi.rotate(kern, float(angle), reshape=False, order=1)
        kern = np.clip(kern, 0.0, None)  # bilinear ringing guards
    return kern / kern.sum()


def motion_blur(
    img: Array,
    kernel_size: int = 9,
    angle: float = 0.0,
    direction: float = 0.0,
    mode: str = "constant",
) -> Array:
    """Directional motion blur (kornia.filters.motion_blur role,
    reference pyproject.toml:8): correlate the image with the rotated
    line PSF from ``motion_blur_kernel``. ``direction`` biases the
    energy toward one end of the streak (-1/+1) or keeps it uniform
    (0). Used in training augmentation (simulated patient motion) and
    deblur-evaluation pairs. Runs as one ``lax.conv_general_dilated``
    over the border-padded image, HIGHEST precision; golden:
    tests/goldens/golden_ops.py::motion_blur (real scipy correlate
    against an independently-transcribed kernel)."""
    kern = motion_blur_kernel(int(kernel_size), float(angle),
                              float(direction))
    r = kern.shape[0] // 2
    h0, w0 = img.shape
    xp = _pad2d(img.astype(jnp.float32), r, r, mode)
    # _dense_conv2d CONVOLVES; this op's contract is scipy CORRELATE,
    # so hand it the flipped kernel (convolve(flip(k)) == correlate(k))
    flipped = np.ascontiguousarray(kern[::-1, ::-1])
    return _dense_conv2d(xp, flipped[None], h0, w0)[0]


def gabor_bank(
    img: Array,
    frequency: float = 0.1,
    n_orientations: int = 8,
    bandwidth: float = 1.0,
    sigma_x: float | None = None,
    sigma_y: float | None = None,
    n_stds: int = 3,
    offset: float = 0.0,
    mode: str = "reflect",
    output: str = "max",
) -> Array:
    """Orientation-pooled Gabor texture energy: magnitudes at
    ``theta_k = k * pi / n_orientations`` pooled by ``output`` ('max' —
    the rotation-invariant texture energy standard in mammography CAD —
    or 'mean'). Each orientation is exactly ``gabor(..., theta_k,
    output='magnitude')``.

    TPU note: every orientation's (real, imag) kernel pair is zero-
    padded to the bank's largest support and stacked through ONE
    ``_dense_conv2d`` call — one shared image FFT + a batched spectral
    multiply over 2*N channels (the zero-padded support keeps each
    channel identical to its standalone response; the census caught
    the previous 2N-channel conv lowering at 541.6 ms per b32 512²).
    Golden: tests/goldens/golden_ops.py::gabor_response looped per
    orientation (real scipy convolutions).
    """
    if n_orientations < 1:
        raise ValueError("n_orientations must be >= 1")
    if output not in ("max", "mean"):
        raise ValueError(f"output must be 'max' or 'mean', got {output!r}")
    kernels = [
        gabor_kernel(
            float(frequency), k * np.pi / n_orientations, float(bandwidth),
            None if sigma_x is None else float(sigma_x),
            None if sigma_y is None else float(sigma_y),
            int(n_stds), float(offset),
        )
        for k in range(int(n_orientations))
    ]
    ry = max(g.shape[0] // 2 for g in kernels)
    rx = max(g.shape[1] // 2 for g in kernels)
    stack = np.zeros((2 * len(kernels), 2 * ry + 1, 2 * rx + 1),
                     np.float64)
    for i, g in enumerate(kernels):
        gy, gx = g.shape[0] // 2, g.shape[1] // 2
        sl = (slice(ry - gy, ry + gy + 1), slice(rx - gx, rx + gx + 1))
        stack[2 * i][sl] = g.real
        stack[2 * i + 1][sl] = g.imag
    h0, w0 = img.shape
    xp = _pad2d(img.astype(jnp.float32), ry, rx, mode)
    resp = _dense_conv2d(xp, stack, h0, w0)
    mags = jnp.sqrt(resp[0::2] ** 2 + resp[1::2] ** 2)  # [N, H, W]
    return jnp.max(mags, axis=0) if output == "max" else jnp.mean(
        mags, axis=0
    )


def retinex(
    img: Array,
    sigmas: tuple = (2.0, 8.0, 30.0),
    weights: tuple | None = None,
    eps: float = 1.0 / 255.0,
    gain: float = 1.0,
    rescale: str = "clip",
    mode: str = "nearest",
    truncate: float = 4.0,
) -> Array:
    """Multiscale retinex (Jobson, Rahman & Woodell, IEEE TIP 1997):
    ``sum_k w_k * (log(I + eps) - log(G_sigma_k(I) + eps))`` — the
    log-ratio of each pixel to its neighborhood at several scales.
    Illumination (the slow field) cancels in the ratio, reflectance
    (tissue detail) survives: the spatial-domain sibling of
    ``homomorphic`` (which does the same separation in the FFT
    domain), standard for endoscopy / dermoscopy / non-uniformly
    illuminated radiographs.

    ``rescale='clip'`` maps the zero-centered log-ratio through
    ``clip(0.5 + gain * msr)`` — LOCAL extent, so chains stay
    band-shardable (halo = the largest Gaussian radius);
    ``'minmax'`` stretches to the image's own range (global extent,
    rejected for spatial sharding). Each scale's blur is exactly
    ``gaussian_blur(sigma_k)`` (scipy semantics). Golden:
    tests/goldens/golden_ops.py::retinex.
    """
    if not sigmas or any(s <= 0 for s in sigmas):
        raise ValueError("sigmas must be a non-empty tuple of numbers > 0")
    if weights is None:
        weights = (1.0 / len(sigmas),) * len(sigmas)
    if len(weights) != len(sigmas):
        raise ValueError(
            f"weights must match sigmas ({len(sigmas)}), got {len(weights)}"
        )
    if rescale not in ("clip", "minmax"):
        raise ValueError(f"rescale must be 'clip' or 'minmax', got {rescale!r}")
    if eps <= 0:
        raise ValueError("eps must be > 0")
    x = img.astype(jnp.float32)
    e32 = np.float32(eps)
    logx = jnp.log(x + e32)
    msr = jnp.zeros_like(x)
    for s, w in zip(sigmas, weights):
        # gaussian_blur semantics (scipy taps, same border mode), but
        # dispatched through _correlate1d_auto: the default sigma=30
        # scale alone is 482 shifted-add passes (~the census's 94.65 ms
        # op cost) — on TPU the big scales run as banded MXU matmuls
        # (chip consistency gate: retinex_vs_cpu, atol 1e-3)
        r = int(truncate * float(s) + 0.5)
        k = gaussian_kernel1d(float(s), r)
        blur = _correlate1d_auto(
            _correlate1d_auto(x, k, 0, mode), k, 1, mode
        )
        msr = msr + np.float32(w) * (logx - jnp.log(blur + e32))
    if rescale == "minmax":
        lo, hi = jnp.min(msr), jnp.max(msr)
        return (msr - lo) / jnp.maximum(hi - lo, np.float32(1e-12))
    return jnp.clip(np.float32(0.5) + np.float32(gain) * msr, 0.0, 1.0)


def lee_filter(
    img: Array,
    kernel_size: int = 5,
    sigma: float | None = None,
    mode: str = "reflect",
) -> Array:
    """Lee despeckle filter (Lee, IEEE TPAMI 1980) — the classical
    ultrasound/SAR local-statistics Wiener: ``out = m + k * (x - m)``
    with ``m, v`` the window mean/variance and gain
    ``k = v / (v + sigma^2)``. Homogeneous speckle (v ~ sigma²) is
    averaged away; edges (v >> sigma²) pass through.

    ``sigma`` is the noise STD in intensity units; ``None`` estimates
    ``sigma² = mean local variance`` over the whole image (the flat-
    region assumption) — an IMAGE-WIDE statistic, so chains with
    ``sigma=None`` are rejected for spatial sharding (pass an explicit
    sigma, the frangi-gamma rule). Pure box-filter dataflow: two
    separable window means, zero gathers. Golden:
    tests/goldens/golden_ops.py::lee_filter."""
    if kernel_size % 2 != 1 or kernel_size < 3:
        raise ValueError("kernel_size must be odd and >= 3")
    if sigma is not None and sigma <= 0:
        raise ValueError("sigma must be > 0 (or omitted to estimate)")
    x = img.astype(jnp.float32)
    m = box_blur(x, kernel_size, mode)
    v = jnp.maximum(box_blur(x * x, kernel_size, mode) - m * m, 0.0)
    noise_var = (
        jnp.mean(v) if sigma is None
        else np.float32(float(sigma) * float(sigma))
    )
    k = v / (v + noise_var + np.float32(1e-12))
    return m + k * (x - m)


def kuwahara(
    img: Array, kernel_size: int = 5, mode: str = "reflect",
) -> Array:
    """Kuwahara edge-preserving smoother (Kuwahara et al. 1976): each
    pixel takes the MEAN of whichever of its four overlapping
    (r+1)x(r+1) corner quadrants has the LOWEST variance — smoothing
    never crosses an edge, because the quadrant straddling it has high
    variance and loses. Ties pick the first of (top-left, top-right,
    bottom-left, bottom-right), deterministically.

    All four quadrant means/variances come from ONE pair of
    shifted-window sums over the padded image (x and x²) sampled at
    four static offsets — pure VPU dataflow, band-shardable with
    halo r. Golden: tests/goldens/golden_ops.py::kuwahara."""
    if kernel_size % 2 != 1 or kernel_size < 3:
        raise ValueError("kernel_size must be odd and >= 3")
    r = kernel_size // 2
    q = r + 1
    h, w = img.shape
    x = img.astype(jnp.float32)
    xp = _pad2d(x, r, r, mode)

    def win_sums(a):
        rs = None
        for t in range(q):
            sl = a[t:t + h + r, :]
            rs = sl if rs is None else rs + sl
        out = None
        for t in range(q):
            sl = rs[:, t:t + w + r]
            out = sl if out is None else out + sl
        return out

    inv_n = np.float32(1.0 / (q * q))
    s1 = win_sums(xp) * inv_n
    s2 = win_sums(xp * xp) * inv_n
    vfull = jnp.maximum(s2 - s1 * s1, 0.0)
    # quadrant (dy, dx) offsets into the [h+r, w+r] sum maps
    offs = ((0, 0), (0, r), (r, 0), (r, r))
    means = [s1[dy:dy + h, dx:dx + w] for dy, dx in offs]
    varis = [vfull[dy:dy + h, dx:dx + w] for dy, dx in offs]
    best_m, best_v = means[0], varis[0]
    for mq, vq in zip(means[1:], varis[1:]):
        take = vq < best_v  # strict: ties keep the earlier quadrant
        best_m = jnp.where(take, mq, best_m)
        best_v = jnp.where(take, vq, best_v)
    return best_m

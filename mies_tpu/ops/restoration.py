"""Restoration denoisers: non-local means, TV-Chambolle, Richardson-Lucy.

The reference declares scikit-image 0.26 (`/root/reference/pyproject.toml:12`),
whose ``skimage.restoration`` module is the classical-denoising surface this
module rebuilds TPU-first:

  * ``denoise_nl_means``   -> skimage.restoration.denoise_nl_means
    (fast_mode=True, the default): patchwise self-similarity averaging,
    the strongest classical denoiser for low-dose CT / X-ray noise.
  * ``denoise_tv``         -> skimage.restoration.denoise_tv_chambolle:
    total-variation dual projection (Chambolle 2004).
  * ``richardson_lucy``    -> skimage.restoration.richardson_lucy with a
    Gaussian PSF: iterative deconvolution (focal-spot / detector blur).

TPU design notes
----------------
NL-means is expressed as a ``lax.fori_loop`` over the (2d+1)^N search
shifts; each iteration is pure shifted-window VPU dataflow (one squared
difference, one separable unnormalized box sum of the patch, one exp,
two fused multiply-adds) with STATIC shapes — no gathers, no scatter,
nothing data-dependent. The classic integral-image trick buys nothing
here: it serializes a prefix scan over the whole image per shift, while
the separable patch sum is 2*s shifted adds that XLA fuses and the VPU
streams. Summation order is size-independent (explicit shifted adds,
like ``filters._conv1d_shifted``), so halo-sharded bands reproduce the
unsharded op bit for bit.

TV-Chambolle runs its data-dependent convergence test inside ONE
``lax.while_loop`` — the energy scalars live on device, so the whole
denoise is a single XLA program with zero host syncs. Richardson-Lucy
is a ``fori_loop`` of separable zero-pad convolutions.

Semantics transcriptions are pinned by NumPy goldens
(tests/goldens/golden_ops.py) and covered by
``tools/verify_skimage_golden.py`` for any environment where the real
scikit-image is installable (it is not, here).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from mies_tpu.ops.filters import _conv1d_shifted, gaussian_kernel1d

_DISTANCE_CUTOFF = 5.0  # skimage _nl_means_denoising.pyx: DISTANCE_CUTOFF


def _nlm_mode() -> tuple[str, int]:
    """A/B knob for the NL-means pair loop (VERDICT r3 item 2):
    MIES_TPU_NLM selects 'fori' (production lax.fori_loop), 'unroll'
    (full static unroll — measured OOM at d=11 and 1.34x SLOWER at d=5,
    benchmarks/nlm_ab.py), or 'chunkK' (e.g. chunk8: static unroll in
    groups of K pairs with an optimization_barrier on the carry between
    groups — static slices for XLA cross-pair fusion, bounded live
    set). Identical math and accumulation order in every mode. Read at
    TRACE time — a mid-process flip does NOT retrace an
    already-compiled chain, so A/B measurements run each variant in
    its own process (benchmarks/nlm_ab.py does).
    """
    import os

    v = os.environ.get("MIES_TPU_NLM", "fori")
    if v in ("fori", "unroll"):
        return v, 0
    if v.startswith("chunk"):
        try:
            k = int(v[len("chunk"):])
            if k > 0:
                return "chunk", k
        except ValueError:
            pass
    raise ValueError(
        f"MIES_TPU_NLM must be 'fori', 'unroll' or 'chunkK', got {v!r}"
    )


def _half_shift_table(d: int, nd: int) -> np.ndarray:
    """Lexicographically-positive half of [-d, d]^nd (first nonzero
    component > 0), encoded as offsets in [0, 2d] (dec = t + d).
    Each entry stands for the unordered pair {t, -t}."""
    import itertools

    out = []
    for t in itertools.product(range(-d, d + 1), repeat=nd):
        for c in t:
            if c > 0:
                out.append([ti + d for ti in t])
                break
            if c < 0:
                break
    return np.asarray(out, np.int32)


def _nl_means_core(
    u: Array, patch_size: int, patch_distance: int, h: float, sigma: float
) -> Array:
    """N-D fast-mode NL-means (skimage semantics), shared by 2-D and 3-D.

    Per-pixel form of skimage's symmetric-pair accumulation (the Cython
    ``_fast_nl_means_denoising_2d/3d`` kernels): for every shift t in
    [-d, d]^N,

        S_t(p) = sum_{|k|<=offset} (u(p+k) - u(p+t+k))^2        (patch SSD)
        D_t(p) = max(S_t(p) - 2 sigma^2 s^N, 0) / (h^2 s^N)
        w_t(p) = exp(-D_t(p)) if D_t(p) <= 5.0 else 0           (cutoff)
        out(p) = (sum_t w_t(p) u(p+t) + u(p)) / (sum_t w_t(p) + 1)

    The extra ``+ u(p) / + 1`` term reproduces skimage's DOUBLED self
    pair: its t=(0,..,0) loop iteration writes both endpoints of the
    (p, p) pair, giving the center weight 2 (1 from the t=0 term of the
    sum + 1 here). The 0.5-alpha bookkeeping skimage applies to
    t_col == 0 shifts nets out to exactly one unit weight per
    unordered pair, which is what the plain sum over ALL t computes.
    Patches are compared on the np.pad(mode='reflect') extension, as in
    skimage (our pad-mode name: 'mirror').

    Symmetric-pair evaluation (the bilateral kernel's trick): D is
    symmetric — D_{-t}(p) == D_t(p - t) — so the loop runs over HALF the
    shifts, computes each pair's distance field ONCE on a domain
    extended by d (covering both p and p - t), and accumulates both
    endpoints. The patch sum (the dominant cost, 2*s passes) is shared
    between t and -t; the consumed distance values read only within
    skimage's own offset+d pad of the image, so semantics are unchanged
    (the wider allocation pad exists only to keep slice shapes static).
    """
    nd = u.ndim
    s = patch_size if patch_size % 2 == 1 else patch_size + 1  # skimage: s += 1
    offset = s // 2
    d = int(patch_distance)
    pad = offset + d
    shape = u.shape
    if any(pad > n - 1 for n in shape):
        raise ValueError(
            f"patch_size//2 + patch_distance = {pad} must be < every image "
            f"dim - 1 (got shape {shape}); shrink patch_distance"
        )
    # Two-step pad. Semantic extension first: offset + d of np 'reflect',
    # exactly what skimage compares patches on (and the jnp reflect limit
    # pad <= dim-1 is checked against THIS width, the true requirement).
    # Then d more 'edge' rows purely for static slice shapes — consumed
    # distances/values never read beyond the semantic extension (the
    # outer rows feed only D entries outside the [-d, shape+d) window
    # that the pair accumulation slices out).
    up = jnp.pad(u.astype(jnp.float32), pad, mode="reflect")
    up = jnp.pad(up, d, mode="edge")
    sn = float(s) ** nd
    inv_h2sn = np.float32(1.0 / (float(h) * float(h) * sn))
    bias = np.float32(2.0 * float(sigma) * float(sigma) * sn)
    # distance-field domain Q = [-d, shape + d) (indexed q + d)
    ext_q = tuple(n + 2 * d + 2 * offset for n in shape)
    base = lax.dynamic_slice(up, (d,) * nd, ext_q)
    table_np = _half_shift_table(d, nd)  # [n_half, nd] in [0, 2d]
    table = jnp.asarray(table_np)

    def patch_sum(v: Array) -> Array:
        # un-normalized s-wide 'valid' box sum per axis. Explicit shifted
        # adds in a fixed order — size-independent, so band-sharded and
        # unsharded runs are bit-identical.
        for ax in range(nd):
            acc = lax.slice_in_dim(v, 0, v.shape[ax] - (s - 1), axis=ax)
            for j in range(1, s):
                acc = acc + lax.slice_in_dim(
                    v, j, v.shape[ax] - (s - 1) + j, axis=ax
                )
            v = acc
        return v

    def body(dec, carry):
        # ``dec``: per-axis offsets, dec = t + d in [0, 2d]. Either a
        # traced table row (fori_loop form: dynamic_slice offsets) or a
        # tuple of Python ints (unrolled form: every slice is STATIC, so
        # XLA fuses the shifted reads and batches several pairs per HBM
        # pass). Identical math and accumulation order either way.
        num, den = carry
        shifted = lax.dynamic_slice(
            up, tuple(dec[ax] for ax in range(nd)), ext_q
        )
        diff = base - shifted
        ssd = patch_sum(diff * diff)  # D field over Q
        dist = jnp.maximum(ssd - bias, 0.0) * inv_h2sn
        w = jnp.where(dist <= _DISTANCE_CUTOFF, jnp.exp(-dist), 0.0)
        # forward endpoint: w_t(p) = W[p + d], value u(p + t)
        w_f = lax.dynamic_slice(w, (d,) * nd, shape)
        v_f = lax.dynamic_slice(
            up, tuple(offset + d + dec[ax] for ax in range(nd)), shape
        )
        # reverse endpoint: w_{-t}(p) = W[p - t + d], value u(p - t)
        w_r = lax.dynamic_slice(
            w, tuple(2 * d - dec[ax] for ax in range(nd)), shape
        )
        v_r = lax.dynamic_slice(
            up, tuple(offset + 3 * d - dec[ax] for ax in range(nd)), shape
        )
        return num + (w_f * v_f + w_r * v_r), den + (w_f + w_r)

    n_half = ((2 * d + 1) ** nd - 1) // 2
    carry = (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    mode, chunk = _nlm_mode()
    if mode == "unroll":
        # Full static unroll: one Python loop over the same table, same
        # order — every shift a static slice. Measured DEAD END on chip
        # (OOM at d=11: 17.4 GB of live fused temporaries; 1.34x slower
        # at d=5) — kept for the A/B record.
        for row in table_np:
            carry = body(tuple(int(v) for v in row), carry)
        num, den = carry
    elif mode == "chunk":
        # Static slices with a BOUNDED live set: barrier the carry
        # every `chunk` pairs so XLA fuses within a group but cannot
        # balloon temporaries across the whole table.
        for g, row in enumerate(table_np):
            carry = body(tuple(int(v) for v in row), carry)
            if (g + 1) % chunk == 0:
                carry = lax.optimization_barrier(carry)
        num, den = carry
    else:
        num, den = lax.fori_loop(
            0, n_half, lambda i, c: body(table[i], c), carry
        )
    # the self pair: skimage's t=0 iteration writes both endpoints of
    # (p, p), so the center weight is exactly 2
    return (num + 2.0 * u) / (den + 2.0)


def denoise_nl_means(
    img: Array,
    patch_size: int = 7,
    patch_distance: int = 11,
    h: float = 0.1,
    sigma: float = 0.0,
) -> Array:
    """Non-local means denoising, skimage.restoration.denoise_nl_means
    (fast_mode=True) semantics on a 2-D slice.

    ``h`` is the filtering cut-off (larger = smoother); ``sigma`` the
    expected noise standard deviation — when given, the expected noise
    contribution ``2 sigma^2`` is subtracted from patch distances before
    weighting (Buades et al.). Golden:
    tests/goldens/golden_ops.py::denoise_nl_means.
    """
    return _nl_means_core(img, patch_size, patch_distance, h, sigma)


def denoise_nl_means3d(
    vol: Array,
    patch_size: int = 5,
    patch_distance: int = 5,
    h: float = 0.1,
    sigma: float = 0.0,
) -> Array:
    """Volumetric non-local means on [Z, H, W] — the 3-D sibling
    (skimage's ``_fast_nl_means_denoising_3d``): patches and the search
    window extend across slices, so z-correlated CT noise averages out
    without blurring through-plane structure. Defaults follow skimage's
    3-D guidance (smaller patches: 5^3, search 11^3)."""
    return _nl_means_core(vol, patch_size, patch_distance, h, sigma)


def _tv_chambolle_core(
    image: Array, weight: float, eps: float, max_num_iter: int
) -> Array:
    """N-D Chambolle-2004 dual projection (skimage
    ``_denoise_tv_chambolle_nd``), one ``lax.while_loop``.

    Faithful update order: divergence of the dual field p -> candidate
    ``out`` -> energy E = (|d|^2 + weight * |grad out|) / size -> dual
    ascent step p <- (p - tau g) / (1 + tau/weight |g|), tau = 1/(2 ndim)
    -> stop when |E_prev - E| < eps * E_init (checked from the second
    iteration, exactly like the reference loop). The convergence test is
    a device scalar, so early stopping costs no host round-trip.
    """
    nd = image.ndim
    img = image.astype(jnp.float32)
    size = np.float32(float(np.prod(image.shape)))
    tau = np.float32(1.0 / (2.0 * nd))
    weight = np.float32(weight)
    eps = np.float32(eps)

    def divergence(p: Array) -> Array:
        d = -jnp.sum(p, axis=0)
        for ax in range(nd):
            head = lax.slice_in_dim(p[ax], 0, img.shape[ax] - 1, axis=ax)
            pads = [(1, 0) if a == ax else (0, 0) for a in range(nd)]
            d = d + jnp.pad(head, pads)
        return d

    def gradient(out: Array) -> Array:
        gs = []
        for ax in range(nd):
            diff = lax.slice_in_dim(out, 1, out.shape[ax], axis=ax) - (
                lax.slice_in_dim(out, 0, out.shape[ax] - 1, axis=ax)
            )
            pads = [(0, 1) if a == ax else (0, 0) for a in range(nd)]
            gs.append(jnp.pad(diff, pads))
        return jnp.stack(gs, axis=0)

    def body(carry):
        i, p, _, e_prev, e_init, _ = carry
        d = divergence(p)
        out = img + d
        e = jnp.sum(d * d)
        g = gradient(out)
        norm = jnp.sqrt(jnp.sum(g * g, axis=0))
        e = (e + weight * jnp.sum(norm)) / size
        factor = 1.0 + (tau / weight) * norm
        p = (p - tau * g) / factor[None]
        e_init = jnp.where(i == 0, e, e_init)
        stop = (i > 0) & (jnp.abs(e_prev - e) < eps * e_init)
        return i + 1, p, out, e, e_init, stop

    def cond(carry):
        i, _, _, _, _, stop = carry
        return (i < max_num_iter) & (~stop)

    init = (
        jnp.int32(0),
        jnp.zeros((nd,) + image.shape, jnp.float32),
        img,
        jnp.float32(0.0),
        jnp.float32(0.0),
        jnp.bool_(False),
    )
    _, _, out, _, _, _ = lax.while_loop(cond, body, init)
    return out


def denoise_tv(
    img: Array,
    weight: float = 0.1,
    eps: float = 2e-4,
    max_num_iter: int = 200,
) -> Array:
    """Total-variation denoising, skimage.restoration.denoise_tv_chambolle
    semantics on a 2-D slice. Edge-preserving piecewise-constant prior —
    the classical choice for low-dose CT streak noise. Golden:
    tests/goldens/golden_ops.py::denoise_tv_chambolle."""
    if max_num_iter < 1:
        raise ValueError("max_num_iter must be >= 1")
    return _tv_chambolle_core(img, weight, eps, max_num_iter)


def denoise_tv3d(
    vol: Array,
    weight: float = 0.1,
    eps: float = 2e-4,
    max_num_iter: int = 200,
) -> Array:
    """Volumetric TV denoising on [Z, H, W]: the TV prior couples all
    three axes (skimage's N-D loop), removing z-streaks a per-slice run
    cannot see."""
    if max_num_iter < 1:
        raise ValueError("max_num_iter must be >= 1")
    return _tv_chambolle_core(vol, weight, eps, max_num_iter)


def _gauss_same(x: Array, taps: np.ndarray) -> Array:
    """Separable 'same' ZERO-pad convolution (scipy.signal.convolve
    mode='same' on an odd separable kernel). The Gaussian is symmetric,
    so correlation == convolution and mirror == kernel."""
    y = _conv1d_shifted(x, taps, 0, "constant")
    return _conv1d_shifted(y, taps, 1, "constant")


def richardson_lucy(
    img: Array,
    psf_sigma: float = 1.5,
    psf_size: int = 7,
    num_iter: int = 30,
    clip: bool = True,
    filter_epsilon: float | None = None,
) -> Array:
    """Richardson-Lucy deconvolution with a separable Gaussian PSF,
    skimage.restoration.richardson_lucy semantics (init 0.5, eps=1e-12
    on the denominator, optional ``filter_epsilon`` zeroing of the
    relative blur, final clip to [-1, 1]).

    The registry op models the clinically common blur (focal spot /
    detector PSF) as ``outer(g, g)`` of normalized Gaussian taps; the
    golden runs the reference loop with the same PSF through
    scipy.signal.convolve. Convolutions are separable zero-pad 1-D
    passes — the same shifted-add dataflow as ``gaussian_blur``, so the
    whole restore is 4 * num_iter fused VPU passes.
    """
    if psf_size % 2 != 1:
        raise ValueError("psf_size must be odd")
    if num_iter < 1:
        raise ValueError("num_iter must be >= 1")
    taps = gaussian_kernel1d(float(psf_sigma), psf_size // 2)
    x = img.astype(jnp.float32)
    conv_eps = np.float32(1e-12)

    def body(_, im):
        conv = _gauss_same(im, taps) + conv_eps
        if filter_epsilon:
            rel = jnp.where(
                conv < np.float32(filter_epsilon), 0.0, x / conv
            )
        else:
            rel = x / conv
        return im * _gauss_same(rel, taps)

    im = lax.fori_loop(
        0, num_iter, body, jnp.full(x.shape, 0.5, jnp.float32)
    )
    return jnp.clip(im, -1.0, 1.0) if clip else im


@functools.lru_cache(maxsize=8)
def _rl_psf(psf_sigma: float, psf_size: int) -> np.ndarray:
    """The 2-D PSF the registry op implies (for goldens/diagnostics)."""
    g = gaussian_kernel1d(float(psf_sigma), psf_size // 2).astype(np.float64)
    return np.outer(g, g)


def _ir2tf_np(ir: np.ndarray, shape: tuple) -> np.ndarray:
    """skimage.restoration.uft.ir2tf: zero-pad the impulse response to
    ``shape``, roll each axis so the kernel center lands at the origin
    (circulant convention), real-FFT. Host-side float64."""
    pad = np.zeros(shape, np.float64)
    pad[tuple(slice(0, s) for s in ir.shape)] = ir
    for ax, s in enumerate(ir.shape):
        pad = np.roll(pad, -int(np.floor(s / 2)), axis=ax)
    return np.fft.rfftn(pad, axes=tuple(range(len(shape))))


def _laplacian_ir_np(ndim: int) -> np.ndarray:
    """skimage uft.laplacian impulse response: 2*ndim at the center,
    -1 at each face neighbor (the regularizer of the Wiener filter)."""
    impr = np.zeros((3,) * ndim, np.float64)
    for dim in range(ndim):
        idx = tuple(
            [slice(1, 2)] * dim + [slice(None)]
            + [slice(1, 2)] * (ndim - dim - 1)
        )
        impr[idx] = np.array([-1.0, 0.0, -1.0]).reshape(
            [-1 if i == dim else 1 for i in range(ndim)]
        )
    impr[(slice(1, 2),) * ndim] = 2.0 * ndim
    return impr


@functools.lru_cache(maxsize=16)
def _wiener_filter_np(
    shape: tuple, psf_sigma: float, psf_size: int, balance: float
) -> np.ndarray:
    """The Wiener transfer conj(H) / (|H|^2 + balance*|L|^2) on the
    rfftn grid of ``shape`` — H the Gaussian-PSF transfer, L the
    Laplacian regularizer (skimage.restoration.wiener's default reg).
    Host-side float64 -> complex64 program constant."""
    g = gaussian_kernel1d(float(psf_sigma), psf_size // 2).astype(
        np.float64
    )
    psf = g
    for _ in range(len(shape) - 1):
        psf = np.multiply.outer(psf, g)
    tf = _ir2tf_np(psf, shape)
    reg = _ir2tf_np(_laplacian_ir_np(len(shape)), shape)
    filt = np.conj(tf) / (np.abs(tf) ** 2 + balance * np.abs(reg) ** 2)
    return filt.astype(np.complex64)


def wiener(
    img: Array,
    psf_sigma: float = 1.5,
    psf_size: int = 7,
    balance: float = 0.1,
    clip: bool = True,
) -> Array:
    """Wiener-Hunt deconvolution, skimage.restoration.wiener semantics
    with the same separable-Gaussian PSF convention as
    ``richardson_lucy``: x = irfft( conj(H)/(|H|^2 + balance*|L|^2) *
    rfft(y) ), L the Laplacian regularizer, final clip to [-1, 1]
    (skimage's ``clip=True``; the chain quantize clamps to [0, 1]).
    skimage's unitary FFT normalization cancels in the filter multiply,
    so plain rfftn/irfftn is arithmetic-identical.

    TPU note: the whole transfer is built HOST-side in float64 (shapes
    static under jit) and baked in as one complex64 constant — device
    work is rfftn -> one complex multiply -> irfftn, the same XLA FFT
    path as ops.frequency. A single program vs richardson_lucy's
    4*num_iter conv passes: the fast deblur when a linear restore
    suffices. Golden: tests/goldens/golden_ops.py::wiener_deconv
    (float64 numpy end to end). FFT = global extent: rejected by
    spatial/z sharding; batch-shard instead.
    """
    if psf_size % 2 != 1:
        raise ValueError("psf_size must be odd")
    if balance <= 0:
        raise ValueError("balance must be > 0")
    x = img.astype(jnp.float32)
    filt = _wiener_filter_np(
        x.shape, float(psf_sigma), int(psf_size), float(balance)
    )
    axes = tuple(range(x.ndim))
    out = jnp.fft.irfftn(
        jnp.fft.rfftn(x, axes=axes) * jnp.asarray(filt),
        s=x.shape, axes=axes,
    )
    return jnp.clip(out, -1.0, 1.0) if clip else out


def wiener3d(
    vol: Array,
    psf_sigma: float = 1.5,
    psf_size: int = 7,
    balance: float = 0.1,
    clip: bool = True,
) -> Array:
    """Volumetric Wiener deconvolution on [Z, H, W]: isotropic 3-D
    Gaussian PSF + 3-D Laplacian regularizer (``wiener`` is
    n-dimensional; one z-consistent restore). Golden:
    tests/goldens/golden_ops.py::wiener_deconv (n-d)."""
    return wiener(vol, psf_sigma, psf_size, balance, clip)


# ---------------------------------------------------------------------------
# Perona-Malik anisotropic diffusion
# ---------------------------------------------------------------------------


def _pm_step(
    ext: Array, kappa: float, gamma: float, option: int,
    spacing: tuple,
) -> Array:
    """One Perona-Malik update for an array already extended by ONE
    edge-replicated position on AXIS 0 (the sharded axis); the other
    axes are padded here. Returns the interior (original) shape.

    The scheme is the classic explicit discretization (Perona & Malik
    1990, eq. 8; the medpy/Kovesi ``anisodiff`` formulation): forward
    differences per axis, conduction ``g`` evaluated on each difference,
    divergence by backward difference, zero-flux boundaries. On an
    edge-replicated pad the boundary fluxes vanish identically, so
    interior arithmetic is position-independent — the band-sharded form
    (halo_extend_rows per ITERATION) is bit-exact vs unsharded.

    All ops are elementwise VPU dataflow with static shapes; XLA fuses
    each iteration into a handful of passes. No gathers, no transposes.
    """
    nd = ext.ndim
    z = jnp.pad(ext, ((0, 0),) + ((1, 1),) * (nd - 1), mode="edge")
    out = ext[(slice(1, -1),) + (slice(None),) * (nd - 1)]
    upd = jnp.zeros_like(out)
    inv_k2 = np.float32(1.0 / (float(kappa) * float(kappa)))
    g32 = np.float32(gamma)
    for ax in range(nd):
        s = np.float32(1.0 / float(spacing[ax]))
        d = jnp.diff(z, axis=ax) * s
        if option == 1:
            g = jnp.exp(-(d * d) * inv_k2)
        else:
            g = 1.0 / (1.0 + (d * d) * inv_k2)
        flux = (g32 * s) * g * d
        div = jnp.diff(flux, axis=ax)
        sl = tuple(
            slice(None) if a == ax else slice(1, -1) for a in range(nd)
        )
        upd = upd + div[sl]
    return out + upd


def _pm_run(
    x: Array, niter: int, kappa: float, gamma: float, option: int,
    spacing: tuple,
) -> Array:
    if niter < 1:
        raise ValueError("niter must be >= 1")
    if option not in (1, 2):
        raise ValueError("option must be 1 (exponential) or 2 (inverse)")
    x = x.astype(jnp.float32)
    pad0 = ((1, 1),) + ((0, 0),) * (x.ndim - 1)

    def body(_, v):
        return _pm_step(
            jnp.pad(v, pad0, mode="edge"), kappa, gamma, option, spacing
        )

    return lax.fori_loop(0, niter, body, x)


def anisotropic_diffusion(
    img: Array,
    niter: int = 10,
    kappa: float = 50.0,
    gamma: float = 0.1,
    option: int = 1,
) -> Array:
    """Perona-Malik edge-preserving smoothing on a 2-D slice.

    Diffuses WITHIN homogeneous regions while the conduction function
    ``g`` shuts transport across strong gradients — the classical
    speckle/quantum-noise reducer for ultrasound and low-dose X-ray
    (option 1: ``g = exp(-(|grad|/kappa)^2)`` favors high-contrast
    edges; option 2: ``g = 1/(1 + (|grad|/kappa)^2)`` favors wide
    regions). ``kappa`` is the gradient magnitude (in INTENSITY units —
    for [0, 1] inputs use ~0.02-0.2) below which diffusion proceeds;
    ``gamma`` the step size (stability: <= 1/4 in 2-D, <= 1/6 in 3-D).

    Semantics: the medpy/Kovesi ``anisodiff`` explicit scheme with
    zero-flux boundaries, ``niter`` fixed iterations (no data-dependent
    stopping — one static XLA program). Golden:
    tests/goldens/golden_ops.py::anisotropic_diffusion.
    """
    return _pm_run(img, int(niter), kappa, gamma, int(option),
                   (1.0,) * img.ndim)


def anisotropic_diffusion3d(
    vol: Array,
    niter: int = 10,
    kappa: float = 50.0,
    gamma: float = 0.1,
    option: int = 1,
    voxelspacing: tuple | None = None,
) -> Array:
    """Volumetric Perona-Malik diffusion on [Z, H, W]: the conduction
    couples all three axes, so z-streaks and in-plane noise smooth
    together. ``voxelspacing`` (dz, dy, dx) scales each axis's
    differences for anisotropic CT grids (the medpy convention:
    gradient and divergence both divide by the spacing) — pair with
    the DICOM reader's ``VolumeMeta.spacing``. Stability:
    ``gamma * sum(1/s^2) <= 1/2``."""
    if voxelspacing is None:
        sp = (1.0,) * 3
    else:
        sp = tuple(float(v) for v in voxelspacing)
        if len(sp) != 3 or any(v <= 0 for v in sp):
            raise ValueError(
                "voxelspacing must be 3 positive numbers (dz, dy, dx)"
            )
    return _pm_run(vol, int(niter), kappa, gamma, int(option), sp)


# ---------------------------------------------------------------------------
# SRAD — speckle-reducing anisotropic diffusion (Yu & Acton 2002)
# ---------------------------------------------------------------------------


def _srad_step(ext: Array, dt: float, q0t, eps: float) -> Array:
    """One SRAD update for an array edge-extended by TWO positions on
    AXIS 0 (columns pad here). Returns the interior [h, w].

    Discretization (Yu & Acton, IEEE TIP 11(11) 2002, eqs. 57-61):
    one-sided 4-neighbor differences, the instantaneous coefficient of
    variation ``q^2 = (G2/2 - L^2/16) / (1 + L/4)^2`` with
    ``G2 = |grad I|^2 / I^2`` and ``L = lap I / I``, diffusivity
    ``c = 1 / (1 + (q^2 - q0^2) / (q0^2 (1 + q0^2)))`` clipped to
    [0, 1], divergence ``c_S dS + c dN + c_E dE + c dW``. Boundary
    values (including the virtual c ring) are computed from the
    edge-REPLICATED image — one consistent rule for the unsharded op,
    the golden, and the band form (which swaps the axis-0 pad for a
    2-row halo exchange per iteration, bit-exact)."""
    zz = jnp.pad(ext, ((0, 0), (2, 2)), mode="edge")
    inner = zz[1:-1, 1:-1]  # [h+2, w+2]
    d_n = zz[:-2, 1:-1] - inner
    d_s = zz[2:, 1:-1] - inner
    d_w = zz[1:-1, :-2] - inner
    d_e = zz[1:-1, 2:] - inner
    ii = inner + np.float32(eps)
    g2 = (d_n * d_n + d_s * d_s + d_w * d_w + d_e * d_e) / (ii * ii)
    el = (d_n + d_s + d_w + d_e) / ii
    q2 = (np.float32(0.5) * g2 - np.float32(1.0 / 16.0) * (el * el)) / (
        (1.0 + np.float32(0.25) * el) ** 2 + np.float32(1e-12)
    )
    q02 = q0t * q0t
    c = 1.0 / (1.0 + (q2 - q02) / (q02 * (1.0 + q02) + np.float32(1e-12)))
    c = jnp.clip(c, 0.0, 1.0)
    cc = c[1:-1, 1:-1]
    div = (
        c[2:, 1:-1] * d_s[1:-1, 1:-1]
        + cc * d_n[1:-1, 1:-1]
        + c[1:-1, 2:] * d_e[1:-1, 1:-1]
        + cc * d_w[1:-1, 1:-1]
    )
    return ext[2:-2] + np.float32(dt / 4.0) * div


def srad(
    img: Array,
    niter: int = 15,
    dt: float = 0.15,
    q0: float = 1.0,
    rho: float = 0.2,
    eps: float = 1e-6,
) -> Array:
    """Speckle-reducing anisotropic diffusion (Yu & Acton 2002) — the
    ultrasound-specific diffusion: where Perona-Malik gates on the
    GRADIENT, SRAD gates on the instantaneous coefficient of variation
    (local std / local mean), the statistic that actually separates
    fully developed speckle (q ~ q0) from resolvable edges (q >> q0).
    ``q0`` is the speckle scale at t=0, decayed as
    ``q0 * exp(-rho * t)`` per iteration (the paper's homogeneous-
    region decay; a DETERMINISTIC schedule — no image-wide statistics,
    so chains stay band-shardable via the per-iteration 2-row halo).
    ``dt`` is the step size (stability <= 0.25). Input is assumed
    non-negative ([0, 1] pipeline images; ``eps`` guards the
    divisions). Golden: tests/goldens/golden_ops.py::srad."""
    if niter < 1:
        raise ValueError("niter must be >= 1")
    if not 0.0 < dt <= 0.25:
        raise ValueError(f"dt must be in (0, 0.25], got {dt}")
    if q0 <= 0 or rho < 0:
        raise ValueError("q0 must be > 0 and rho >= 0")
    x = img.astype(jnp.float32)

    def body(t, v):
        q0t = np.float32(q0) * jnp.exp(-np.float32(rho) * t.astype(jnp.float32))
        return _srad_step(
            jnp.pad(v, ((2, 2), (0, 0)), mode="edge"), dt, q0t, eps
        )

    return lax.fori_loop(0, niter, body, x)


def _srad_step3d(ext: Array, dt: float, q0t, eps: float) -> Array:
    """One volumetric SRAD update for a [z+4, H, W] slab extended by
    TWO z positions (y/x pad here): the 2-D step's functional form
    with 6-neighbor sums — the common volumetric extension. Returns
    the interior [z, H, W]."""
    zz = jnp.pad(ext, ((0, 0), (2, 2), (2, 2)), mode="edge")
    c0 = zz[1:-1, 1:-1, 1:-1]
    d_u = zz[:-2, 1:-1, 1:-1] - c0  # z-1
    d_d = zz[2:, 1:-1, 1:-1] - c0   # z+1
    d_n = zz[1:-1, :-2, 1:-1] - c0
    d_s = zz[1:-1, 2:, 1:-1] - c0
    d_w = zz[1:-1, 1:-1, :-2] - c0
    d_e = zz[1:-1, 1:-1, 2:] - c0
    ii = c0 + np.float32(eps)
    g2 = (d_u * d_u + d_d * d_d + d_n * d_n + d_s * d_s
          + d_w * d_w + d_e * d_e) / (ii * ii)
    el = (d_u + d_d + d_n + d_s + d_w + d_e) / ii
    q2 = (np.float32(0.5) * g2 - np.float32(1.0 / 16.0) * (el * el)) / (
        (1.0 + np.float32(0.25) * el) ** 2 + np.float32(1e-12)
    )
    q02 = q0t * q0t
    c = 1.0 / (1.0 + (q2 - q02) / (q02 * (1.0 + q02) + np.float32(1e-12)))
    c = jnp.clip(c, 0.0, 1.0)
    cc = c[1:-1, 1:-1, 1:-1]
    inr = (slice(1, -1),) * 3
    div = (
        c[2:, 1:-1, 1:-1] * d_d[inr]
        + cc * d_u[inr]
        + c[1:-1, 2:, 1:-1] * d_s[inr]
        + cc * d_n[inr]
        + c[1:-1, 1:-1, 2:] * d_e[inr]
        + cc * d_w[inr]
    )
    return ext[2:-2] + np.float32(dt / 6.0) * div


def srad3d(
    vol: Array,
    niter: int = 15,
    dt: float = 0.15,
    q0: float = 1.0,
    rho: float = 0.2,
    eps: float = 1e-6,
) -> Array:
    """Volumetric SRAD on [Z, H, W] (3-D echocardiography / 3-D
    ultrasound): the 2-D op's ICOV gating with 6-neighbor coupling, so
    speckle smooths consistently ACROSS slices while organ boundaries
    hold in all three axes. Same deterministic q0 decay schedule —
    z-band-shardable via the per-iteration 2-slab halo. Step scale
    dt/6 (one per neighbor; stability <= 0.25). Golden:
    tests/goldens/golden_ops.py::srad3d."""
    if niter < 1:
        raise ValueError("niter must be >= 1")
    if not 0.0 < dt <= 0.25:
        raise ValueError(f"dt must be in (0, 0.25], got {dt}")
    if q0 <= 0 or rho < 0:
        raise ValueError("q0 must be > 0 and rho >= 0")
    x = vol.astype(jnp.float32)

    def body(t, v):
        q0t = np.float32(q0) * jnp.exp(
            -np.float32(rho) * t.astype(jnp.float32)
        )
        return _srad_step3d(
            jnp.pad(v, ((2, 2), (0, 0), (0, 0)), mode="edge"),
            dt, q0t, eps,
        )

    return lax.fori_loop(0, niter, body, x)

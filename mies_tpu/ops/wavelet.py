"""Wavelet shrinkage denoising: ``denoise_wavelet`` + ``estimate_sigma``.

The reference declares scikit-image 0.26 (`/root/reference/pyproject.toml:12`);
``skimage.restoration.denoise_wavelet`` / ``estimate_sigma`` are its
wavelet-domain denoising surface (BayesShrink / VisuShrink thresholding
over a PyWavelets multilevel decomposition). This module rebuilds that
TPU-first:

  * the multilevel separable DWT/IDWT is pure static-shape dataflow —
    per-axis shifted-add FIR passes (the ``_conv1d_shifted`` family's
    design) followed by stride-2 ``lax.slice_in_dim`` downsampling; the
    inverse runs the two filter polyphases as two small FIR passes and
    interleaves them with one reshape. No gathers, no dynamic shapes:
    every level's coefficient extents are computed at trace time with
    PyWavelets' length formulas, so XLA sees a fixed pipeline of fused
    VPU passes.
  * thresholds are device scalars (BayesShrink's per-subband noise
    statistic, the MAD sigma estimate) — the whole denoise is ONE jitted
    program with zero host syncs.

Semantics follow skimage 0.26 / PyWavelets exactly (symmetric signal
extension, ``coeffs[1::2]`` analysis phase, ``[flen-2:]`` synthesis
crop, skimage's default level count ``max(min_axis_max_level - 3, 1)``,
the nonzero-masked MAD estimator, BayesShrink's ``var/sqrt(dvar-var)``
subband thresholds, VisuShrink's universal threshold); the NumPy golden
(tests/goldens/golden_ops.py::denoise_wavelet) is an independent
``np.convolve``-based transcription, and
``tools/verify_skimage_golden.py`` closes the loop against the real
libraries in any environment that has them.

Only even-length orthogonal wavelets ship (haar/db1..db4, sym4 — the
polyphase interleave assumes even filter length); skimage's default is
db1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

# scaling (reconstruction lowpass) filters, PyWavelets coefficient
# tables; dec/rec hi/lo derive from these by the standard QMF relations
_SQ2 = math.sqrt(2.0)
_S3 = math.sqrt(3.0)
_WAVELETS: dict[str, tuple[float, ...]] = {
    "haar": (1.0 / _SQ2, 1.0 / _SQ2),
    "db2": (
        (1.0 + _S3) / (4.0 * _SQ2),
        (3.0 + _S3) / (4.0 * _SQ2),
        (3.0 - _S3) / (4.0 * _SQ2),
        (1.0 - _S3) / (4.0 * _SQ2),
    ),
    "db3": (
        0.3326705529509569,
        0.8068915093133388,
        0.4598775021193313,
        -0.13501102001039084,
        -0.08544127388224149,
        0.035226291882100656,
    ),
    "db4": (
        0.23037781330885523,
        0.7148465705525415,
        0.6308807679295904,
        -0.02798376941698385,
        -0.18703481171888114,
        0.030841381835986965,
        0.032883011666982945,
        -0.010597401784997278,
    ),
    "sym4": (
        0.032223100604042702,
        -0.012603967262037833,
        -0.099219543576847216,
        0.29785779560527736,
        0.80373875180591614,
        0.49761866763201545,
        -0.02963552764599851,
        -0.075765714789273325,
    ),
}
_WAVELETS["db1"] = _WAVELETS["haar"]

# norm.ppf(0.75): the Gaussian MAD -> sigma conversion constant
_MAD_DENOM = 0.6744897501960817


def wavelet_filters(name: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(dec_lo, dec_hi, rec_lo, rec_hi) for a named wavelet, PyWavelets'
    QMF conventions: rec_lo = scaling filter; dec_lo = rec_lo[::-1];
    rec_hi[k] = (-1)^k rec_lo[flen-1-k]; dec_hi = rec_hi[::-1]."""
    try:
        rec_lo = np.asarray(_WAVELETS[name], np.float64)
    except KeyError:
        raise ValueError(
            f"unknown wavelet {name!r}; supported: "
            f"{sorted(_WAVELETS)} (even-length orthogonal families)"
        ) from None
    flen = len(rec_lo)
    rec_hi = np.array(
        [(-1.0) ** k * rec_lo[flen - 1 - k] for k in range(flen)]
    )
    return rec_lo[::-1].copy(), rec_hi[::-1].copy(), rec_lo, rec_hi


def dwt_max_level(n: int, flen: int) -> int:
    """PyWavelets ``dwt_max_level``: floor(log2(n / (flen - 1)))."""
    if n < flen - 1 or n < flen:
        return 0
    return int(math.floor(math.log2(n / (flen - 1))))


def default_levels(shape: tuple[int, ...], flen: int) -> int:
    """skimage ``_wavelet_threshold`` default: min-axis max level - 3,
    floored at 1."""
    lv = min(dwt_max_level(int(n), flen) for n in shape)
    return max(lv - 3, 1)


def _vconv(xe: Array, taps: np.ndarray, axis: int, out_len: int) -> Array:
    """'valid' convolution along ``axis`` of the already-extended signal
    with ``taps``: out[m] = sum_j taps[j] * xe[m + flen-1 - j]. Explicit
    shifted adds in a fixed order — the repo's size-independent FIR
    idiom (bit-identical regardless of surrounding padding)."""
    flen = len(taps)
    acc = None
    for j in range(flen):
        c = np.float32(taps[j])
        sl = lax.slice_in_dim(xe, flen - 1 - j, flen - 1 - j + out_len,
                              axis=axis)
        acc = c * sl if acc is None else acc + c * sl
    return acc


def _dwt_axis(
    x: Array, axis: int, dec_lo: np.ndarray, dec_hi: np.ndarray
) -> tuple[Array, Array]:
    """One analysis level along one axis, PyWavelets mode='symmetric':
    pad flen-1 each side, valid-convolve, keep phase [1::2]."""
    flen = len(dec_lo)
    n = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (flen - 1, flen - 1)
    xe = jnp.pad(x, pads, mode="symmetric")
    full = n + flen - 1
    out_len = (n + flen - 1) // 2
    a = _vconv(xe, dec_lo, axis, full)
    d = _vconv(xe, dec_hi, axis, full)
    a = lax.slice_in_dim(a, 1, 2 * out_len, stride=2, axis=axis)
    d = lax.slice_in_dim(d, 1, 2 * out_len, stride=2, axis=axis)
    return a, d


def _idwt_axis(
    a: Array,
    d: Array,
    axis: int,
    rec_lo: np.ndarray,
    rec_hi: np.ndarray,
    out_len: int,
) -> Array:
    """One synthesis level along one axis. The upsample-convolve is run
    as its two polyphases (y[2m] uses taps f[0::2], y[2m+1] f[1::2] —
    each a plain small FIR over the coefficients), interleaved with one
    reshape: zero static-shape waste, no scatter. Standard PyWavelets
    crop ``[flen-2 : flen-2 + out_len]`` (waverecn's end-trim when the
    approximation ran one longer than the detail is folded into
    ``out_len``)."""
    flen = len(rec_lo)
    if flen % 2 != 0:
        raise ValueError("even-length filters only")
    L = a.shape[axis]
    half = flen // 2
    # full conv of the zero-upsampled signal, split by output parity:
    # parity p taps are f[p::2] (half of them); full-conv length per
    # parity = L + half - 1
    plen = L + half - 1
    pads = [(0, 0)] * a.ndim
    pads[axis] = (half - 1, half - 1)

    def parity(c: Array, taps: np.ndarray) -> Array:
        ce = jnp.pad(c, pads)  # zero pad: full conv via the valid helper
        return _vconv(ce, taps, axis, plen)

    y_even = parity(a, rec_lo[0::2]) + parity(d, rec_hi[0::2])
    y_odd = parity(a, rec_lo[1::2]) + parity(d, rec_hi[1::2])
    # interleave parities along axis: [..., plen, 2, ...] -> 2*plen
    ax = axis % a.ndim
    st = jnp.stack([y_even, y_odd], axis=ax + 1)
    shape = list(y_even.shape)
    shape[ax] = 2 * plen
    y = st.reshape(shape)
    return lax.slice_in_dim(y, flen - 2, flen - 2 + out_len, axis=ax)


def wavedec_nd(
    x: Array, wavelet: str, level: int
) -> tuple[Array, list[dict[str, Array]]]:
    """Multilevel N-D DWT (PyWavelets ``wavedecn``, mode='symmetric').

    Returns (approximation, details) with details ordered COARSEST
    FIRST (PyWavelets' order); each level is a dict keyed by one
    'a'/'d' character per axis ('d' * ndim = diagonal), the all-'a'
    key being the next level's input."""
    dec_lo, dec_hi, _, _ = wavelet_filters(wavelet)
    nd = x.ndim
    a = x
    details: list[dict[str, Array]] = []
    for _ in range(level):
        bands: dict[str, Array] = {"": a}
        for ax in range(nd):
            nxt: dict[str, Array] = {}
            for key, arr in bands.items():
                lo, hi = _dwt_axis(arr, ax, dec_lo, dec_hi)
                nxt[key + "a"] = lo
                nxt[key + "d"] = hi
            bands = nxt
        a = bands.pop("a" * nd)
        details.append(bands)
    details.reverse()
    return a, details


def waverec_nd(
    a: Array,
    details: list[dict[str, Array]],
    wavelet: str,
    out_shape: tuple[int, ...],
) -> Array:
    """Multilevel inverse of ``wavedec_nd`` cropped to ``out_shape``."""
    _, _, rec_lo, rec_hi = wavelet_filters(wavelet)
    nd = a.ndim
    for li, bands in enumerate(details):
        ref = bands["d" * nd]
        # waverecn end-trim: approximation may run 1 longer per axis
        if a.shape != ref.shape:
            a = a[tuple(slice(0, s) for s in ref.shape)]
        target = (
            out_shape
            if li == len(details) - 1
            else details[li + 1]["d" * nd].shape
        )
        merged: dict[str, Array] = dict(bands)
        merged["a" * nd] = a
        for ax in range(nd - 1, -1, -1):
            nxt: dict[str, Array] = {}
            done: set[str] = set()
            for key in merged:
                stem = key[:ax]
                if stem in done:
                    continue
                done.add(stem)
                lo = merged[stem + "a" + key[ax + 1:]]
                hi = merged[stem + "d" + key[ax + 1:]]
                # reconstruct to the next level's extent along this
                # axis (standard crop; may be one less than 2L-flen+2)
                want = min(2 * lo.shape[ax] - len(rec_lo) + 2, target[ax])
                nxt[stem] = _idwt_axis(lo, hi, ax, rec_lo, rec_hi, want)
            merged = nxt
        a = merged[""]
    return a


def _masked_median_abs(d: Array) -> Array:
    """median(|d|) over the NONZERO entries (skimage ``_sigma_est_dwt``):
    one sort with zeros pushed to +inf, then the count-indexed middle
    (np.median's even-count average). Returns 0 when all entries are 0."""
    v = jnp.abs(d.reshape(-1))
    nz = v > 0
    cnt = jnp.sum(nz.astype(jnp.int32))
    s = jnp.sort(jnp.where(nz, v, jnp.inf))
    hi = jnp.take(s, jnp.maximum(cnt // 2, 0), mode="clip")
    lo = jnp.take(s, jnp.maximum((cnt - 1) // 2, 0), mode="clip")
    med = 0.5 * (lo + hi)
    return jnp.where(cnt > 0, med, 0.0)


def estimate_sigma(img: Array, wavelet: str = "db2") -> Array:
    """Robust Gaussian noise-sigma estimate
    (skimage.restoration.estimate_sigma): MAD of the finest-level
    diagonal detail coefficients / norm.ppf(0.75). skimage's standalone
    estimator decomposes with db2 (its hardcoded choice) — the
    ``sigma=None`` branch of ``denoise_wavelet`` instead reuses the
    denoising wavelet's own finest subband, as skimage does. Returns a
    device scalar — usable inside jitted pipelines."""
    dec_lo, dec_hi, _, _ = wavelet_filters(wavelet)
    bands: dict[str, Array] = {"": img.astype(jnp.float32)}
    for ax in range(img.ndim):
        nxt: dict[str, Array] = {}
        for key, arr in bands.items():
            lo, hi = _dwt_axis(arr, ax, dec_lo, dec_hi)
            nxt[key + "a"] = lo
            nxt[key + "d"] = hi
        bands = nxt
    return _masked_median_abs(bands["d" * img.ndim]) / np.float32(_MAD_DENOM)


def _soft(x: Array, t: Array) -> Array:
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def _hard(x: Array, t: Array) -> Array:
    return jnp.where(jnp.abs(x) > t, x, 0.0)


def _denoise_wavelet_core(
    img: Array,
    sigma: float | None,
    wavelet: str,
    mode: str,
    wavelet_levels: int | None,
    method: str,
) -> Array:
    if method not in ("BayesShrink", "VisuShrink"):
        raise ValueError(
            f"method must be 'BayesShrink' or 'VisuShrink', got {method!r}"
        )
    if mode not in ("soft", "hard"):
        raise ValueError(f"mode must be 'soft' or 'hard', got {mode!r}")
    dec_lo, _, _, _ = wavelet_filters(wavelet)
    flen = len(dec_lo)
    x = img.astype(jnp.float32)
    level = (
        int(wavelet_levels)
        if wavelet_levels is not None
        else default_levels(x.shape, flen)
    )
    if level < 1:
        raise ValueError("wavelet_levels must be >= 1")
    max_lv = min(dwt_max_level(int(n), flen) for n in x.shape)
    if level > max_lv:
        raise ValueError(
            f"wavelet_levels={level} exceeds the maximum decomposition "
            f"level {max_lv} for shape {tuple(x.shape)} and {wavelet}"
        )
    a, details = wavedec_nd(x, wavelet, level)
    nd = x.ndim
    if sigma is None:
        sig = _masked_median_abs(details[-1]["d" * nd]) / np.float32(
            _MAD_DENOM
        )
    else:
        sig = jnp.float32(sigma)
    shrink = _soft if mode == "soft" else _hard
    if method == "VisuShrink":
        thresh = sig * np.float32(math.sqrt(2.0 * math.log(x.size)))
        details = [
            {k: shrink(v, thresh) for k, v in lv.items()} for lv in details
        ]
    else:  # BayesShrink: per-subband threshold var / sqrt(dvar - var)
        var = sig * sig
        eps = np.float32(np.finfo(np.float32).eps)

        def bayes(v: Array) -> Array:
            dvar = jnp.mean(v * v)
            return shrink(v, var / jnp.sqrt(jnp.maximum(dvar - var, eps)))

        details = [{k: bayes(v) for k, v in lv.items()} for lv in details]
    return waverec_nd(a, details, wavelet, tuple(x.shape))


def denoise_wavelet(
    img: Array,
    sigma: float | None = None,
    wavelet: str = "db1",
    mode: str = "soft",
    wavelet_levels: int | None = None,
    method: str = "BayesShrink",
) -> Array:
    """Wavelet shrinkage denoising on a 2-D slice,
    skimage.restoration.denoise_wavelet semantics (float image path:
    no sigma rescaling). ``sigma=None`` estimates the noise in-graph
    from the finest diagonal subband (the MAD estimator). Golden:
    tests/goldens/golden_ops.py::denoise_wavelet."""
    return _denoise_wavelet_core(
        img, sigma, wavelet, mode, wavelet_levels, method
    )


def denoise_wavelet3d(
    vol: Array,
    sigma: float | None = None,
    wavelet: str = "db1",
    mode: str = "soft",
    wavelet_levels: int | None = None,
    method: str = "BayesShrink",
) -> Array:
    """Volumetric wavelet shrinkage on [Z, H, W]: the separable 3-D DWT
    couples all axes, so z-correlated CT noise lands in the mixed
    subbands and thresholds away without blurring through-plane
    structure."""
    return _denoise_wavelet_core(
        vol, sigma, wavelet, mode, wavelet_levels, method
    )


def cycle_spin(
    img: Array,
    max_shifts: int = 3,
    shift_steps: int = 1,
    sigma: float | None = None,
    wavelet: str = "db1",
    mode: str = "soft",
    wavelet_levels: int | None = None,
    method: str = "BayesShrink",
) -> Array:
    """Shift-invariant (cycle-spun) wavelet denoising:
    skimage.restoration.cycle_spin specialized to its canonical
    ``func=denoise_wavelet`` use. The decimated DWT is not
    shift-invariant, so thresholding leaves grid-locked ringing;
    averaging the denoiser over circularly shifted copies

        out = mean_s unroll_s( denoise_wavelet( roll_s(img) ) ),
        s in {0, shift_steps, ...} x {0, shift_steps, ...} <= max_shifts

    (Coifman & Donoho translation-invariant denoising) removes it.

    TPU-first: the whole shift grid runs as ONE vmapped program — the
    S = ((max_shifts // shift_steps) + 1)^2 shifted copies stack on a
    leading axis so every DWT level batches; rolls are static
    (shift table is host-side), and the mean reduces the stack on
    device. skimage instead loops Python-side per shift.
    """
    if max_shifts < 0:
        raise ValueError("max_shifts must be >= 0")
    if shift_steps < 1:
        raise ValueError("shift_steps must be >= 1")
    shifts = [
        (dy, dx)
        for dy in range(0, max_shifts + 1, shift_steps)
        for dx in range(0, max_shifts + 1, shift_steps)
    ]

    rolled = jnp.stack(
        [jnp.roll(img, s, axis=(0, 1)) for s in shifts]
    )  # [S, H, W], static rolls
    den = jax.vmap(
        lambda x: _denoise_wavelet_core(
            x, sigma, wavelet, mode, wavelet_levels, method
        )
    )(rolled)  # ONE batched DWT over the whole shift grid
    unrolled = jnp.stack(
        [
            jnp.roll(den[i], (-dy, -dx), axis=(0, 1))
            for i, (dy, dx) in enumerate(shifts)
        ]
    )
    return jnp.mean(unrolled, axis=0)


def cycle_spin_batched(
    imgs: Array,
    max_shifts: int = 3,
    shift_steps: int = 1,
    sigma: float | None = None,
    wavelet: str = "db1",
    mode: str = "soft",
    wavelet_levels: int | None = None,
    method: str = "BayesShrink",
) -> Array:
    """``cycle_spin`` on a [B, H, W] stack with the shift grid FLATTENED
    into the leading batch: [S, B, H, W] -> [S*B, H, W] before the
    vmapped denoise, instead of the nested [B, S, H, W] an outer vmap
    of ``cycle_spin`` produces.

    Chip A/B (benchmarks/cyclespin_ab.py, r5): the nested layout ran
    112.4 ms/b32 512^2 at S=16 while the 16x-flat-stack denoise alone
    is 73.1 ms and the rolls+mean leg 4.1 ms — the nested vmap was
    wasting ~35 ms of pure layout overhead. This form measures
    ~stack+rollonly, and 73.1 < 16 x 5.27 (single-denoise leg), so the
    shift grid even shares work; the op is CLOSED at ~16 denoises.
    Same math as ``cycle_spin`` per slice (skimage partial-shift
    contract; the SWT identity cannot apply to the 4x4 partial grid).
    """
    if max_shifts < 0:
        raise ValueError("max_shifts must be >= 0")
    if shift_steps < 1:
        raise ValueError("shift_steps must be >= 1")
    shifts = [
        (dy, dx)
        for dy in range(0, max_shifts + 1, shift_steps)
        for dx in range(0, max_shifts + 1, shift_steps)
    ]
    b, h, w = imgs.shape
    rolled = jnp.concatenate(
        [jnp.roll(imgs, s, axis=(1, 2)) for s in shifts]
    )  # [S*B, H, W], shift-major so the reshape back is a view
    den = jax.vmap(
        lambda x: _denoise_wavelet_core(
            x, sigma, wavelet, mode, wavelet_levels, method
        )
    )(rolled).reshape(len(shifts), b, h, w)
    unrolled = jnp.stack(
        [
            jnp.roll(den[i], (-dy, -dx), axis=(1, 2))
            for i, (dy, dx) in enumerate(shifts)
        ]
    )
    return jnp.mean(unrolled, axis=0)

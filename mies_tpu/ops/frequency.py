"""Frequency-domain filters: Butterworth low/high-pass + homomorphic.

Semantics mirror the reference's pinned dependency surface (SURVEY.md
section 2b D6): ``butterworth`` is a faithful transcription of
skimage.filters.butterworth 0.26 (the version the reference locks,
/root/reference/pyproject.toml:12) — same frequency grid
(per-axis ``arange(-(d-1)//2, (d-1)//2+1) / (d*cutoff)`` squared and
ifftshifted, half-spectrum on the real-FFT axis), same
``1/(1 + q^(2*order))`` squared-Butterworth transfer with the optional
sqrt, same edge-pad ``npad`` handling. The golden
(tests/goldens/golden_ops.py::butterworth_filter) is the same
transcription in float64 NumPy, so the test pins the jnp FFT path
against an independent arithmetic route.

``homomorphic`` is the classic log-domain illumination/reflectance
split (Gonzalez & Woods, Digital Image Processing section 4.9 — no
skimage counterpart): gains interpolated between ``low_gain`` at DC and
``high_gain`` at high frequency by the SAME Butterworth high-pass
transfer, applied to log(img + eps), then exponentiated back and
clipped. X-ray/mammography use: flatten slow illumination gradients
while boosting local tissue contrast in one program.

TPU notes: the transfer function is built HOST-side in float64 (shapes
are static under jit) and baked into the program as an f32 constant, so
the device work is exactly rfftn -> one complex-by-real multiply ->
irfftn, which XLA:TPU lowers onto its native FFT path (matmul-backed)
and fuses the elementwise epilogues into. Both ops are GLOBAL-extent
(every output pixel depends on every input pixel), so they are rejected
by spatial/z-band sharding (mies_tpu.parallel.halo /
parallel.volume_shard) — batch sharding composes fine.

All 2-D functions take float32 [H, W] in [0, 1]; 3-D take [Z, H, W].
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import Array


@functools.lru_cache(maxsize=64)
def butterworth_transfer(
    shape: tuple,
    cutoff_frequency_ratio: float,
    order: float,
    high_pass: bool,
    squared_butterworth: bool = True,
) -> np.ndarray:
    """The n-D Butterworth transfer on the rfftn grid of ``shape``
    (host-side, float64 -> float32; skimage
    _get_nd_butterworth_filter transcription, see module docstring).

    Returned shape is ``shape`` with the last axis halved to
    ``d//2 + 1`` (the real-FFT half spectrum).
    """
    ranges = []
    for d in shape:
        axis = (
            np.arange(-(d - 1) // 2, (d - 1) // 2 + 1, dtype=np.float64)
            / (d * cutoff_frequency_ratio)
        )
        ranges.append(np.fft.ifftshift(axis**2))
    # real FFT: the last axis keeps only frequencies 0..d/2
    ranges[-1] = ranges[-1][: shape[-1] // 2 + 1]
    q2 = functools.reduce(
        np.add, np.meshgrid(*ranges, indexing="ij", sparse=True)
    )
    q2 = np.power(q2, order)
    wfilt = 1.0 / (1.0 + q2)
    if high_pass:
        wfilt = wfilt * q2
    if not squared_butterworth:
        np.sqrt(wfilt, out=wfilt)
    return wfilt.astype(np.float32)


def _validate_cutoff(cutoff_frequency_ratio: float) -> None:
    if not 0.0 < float(cutoff_frequency_ratio) <= 0.5:
        raise ValueError(
            "cutoff_frequency_ratio must be in (0, 0.5] (a fraction of "
            f"the sampling rate), got {cutoff_frequency_ratio}"
        )


def _apply_transfer(x: Array, wfilt: np.ndarray) -> Array:
    """rfftn -> multiply by the real transfer -> irfftn, same shape."""
    axes = tuple(range(x.ndim))
    spec = jnp.fft.rfftn(x, axes=axes)
    return jnp.fft.irfftn(spec * jnp.asarray(wfilt), s=x.shape, axes=axes)


def _butterworth_nd(
    x: Array,
    cutoff_frequency_ratio: float,
    high_pass: bool,
    order: float,
    squared_butterworth: bool,
    npad: int,
) -> Array:
    _validate_cutoff(cutoff_frequency_ratio)
    if npad < 0:
        raise ValueError("npad must be >= 0")
    x = x.astype(jnp.float32)
    if npad:
        x = jnp.pad(x, npad, mode="edge")
    wfilt = butterworth_transfer(
        x.shape,
        float(cutoff_frequency_ratio),
        float(order),
        bool(high_pass),
        bool(squared_butterworth),
    )
    out = _apply_transfer(x, wfilt)
    if npad:
        out = out[tuple(slice(npad, s - npad) for s in out.shape)]
    return out


def butterworth(
    img: Array,
    cutoff_frequency_ratio: float = 0.005,
    high_pass: bool = True,
    order: float = 2.0,
    squared_butterworth: bool = True,
    npad: int = 0,
) -> Array:
    """skimage.filters.butterworth on a 2-D slice (transcription — see
    the module docstring). ``high_pass=True`` returns the detail band
    (can be negative — the chain's final uint8 quantize clamps);
    ``high_pass=False`` is the smoothed image. ``npad`` edge-pads before
    the FFT to soften wrap-around ringing, exactly as skimage does.
    Golden: tests/goldens/golden_ops.py::butterworth_filter."""
    return _butterworth_nd(
        img, cutoff_frequency_ratio, high_pass, order,
        squared_butterworth, int(npad),
    )


def butterworth3d(
    vol: Array,
    cutoff_frequency_ratio: float = 0.005,
    high_pass: bool = True,
    order: float = 2.0,
    squared_butterworth: bool = True,
    npad: int = 0,
) -> Array:
    """The volumetric sibling of ``butterworth`` on [Z, H, W]: skimage's
    filter is n-dimensional, so the declared surface extends to volumes;
    the 3-D frequency grid is z-consistent (no slice flicker). Golden:
    tests/goldens/golden_ops.py::butterworth_filter (n-d)."""
    return _butterworth_nd(
        vol, cutoff_frequency_ratio, high_pass, order,
        squared_butterworth, int(npad),
    )


def _homomorphic_nd(
    x: Array,
    cutoff_frequency_ratio: float,
    order: float,
    low_gain: float,
    high_gain: float,
    eps: float,
    npad: int,
) -> Array:
    _validate_cutoff(cutoff_frequency_ratio)
    if npad < 0:
        raise ValueError("npad must be >= 0")
    if eps <= 0:
        raise ValueError("eps must be > 0 (log-domain offset)")
    x = x.astype(jnp.float32)
    logx = jnp.log(x + np.float32(eps))
    if npad:
        logx = jnp.pad(logx, npad, mode="edge")
    # H(f) = low_gain + (high_gain - low_gain) * butterworth_highpass(f):
    # exactly low_gain at DC, -> high_gain at the Nyquist corner
    hp = butterworth_transfer(
        logx.shape, float(cutoff_frequency_ratio), float(order),
        high_pass=True, squared_butterworth=True,
    )
    wfilt = np.float32(low_gain) + np.float32(high_gain - low_gain) * hp
    out = _apply_transfer(logx, wfilt)
    if npad:
        out = out[tuple(slice(npad, s - npad) for s in out.shape)]
    return jnp.clip(jnp.exp(out) - np.float32(eps), 0.0, 1.0)


def homomorphic(
    img: Array,
    cutoff_frequency_ratio: float = 0.02,
    order: float = 2.0,
    low_gain: float = 0.5,
    high_gain: float = 1.5,
    eps: float = 1.0 / 255.0,
    npad: int = 16,
) -> Array:
    """Homomorphic enhancement (Gonzalez & Woods section 4.9) on a 2-D
    slice: log -> gain-interpolated Butterworth emphasis -> exp, clipped
    to [0, 1]. ``low_gain < 1`` compresses illumination (the slow
    field), ``high_gain > 1`` boosts reflectance (tissue detail); the
    default ``npad=16`` edge pad suppresses the FFT's wrap-around
    seam at image borders. Golden:
    tests/goldens/golden_ops.py::homomorphic_filter."""
    return _homomorphic_nd(
        img, cutoff_frequency_ratio, order, low_gain, high_gain,
        eps, int(npad),
    )


def homomorphic3d(
    vol: Array,
    cutoff_frequency_ratio: float = 0.02,
    order: float = 2.0,
    low_gain: float = 0.5,
    high_gain: float = 1.5,
    eps: float = 1.0 / 255.0,
    npad: int = 8,
) -> Array:
    """Volumetric homomorphic enhancement on [Z, H, W]: one 3-D
    log-domain Butterworth emphasis, z-consistent (bias-field-like slow
    intensity gradients across slices are flattened with the in-plane
    ones). Golden: tests/goldens/golden_ops.py::homomorphic_filter."""
    return _homomorphic_nd(
        vol, cutoff_frequency_ratio, order, low_gain, high_gain,
        eps, int(npad),
    )

"""Pallas bilateral filter: whole image resident in VMEM.

XLA's shifted-window formulation re-reads the padded image from HBM for
each of the k^2 offsets (~25x the image in traffic). Here the padded
image sits in VMEM once per program (a 520^2 f32 slice is ~1.1 MB, well
under the ~16 MB budget), and the k^2 weighted accumulation runs
entirely on the VPU: traffic drops to 2 images per slice, measured
~2.3x faster at 512^2 batch 32.

Semantics identical to mies_tpu.ops.filters.bilateral_blur (same
formula, same f32 accumulation order: offsets scanned row-major with
two running sums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mies_tpu.ops.filters import _PAD_MODE

# above this many VMEM bytes for the padded block, fall back to XLA
_VMEM_BLOCK_LIMIT = 6 * 1024 * 1024


def _strip_rows(h: int) -> int:
    """Largest supported strip height dividing h. Bigger strips amortize
    per-program overhead: 32 -> 128 measured 1.92 -> 1.48 ms per
    batch-32 512^2 (bit-exact); 256+ blows the Mosaic VMEM stack (the
    unrolled k^2 temporaries get no slot sharing)."""
    for s in (128, 64, 32):
        if h % s == 0:
            return s
    return 0


def _bilateral_kernel(
    xp_ref,   # [1, Hp, Wp] f32 padded image (same block for all strips)
    out_ref,  # [1, strip, W] f32
    *,
    w: int,
    k: int,
    spatial: tuple,  # k*k static spatial weights
    inv_two_sc2: float,
    strip_rows: int,
):
    """One output row-strip. Working in strips keeps the 25 shifted-window
    temporaries at [strip, W] instead of full-image (~1 MB) — Mosaic
    allocates unrolled-loop temporaries on the VMEM stack without slot
    sharing, so full-image strips blow the 16 MB budget."""
    r = k // 2
    s = pl.multiple_of(pl.program_id(1) * strip_rows, strip_rows)
    # one ALIGNED dynamic read (s is a multiple of 8); the sub-row
    # misalignments (dy, r < 8) become static slices of the register
    # value, which Mosaic handles with cheap shifts.
    strip = xp_ref[0, pl.ds(s, strip_rows + 8), :]
    center = strip[r : r + strip_rows, r : r + w]
    num = jnp.zeros((strip_rows, w), jnp.float32)
    den = jnp.zeros((strip_rows, w), jnp.float32)
    idx = 0
    for dy in range(k):
        for dx in range(k):
            q = strip[dy : dy + strip_rows, dx : dx + w]
            d = q - center
            wgt = np.float32(spatial[idx]) * jnp.exp(
                -(d * d) * np.float32(inv_two_sc2)
            )
            num = num + wgt * q
            den = den + wgt
            idx += 1
    out_ref[0] = num / den


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "sigma_color", "sigma_space", "mode", "interpret"),
)
def bilateral_tpu(
    batch: Array,
    kernel_size: int = 5,
    sigma_color: float = 0.1,
    sigma_space: float = 1.5,
    mode: str = "reflect",
    interpret: bool = False,
) -> Array:
    """Batched bilateral filter, Pallas whole-image-in-VMEM kernel.

    batch: [B, H, W] float32. Same results as the XLA path up to f32
    summation-order ULPs (both sum the k^2 window terms; the kernel uses
    two running sums in row-major offset order).
    """
    B, h, w = batch.shape
    k = kernel_size
    r = k // 2
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    spatial = tuple(
        np.exp(-(dy**2 + dx**2) / (2.0 * float(sigma_space) ** 2))
        .astype(np.float32)
        .ravel()
        .tolist()
    )
    strip_rows = _strip_rows(h)
    if not strip_rows:
        raise ValueError("H must be a multiple of 32")
    if k > 9:
        raise ValueError("kernel_size > 9 unsupported by the strip kernel")
    xp = jnp.pad(
        batch.astype(jnp.float32), ((0, 0), (r, r), (r, r)), mode=_PAD_MODE[mode]
    )
    # each strip reads an aligned (_STRIP_ROWS + 8)-row window; pad the
    # bottom so the last strip's read stays in bounds (extra rows unused)
    extra = (h + 8) - (h + 2 * r)
    if extra > 0:
        xp = jnp.pad(xp, ((0, 0), (0, extra), (0, 0)), mode="edge")
    kern = functools.partial(
        _bilateral_kernel,
        w=w,
        k=k,
        spatial=spatial,
        inv_two_sc2=1.0 / (2.0 * float(sigma_color) ** 2),
        strip_rows=strip_rows,
    )
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B, h // strip_rows),
        in_specs=[
            # whole padded image per program; the block index is constant
            # across the strip axis, so Mosaic fetches it once per image.
            pl.BlockSpec((1, h + 8, w + 2 * r), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, strip_rows, w), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
    )(xp)


def bilateral_supported(shape: tuple[int, int], kernel_size: int) -> bool:
    """VMEM fit check + tiling sanity for the Pallas path."""
    h, w = shape
    r = kernel_size // 2
    block_bytes = (h + 2 * r) * (w + 2 * r) * 4
    return (
        block_bytes <= _VMEM_BLOCK_LIMIT
        and _strip_rows(h) > 0
        and w >= 128
    )


def bilateral_batched(
    batch: Array,
    kernel_size: int = 5,
    sigma_color: float = 0.1,
    sigma_space: float = 1.5,
    mode: str = "reflect",
) -> Array:
    """Backend-dispatching batched bilateral: Pallas on TPU, XLA elsewhere."""
    from mies_tpu.ops.filters import bilateral_blur

    if jax.default_backend() == "tpu" and bilateral_supported(
        batch.shape[-2:], kernel_size
    ):
        return bilateral_tpu(batch, kernel_size, sigma_color, sigma_space, mode)
    fn = functools.partial(
        bilateral_blur,
        kernel_size=kernel_size,
        sigma_color=sigma_color,
        sigma_space=sigma_space,
        mode=mode,
    )
    return jax.vmap(fn)(batch)

"""Fused bilateral -> unsharp-mask -> quantize Pallas kernel.

The tail of the flagship chain (bilateral denoise, unsharp sharpen,
uint8 quantize) is three full HBM round-trips in the unfused program
(~3.3 ms of the 6 ms batch-32 chain). Fusing them into one strip kernel
keeps the bilateral result in VMEM, runs the 13-tap separable Gaussian
and the sharpening residual in-register, and writes uint8 directly —
one read of the padded input, one uint8 write.

MEASURED RESULT (v5e, batch-32 512^2): net NEGATIVE — 6.65 ms fused vs
6.02 ms unfused for the full chain. XLA already fuses the unsharp
residual + quantize into one elementwise pass, and the fused kernel
recomputes the bilateral on the gaussian-halo rows (+2*rg/STRIP = +37%
bilateral work for radius 1.5). Kept as an opt-in (MIES_TPU_FUSE_TAIL=1
via the pipeline compiler) and as a documented design exploration; the
kernel is exact and tested.

Exactness: the unfused program computes unsharp on the bilateral
OUTPUT with 'nearest' (edge-replicate) padding. The fused kernel
therefore computes bilateral on a halo band and then REPLACES the
out-of-image halo rows/cols with edge replication of the true image-
edge bilateral values, reproducing the unfused border semantics
exactly (same f32 tap order as ops.filters._conv1d_shifted).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mies_tpu.ops.filters import _PAD_MODE, gaussian_kernel1d

_STRIP = 32
_VMEM_BLOCK_LIMIT = 6 * 1024 * 1024


def _fused_kernel(
    xp_ref,   # [1, Hp, Wp] f32 input padded by `pad` with the bilateral mode
    out_ref,  # [1, STRIP, W] u8 or f32
    *,
    h: int,
    w: int,
    k: int,
    pad: int,
    spatial: tuple,
    inv_two_sc2: float,
    taps: tuple,
    amount: float,
    quantize: bool,
):
    rb = k // 2
    rg = len(taps) // 2  # == pad - rb
    s = pl.multiple_of(pl.program_id(1) * _STRIP, _STRIP)
    n_strips = pl.num_programs(1)
    read_rows = _STRIP + 2 * pad
    strip = xp_ref[0, pl.ds(s, read_rows), :]  # [STRIP+2p, W+2p]

    # ---- bilateral on the halo band: rows -rg..STRIP+rg, cols -rg..w+rg
    bh = _STRIP + 2 * rg
    bw = w + 2 * rg
    # band output row t (t in [0, bh)) is image row s - rg + t; with
    # pad = rb + rg its k x k input window starts at strip row t, so the
    # window CENTER sits at strip offset (rb, rb).
    center = strip[rb : rb + bh, rb : rb + bw]
    num = jnp.zeros((bh, bw), jnp.float32)
    den = jnp.zeros((bh, bw), jnp.float32)
    idx = 0
    for dy in range(k):
        for dx in range(k):
            q = strip[dy : dy + bh, dx : dx + bw]
            d = q - center
            wgt = np.float32(spatial[idx]) * jnp.exp(
                -(d * d) * np.float32(inv_two_sc2)
            )
            num = num + wgt * q
            den = den + wgt
            idx += 1
    bil = num / den  # [bh, bw]

    # ---- edge-replicate the out-of-image halo (unsharp 'nearest' mode)
    # columns: the band covers image cols -rg..w+rg; cols < 0 and >= w
    # replicate the edge column (every strip).
    left = bil[:, rg : rg + 1]
    right = bil[:, rg + w - 1 : rg + w]
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    bil = jnp.where(col < rg, left, bil)
    bil = jnp.where(col >= rg + w, right, bil)
    # rows: only the first/last strips have out-of-image rows.
    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    is_first = (pl.program_id(1) == 0).astype(jnp.int32)
    is_last = (pl.program_id(1) == n_strips - 1).astype(jnp.int32)
    top = bil[rg : rg + 1, :]
    bot = bil[rg + _STRIP - 1 : rg + _STRIP, :]
    bil = jnp.where((row < rg) & (is_first == 1), top, bil)
    bil = jnp.where((row >= rg + _STRIP) & (is_last == 1), bot, bil)

    # ---- separable gaussian (scipy tap order), vertical then horizontal
    acc = np.float32(taps[0]) * bil[0:_STRIP, :]
    for t in range(1, len(taps)):
        acc = acc + np.float32(taps[t]) * bil[t : t + _STRIP, :]
    acch = np.float32(taps[0]) * acc[:, 0:w]
    for t in range(1, len(taps)):
        acch = acch + np.float32(taps[t]) * acc[:, t : t + w]

    # ---- unsharp residual + clip (+ quantize)
    center_out = bil[rg : rg + _STRIP, rg : rg + w]
    sharp = center_out + np.float32(amount) * (center_out - acch)
    sharp = jnp.clip(sharp, 0.0, 1.0)
    if quantize:
        # Mosaic has no f32->u8 cast; emit int32, XLA downcasts (cheap)
        out_ref[0] = jnp.clip(jnp.rint(sharp * 255.0), 0, 255).astype(jnp.int32)
    else:
        out_ref[0] = sharp


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_size", "sigma_color", "sigma_space", "bilateral_mode",
        "radius", "amount", "quantize", "interpret",
    ),
)
def bilateral_unsharp_tpu(
    batch: Array,
    kernel_size: int = 5,
    sigma_color: float = 0.1,
    sigma_space: float = 1.5,
    bilateral_mode: str = "reflect",
    radius: float = 1.5,
    amount: float = 1.0,
    quantize: bool = True,
    interpret: bool = False,
) -> Array:
    """Fused bilateral -> unsharp('nearest') [-> uint8] on [B, H, W]."""
    B, h, w = batch.shape
    k = kernel_size
    rb = k // 2
    taps = tuple(
        gaussian_kernel1d(float(radius), int(4.0 * float(radius) + 0.5)).tolist()
    )
    rg = len(taps) // 2
    pad = rb + rg

    dy, dx = np.mgrid[-rb : rb + 1, -rb : rb + 1]
    spatial = tuple(
        np.exp(-(dy**2 + dx**2) / (2.0 * float(sigma_space) ** 2))
        .astype(np.float32).ravel().tolist()
    )

    # pad with the bilateral's border mode; the halo rows whose windows
    # reach deeper than the image edge get overwritten by the kernel's
    # edge replication, so one mode for the whole pad is sound.
    xp = jnp.pad(
        batch.astype(jnp.float32), ((0, 0), (pad, pad), (pad, pad)),
        mode=_PAD_MODE[bilateral_mode],
    )
    # aligned strip reads may reach past the padded bottom: extend
    read_rows = _STRIP + 2 * pad
    need = (h - _STRIP) + read_rows
    if need > h + 2 * pad:
        xp = jnp.pad(xp, ((0, 0), (0, need - (h + 2 * pad)), (0, 0)), mode="edge")

    kern = functools.partial(
        _fused_kernel,
        h=h, w=w, k=k, pad=pad, spatial=spatial,
        inv_two_sc2=1.0 / (2.0 * float(sigma_color) ** 2),
        taps=taps, amount=float(amount), quantize=quantize,
    )
    out_dtype = jnp.int32 if quantize else jnp.float32
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B, h // _STRIP),
        in_specs=[
            pl.BlockSpec((1, xp.shape[1], xp.shape[2]), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _STRIP, w), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w), out_dtype),
    )(xp)
    return out.astype(jnp.uint8) if quantize else out


def fused_supported(shape: tuple[int, int], kernel_size: int, radius: float) -> bool:
    h, w = shape
    rb = kernel_size // 2
    rg = int(4.0 * float(radius) + 0.5)
    pad = rb + rg
    return (
        h % _STRIP == 0
        and w >= 128
        and (h + 2 * pad + _STRIP) * (w + 2 * pad) * 4 <= _VMEM_BLOCK_LIMIT
        and pad <= _STRIP  # strip reads stay well-formed
    )

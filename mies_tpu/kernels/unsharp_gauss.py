"""Fused unsharp_mask -> gaussian_blur Pallas kernel.

BASELINE workload 3 is literally "unsharp mask + Gaussian denoise
fused" (BASELINE.md row 3); XLA runs the pair as four separable
shifted-add passes with materialized intermediates. This kernel keeps
the whole pair in VMEM per row strip: one image read, one write,
measured 1.20 -> 0.92 ms per batch-8 1024^2 (+23%) — and BIT-EXACT vs
the unfused jnp twin (same ascending-tap summation order; the border
semantics below reproduce scipy's per-pass 'nearest' padding exactly).

Border fidelity (the hard part — scipy pads PER 1-D PASS, so naive
pre-padding of x nests incorrectly):
* G1's row+col pads of x ARE plain edge pads of x (row conv commutes
  with column replication), so x arrives pre-padded from XLA;
* G2's row pad replicates U's (the unsharp result's) edge ROWS — NOT
  U evaluated on padded x — so edge strips overwrite out-of-image U
  rows with a sublane-broadcast of the true edge row;
* G2's col pad replicates V's (the G2-rows result's) edge COLUMNS —
  built in-kernel by lane-broadcasting V's first/last column.

Only mode='nearest' (both stages' default) and clip=True are fused;
anything else falls back to the unfused ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mies_tpu.ops.filters import gaussian_kernel1d

_STRIP = 64
_VMEM_BLOCK_LIMIT = 6 * 1024 * 1024


def _rowconv(src, taps, out_rows):
    """Vertical shifted-add correlation, scipy's ascending-tap order."""
    acc = np.float32(taps[0]) * src[0:out_rows, :]
    for t in range(1, len(taps)):
        acc = acc + np.float32(taps[t]) * src[t : t + out_rows, :]
    return acc


def _colconv(src, taps, out_cols):
    """Horizontal shifted-add correlation, scipy's ascending-tap order."""
    acc = np.float32(taps[0]) * src[:, 0:out_cols]
    for t in range(1, len(taps)):
        acc = acc + np.float32(taps[t]) * src[:, t : t + out_cols]
    return acc


def _kern(x_ref, out_ref, *, w, k1, k2, amount, h):
    r1, r2 = len(k1) // 2, len(k2) // 2
    big_r = r1 + r2
    s = pl.multiple_of(pl.program_id(1) * _STRIP, _STRIP)
    win = x_ref[0, pl.ds(s, _STRIP + 2 * big_r), :]  # rows [s-R, s+S+R)

    # G1 + blend: U on rows [s-r2, s+S+r2), cols [0, w)
    y1 = _rowconv(win, k1, _STRIP + 2 * r2)
    g1 = _colconv(y1, k1, w)
    xc = win[r1 : r1 + _STRIP + 2 * r2, r1 : r1 + w]
    u = jnp.clip(xc + np.float32(amount) * (xc - g1), 0.0, 1.0)

    # G2's 'nearest' row pad replicates U's global edge rows
    gi = jax.lax.broadcasted_iota(jnp.int32, (_STRIP + 2 * r2, 1), 0) + (s - r2)
    top_row = jax.lax.broadcast_in_dim(u[r2 : r2 + 1, :], u.shape, (0, 1))
    u = jnp.where(gi < 0, top_row, u)
    li = jax.lax.broadcasted_iota(jnp.int32, (_STRIP + 2 * r2, 1), 0)
    bot_idx = jnp.minimum(h - 1 - (s - r2), _STRIP + 2 * r2 - 1)
    last_row = jnp.sum(jnp.where(li == bot_idx, u, 0.0), axis=0, keepdims=True)
    last_row = jax.lax.broadcast_in_dim(last_row, u.shape, (0, 1))
    u = jnp.where(gi > h - 1, last_row, u)

    # G2: rows then cols; the col pad replicates V's edge columns
    v = _rowconv(u, k2, _STRIP)
    left = jax.lax.broadcast_in_dim(v[:, 0:1], (_STRIP, r2), (0, 1))
    right = jax.lax.broadcast_in_dim(v[:, w - 1 : w], (_STRIP, r2), (0, 1))
    vext = jnp.concatenate([left, v, right], axis=1)
    out_ref[0] = _colconv(vext, k2, w)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "amount", "sigma", "truncate", "interpret"),
)
def unsharp_gauss_tpu(
    batch: Array,
    radius: float = 1.5,
    amount: float = 1.0,
    sigma: float = 1.5,
    truncate: float = 4.0,
    interpret: bool = False,
) -> Array:
    """Fused unsharp(radius, amount, nearest) -> gaussian(sigma, nearest)
    on [B, H, W] float [0,1]. Bit-exact vs the unfused pair."""
    B, h, w = batch.shape
    r1 = int(truncate * float(radius) + 0.5)
    r2 = int(truncate * float(sigma) + 0.5)
    k1 = tuple(gaussian_kernel1d(float(radius), r1).astype(np.float32).tolist())
    k2 = tuple(gaussian_kernel1d(float(sigma), r2).astype(np.float32).tolist())
    big_r = r1 + r2
    if h % _STRIP:
        raise ValueError(f"H must be a multiple of {_STRIP}")
    if r2 > _STRIP:
        # the top-edge fixup replicates U's global row 0 from the s=0
        # strip's local index r2; strips s > 0 must never see gi < 0,
        # which requires s - r2 >= 0 for all s >= _STRIP
        raise ValueError(f"sigma radius {r2} exceeds the strip height")
    xp = jnp.pad(
        batch.astype(jnp.float32), ((0, 0), (big_r, big_r), (r1, r1)),
        mode="edge",
    )
    kern = functools.partial(_kern, w=w, k1=k1, k2=k2, amount=amount, h=h)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B, h // _STRIP),
        in_specs=[
            pl.BlockSpec((1, h + 2 * big_r, w + 2 * r1),
                         lambda b, s: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _STRIP, w), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, h, w), jnp.float32),
    )(xp)


def _unsharp_kern(x_ref, out_ref, *, w, k1, amount, quantize):
    """One row-strip of unsharp_mask(mode='nearest', clip=True), with the
    optional uint8 quantize folded in (emitted as int32 — Mosaic has no
    f32->u8 vector cast; XLA's int32->u8 epilogue cast is free-ish)."""
    r1 = len(k1) // 2
    s = pl.multiple_of(pl.program_id(1) * _STRIP, _STRIP)
    win = x_ref[0, pl.ds(s, _STRIP + 2 * r1), :]  # [S+2r1, w+2r1]
    y1 = _rowconv(win, k1, _STRIP)
    g = _colconv(y1, k1, w)
    xc = win[r1 : r1 + _STRIP, r1 : r1 + w]
    u = jnp.clip(xc + np.float32(amount) * (xc - g), 0.0, 1.0)
    if quantize:
        out_ref[0] = jnp.clip(
            jnp.rint(u * np.float32(255.0)), 0.0, 255.0
        ).astype(jnp.int32)
    else:
        out_ref[0] = u


# Sublane-aligned row padding held in the scratch-built border (the
# scratch interior starts at row _PADR, which Mosaic requires to be
# 8-aligned for the strip reads; r1 <= _PADR shapes qualify).
_PADR = 8


def _unsharp_kern_scratch(x_ref, out_ref, scratch, *, w, h, k1, amount,
                          quantize):
    """Pad-free variant of ``_unsharp_kern``: the input block is the
    UNPADDED image; the edge-replicated border lives in a VMEM scratch
    built once per image (at strip 0), eliminating the XLA pad pass's
    HBM round trip (measured 0.493 -> 0.393 ms per batch-32 512^2,
    bit-equal on chip). Rows sit at offset _PADR (8-aligned) so the
    per-strip dynamic read offset stays the 64-aligned ``s``; all tap
    offsets within the read window are static."""
    r1 = len(k1) // 2
    s = pl.multiple_of(pl.program_id(1) * _STRIP, _STRIP)

    @pl.when(s == 0)
    def _build():
        x = x_ref[0]
        scratch[_PADR : _PADR + h, r1 : r1 + w] = x
        top = jax.lax.broadcast_in_dim(x[0:1, :], (_PADR, w), (0, 1))
        scratch[0:_PADR, r1 : r1 + w] = top
        bot = jax.lax.broadcast_in_dim(x[h - 1 : h, :], (_PADR, w), (0, 1))
        scratch[_PADR + h : 2 * _PADR + h, r1 : r1 + w] = bot
        lcol = scratch[:, r1 : r1 + 1]
        scratch[:, 0:r1] = jax.lax.broadcast_in_dim(
            lcol, (2 * _PADR + h, r1), (0, 1)
        )
        rcol = scratch[:, r1 + w - 1 : r1 + w]
        scratch[:, r1 + w : 2 * r1 + w] = jax.lax.broadcast_in_dim(
            rcol, (2 * _PADR + h, r1), (0, 1)
        )

    win = scratch[pl.ds(s, _STRIP + 2 * _PADR), :]  # rows [s-8, s+S+8)
    src = win[_PADR - r1 : _PADR + r1 + _STRIP, :]
    y1 = _rowconv(src, k1, _STRIP)
    g = _colconv(y1, k1, w)
    xc = src[r1 : r1 + _STRIP, r1 : r1 + w]
    u = jnp.clip(xc + np.float32(amount) * (xc - g), 0.0, 1.0)
    if quantize:
        out_ref[0] = jnp.clip(
            jnp.rint(u * np.float32(255.0)), 0.0, 255.0
        ).astype(jnp.int32)
    else:
        out_ref[0] = u


def _scratch_fits(h: int, w: int, r1: int) -> bool:
    """Scratch-border path VMEM budget: unpadded input block (double-
    buffered by Pallas) + the bordered scratch must leave headroom in
    the ~16 MB/core VMEM; above this the padded-input path is used."""
    return (
        1 <= r1 <= _PADR
        and 2 * h * w * 4 + (h + 2 * _PADR) * (w + 2 * r1) * 4
        <= 10 * 1024 * 1024
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "amount", "truncate", "quantize", "interpret",
        "scratch_borders",
    ),
)
def unsharp_quant_tpu(
    batch: Array,
    radius: float = 1.0,
    amount: float = 1.0,
    truncate: float = 4.0,
    quantize: bool = True,
    interpret: bool = False,
    scratch_borders: bool | None = None,
) -> Array:
    """Pallas unsharp_mask('nearest', clip=True) with fused uint8
    quantize on [B, H, W] float [0,1].

    Bit-exact vs unsharp_mask + _quantize_u8: same ascending-tap
    shifted-add order as ops.filters._conv1d_shifted, and the 'nearest'
    per-pass border pads collapse to one edge pad of x (row conv
    commutes with column replication). Saves the separable blur's HBM
    intermediate and the separate quantize pass."""
    B, h, w = batch.shape
    r1 = int(truncate * float(radius) + 0.5)
    k1 = tuple(gaussian_kernel1d(float(radius), r1).astype(np.float32).tolist())
    if h % _STRIP:
        raise ValueError(f"H must be a multiple of {_STRIP}")
    if scratch_borders is None:
        scratch_borders = _scratch_fits(h, w, r1)
    elif scratch_borders and not _scratch_fits(h, w, r1):
        raise ValueError("scratch_borders path does not fit VMEM here")
    if scratch_borders:
        kern = functools.partial(
            _unsharp_kern_scratch, w=w, h=h, k1=k1, amount=float(amount),
            quantize=quantize,
        )
        out = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(B, h // _STRIP),
            in_specs=[
                pl.BlockSpec((1, h, w), lambda b, s: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, _STRIP, w), lambda b, s: (b, s, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B, h, w), jnp.int32 if quantize else jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((h + 2 * _PADR, w + 2 * r1), jnp.float32)
            ],
        )(batch.astype(jnp.float32))
        return out.astype(jnp.uint8) if quantize else out
    xp = jnp.pad(
        batch.astype(jnp.float32), ((0, 0), (r1, r1), (r1, r1)), mode="edge"
    )
    kern = functools.partial(
        _unsharp_kern, w=w, k1=k1, amount=float(amount), quantize=quantize
    )
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(B, h // _STRIP),
        in_specs=[
            pl.BlockSpec((1, h + 2 * r1, w + 2 * r1), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _STRIP, w), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (B, h, w), jnp.int32 if quantize else jnp.float32
        ),
    )(xp)
    return out.astype(jnp.uint8) if quantize else out


def unsharp_quant_supported(
    shape: tuple[int, int], radius: float, truncate: float = 4.0
) -> bool:
    h, w = shape
    r1 = int(truncate * float(radius) + 0.5)
    block = (h + 2 * r1) * (w + 2 * r1) * 4
    return (
        h % _STRIP == 0 and w >= 128 and r1 >= 1 and block <= _VMEM_BLOCK_LIMIT
    )


def unsharp_gauss_supported(
    shape: tuple[int, int], radius: float, sigma: float, truncate: float = 4.0
) -> bool:
    h, w = shape
    r1 = int(truncate * float(radius) + 0.5)
    r2 = int(truncate * float(sigma) + 0.5)
    block = (h + 2 * (r1 + r2)) * (w + 2 * r1) * 4
    return (
        h % _STRIP == 0
        and w >= 128
        and r1 >= 1
        and 1 <= r2 <= _STRIP  # top-edge replication needs s - r2 >= 0
        and block <= _VMEM_BLOCK_LIMIT
    )

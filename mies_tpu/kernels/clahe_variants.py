"""Measured-slower CLAHE apply variants, kept for reproducibility.

Both are BIT-equal to the production _apply33_kernel and both measured
SLOWER on chip (docs/KERNELS.md round 4: an MXU dot is ONE pass for any
M <= 128, so shrinking the LUT stack or batching rows saves nothing —
the kernel is mask-build-bound). Selectable via MIES_TPU_APPLY33=v2|v3
for re-measurement; tests pin their bit-identity in interpret mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mies_tpu.kernels.clahe import NBINS, _onehot256, _select_luts, _split_luts


def _apply33_kernel_v2(
    v_ref,    # [1, th, 2*tw] int32: two adjacent tiles of one tile-row
    lut_ref,  # [1, 1, 2, 9, 256] 3x3 neighbor LUT stacks (bf16 or f32)
    out_ref,  # [1, th, 2*tw] f32
    *,
    th: int,
    tw: int,
    gy: int,
    gx: int,
    split: bool,
):
    """Half-stack variant of _apply33_kernel: the y-group pick is STATIC
    per row (row < th/2), so each row only ever reads 6 of its tile's 9
    stack rows — the dot shrinks [18,256] -> [12,256] (-33% MXU work),
    built ONCE per program as two half-stacks (top: dy 0..1, bottom:
    dy 1..2 for both tiles). The i/j edge clamps are already encoded by
    the edge-padded LUT grid (lp[0] == luts[0] etc. — the slices
    coincide at the borders), so the redundant clamp selects are dropped;
    values remain BIT-identical (same selected rows, same blend order).
    """
    w2 = 2 * tw
    a = pl.program_id(0)  # b * gy + i
    i = jax.lax.rem(a, gy)

    inv_th = np.float32(1.0 / th)
    inv_tw = np.float32(1.0 / tw)
    lk = jnp.concatenate([lut_ref[0, 0, 0], lut_ref[0, 0, 1]], axis=0)
    # [12, 256] half-stacks: rows (0:6, 9:15) = both tiles' dy in {0,1};
    # rows (3:9, 12:18) = dy in {1,2}
    lk_top = jnp.concatenate([lk[0:6], lk[9:15]], axis=0)
    lk_bot = jnp.concatenate([lk[3:9], lk[12:18]], axis=0)
    if split:  # hoist the loop-invariant hi/lo split out of the row loop
        lk_top = _split_luts(lk_top)
        lk_bot = _split_luts(lk_bot)

    c = jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1)
    half = c >= tw                     # per-lane tile-in-pair
    j0 = pl.program_id(1) * 2
    left = (c - half.astype(jnp.int32) * tw) < (tw // 2)
    xg = (j0 * tw + c).astype(jnp.float32)
    txf = xg * inv_tw - np.float32(0.5)
    xa = txf - jnp.floor(txf)          # [1, w2]
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, w2), 0)

    win = v_ref[0]                     # [th, w2] int32
    for row in range(th):
        v = win[row : row + 1, :]
        mask = _onehot256(v, bins)     # [256, w2], exact 0/1 bf16
        top = row < th // 2
        sel = _select_luts(lk_top if top else lk_bot, mask, split)
        s = jnp.where(half, sel[6:12], sel[0:6])  # this tile's 2x3 rows
        g1, g2 = s[0:3], s[3:6]        # y-neighbor LUT rows (clamped via
        #                                the edge-padded stack itself)
        v11 = jnp.where(left, g1[0:1], g1[1:2])
        v12 = jnp.where(left, g1[1:2], g1[2:3])
        v21 = jnp.where(left, g2[0:1], g2[1:2])
        v22 = jnp.where(left, g2[1:2], g2[2:3])

        yg = (i * th + row).astype(jnp.float32)
        tyf = yg * inv_th - np.float32(0.5)
        ya = tyf - jnp.floor(tyf)
        res = (v11 * (np.float32(1.0) - xa) + v12 * xa) * (
            np.float32(1.0) - ya
        ) + (v21 * (np.float32(1.0) - xa) + v22 * xa) * ya
        out_ref[0, row : row + 1, :] = res.astype(jnp.float32)


def _apply33_kernel_v3(
    v_ref,    # [1, th, 2*tw] int32
    lut_ref,  # [1, 1, 2, 9, 256]
    out_ref,  # [1, th, 2*tw] f32
    vpair,    # VMEM scratch [1, 4*tw] int32: two rows side by side
    *,
    th: int,
    tw: int,
    gy: int,
    gx: int,
    split: bool,
):
    """Two-rows-per-dot variant of _apply33_kernel: rows r and r+1 share
    one [256, 4*tw] mask and ONE [18,256]x[256,4*tw] dot (2 lane tiles),
    halving per-dot fixed overhead at the cost of 2 strided VMEM copies
    per pair to lay the rows side by side. Blend is per row on the lane
    half — identical arithmetic to v1."""
    w2 = 2 * tw
    a = pl.program_id(0)
    bcol = pl.program_id(1)
    i = jax.lax.rem(a, gy)

    inv_th = np.float32(1.0 / th)
    inv_tw = np.float32(1.0 / tw)
    lk = jnp.concatenate([lut_ref[0, 0, 0], lut_ref[0, 0, 1]], axis=0)
    if split:
        lk = _split_luts(lk)

    c = jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1)
    half = c >= tw
    j0 = bcol * 2
    jl = j0 + half.astype(jnp.int32)
    left = (c - half.astype(jnp.int32) * tw) < (tw // 2)
    lx = jnp.logical_and(left, jl > 0)
    rx = jnp.logical_and(jnp.logical_not(left), jl < gx - 1)
    xg = (j0 * tw + c).astype(jnp.float32)
    txf = xg * inv_tw - np.float32(0.5)
    xa = txf - jnp.floor(txf)
    bins2 = jax.lax.broadcasted_iota(jnp.int32, (NBINS, 2 * w2), 0)

    win = v_ref[0]
    for row in range(0, th, 2):
        vpair[0, 0:w2] = win[row, :]
        vpair[0, w2 : 2 * w2] = win[row + 1, :]
        mask = _onehot256(vpair[0:1, :], bins2)  # [256, 2*w2]
        selp = _select_luts(lk, mask, split)     # [18, 2*w2]
        for h in range(2):
            r = row + h
            sel = selp[:, h * w2 : (h + 1) * w2]
            s = jnp.where(half, sel[9:18], sel[0:9])
            if r < th // 2:
                g1 = jnp.where(i > 0, s[0:3], s[3:6])
                g2 = s[3:6]
            else:
                g1 = s[3:6]
                g2 = jnp.where(i < gy - 1, s[6:9], s[3:6])
            v11 = jnp.where(lx, g1[0:1], g1[1:2])
            v12 = jnp.where(lx, g1[1:2], jnp.where(rx, g1[2:3], g1[1:2]))
            v21 = jnp.where(lx, g2[0:1], g2[1:2])
            v22 = jnp.where(lx, g2[1:2], jnp.where(rx, g2[2:3], g2[1:2]))

            yg = (i * th + r).astype(jnp.float32)
            tyf = yg * inv_th - np.float32(0.5)
            ya = tyf - jnp.floor(tyf)
            res = (v11 * (np.float32(1.0) - xa) + v12 * xa) * (
                np.float32(1.0) - ya
            ) + (v21 * (np.float32(1.0) - xa) + v22 * xa) * ya
            out_ref[0, r : r + 1, :] = res.astype(jnp.float32)

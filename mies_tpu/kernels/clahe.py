"""Pallas CLAHE: gatherless LUT interpolation on the MXU.

Why: XLA lowers the per-pixel 4-way LUT gather of CLAHE to ~100 ms per
batch-32 of 512^2 slices on a v5e — it is THE bottleneck of the whole
framework (SURVEY.md section 7 hard part #2). TPUs have no hardware
gather; the TPU-native formulation is selection-by-matmul:

    sel[k, p] = sum_b L_k[b] * onehot(v_p)[b]      (k = 4 neighbor LUTs)

one [4, 256] x [256, cell_px] matmul per interpolation cell, with the
onehot mask built directly in VMEM (never touching HBM) and pixels
riding the 128-lane axis.

Exactness: the mask is 0/1 (exact in bf16) and OpenCV-convention LUTs
are integers <= 255 (exact in bf16's 8-bit mantissa); the MXU
accumulates in f32, so the selection is EXACT, and the final bilinear
blend runs as f32 VPU ops in OpenCV's operation order. The
fraction-convention path splits its fractional f32 LUTs into bf16
hi/lo halves (hi = bf16(L), lo = bf16(L - hi)) and sums the two
selections (~2^-17 relative error). The split MUST happen INSIDE the
kernel: when it was computed XLA-side, XLA:TPU's bf16-propagation pass
saw the convert-to-bf16 consumer and demoted the subtraction itself to
bf16 — bf16(L) - bf16(L) == 0 — silently zeroing the lo half on real
hardware only (found on-chip: every fraction output was quantized to
the bf16 grid, off by up to 2^-9; interpret mode never showed it).

Cell decomposition: OpenCV's bilinear weights make the 4 participating
tile LUTs CONSTANT within half-tile-shifted cells. Padding the image by
(th/2, tw/2) turns the (gy+1, gx+1) cells into a uniform grid, so the
kernel has no data-dependent control flow at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBINS = 256


def _onehot256(v: Array, bins: Array) -> Array:
    """[1, npx] int32 levels -> [256, npx] exact 0/1 bf16 onehot mask.

    Plain 256-row compare+cast. MEASURED dead ends (do not re-try):
    radix-2 decomposition (129 compares + two K=128 matmuls) was
    time-identical — the apply is not compare-bound; the hist kernel's
    nibble outer product (mhi[:,None,:] * mlo[None,:,:] then reshape
    [16,16,npx] -> [256,npx]) was 2.1x SLOWER here — Mosaic materializes
    the 3-D broadcast product through row-by-row copies instead of
    fusing it into the matmul operand staging like it does this form."""
    return (bins == v).astype(jnp.bfloat16)


_dot = functools.partial(
    jax.lax.dot_general,
    dimension_numbers=(((1,), (0,)), ((), ())),
    preferred_element_type=jnp.float32,
)


def _split_luts(lk: Array) -> tuple[Array, Array]:
    """f32 fractional LUTs -> exact-as-possible bf16 (hi, lo) halves.

    MUST run INSIDE a Pallas kernel: Mosaic compiles exactly what is
    written, whereas XLA:TPU's bf16-propagation pass demoted the
    XLA-side subtraction to bf16 — bf16(L) - bf16(L) == 0 — silently
    zeroing the lo half on real hardware (module docstring)."""
    hi = lk.astype(jnp.bfloat16)
    lo = (lk - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _select_luts(lk, mask: Array, split: bool) -> Array:
    """MXU LUT selection: [k, 256] LUTs x [256, npx] onehot -> [k, npx].

    split=False: lk is bf16 integer-valued (OpenCV LUTs) — one exact dot.
    split=True: lk is f32 with fractional values (fraction-convention
    LUTs), hi/lo-decomposed in-kernel (_split_luts) and summed — or an
    already-split (hi, lo) tuple when the caller hoisted the
    loop-invariant split out of its row loop."""
    if not split:
        return _dot(lk, mask)
    hi, lo = lk if isinstance(lk, tuple) else _split_luts(lk)
    return _dot(hi, mask) + _dot(lo, mask)


def _cell_luts(luts: Array, gy: int, gx: int) -> Array:
    """[B, gy, gx, 256] -> [B, gy+1, gx+1, 4, 256] per-cell LUT stacks.

    Cell (i, j) interpolates tiles clamped OpenCV-style (static indices):
    ty1 = max(i-1, 0), ty2 = min(i, gy-1); same for x. Row order:
    (ty1,tx1), (ty1,tx2), (ty2,tx1), (ty2,tx2).
    """
    rows = []
    for i in range(gy + 1):
        ty1, ty2 = max(i - 1, 0), min(i, gy - 1)
        cols = []
        for j in range(gx + 1):
            tx1, tx2 = max(j - 1, 0), min(j, gx - 1)
            cols.append(
                jnp.stack(
                    [luts[:, ty1, tx1], luts[:, ty1, tx2],
                     luts[:, ty2, tx1], luts[:, ty2, tx2]],
                    axis=1,
                )
            )
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, gy+1, gx+1, 4, 256]


_CELLS_PER_PROGRAM = 8


def _apply_kernel(
    v_ref, lut_ref, out_ref, *, th: int, tw: int, gx1: int, ncells: int, split: bool
):
    """8 interpolation cells: mask-matmul selection + f32 bilinear blend.

    v_ref:   [8, npx] int32 pixel levels (flattened cells, row-major;
             NB: v5e has no bf16 vector compare — int32 it is)
    lut_ref: [8, 4, 256] cell LUT stacks (bf16 integer or f32 fractional)
    out_ref: [8, npx] f32 un-rounded OpenCV interpolation values

    Cell flat index = program_id * 8 + k, decomposed as
    (image b, cell row i, cell col j) with i = (idx % ncells) // gx1 etc.
    """
    npx = th * tw
    base = pl.program_id(0) * _CELLS_PER_PROGRAM

    inv_th = np.float32(1.0 / th)
    inv_tw = np.float32(1.0 / tw)
    pi = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    r = (pi // tw).astype(jnp.float32)
    c = (pi % tw).astype(jnp.float32)
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, npx), 0)

    for k in range(_CELLS_PER_PROGRAM):
        idx = base + k
        cell = jax.lax.rem(idx, ncells)
        i = jax.lax.div(cell, gx1)
        j = jax.lax.rem(cell, gx1)

        v = v_ref[k : k + 1, :]  # [1, npx] int32, pixels on lanes
        mask = _onehot256(v, bins)  # [256, npx], exact 0/1 bf16
        sel = _select_luts(lut_ref[k], mask, split)  # [4, npx]

        # OpenCV f32 weights; x is the UNPADDED global coordinate:
        # x = j*tw + c - tw/2 for local flat pixel p = r*tw + c.
        yg = (i * th - th // 2).astype(jnp.float32) + r
        xg = (j * tw - tw // 2).astype(jnp.float32) + c
        tyf = yg * inv_th - np.float32(0.5)
        txf = xg * inv_tw - np.float32(0.5)
        ya = tyf - jnp.floor(tyf)
        xa = txf - jnp.floor(txf)
        ya1 = np.float32(1.0) - ya
        xa1 = np.float32(1.0) - xa

        res = (sel[0:1] * xa1 + sel[1:2] * xa) * ya1 + (
            sel[2:3] * xa1 + sel[3:4] * xa
        ) * ya
        out_ref[k : k + 1, :] = res.astype(jnp.float32)


def _apply_kernel_slab(
    slab_ref,  # [1, th, 2*tw] int32: TWO horizontally-adjacent cells
    lut_ref,   # [1, 1, 2, 4, 256] LUTs for the two cells (bf16 or f32)
    out_ref,   # [1, th, 2*tw] f32
    vflat,     # VMEM scratch [1, npx] int32
    rflat,     # VMEM scratch [1, npx] f32
    *,
    th: int,
    tw: int,
    gy1: int,
    split: bool,
):
    """Transpose-free variant: cells are read straight out of the padded
    image as [th, 2*tw] slabs (the host-side layout change is a pure
    reshape), and the [th, tw] -> [1, npx] flattening the mask matmul
    needs happens via th row copies through VMEM scratch — Mosaic has no
    (th, tw) -> (1, npx) register shape cast, but the strided copies cost
    less than the two big XLA transposes they replace (measured
    2.37 -> 1.97 ms per batch-32 apply)."""
    npx = th * tw
    a = pl.program_id(0)
    b = pl.program_id(1)
    i = jax.lax.rem(a, gy1)

    inv_th = np.float32(1.0 / th)
    inv_tw = np.float32(1.0 / tw)
    pi = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    r = (pi // tw).astype(jnp.float32)
    c = (pi % tw).astype(jnp.float32)
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, npx), 0)

    for half in range(2):
        j = b * 2 + half
        for row in range(th):
            vflat[0, row * tw : (row + 1) * tw] = slab_ref[
                0, row, half * tw : (half + 1) * tw
            ]
        v = vflat[0:1, :]
        mask = _onehot256(v, bins)  # [256, npx], exact 0/1 bf16
        sel = _select_luts(lut_ref[0, 0, half], mask, split)  # [4, npx]

        yg = (i * th - th // 2).astype(jnp.float32) + r
        xg = (j * tw - tw // 2).astype(jnp.float32) + c
        tyf = yg * inv_th - np.float32(0.5)
        txf = xg * inv_tw - np.float32(0.5)
        ya = tyf - jnp.floor(tyf)
        xa = txf - jnp.floor(txf)
        res = (sel[0:1] * (np.float32(1.0) - xa) + sel[1:2] * xa) * (
            np.float32(1.0) - ya
        ) + (sel[2:3] * (np.float32(1.0) - xa) + sel[3:4] * xa) * ya
        rflat[0:1, :] = res.astype(jnp.float32)
        for row in range(th):
            out_ref[0, row, half * tw : (half + 1) * tw] = rflat[
                0, row * tw : (row + 1) * tw
            ]


def _tile33_group(tw: int, gx: int, max_p: int = 4) -> int:
    """Tiles-per-program for the tile33 apply family (0 = unsupported):
    the block's lane extent P*tw must be 128-aligned (Mosaic lane-offset
    rule) and P must divide gx. P=2 is the classic pairing (tw % 64 ==
    0); narrow/odd widths (tw = 32, 96, ...) ride in groups of four.
    The selection dot grows to [P*9, 256] (2-D) / [P*18, 256] (3-D) —
    still ONE MXU pass while P*18 <= 128. The 2-D callers allow
    max_p=8 ([72, 256] dot — covers tw = 16/48/80/112); the 3-D kernel
    caps at 4 so its [P*18, 256] dot stays a single pass."""
    for P in (2, 4, 8):
        if P <= max_p and gx % P == 0 and (P * tw) % 128 == 0:
            return P
    return 0


def _apply33_kernel(
    v_ref,    # [1, th, P*tw] int32: P adjacent tiles of one tile-row
    lut_ref,  # [1, 1, P, 9, 256] 3x3 neighbor LUT stacks (bf16 or f32)
    out_ref,  # [1, th, P*tw] f32
    *,
    th: int,
    tw: int,
    gy: int,
    gx: int,
    split: bool,
    quantize: bool = False,
    finalize: str | None = None,
    P: int = 2,
):
    """Tile-aligned apply, per-ROW: each program owns P ORIGINAL tiles
    of one tile-row and works slab-row by slab-row — mask [256, P*tw],
    ONE [18, 256] x [256, 2tw] dot (both tiles' 3x3 LUT stacks stacked
    on sublanes), per-LANE corner selection (half/left/right as lane
    masks). vs the flatten-into-scratch form this removes ALL 128
    strided [1, tw] VMEM copies per tile pair — the copies, not the
    compares, were the apply's hidden cost (measured 1.63 -> 1.13 ms
    per batch-32 512^2 apply with the loop-invariant split hoisted,
    BIT-equal on chip). The y-group pick
    (row < th/2) is a static Python branch per unrolled row; the
    clamped OpenCV tile indices and blend arithmetic are unchanged.

    No edge padding of the image, no output crop, no per-cell LUT
    gather (_cell_luts): the stack is 9 shifted slices of the
    edge-padded LUT grid (cheap XLA slices).

    quantize=True: v_ref is f32 [0,1]; the uint8 level quantize runs
    in-kernel (same clip(round(v*255)) ops — bit-identical levels, no
    int32 HBM intermediate). finalize folds the convention's epilogue
    into the kernel output: 'u8norm' = clip(rint(res),0,255)/255
    (OpenCV saturate + renormalize), 'clip01' = clip(res, 0, 1).

    P tiles per program (_tile33_group): P=2 is the classic pairing;
    tw = 32/96 ride with P=4 so their lane offsets stay 128-aligned
    instead of falling to the cells path."""
    wp = P * tw
    a = pl.program_id(0)  # b * gy + i
    bcol = pl.program_id(1)
    i = jax.lax.rem(a, gy)

    inv_th = np.float32(1.0 / th)
    inv_tw = np.float32(1.0 / tw)
    lk = jnp.concatenate([lut_ref[0, 0, k] for k in range(P)], axis=0)
    if split:  # hoist the loop-invariant hi/lo split out of the row loop
        lk = _split_luts(lk)

    c = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    t = c // tw                        # per-lane tile-in-group
    j0 = bcol * P
    jl = j0 + t                        # per-lane global tile column
    left = (c - t * tw) < (tw // 2)
    lx = jnp.logical_and(left, jl > 0)
    rx = jnp.logical_and(jnp.logical_not(left), jl < gx - 1)
    # xg == j*tw + c_local for every tile (identical f32 value/ops as
    # the jnp twin: integer add below 2^24, then one cast)
    xg = (j0 * tw + c).astype(jnp.float32)
    txf = xg * inv_tw - np.float32(0.5)
    xa = txf - jnp.floor(txf)          # [1, wp]
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, wp), 0)

    win = v_ref[0]                     # [th, wp] int32 (f32 if quantize)
    if quantize:
        win = jnp.clip(
            jnp.round(win * np.float32(255.0)), 0.0, 255.0
        ).astype(jnp.int32)
    for row in range(th):
        v = win[row : row + 1, :]
        mask = _onehot256(v, bins)     # [256, wp], exact 0/1 bf16
        sel = _select_luts(lk, mask, split)       # [9P, wp]
        s = sel[0:9]                   # this tile's 3x3 rows, per lane
        for k in range(1, P):
            s = jnp.where(t == k, sel[k * 9 : k * 9 + 9], s)

        # clamped OpenCV tile indices -> positions in the 3x3 stack:
        # ty1 = max(floor, 0) -> row 0 unless the clamp hits (i == 0);
        # ty2 = min(floor+1, gy-1) -> row 2 unless i == gy-1; bottom
        # halves shift everything one row down. Same for x, per lane.
        if row < th // 2:
            g1 = jnp.where(i > 0, s[0:3], s[3:6])
            g2 = s[3:6]
        else:
            g1 = s[3:6]
            g2 = jnp.where(i < gy - 1, s[6:9], s[3:6])
        v11 = jnp.where(lx, g1[0:1], g1[1:2])
        v12 = jnp.where(lx, g1[1:2], jnp.where(rx, g1[2:3], g1[1:2]))
        v21 = jnp.where(lx, g2[0:1], g2[1:2])
        v22 = jnp.where(lx, g2[1:2], jnp.where(rx, g2[2:3], g2[1:2]))

        yg = (i * th + row).astype(jnp.float32)
        tyf = yg * inv_th - np.float32(0.5)
        ya = tyf - jnp.floor(tyf)
        res = (v11 * (np.float32(1.0) - xa) + v12 * xa) * (
            np.float32(1.0) - ya
        ) + (v21 * (np.float32(1.0) - xa) + v22 * xa) * ya
        res = res.astype(jnp.float32)
        if finalize == "u8norm":
            res = jnp.clip(jnp.rint(res), 0.0, 255.0) / np.float32(255.0)
        elif finalize == "clip01":
            res = jnp.clip(res, 0.0, 1.0)
        out_ref[0, row : row + 1, :] = res


def _apply33z_kernel(
    v_ref,    # [1, th, P*tw]: P adjacent tiles of one slice's tile-row
    lut_ref,  # [1, 1, P, 18, 256]: per tile, z-lo 3x3 stack ++ z-hi stack
    out_ref,  # [1, th, P*tw] f32
    *,
    th: int,
    tw: int,
    gy: int,
    gx: int,
    tz: int,
    split: bool,
    quantize: bool = False,
    finalize: str | None = None,
    P: int = 2,
):
    """Trilinear (3-D CLAHE) apply in ONE tile33-style pass: the volume
    is the rows layout [Z*gy, th, W], each program owns two tiles of one
    slice's tile-row, and the z interpolation happens IN-KERNEL — one
    onehot mask per row, ONE [36, 256] x [256, 2tw] dot (both z-planes'
    3x3 stacks stacked on sublanes; an MXU dot is one pass for any
    M <= 128, so doubling M from the 2-D kernel's 18 is free), two
    4-corner blends, and a scalar z-lerp with za derived from the
    program id (z = a // gy; za = frac(z * (1/tz) - 0.5) — the same f32
    ops as ops.volume3d._axis_weights; no clamp needed: at the global z
    edges both planes are the same LUT, so the lerp is degenerate).

    vs the two-2-D-applies decomposition this halves the mask builds —
    the dominant cost of the apply family (docs/KERNELS.md round 4) —
    and reads the image once instead of twice.

    ``P`` is the tiles-per-program count (the smallest of {2, 4} with
    gx % P == 0 and P*tw a multiple of 128 — _tile33_group with its 3-D
    cap of max_p=4): the block's lane extent is P * tw, which must be
    128-aligned for Mosaic's lane-offset rule, so NARROW tiles (tw =
    32, 96, ...) ride in wider groups instead of falling off the fast
    path. The dot is [P*18, 256] x [256, P*tw] — still one MXU pass for
    P*18 <= 128, which is why the 3-D kernel stops at P=4 while the 2-D
    kernel ([P*9, 256]) goes to P=8.
    """
    wp = P * tw
    a = pl.program_id(0)  # z * gy + i
    bcol = pl.program_id(1)
    i = jax.lax.rem(a, gy)
    z = jax.lax.div(a, gy)

    inv_th = np.float32(1.0 / th)
    inv_tw = np.float32(1.0 / tw)
    inv_tz = np.float32(1.0 / tz)
    lk = jnp.concatenate([lut_ref[0, 0, k] for k in range(P)], axis=0)
    if split:
        lk = _split_luts(lk)

    zf = z.astype(jnp.float32) * inv_tz - np.float32(0.5)
    za = zf - jnp.floor(zf)            # scalar
    zb = np.float32(1.0) - za

    c = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    t = c // tw                        # per-lane tile-in-group
    j0 = bcol * P
    jl = j0 + t
    left = (c - t * tw) < (tw // 2)
    lx = jnp.logical_and(left, jl > 0)
    rx = jnp.logical_and(jnp.logical_not(left), jl < gx - 1)
    xg = (j0 * tw + c).astype(jnp.float32)
    txf = xg * inv_tw - np.float32(0.5)
    xa = txf - jnp.floor(txf)
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, wp), 0)

    win = v_ref[0]
    if quantize:
        win = jnp.clip(
            jnp.round(win * np.float32(255.0)), 0.0, 255.0
        ).astype(jnp.int32)
    for row in range(th):
        v = win[row : row + 1, :]
        mask = _onehot256(v, bins)
        sel = _select_luts(lk, mask, split)  # [P*18, wp]
        s0 = sel[0:9]
        s1 = sel[9:18]
        for k in range(1, P):
            pick = t == k
            s0 = jnp.where(pick, sel[k * 18 : k * 18 + 9], s0)
            s1 = jnp.where(pick, sel[k * 18 + 9 : k * 18 + 18], s1)

        yg = (i * th + row).astype(jnp.float32)
        tyf = yg * inv_th - np.float32(0.5)
        ya = tyf - jnp.floor(tyf)

        def blend(s):
            if row < th // 2:
                g1 = jnp.where(i > 0, s[0:3], s[3:6])
                g2 = s[3:6]
            else:
                g1 = s[3:6]
                g2 = jnp.where(i < gy - 1, s[6:9], s[3:6])
            v11 = jnp.where(lx, g1[0:1], g1[1:2])
            v12 = jnp.where(lx, g1[1:2], jnp.where(rx, g1[2:3], g1[1:2]))
            v21 = jnp.where(lx, g2[0:1], g2[1:2])
            v22 = jnp.where(lx, g2[1:2], jnp.where(rx, g2[2:3], g2[1:2]))
            return (v11 * (np.float32(1.0) - xa) + v12 * xa) * (
                np.float32(1.0) - ya
            ) + (v21 * (np.float32(1.0) - xa) + v22 * xa) * ya

        r0 = blend(s0).astype(jnp.float32)
        r1 = blend(s1).astype(jnp.float32)
        res = r0 * zb + r1 * za
        if finalize == "u8norm":
            res = jnp.clip(jnp.rint(res), 0.0, 255.0) / np.float32(255.0)
        elif finalize == "clip01":
            res = jnp.clip(res, 0.0, 1.0)
        out_ref[0, row : row + 1, :] = res


def tile33z_supported(
    shape: tuple[int, int, int], grid: tuple[int, int, int]
) -> bool:
    """Shape gate for the fused 3-D tile33-z apply (same alignment rules
    as the 2-D tile33 path — with narrow tw=32 tiles riding in groups
    of four — plus z tile-divisibility)."""
    z, h, w = shape
    gz, gy, gx = grid
    if z % gz or h % gy or w % gx:
        return False
    tz, th, tw = z // gz, h // gy, w // gx
    if not _tile33_group(tw, gx):
        return False
    return th % 2 == 0 and (th * tw) % 128 == 0 and tz % 2 == 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "integer_luts", "interpret", "quantize_input", "finalize",
    ),
)
def clahe3d_apply_tile33z(
    vin: Array,
    luts: Array,
    grid: tuple[int, int, int],
    integer_luts: bool = True,
    interpret: bool = False,
    quantize_input: bool = False,
    finalize: str | None = None,
) -> Array:
    """Fused 3-D CLAHE apply: [Z, H, W] levels (or f32 [0,1] with
    quantize_input) x [gz, gy, gx, 256] LUTs -> [Z, H, W] f32.

    Bit-exact vs ops.volume3d._apply_luts_trilinear_gather (tested).
    The LUT operand is per-z-CELL, not per-slice: only gz+1 distinct
    (zlo, zhi) plane pairs exist (lpz = edge-padded z axis; cell k
    reads lpz[k] and lpz[k+1]), and the kernel's lut index_map routes
    each slice-row program to its cell's stack — [gz+1, gy, gx, 36*256]
    instead of [Z, ...], 1/tz of the HBM.
    """
    gz, gy, gx = grid
    Z, H, W = vin.shape
    tz, th, tw = Z // gz, H // gy, W // gx
    rows = vin.reshape(Z * gy, th, W)  # FREE

    lpz = jnp.pad(luts, ((1, 1), (0, 0), (0, 0), (0, 0)), mode="edge")

    def stack9(l):  # [gz+1, gy, gx, 256] -> [gz+1, gy, gx, 9, 256]
        lp = jnp.pad(l, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return jnp.stack(
            [lp[:, dy : dy + gy, dx : dx + gx]
             for dy in range(3) for dx in range(3)],
            axis=3,
        )

    s18 = jnp.concatenate(
        [stack9(lpz[: gz + 1]), stack9(lpz[1 : gz + 2])], axis=3
    )  # [gz+1, gy, gx, 18, 256]
    P = _tile33_group(tw, gx)
    cl_in = s18.astype(jnp.bfloat16) if integer_luts else s18
    cl_in = cl_in.reshape((gz + 1) * gy, gx // P, P, 18, NBINS)

    hz = tz // 2
    kernel = functools.partial(
        _apply33z_kernel, th=th, tw=tw, gy=gy, gx=gx, tz=tz,
        split=not integer_luts, quantize=quantize_input, finalize=finalize,
        P=P,
    )
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(Z * gy, gx // P),
        in_specs=[
            pl.BlockSpec((1, th, P * tw), lambda a, b: (a, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, P, 18, NBINS),
                # z-cell of slice a//gy is (a//gy + tz//2) // tz
                lambda a, b: (
                    ((a // gy + hz) // tz) * gy + a % gy, b, 0, 0, 0
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, th, P * tw), lambda a, b: (a, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Z * gy, th, W), jnp.float32),
    )(rows, cl_in)
    return out.reshape(Z, H, W)


def _finalize_xla(res: Array, finalize: str | None) -> Array:
    """XLA-side twin of the in-kernel ``finalize`` epilogue — used by
    the apply paths that don't fold it into their Pallas kernel."""
    if finalize == "u8norm":
        return jnp.clip(jnp.rint(res), 0, 255) / 255.0
    if finalize == "clip01":
        return jnp.clip(res, 0.0, 1.0)
    return res


def _levels_from_float(x: Array) -> Array:
    """XLA-side uint8 level quantize (the exact ops the kernels run
    in-kernel under quantize_input=True)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * 255.0), 0, 255).astype(
        jnp.int32
    )


def _apply_lut_tile33(
    u8: Array,
    luts: Array,
    grid_size,
    integer_luts: bool,
    interpret: bool,
    variant: str = "v1",
    quantize_input: bool = False,
    finalize: str | None = None,
) -> Array:
    """3x3-stack tile-aligned apply: no pad, no crop, no _cell_luts.

    ``variant`` selects the production kernel ("v1") or the measured-
    slower bit-equal forms kept for re-measurement ("v2"/"v3" —
    kernels/clahe_variants.py; docs/KERNELS.md round 4). Callers
    resolve the MIES_TPU_APPLY33 env var BEFORE jit dispatch so the
    choice participates in the jit cache key (reading it at trace time
    silently ignored mid-process flips)."""
    B, H, W = u8.shape
    gy, gx = grid_size
    th, tw = H // gy, W // gx
    rows = u8.reshape(B * gy, th, W)  # FREE

    # 3x3 neighbor stacks: edge-pad the LUT grid, take 9 shifted slices
    lp = jnp.pad(luts, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    stack = jnp.stack(
        [lp[:, dy : dy + gy, dx : dx + gx] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # [B, gy, gx, 9, 256]
    # integer LUTs ship bf16 (exact); fractional LUTs ship f32 and are
    # hi/lo-split inside the kernel (_select_luts)
    P = _tile33_group(tw, gx, max_p=8)
    cl_in = stack.astype(jnp.bfloat16) if integer_luts else stack
    cl_in = cl_in.reshape(B * gy, gx // P, P, 9, NBINS)

    if variant == "v3" and th % 2:
        variant = "v1"  # v3 processes row PAIRS; odd tile heights can't
    if P != 2:
        variant = "v1"  # the re-measurement variants are P=2-only
    if variant in ("v2", "v3"):
        from mies_tpu.kernels import clahe_variants as CV

        body = (
            CV._apply33_kernel_v2 if variant == "v2"
            else CV._apply33_kernel_v3
        )
        # the re-measurement variants don't fold quantize/finalize;
        # run both XLA-side around them (identical semantics)
        if quantize_input:
            rows = _levels_from_float(rows)
            quantize_input = False
        xla_finalize, finalize = finalize, None
        kernel = functools.partial(
            body, th=th, tw=tw, gy=gy, gx=gx, split=not integer_luts
        )
    else:
        body = _apply33_kernel
        xla_finalize = None
        kernel = functools.partial(
            body, th=th, tw=tw, gy=gy, gx=gx, split=not integer_luts,
            quantize=quantize_input, finalize=finalize, P=P,
        )
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B * gy, gx // P),
        in_specs=[
            pl.BlockSpec((1, th, P * tw), lambda a, b: (a, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P, 9, NBINS), lambda a, b: (a, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, P * tw), lambda a, b: (a, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * gy, th, W), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((1, 4 * tw), jnp.int32)] if variant == "v3" else []
        ),
    )(rows, cl_in)
    return _finalize_xla(out, xla_finalize).reshape(B, H, W)


def _apply_lut_slab(
    u8: Array, luts: Array, grid_size, integer_luts: bool, interpret: bool
) -> Array:
    """Slab-layout apply: zero XLA transposes (reshapes only + pads)."""
    B, H, W = u8.shape
    gy, gx = grid_size
    th, tw = H // gy, W // gx
    th2, tw2 = th // 2, tw // 2
    npx = th * tw
    gy1 = gy + 1
    gx1p = gx + 1 + ((gx + 1) % 2)  # even number of cell columns

    vp = jnp.pad(u8, ((0, 0), (th2, th2), (tw2, tw2)), mode="edge")
    extra_cols = gx1p * tw - (W + tw)
    if extra_cols:
        vp = jnp.pad(vp, ((0, 0), (0, 0), (0, extra_cols)), mode="edge")
    slabs = vp.reshape(B * gy1, th, gx1p * tw)  # FREE

    cl = _cell_luts(luts, gy, gx)  # [B, gy1, gx+1, 4, 256] f32
    cl_in = cl.astype(jnp.bfloat16) if integer_luts else cl
    if gx1p != gx + 1:
        cl_in = jnp.concatenate([cl_in, cl_in[:, :, -1:]], axis=2)
    cl_in = cl_in.reshape(B * gy1, gx1p // 2, 2, 4, NBINS)

    kernel = functools.partial(
        _apply_kernel_slab, th=th, tw=tw, gy1=gy1, split=not integer_luts
    )
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(B * gy1, gx1p // 2),
        in_specs=[
            pl.BlockSpec((1, th, 2 * tw), lambda a, b: (a, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, 4, NBINS), lambda a, b: (a, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, 2 * tw), lambda a, b: (a, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * gy1, th, gx1p * tw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, npx), jnp.int32),
            pltpu.VMEM((1, npx), jnp.float32),
        ],
    )(slabs, cl_in)
    outp = out.reshape(B, gy1 * th, gx1p * tw)  # FREE
    return outp[:, th2 : th2 + H, tw2 : tw2 + W]


def clahe_apply_lut(
    u8: Array,
    luts: Array,
    grid_size: tuple[int, int],
    integer_luts: bool = True,
    interpret: bool = False,
    quantize_input: bool = False,
    finalize: str | None = None,
) -> Array:
    """Public entry: resolves the MIES_TPU_APPLY33 variant env var HERE
    (before jit dispatch) so it keys the jit cache — a mid-process flip
    retraces instead of silently reusing the previous variant's trace."""
    import os

    return _clahe_apply_lut_jit(
        u8, luts, grid_size, integer_luts, interpret,
        os.environ.get("MIES_TPU_APPLY33", "v1"),
        quantize_input, finalize,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "integer_luts", "interpret", "variant",
        "quantize_input", "finalize",
    ),
)
def _clahe_apply_lut_jit(
    u8: Array,
    luts: Array,
    grid_size: tuple[int, int],
    integer_luts: bool = True,
    interpret: bool = False,
    variant: str = "v1",
    quantize_input: bool = False,
    finalize: str | None = None,
) -> Array:
    """Bilinear per-pixel LUT interpolation (Pallas, gatherless).

    u8:   [B, H, W] int32 levels in [0, 255]; H % gy == 0, W % gx == 0,
          even tile sizes, tile_px % 128 == 0 (pipeline pads beforehand).
          With quantize_input=True it is instead f32 [0,1] and the level
          quantize runs in-kernel (tile33 path) or XLA-side (others) —
          bit-identical levels either way, but the tile33 path skips the
          int32 HBM intermediate.
    luts: [B, gy, gx, 256] float32 (integer-valued iff integer_luts).
    Returns [B, H, W] float32 un-rounded interpolated values — the exact
    f32 numbers OpenCV computes before its final saturate_cast — unless
    ``finalize`` folds a convention epilogue in: 'u8norm' =
    clip(rint(res),0,255)/255, 'clip01' = clip(res,0,1).

    Three layouts, identical results: the tile33 path (grid cols
    divisible by a P in {2,4,8} with P*tw 128-lane-aligned — covers
    tw = 16/32/48/64/80/96/112/128..., see _tile33_group) reads
    original tiles with zero padding/cropping; the slab path covers
    wide tiles with odd grid columns; the cell-list path handles the
    rest.
    """
    gy_, gx_ = grid_size
    tw_ = u8.shape[2] // gx_
    th_ = u8.shape[1] // gy_
    if th_ % 2 == 0 and (th_ * tw_) % 128 == 0:
        if _tile33_group(tw_, gx_, max_p=8):
            return _apply_lut_tile33(
                u8, luts, grid_size, integer_luts, interpret, variant,
                quantize_input, finalize,
            )
        if tw_ % 64 == 0:
            # wide tiles but odd grid cols: the slab layout
            if quantize_input:
                u8 = _levels_from_float(u8)
            return _finalize_xla(
                _apply_lut_slab(
                    u8, luts, grid_size, integer_luts, interpret
                ),
                finalize,
            )
    if quantize_input:
        u8 = _levels_from_float(u8)
    return _finalize_xla(
        _apply_lut_cells(u8, luts, grid_size, integer_luts, interpret),
        finalize,
    )


def _apply_lut_cells(
    u8: Array, luts: Array, grid_size, integer_luts: bool, interpret: bool
) -> Array:
    """Cell-list apply: gathers cells with XLA transposes; handles tiles
    the slab layout cannot (tw not a multiple of 64)."""
    B, H, W = u8.shape
    gy, gx = grid_size
    th, tw = H // gy, W // gx
    if th % 2 or tw % 2 or (th * tw) % 128:
        raise ValueError(f"tile {th}x{tw} unsupported (need even, px % 128 == 0)")
    th2, tw2 = th // 2, tw // 2
    npx = th * tw

    # Pad so cells form a uniform (gy+1, gx+1) grid (pad values only land
    # in cropped rows/cols), then flatten each cell row-major so the
    # kernel sees pixels on the 128-lane axis with no in-kernel relayout.
    vp = jnp.pad(u8, ((0, 0), (th2, th2), (tw2, tw2)), mode="edge")
    ncells = (gy + 1) * (gx + 1)
    cells = (
        vp.reshape(B, gy + 1, th, gx + 1, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * ncells, npx)
    )

    cl = _cell_luts(luts, gy, gx)  # [B, gy+1, gx+1, 4, 256] f32
    cl_in = cl.astype(jnp.bfloat16) if integer_luts else cl
    cl_in = cl_in.reshape(B * ncells, 4, NBINS)

    # pad the cell count to the per-program blocking
    total = B * ncells
    cpp = _CELLS_PER_PROGRAM
    pad_cells = (-total) % cpp
    if pad_cells:
        cells = jnp.concatenate([cells, cells[:pad_cells]], axis=0)
        cl_in = jnp.concatenate([cl_in, cl_in[:pad_cells]], axis=0)

    kernel = functools.partial(
        _apply_kernel, th=th, tw=tw, gx1=gx + 1, ncells=ncells,
        split=not integer_luts,
    )
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=((total + pad_cells) // cpp,),
        in_specs=[
            pl.BlockSpec((cpp, npx), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cpp, 4, NBINS), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpp, npx), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total + pad_cells, npx), jnp.float32),
    )(cells, cl_in)

    # cells -> padded image -> crop
    outp = (
        out[:total]
        .reshape(B, gy + 1, gx + 1, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, (gy + 1) * th, (gx + 1) * tw)
    )
    return outp[:, th2 : th2 + H, tw2 : tw2 + W]


# ---------------------------------------------------------------------------
# Full CLAHE entry point (hist via onehot matmul, apply via Pallas)
# ---------------------------------------------------------------------------


_TILES_PER_PROGRAM = 8


def _hist_kernel(v_ref, out_ref, *, npx: int):
    """Nibble outer-product histogram for _TILES_PER_PROGRAM tiles.

    v_ref:   [TPP, npx] int32 pixel levels (pixels on lanes)
    out_ref: [TPP, 16, 16] f32 — row-major [16, 16] IS the 256-bin
             histogram (bin = hi*16 + lo)
    """
    i16 = jax.lax.broadcasted_iota(jnp.int32, (16, npx), 0)
    for k in range(_TILES_PER_PROGRAM):
        v = v_ref[k : k + 1, :]
        mhi = (i16 == (v >> 4)).astype(jnp.bfloat16)
        mlo = (i16 == (v & 15)).astype(jnp.bfloat16)
        out_ref[k] = jax.lax.dot_general(
            mhi, mlo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


@functools.partial(jax.jit, static_argnames=("gy", "gx", "interpret"))
def tile_hists_pallas(
    u8: Array, gy: int, gx: int, interpret: bool = False
) -> Array:
    """Per-tile histograms, Pallas: [B, H, W] int32 -> [B, gy, gx, 256].

    Same nibble outer product as _tile_hists_onehot but with the masks
    built in VMEM (never touching HBM) and the [16, npx] x [npx, 16]
    dot on the MXU per tile — measured 1.66 (full onehot) -> 1.01 (jnp
    nibble) -> 0.58 ms per batch-32 512^2. Exact f32 counts (0/1 bf16
    products). Requires npx % 128 == 0 (clahe_supported guards).
    """
    B, H, W = u8.shape
    th, tw = H // gy, W // gx
    npx = th * tw
    tiles = (
        u8.reshape(B, gy, th, gx, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * gy * gx, npx)
    )
    total = tiles.shape[0]
    tpp = _TILES_PER_PROGRAM
    pad = (-total) % tpp
    if pad:
        # zeros, not tiles[:pad]: when total < pad the slice is short and
        # the array would not divide into blocks (padding rows' counts
        # are discarded below, so their content is irrelevant)
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad, npx), tiles.dtype)], axis=0
        )
    out = pl.pallas_call(
        functools.partial(_hist_kernel, npx=npx),
        interpret=interpret,
        grid=((total + pad) // tpp,),
        in_specs=[
            pl.BlockSpec((tpp, npx), lambda g: (g, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tpp, 16, 16), lambda g: (g, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((total + pad, 16, 16), jnp.float32),
    )(tiles)
    return out[:total].reshape(B, gy, gx, NBINS)


def _hist_rows_kernel(v_ref, out_ref, *, th: int, tw: int,
                      quantize: bool = False):
    """Rows-layout nibble histogram: v_ref [1, th, 2*tw] int32 (two
    adjacent tiles of one tile-row, the SAME block shape the apply
    kernel reads) -> out_ref [1, 2, 16, 16] f32 histograms.

    Per slab row: full-width nibble masks (compares at 128 lanes), then
    one accumulating [16, tw] x [tw, 16] dot per tile (static lane
    slices of the masks). The [16, 16] f32 accumulators live in
    registers across the unrolled row loop — integer counts, exact.
    Removes the XLA tiles transpose entirely (hist and apply now share
    one free reshape; measured 0.65 -> 0.56 ms for hist+LUT per
    batch-32 512^2).

    quantize=True: v_ref is f32 [0,1]; the uint8 level quantize
    (clip(round(v*255))) runs in-kernel on the VPU, eliminating the
    XLA level-quantize pass's int32 HBM intermediate. Same round-half-
    even + cast ops as the XLA form — bit-identical levels."""
    w2 = 2 * tw
    i16 = jax.lax.broadcasted_iota(jnp.int32, (16, w2), 0)
    win = v_ref[0]
    if quantize:
        win = jnp.clip(
            jnp.round(win * np.float32(255.0)), 0.0, 255.0
        ).astype(jnp.int32)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc0 = jnp.zeros((16, 16), jnp.float32)
    acc1 = jnp.zeros((16, 16), jnp.float32)
    for row in range(th):
        v = win[row : row + 1, :]
        mhi = (i16 == (v >> 4)).astype(jnp.bfloat16)  # [16, w2]
        mlo = (i16 == (v & 15)).astype(jnp.bfloat16)
        acc0 = acc0 + dot(mhi[:, :tw], mlo[:, :tw])
        acc1 = acc1 + dot(mhi[:, tw:], mlo[:, tw:])
    out_ref[0, 0] = acc0
    out_ref[0, 1] = acc1


@functools.partial(
    jax.jit, static_argnames=("gy", "gx", "interpret", "quantize_input")
)
def tile_hists_rows_pallas(
    u8: Array, gy: int, gx: int, interpret: bool = False,
    quantize_input: bool = False,
) -> Array:
    """Per-tile histograms from the rows layout (no XLA transpose):
    [B, H, W] int32 -> [B, gy, gx, 256]. Requires gx % 2 == 0.

    quantize_input=True: input is f32 [0,1] and the uint8 level
    quantize happens in-kernel (no int32 HBM intermediate)."""
    B, H, W = u8.shape
    th, tw = H // gy, W // gx
    rows = u8.reshape(B * gy, th, W)  # FREE
    out = pl.pallas_call(
        functools.partial(_hist_rows_kernel, th=th, tw=tw,
                          quantize=quantize_input),
        interpret=interpret,
        grid=(B * gy, gx // 2),
        in_specs=[pl.BlockSpec((1, th, 2 * tw), lambda a, b: (a, 0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2, 16, 16), lambda a, b: (a, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * gy, gx, 16, 16), jnp.float32),
    )(rows)
    return out.reshape(B, gy, gx, NBINS)


def _tile_hists_onehot(u8: Array, gy: int, gx: int) -> Array:
    """Per-tile histograms via NIBBLE OUTER PRODUCT on the MXU.

    [B, H, W] int32 -> [B, gy, gx, 256], exact f32 counts.

    hist[hi*16 + lo] = sum_p onehot4(v_p >> 4)[hi] * onehot4(v_p & 15)[lo]
    — one [16, npx] x [npx, 16] matmul per tile whose row-major [16, 16]
    result IS the 256-bin histogram. 32 compares/pixel instead of the
    full-onehot form's 256 (measured 1.66 -> 0.90 ms per batch-32 512^2;
    the old 'tpb,p->tb' matvec was VPU-bound on the compares). Counts
    stay exact: 0/1 bf16 products, f32 accumulation.
    """
    B, H, W = u8.shape
    th, tw = H // gy, W // gx
    tiles = (
        u8.reshape(B, gy, th, gx, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * gy * gx, th * tw)
    )
    hi = tiles >> 4
    lo = tiles & 15
    i16 = jnp.arange(16, dtype=jnp.int32)
    ohh = (hi[:, :, None] == i16).astype(jnp.bfloat16)
    ohl = (lo[:, :, None] == i16).astype(jnp.bfloat16)
    hists = jnp.einsum(
        "tph,tpl->thl", ohh, ohl, preferred_element_type=jnp.float32
    )
    return hists.reshape(B, gy, gx, NBINS)


def _apply_maps_kernel(v_ref, map_ref, out_ref, *, kr: int, kc: int):
    """skimage interpolation blocks: selection-by-matmul + arange(k)/k
    coefficient blend + truncating floor.

    v_ref:   [8, npx] int32 bin indices (blocks row-major, npx = kr*kc)
    map_ref: [8, 4, 256] f32 integer-valued region maps < 2^14 — the
             in-kernel hi/lo split keeps the selection EXACT (bf16 hi
             holds the top 8 bits, the integer residual < 2^6 is exact
             in the lo half); XLA-side splitting is forbidden (module
             docstring).
    out_ref: [8, npx] f32 floored map values (uint14 range).

    Unlike the OpenCV cells kernel there is NO in-kernel corner
    clamping: skimage pre-pads the map grid edge-replicated, so the 4
    corner maps arrive ready. Coefficients replicate the jnp twin's
    exact arithmetic (true division by kr/kc, same product and
    accumulation order)."""
    npx = kr * kc
    pi = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    wy = (pi // kc).astype(jnp.float32) / np.float32(kr)
    wx = (pi % kc).astype(jnp.float32) / np.float32(kc)
    one = np.float32(1.0)
    c00 = (one - wy) * (one - wx)
    c01 = (one - wy) * wx
    c10 = wy * (one - wx)
    c11 = wy * wx
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, npx), 0)
    for k in range(_CELLS_PER_PROGRAM):
        v = v_ref[k : k + 1, :]
        mask = _onehot256(v, bins)  # [256, npx], exact 0/1 bf16
        hi, lo = _split_luts(map_ref[k])
        sel = _dot(hi, mask) + _dot(lo, mask)  # [4, npx] exact
        acc = (
            sel[0:1] * c00 + sel[1:2] * c01 + sel[2:3] * c10 + sel[3:4] * c11
        )
        out_ref[k : k + 1, :] = jnp.floor(acc)


def _blocks8_kernel(
    v_ref,    # [8, chunk] int32 bin indices (one chunk of 8 blocks)
    map_ref,  # [8, 8, 256] f32 corner maps (ez,ey,ex lexicographic)
    out_ref,  # [8, chunk] f32
    *,
    dims: tuple[int, int, int],     # (kz, kr, kc) block shape
    grids: tuple[int, int, int],    # (n_z, n_y, n_x) block grid
    chunk: int,
    mode: str,                      # 'skimage' | 'opencv'
    split: bool,                    # hi/lo split (maps >= 2^8)
):
    """8-corner (trilinear) blocks selection for the 3-D CLAHE paths.

    mode='skimage': arange(k)/k coefficients (cell-independent, true
    division — the jnp transcription's exact arithmetic), sum of the 8
    sel*coeff terms in corner order, truncating floor.
    mode='opencv': per-axis OpenCV fracs computed in-kernel from the
    block's GLOBAL cell identity (flat block id -> (iz, iy, ix), voxel
    coord n = i*t - t//2 + local, a = frac(n*inv - 0.5) — the same f32
    ops as ops.volume3d._axis_weights), nested x->y->z lerp.

    Selection exactness: opencv maps are integers <= 255 (bf16-exact,
    one dot); skimage maps are integers < 2^14 (exact via the in-kernel
    hi/lo split). Fraction-convention maps are NOT integer — that path
    stays on the jnp selection (HIGH-precision, exact).
    """
    kz, kr, kc = dims
    nz, ny, nx = grids
    base = pl.program_id(0) * _CELLS_PER_PROGRAM
    coff = pl.program_id(1) * chunk

    p = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + coff
    rz = p // (kr * kc)
    rem = p % (kr * kc)
    ry = rem // kc
    rx = rem % kc
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, chunk), 0)

    if mode == "skimage":
        wz = rz.astype(jnp.float32) / np.float32(kz)
        wy = ry.astype(jnp.float32) / np.float32(kr)
        wx = rx.astype(jnp.float32) / np.float32(kc)
        one = np.float32(1.0)
        cs = []
        for ez in range(2):
            cz = wz if ez else one - wz
            for ey in range(2):
                cy = wy if ey else one - wy
                for ex in range(2):
                    cx = wx if ex else one - wx
                    cs.append((cz * cy) * cx)

    for k in range(_CELLS_PER_PROGRAM):
        v = v_ref[k : k + 1, :]
        mask = _onehot256(v, bins)  # [256, chunk] exact 0/1 bf16
        sel = _select_luts(map_ref[k], mask, split)  # [8, chunk]

        if mode == "skimage":
            acc = sel[0:1] * cs[0]
            for e in range(1, 8):
                acc = acc + sel[e : e + 1] * cs[e]
            out_ref[k : k + 1, :] = jnp.floor(acc)
        else:
            b = base + k
            iz = jax.lax.div(b, ny * nx)
            r2 = jax.lax.rem(b, ny * nx)
            iy = jax.lax.div(r2, nx)
            ix = jax.lax.rem(r2, nx)

            def frac(i, local, t):
                n = (i * t - t // 2 + local).astype(jnp.float32)
                f = n * (np.float32(1.0) / np.float32(t)) - np.float32(0.5)
                return f - jnp.floor(f)

            az = frac(iz, rz, kz)
            ay = frac(iy, ry, kr)
            ax = frac(ix, rx, kc)
            one = np.float32(1.0)
            c00 = sel[0:1] * (one - ax) + sel[1:2] * ax
            c01 = sel[2:3] * (one - ax) + sel[3:4] * ax
            c10 = sel[4:5] * (one - ax) + sel[5:6] * ax
            c11 = sel[6:7] * (one - ax) + sel[7:8] * ax
            c0 = c00 * (one - ay) + c01 * ay
            c1 = c10 * (one - ay) + c11 * ay
            out_ref[k : k + 1, :] = c0 * (one - az) + c1 * az


def _blocks4_fracs_kernel(
    v_ref,   # [8, chunk] int32 bin indices
    m4_ref,  # [8, 4, 256] maps (bf16 integer or f32 fractional)
    ya_ref,  # [8, chunk] f32 y fracs (precomputed — band offsets are traced)
    xa_ref,  # [8, chunk] f32 x fracs
    out_ref,  # [8, chunk] f32
    *,
    split: bool,
):
    """4-corner bilinear blocks selection with frac INPUTS.

    Used by _bilinear_lut_apply_selection (the band/fallback 2-D apply):
    the cell identity there involves a TRACED row offset (shard_map
    axis_index), so the OpenCV fracs are computed XLA-side with the
    exact _bilinear_lut_apply arithmetic and shipped as blocks instead
    of being derived in-kernel. Blend: x lerp then y lerp — the same op
    order as the gather form."""
    chunk = out_ref.shape[1]
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, chunk), 0)
    one = np.float32(1.0)
    for k in range(_CELLS_PER_PROGRAM):
        v = v_ref[k : k + 1, :]
        mask = _onehot256(v, bins)
        sel = _select_luts(m4_ref[k], mask, split)  # [4, chunk]
        xa = xa_ref[k : k + 1, :]
        ya = ya_ref[k : k + 1, :]
        top = sel[0:1] * (one - xa) + sel[1:2] * xa
        bot = sel[2:3] * (one - xa) + sel[3:4] * xa
        out_ref[k : k + 1, :] = top * (one - ya) + bot * ya


def blocks4_fracs_apply(
    blocks: Array,
    m4: Array,
    yab: Array,
    xab: Array,
    integer_luts: bool,
    interpret: bool = False,
) -> Array:
    """Run _blocks4_fracs_kernel over [NB, npx] blocks."""
    nb, npx = blocks.shape
    chunk = min(npx, 4096)
    cpp = _CELLS_PER_PROGRAM
    pad = (-nb) % cpp
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, npx), blocks.dtype)], axis=0
        )
        m4 = jnp.concatenate([m4, jnp.zeros((pad, 4, NBINS), m4.dtype)], axis=0)
        zf = jnp.zeros((pad, npx), jnp.float32)
        yab = jnp.concatenate([yab, zf], axis=0)
        xab = jnp.concatenate([xab, zf], axis=0)
    maps_in = m4.astype(jnp.bfloat16) if integer_luts else m4
    out = pl.pallas_call(
        functools.partial(_blocks4_fracs_kernel, split=not integer_luts),
        interpret=interpret,
        grid=((nb + pad) // cpp, npx // chunk),
        in_specs=[
            pl.BlockSpec((cpp, chunk), lambda g, c: (g, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpp, 4, NBINS), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpp, chunk), lambda g, c: (g, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpp, chunk), lambda g, c: (g, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpp, chunk), lambda g, c: (g, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb + pad, npx), jnp.float32),
    )(blocks, maps_in, yab, xab)
    return out[:nb]


def blocks8_supported(npx: int) -> bool:
    """Chunking gate for the 8-corner blocks kernel."""
    chunk = min(npx, 4096)
    return npx % 128 == 0 and npx % chunk == 0 and chunk % 128 == 0


def blocks8_apply(
    blocks: Array,
    m8: Array,
    dims: tuple[int, int, int],
    grids: tuple[int, int, int],
    mode: str,
    split: bool,
    interpret: bool = False,
) -> Array:
    """Run _blocks8_kernel over [NB, npx] blocks with [NB, 8, 256] maps."""
    nb, npx = blocks.shape
    chunk = min(npx, 4096)
    cpp = _CELLS_PER_PROGRAM
    pad = (-nb) % cpp
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, npx), blocks.dtype)], axis=0
        )
        m8 = jnp.concatenate(
            [m8, jnp.zeros((pad, 8, NBINS), m8.dtype)], axis=0
        )
    maps_in = m8 if split else m8.astype(jnp.bfloat16)
    out = pl.pallas_call(
        functools.partial(
            _blocks8_kernel, dims=dims, grids=grids, chunk=chunk,
            mode=mode, split=split,
        ),
        interpret=interpret,
        grid=((nb + pad) // cpp, npx // chunk),
        in_specs=[
            pl.BlockSpec((cpp, chunk), lambda g, c: (g, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpp, 8, NBINS), lambda g, c: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpp, chunk), lambda g, c: (g, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb + pad, npx), jnp.float32),
    )(blocks, maps_in)
    return out[:nb]


def _apply_maps_rows_kernel(
    v_ref,    # [1, kr, 2*kc] int32: two adjacent blocks of one block-row
    map_ref,  # [1, 1, 2, 4, 256] f32 corner maps per block
    out_ref,  # [1, kr, 2*kc] f32
    *,
    kr: int,
    kc: int,
):
    """Rows-layout skimage interpolation: the blocks arrive as a FREE
    reshape of the binned image (no XLA flat-blocks transposes — they
    were 4.0 of the 4.9 ms skimage fast path). Per slab row: one
    [8, 256] x [256, 2kc] split-dot selection (both blocks' corner maps
    stacked), a per-lane half select, and the arange(k)/k coefficient
    blend with wy a STATIC per-row scalar — same f32 values and op
    order as the jnp twin (scalar x vector products), truncating floor.
    skimage needs no corner clamping (the map grid is pre-padded), so
    this is simpler than the OpenCV tile33 kernel."""
    w2 = 2 * kc
    m = jnp.concatenate([map_ref[0, 0, 0], map_ref[0, 0, 1]], axis=0)
    m = _split_luts(m)  # integer maps < 2^14: exact hi/lo
    c = jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1)
    half = c >= kc
    cl = c - half.astype(jnp.int32) * kc
    wx = cl.astype(jnp.float32) / np.float32(kc)
    one = np.float32(1.0)
    cx0 = one - wx
    cx1 = wx
    bins = jax.lax.broadcasted_iota(jnp.int32, (NBINS, w2), 0)
    win = v_ref[0]
    for row in range(kr):
        v = win[row : row + 1, :]
        mask = _onehot256(v, bins)
        sel = _select_luts(m, mask, True)  # [8, w2]
        s = jnp.where(half, sel[4:8], sel[0:4])
        wy = np.float32(row) / np.float32(kr)
        cy0 = one - wy
        acc = (
            s[0:1] * (cy0 * cx0)
            + s[1:2] * (cy0 * cx1)
            + s[2:3] * (wy * cx0)
            + s[3:4] * (wy * cx1)
        )
        out_ref[0, row : row + 1, :] = jnp.floor(acc)


def _stretch_out_batched(result: Array) -> Array:
    """Per-image img_as_float + final rescale_intensity (the batched
    twin of ops.histogram._skimage_stretch_out), shared by both apply
    layouts so their bit-identity contract has one implementation."""
    rmin = jnp.min(result, axis=(1, 2), keepdims=True)
    rmax = jnp.max(result, axis=(1, 2), keepdims=True)
    out = jnp.where(
        rmax > rmin,
        (result - rmin) / jnp.maximum(rmax - rmin, 1.0),
        jnp.clip(result / 65535.0, 0.0, 1.0),
    )
    return out.astype(jnp.float32)


def clahe_skimage_supported(
    shape: tuple[int, int], kernel_size: tuple[int, int], nbins: int = NBINS
) -> bool:
    """Pallas fast-path gate for the skimage convention."""
    kr, kc = kernel_size
    npx = kr * kc
    return (
        nbins == NBINS
        and kr > 0
        and kc > 0
        and npx % 128 == 0
        and npx <= 8192  # [256, npx] bf16 mask must fit VMEM comfortably
    )


def clahe_skimage_tpu(
    batch: Array,
    kernel_size: tuple[int, int],
    clip_limit: float,
    nbins: int = NBINS,
    interpret: bool = False,
) -> Array:
    """Batched TRUE-skimage equalize_adapthist on [B, H, W] float [0,1].

    Same semantics as ops.histogram._clahe_skimage (the transcribed
    skimage 0.26 algorithm), with the two hot stages on Pallas: the
    region histograms (nibble outer-product kernels) and the block
    interpolation — _apply_maps_rows_kernel for kc % 64 == 0 (the free
    rows reshape, no flat-blocks transposes), _apply_maps_kernel
    otherwise. Selection and counts are exact, so results match the
    vmapped jnp path up to FMA-contraction ties in the coefficient
    blend (same contract as the golden tests). Measured 17.4 -> 3.7 ms
    per batch-32 512^2 (4.7x), bit-identical on chip.

    Cites: reference pyproject.toml:12 (scikit-image), SURVEY.md
    section 4 item 1.
    """
    from mies_tpu.ops import histogram as H

    B, h0, w0 = batch.shape
    kr, kc = kernel_size
    k_elems = kr * kc

    # img_as_uint + rescale_intensity to 14-bit gray, per image
    x = batch.astype(jnp.float32)
    u16 = jnp.clip(jnp.rint(x * 65535.0), 0, 65535)
    vmin = jnp.min(u16, axis=(1, 2), keepdims=True)
    vmax = jnp.max(u16, axis=(1, 2), keepdims=True)
    span = vmax - vmin
    scaled = jnp.where(
        span > 0,
        (u16 - vmin) / jnp.maximum(span, 1.0) * (H.NR_OF_GRAY - 1),
        jnp.clip(u16, 0, H.NR_OF_GRAY - 1),
    )
    image = jnp.rint(scaled).astype(jnp.int32)

    pr0, pc0 = kr // 2, kc // 2
    pr1 = (kr - h0 % kr) % kr + -(-kr // 2)
    pc1 = (kc - w0 % kc) % kc + -(-kc // 2)
    image = jnp.pad(image, ((0, 0), (pr0, pr1), (pc0, pc1)), mode="reflect")
    _, h, w = image.shape
    bin_size = 1 + H.NR_OF_GRAY // nbins
    binned = image // bin_size

    nr, nc = h // kr - 1, w // kc - 1
    clim = int(np.clip(clip_limit * k_elems, 1, None))
    crop = binned[:, pr0 : pr0 + nr * kr, pc0 : pc0 + nc * kc]
    if nc % 2 == 0 and kc % 64 == 0:
        hists = tile_hists_rows_pallas(crop, nr, nc, interpret=interpret)
    else:
        hists = tile_hists_pallas(crop, nr, nc, interpret=interpret)
    hists = hists.astype(jnp.int32).reshape(B * nr * nc, nbins)
    hists = H._clip_histogram_skimage(hists, clim, nbins)
    maps = H._skimage_maps(hists, k_elems).reshape(B, nr, nc, nbins)
    map_array = jnp.pad(maps, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    nbr, nbc = h // kr, w // kc
    m4g = jnp.stack(
        [
            map_array[:, 0:nbr, 0:nbc],
            map_array[:, 0:nbr, 1 : nbc + 1],
            map_array[:, 1 : nbr + 1, 0:nbc],
            map_array[:, 1 : nbr + 1, 1 : nbc + 1],
        ],
        axis=3,
    )  # [B, nbr, nbc, 4, nbins]

    if kc % 64 == 0:
        # rows layout: blocks are a FREE reshape — no flat-blocks
        # transposes (they were 4.0 of the 4.9 ms fast path). Odd block
        # columns pad one edge-duplicated column (cropped below).
        # kc must be a MULTIPLE of 64: the [1, kr, 2kc] blocks index at
        # lane offset b*2kc, and Mosaic needs those 128-aligned (the
        # same constraint as the OpenCV tile33 gate); other kc fall
        # through to the flat-blocks kernel below.
        nbc_p = nbc + (nbc % 2)
        bp = binned
        if nbc_p != nbc:
            bp = jnp.pad(binned, ((0, 0), (0, 0), (0, kc)), mode="edge")
            m4g = jnp.concatenate([m4g, m4g[:, :, -1:]], axis=2)
        rows = bp.reshape(B * nbr, kr, nbc_p * kc)  # FREE
        m_in = m4g.reshape(B * nbr, nbc_p // 2, 2, 4, nbins)
        out = pl.pallas_call(
            functools.partial(_apply_maps_rows_kernel, kr=kr, kc=kc),
            interpret=interpret,
            grid=(B * nbr, nbc_p // 2),
            in_specs=[
                pl.BlockSpec((1, kr, 2 * kc), lambda a, b: (a, 0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2, 4, NBINS),
                             lambda a, b: (a, b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, kr, 2 * kc), lambda a, b: (a, 0, b),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (B * nbr, kr, nbc_p * kc), jnp.float32
            ),
        )(rows, m_in)
        result = out.reshape(B, h, nbc_p * kc)
        result = result[:, pr0 : h - pr1, pc0 : w - pc1]
        return _stretch_out_batched(result)

    m4 = m4g.reshape(B * nbr * nbc, 4, nbins)
    blocks = (
        binned.reshape(B, nbr, kr, nbc, kc)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * nbr * nbc, k_elems)
    )
    total = blocks.shape[0]
    cpp = _CELLS_PER_PROGRAM
    pad = (-total) % cpp
    if pad:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((pad, k_elems), blocks.dtype)], axis=0
        )
        m4 = jnp.concatenate(
            [m4, jnp.zeros((pad, 4, nbins), m4.dtype)], axis=0
        )
    out = pl.pallas_call(
        functools.partial(_apply_maps_kernel, kr=kr, kc=kc),
        interpret=interpret,
        grid=((total + pad) // cpp,),
        in_specs=[
            pl.BlockSpec((cpp, k_elems), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cpp, 4, NBINS), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpp, k_elems), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total + pad, k_elems), jnp.float32),
    )(blocks, m4)
    result = (
        out[:total]
        .reshape(B, nbr, nbc, kr, kc)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, h, w)
    )
    result = result[:, pr0 : h - pr1, pc0 : w - pc1]
    return _stretch_out_batched(result)


def clahe_supported(shape: tuple[int, int], grid_size: tuple[int, int]) -> bool:
    """Whether the Pallas fast path handles this (H, W) / grid combo."""
    h, w = shape
    gy, gx = grid_size
    if h % gy or w % gx:
        return False
    th, tw = h // gy, w // gx
    return th % 2 == 0 and tw % 2 == 0 and (th * tw) % 128 == 0


def clahe_batched(
    batch: Array,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int] = (8, 8),
    convention: str = "opencv",
    nbins: int = NBINS,
    kernel_size: tuple[int, int] | None = None,
) -> Array:
    """Backend-dispatching batched CLAHE: Pallas on TPU, jnp elsewhere.

    Used by the pipeline compiler for [B, H, W] inputs. Results are
    identical between the two paths (opencv is bit-exact vs cv2 on TPU;
    the skimage fast path reproduces the jnp transcription up to
    FMA-contraction floor ties — tests cross-check all of them).
    """
    from mies_tpu.ops import histogram as H

    if jax.default_backend() == "tpu" and nbins == NBINS:
        if convention == "skimage":
            ks = kernel_size
            if ks is None:
                gy, gx = grid_size
                ks = (max(batch.shape[-2] // gy, 1),
                      max(batch.shape[-1] // gx, 1))
            if clahe_skimage_supported(batch.shape[-2:], ks, nbins):
                return clahe_skimage_tpu(batch, ks, clip_limit, nbins)
        elif convention in ("opencv", "fraction") and clahe_supported(
            batch.shape[-2:], grid_size
        ):
            # kornia's even-ceil tiling / histc binning / linspace blend
            # don't match these kernels — it rides the vmapped jnp path
            return clahe_tpu(batch, clip_limit, grid_size, convention)
    fn = functools.partial(
        H.clahe.__wrapped__,
        clip_limit=clip_limit,
        grid_size=grid_size,
        convention=convention,
        nbins=nbins,
        kernel_size=kernel_size,
    )
    return jax.vmap(fn)(batch)


def clahe_tpu(
    img: Array,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int] = (8, 8),
    convention: str = "opencv",
) -> Array:
    """TPU-native CLAHE on [B, H, W] float [0,1] (batched).

    Same semantics as mies_tpu.ops.histogram.clahe (bit-identical on
    TPU); composed from the onehot-matmul histogram, the jnp
    clip/redistribute/LUT build (tiny), and the Pallas apply kernel.
    H, W must be divisible by the grid (the pipeline pads beforehand).
    """
    from mies_tpu.ops import histogram as H

    if img.ndim != 3:
        raise ValueError(f"clahe_tpu expects [B, H, W]; got {img.shape}")
    B, h, w = img.shape
    gy, gx = grid_size
    if h % gy or w % gx:
        raise ValueError("H, W must be divisible by grid_size (pad first)")
    th, tw = h // gy, w // gx
    tile_area = th * tw

    x = img.astype(jnp.float32)
    if gx % 2 == 0 and tw % 64 == 0:
        # transpose-free: shares the apply kernel's rows layout. tw must
        # be a MULTIPLE of 64 (not merely >= 64): the kernel places
        # [1, th, 2*tw] blocks at lane offset b*2*tw, which Mosaic
        # requires to be 128-aligned (same constraint as the rows apply
        # gate fixed in 083e). Level quantize runs IN-KERNEL (hist and
        # apply both) — the int32 levels never touch HBM.
        hists = tile_hists_rows_pallas(
            x, gy, gx, quantize_input=True
        ).reshape(B * gy * gx, NBINS)
        vin, qin = x, True
    else:
        u8 = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.int32)
        hists = tile_hists_pallas(u8, gy, gx).reshape(B * gy * gx, NBINS)
        vin, qin = u8, False

    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_area / NBINS), 1))
        hists = H._clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        lut_scale = jnp.float32(NBINS - 1) / tile_area
        luts = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255)
        luts = luts.reshape(B, gy, gx, NBINS)
        out = clahe_apply_lut(
            vin, luts, grid_size, integer_luts=True,
            quantize_input=qin, finalize="u8norm",
        )
    elif convention == "fraction":
        clip_value = jnp.float32(max(clip_limit * tile_area, 1.0))
        hists = H._clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = (cdf / tile_area).reshape(B, gy, gx, NBINS)
        out = clahe_apply_lut(
            vin, luts, grid_size, integer_luts=False,
            quantize_input=qin, finalize="clip01",
        )
    else:
        raise ValueError(f"unknown CLAHE convention: {convention!r}")
    return out.astype(jnp.float32)

"""Volumetric (3-D) enhancement ops: 3-D CLAHE and 3-D Gaussian.

Beyond-parity feature motivated by "Multidimensional Contrast Limited
Adaptive Histogram Equalization" (arXiv:1906.11355, PAPERS.md): slice-
by-slice CLAHE produces inter-slice flicker in CT/MRI volumes because
each slice gets independent LUTs; 3-D CLAHE computes histograms over
VOLUMETRIC tiles and interpolates TRILINEARLY between the 8 neighboring
tile LUTs, giving z-consistent contrast.

Conventions mirror the 2-D op (mies_tpu.ops.histogram.clahe): OpenCV
clip semantics extended to 3-D tiles ('opencv') or fraction-of-tile
clipping ('fraction'); weights use the same f32-reciprocal rule per
axis. Golden: tests/goldens/golden_ops.py::clahe3d_fraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from mies_tpu.ops import histogram as H

# volumetric restoration siblings live with their 2-D cores; re-exported
# here so the volume registry's one-getattr convention covers them
from mies_tpu.ops.restoration import (  # noqa: F401
    denoise_nl_means3d,
    anisotropic_diffusion3d,
    srad3d,
    denoise_tv3d,
    wiener3d,
)
from mies_tpu.ops.wavelet import denoise_wavelet3d  # noqa: F401
from mies_tpu.ops.ridges import (
    hessian3d,  # noqa: F401
    frangi3d,
    meijering3d,
    sato3d,
    vessel_enhance3d,
)
from mies_tpu.ops.frequency import (  # noqa: F401
    butterworth3d,
    homomorphic3d,
)

NBINS = 256


def _tile_hists_3d(u8: Array, grid: tuple[int, int, int]) -> Array:
    """Per-tile histograms over volumetric tiles via the shared nibble
    outer product (32 compares/voxel + a [P,16]x[16,16] matmul per tile
    — the same exact-f32-counts form every other histogram in the
    codebase uses; the old full-256 onehot was 8x the compares)."""
    gz, gy, gx = grid
    z, h, w = u8.shape
    tz, th, tw = z // gz, h // gy, w // gx
    tiles = (
        u8.reshape(gz, tz, gy, th, gx, tw)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(gz * gy * gx, tz * th * tw)
    )
    return H._nibble_hist_batched(tiles)


def _axis_weights(n: int, t: int, g: int):
    """OpenCV-style per-axis interpolation: clamped lo/hi indices + frac."""
    inv = np.float32(1.0) / np.float32(t)
    f = jnp.arange(n, dtype=jnp.float32) * inv - np.float32(0.5)
    lo_f = jnp.floor(f)
    a = f - lo_f
    lo = jnp.maximum(lo_f.astype(jnp.int32), 0)
    hi = jnp.minimum(lo_f.astype(jnp.int32) + 1, g - 1)
    return lo, hi, a


def _apply_luts_trilinear_selection(
    u8: Array, luts: Array, grid: tuple[int, int, int],
    integer_luts: bool = False,
) -> Array:
    """OpenCV-weight trilinear LUT interpolation, GATHERLESS.

    The original form gathered 8 corners as ``luts[Zi, Yi, Xi, u8]`` —
    the advanced-indexing path the 2-D code banned ("gather-apply was
    100 ms"); on a 64x256x256 volume it measured 493 ms. This version
    uses the half-tile-shifted CELLS decomposition (the 2-D kernel's
    trick, one dimension up): pad by half a tile per axis so the 8
    participating corner LUTs are CONSTANT within each of the
    (g+1)^3 cells (clamping folds into an edge-padded LUT grid), run
    the batched selection-by-matmul core, and blend with the SAME
    nested x->y->z lerp and the SAME f32 fracs (the _axis_weights
    arrays, relocated into cell blocks) — identical arithmetic, no
    gather.
    """
    gz, gy, gx = grid
    z, h, w = u8.shape
    tz, th, tw = z // gz, h // gy, w // gx
    pz, py, px = tz // 2, th // 2, tw // 2
    pads = ((pz, tz - pz), (py, th - py), (px, tw - px))
    up = jnp.pad(u8, pads, mode="edge")
    nz1, ny1, nx1 = gz + 1, gy + 1, gx + 1
    p_vox = tz * th * tw
    nb = nz1 * ny1 * nx1

    def to_blocks(vol):
        return (
            vol.reshape(nz1, tz, ny1, th, nx1, tw)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(nb, p_vox)
        )

    blocks = to_blocks(up)
    lp = jnp.pad(luts, ((1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
    m8 = jnp.stack(
        [
            lp[ez : ez + nz1, ey : ey + ny1, ex : ex + nx1]
            for ez in range(2)
            for ey in range(2)
            for ex in range(2)
        ],
        axis=3,
    ).reshape(nb, 8, NBINS)

    if integer_luts and jax.default_backend() == "tpu":
        from mies_tpu.kernels.clahe import blocks8_apply, blocks8_supported

        if blocks8_supported(p_vox):
            res = blocks8_apply(
                blocks, m8, dims=(tz, th, tw), grids=(nz1, ny1, nx1),
                mode="opencv", split=False,
            )
            resp = (
                res.reshape(nz1, ny1, nx1, tz, th, tw)
                .transpose(0, 3, 1, 4, 2, 5)
                .reshape(z + tz, h + th, w + tw)
            )
            return resp[pz : pz + z, py : py + h, px : px + w]

    sels = H._select_blocks(
        blocks, m8, NBINS, integer_maps=integer_luts
    )  # [NB, P, 8]

    _, _, za = _axis_weights(z, tz, gz)
    _, _, ya = _axis_weights(h, th, gy)
    _, _, xa = _axis_weights(w, tw, gx)
    zap = jnp.pad(za, pads[0], mode="edge")
    yap = jnp.pad(ya, pads[1], mode="edge")
    xap = jnp.pad(xa, pads[2], mode="edge")
    shape_p = (z + tz, h + th, w + tw)
    zab = to_blocks(jnp.broadcast_to(zap[:, None, None], shape_p))
    yab = to_blocks(jnp.broadcast_to(yap[None, :, None], shape_p))
    xab = to_blocks(jnp.broadcast_to(xap[None, None, :], shape_p))

    # trilinear: blend x, then y, then z (OpenCV op-order per axis) —
    # the exact formula the gather form computed, voxel for voxel
    c00 = sels[:, :, 0] * (1.0 - xab) + sels[:, :, 1] * xab
    c01 = sels[:, :, 2] * (1.0 - xab) + sels[:, :, 3] * xab
    c10 = sels[:, :, 4] * (1.0 - xab) + sels[:, :, 5] * xab
    c11 = sels[:, :, 6] * (1.0 - xab) + sels[:, :, 7] * xab
    c0 = c00 * (1.0 - yab) + c01 * yab
    c1 = c10 * (1.0 - yab) + c11 * yab
    res = c0 * (1.0 - zab) + c1 * zab

    resp = (
        res.reshape(nz1, ny1, nx1, tz, th, tw)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(*shape_p)
    )
    return resp[pz : pz + z, py : py + h, px : px + w]


def _apply_luts_trilinear_2d2(
    u8: Array, luts: Array, grid: tuple[int, int, int],
    integer_luts: bool, interpret: bool = False,
) -> Array:
    """Trilinear apply as TWO batched 2-D applies + one z-lerp.

    The z lerp is the OUTER blend of the OpenCV op order
    (x -> y -> z): out = c0*(1-za) + c1*za where c0/c1 are full 2-D
    bilinear applies of the slice against the zlo/zhi LUT planes — and
    the 2-D machinery (kernels.clahe.clahe_apply_lut) computes exactly
    those c's: identical weight formula (idx * f32-reciprocal - 0.5,
    unclipped-floor clamping) and identical x->y blend order. So the
    volume becomes a batch of Z slices with per-slice (z-blend-selected)
    LUT grids, the 8-corner blocks decomposition — and its two 6-D
    transposes, which cost more than the selection kernel itself
    (docs/KERNELS.md round 4) — disappears, and each voxel builds ONE
    onehot per 2-D apply instead of rematerializing blocks.

    Bit-exact vs _apply_luts_trilinear_gather/_selection (regression-
    pinned in tests/test_volume3d.py); per-slice LUT planes are
    selected by onehot einsum (no gather), exact for integer LUTs under
    HIGH and for fraction LUTs under HIGHEST (pure selection).
    """
    from mies_tpu.kernels.clahe import clahe_apply_lut

    gz, gy, gx = grid
    z = u8.shape[0]
    tz = z // gz
    zlo, zhi, za = _axis_weights(z, tz, gz)
    flat = luts.reshape(gz, gy * gx * NBINS)
    iz = jnp.arange(gz, dtype=jnp.int32)
    prec = (
        jax.lax.Precision.HIGH if integer_luts else jax.lax.Precision.HIGHEST
    )
    oh_lo = (zlo[:, None] == iz).astype(jnp.float32)
    oh_hi = (zhi[:, None] == iz).astype(jnp.float32)
    L0 = jnp.einsum("zg,gk->zk", oh_lo, flat, precision=prec).reshape(
        z, gy, gx, NBINS
    )
    L1 = jnp.einsum("zg,gk->zk", oh_hi, flat, precision=prec).reshape(
        z, gy, gx, NBINS
    )
    c0 = clahe_apply_lut(
        u8, L0, (gy, gx), integer_luts=integer_luts, interpret=interpret
    )
    c1 = clahe_apply_lut(
        u8, L1, (gy, gx), integer_luts=integer_luts, interpret=interpret
    )
    za3 = za[:, None, None]
    return c0 * (np.float32(1.0) - za3) + c1 * za3


def _apply_luts_trilinear_gather(
    u8: Array, luts: Array, grid: tuple[int, int, int]
) -> Array:
    """Gather form of the trilinear apply — CPU only.

    On XLA:CPU advanced-indexing gathers are fast and the onehot-einsum
    selection is the slow form (the inverse of TPU), mirroring the 2-D
    dispatch (clahe / clahe_band keep their gather blend off-TPU).
    Arithmetic is identical to _apply_luts_trilinear_selection: the
    same 8 corner LUT values, the same f32 fracs, the same x->y->z
    lerp order.
    """
    gz, gy, gx = grid
    z, h, w = u8.shape
    tz, th, tw = z // gz, h // gy, w // gx
    zlo, zhi, za = _axis_weights(z, tz, gz)
    ylo, yhi, ya = _axis_weights(h, th, gy)
    xlo, xhi, xa = _axis_weights(w, tw, gx)

    def corner(zi, yi, xi):
        return luts[
            zi[:, None, None], yi[None, :, None], xi[None, None, :], u8
        ]

    zab = za[:, None, None]
    yab = ya[None, :, None]
    xab = xa[None, None, :]
    c00 = corner(zlo, ylo, xlo) * (1.0 - xab) + corner(zlo, ylo, xhi) * xab
    c01 = corner(zlo, yhi, xlo) * (1.0 - xab) + corner(zlo, yhi, xhi) * xab
    c10 = corner(zhi, ylo, xlo) * (1.0 - xab) + corner(zhi, ylo, xhi) * xab
    c11 = corner(zhi, yhi, xlo) * (1.0 - xab) + corner(zhi, yhi, xhi) * xab
    c0 = c00 * (1.0 - yab) + c01 * yab
    c1 = c10 * (1.0 - yab) + c11 * yab
    return c0 * (1.0 - zab) + c1 * zab


def _apply_maps_selection3d(
    binned: Array, map_array: Array, ks: tuple[int, int, int], nbins: int
) -> Array:
    """8-corner trilinear interpolation between neighboring region maps.

    binned:    [Z, H, W] int32 (dims multiples of ks — the padded volume)
    map_array: [nz+1, ny+1, nx+1, nbins] f32 integer-valued, edge-padded.
    The chunked selection-by-matmul core is shared with the 2-D path
    (mies_tpu.ops.histogram._apply_maps_selection_blocks).
    """
    from mies_tpu.ops.histogram import _apply_maps_selection_blocks

    kz, ky, kx = ks
    z, h, w = binned.shape
    nz, ny, nx = z // kz, h // ky, w // kx
    p = kz * ky * kx
    nb = nz * ny * nx
    blocks = (
        binned.reshape(nz, kz, ny, ky, nx, kx)
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(nb, p)
    )
    m8 = jnp.stack(
        [
            map_array[ez : ez + nz, ey : ey + ny, ex : ex + nx]
            for ez in range(2)
            for ey in range(2)
            for ex in range(2)
        ],
        axis=3,
    ).reshape(nb, 8, nbins)

    if nbins == NBINS and jax.default_backend() == "tpu":
        from mies_tpu.kernels.clahe import blocks8_apply, blocks8_supported

        if blocks8_supported(p):
            result = blocks8_apply(
                blocks, m8, dims=(kz, ky, kx), grids=(nz, ny, nx),
                mode="skimage", split=True,
            )
            return (
                result.reshape(nz, ny, nx, kz, ky, kx)
                .transpose(0, 3, 1, 4, 2, 5)
                .reshape(z, h, w)
            )

    wz = jnp.arange(kz, dtype=jnp.float32) / kz
    wy = jnp.arange(ky, dtype=jnp.float32) / ky
    wx = jnp.arange(kx, dtype=jnp.float32) / kx
    coeffs = []
    for ez in range(2):
        cz = wz if ez else 1.0 - wz
        for ey in range(2):
            cy = wy if ey else 1.0 - wy
            for ex in range(2):
                cx = wx if ex else 1.0 - wx
                coeffs.append(
                    (
                        cz[:, None, None]
                        * cy[None, :, None]
                        * cx[None, None, :]
                    ).reshape(p)
                )
    result = _apply_maps_selection_blocks(blocks, m8, coeffs, nbins)
    return (
        result.reshape(nz, ny, nx, kz, ky, kx)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(z, h, w)
    )


def _clahe3d_skimage(
    vol: Array, kernel_size: tuple[int, int, int], clip_limit: float,
    nbins: int = NBINS,
) -> Array:
    """True skimage equalize_adapthist on a [Z, H, W] volume — the N-D
    algorithm of mies_tpu.ops.histogram._clahe_skimage with cubic
    regions and 8-corner trilinear interpolation. Golden:
    tests/goldens/golden_ops.py::equalize_adapthist3d_skimage."""
    from mies_tpu.ops.histogram import (
        NR_OF_GRAY,
        _clip_histogram_skimage,
        _region_hists_onehot,
        _skimage_maps,
        _skimage_scale_in,
        _skimage_stretch_out,
    )

    image = _skimage_scale_in(vol)

    ks = tuple(int(k) for k in kernel_size)
    pad0 = [k // 2 for k in ks]
    pad1 = [
        (k - s % k) % k + -(-k // 2) for k, s in zip(ks, image.shape)
    ]
    image = jnp.pad(image, list(zip(pad0, pad1)), mode="reflect")
    shp = image.shape

    bin_size = 1 + NR_OF_GRAY // nbins
    binned = image // bin_size

    ns = [s // k - 1 for s, k in zip(shp, ks)]
    k_elems = ks[0] * ks[1] * ks[2]
    clim = int(np.clip(clip_limit * k_elems, 1, None))
    regions = binned[
        pad0[0] : pad0[0] + ns[0] * ks[0],
        pad0[1] : pad0[1] + ns[1] * ks[1],
        pad0[2] : pad0[2] + ns[2] * ks[2],
    ]
    regions = (
        regions.reshape(ns[0], ks[0], ns[1], ks[1], ns[2], ks[2])
        .transpose(0, 2, 4, 1, 3, 5)
        .reshape(ns[0] * ns[1] * ns[2], k_elems)
    )
    hists = _region_hists_onehot(regions, nbins)
    hists = _clip_histogram_skimage(hists, clim, nbins)

    maps = _skimage_maps(hists, k_elems).reshape(*ns, nbins)
    map_array = jnp.pad(maps, [(1, 1)] * 3 + [(0, 0)], mode="edge")

    result = _apply_maps_selection3d(binned, map_array, ks, nbins)
    result = result[
        pad0[0] : shp[0] - pad1[0],
        pad0[1] : shp[1] - pad1[1],
        pad0[2] : shp[2] - pad1[2],
    ]
    return _skimage_stretch_out(result)


@functools.partial(
    jax.jit,
    static_argnames=("grid_size", "clip_limit", "convention", "kernel_size"),
)
def clahe3d(
    vol: Array,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int, int] = (4, 8, 8),
    convention: str = "opencv",
    kernel_size: tuple[int, int, int] | None = None,
) -> Array:
    """3-D CLAHE on a float [0,1] volume [Z, H, W].

    convention="opencv"/"fraction": Z, H, W must be divisible by
    grid_size. convention="skimage": true N-D equalize_adapthist
    semantics (any shape; ``kernel_size`` defaults to
    (Z//gz, H//gy, W//gx), min 1 per dim). Returns float32 [Z, H, W].
    """
    if vol.ndim != 3:
        raise ValueError(f"clahe3d expects [Z, H, W]; got {vol.shape}")
    gz, gy, gx = grid_size
    z, h, w = vol.shape
    if convention == "skimage":
        if kernel_size is None:
            kernel_size = (max(z // gz, 1), max(h // gy, 1), max(w // gx, 1))
        return _clahe3d_skimage(vol, kernel_size, clip_limit)
    if z % gz or h % gy or w % gx:
        raise ValueError(f"volume {vol.shape} not divisible by grid {grid_size}")
    tz, th, tw = z // gz, h // gy, w // gx
    tile_vox = tz * th * tw

    x = vol.astype(jnp.float32)
    if jax.default_backend() == "tpu" and convention == "opencv":
        from mies_tpu.kernels.clahe import (
            clahe3d_apply_tile33z,
            tile33z_supported,
            tile_hists_rows_pallas,
        )

        if tile33z_supported(vol.shape, grid_size):
            # fully-fused fast path: rows-layout Pallas histograms
            # (batch = Z slices, per-z-tile sums are exact integer f32
            # adds) + the tile33-z apply, both with IN-KERNEL level
            # quantize and the u8norm epilogue folded into the apply —
            # the int32 levels never touch HBM, and the 6-D block
            # transposes of the old selection path are gone entirely
            # (docs/KERNELS.md rounds 4-5).
            if tw % 64 == 0:
                hists = tile_hists_rows_pallas(
                    x, gy, gx, quantize_input=True
                )  # [Z, gy, gx, 256]
            else:
                # tw=32 rides the P=4 APPLY, but the rows HIST kernel
                # places [1, th, 2tw] blocks at lane offset b*2tw —
                # 128-unaligned for tw=32 (the ADVICE r2 gate class) —
                # so the histogram stays XLA-side (quantize fuses into
                # its nibble einsum for free)
                u8h = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(
                    jnp.int32
                )
                hists = _tile_hists_3d(u8h, (z, gy, gx)).reshape(
                    z, gy, gx, NBINS
                )
            hists = (
                hists.reshape(gz, tz, gy, gx, NBINS)
                .sum(axis=1)
                .reshape(gz * gy * gx, NBINS)
            )
            clip_value = jnp.float32(
                max(int(clip_limit * tile_vox / NBINS), 1)
            )
            hists = H._clip_redistribute_opencv(hists, clip_value)
            cdf = jnp.cumsum(hists, axis=1)
            luts = jnp.clip(
                jnp.rint(cdf * (jnp.float32(NBINS - 1) / tile_vox)), 0, 255
            ).reshape(gz, gy, gx, NBINS)
            return clahe3d_apply_tile33z(
                x, luts, grid_size, quantize_input=True, finalize="u8norm"
            )

    u8 = jnp.clip(jnp.round(x * 255.0), 0, 255).astype(jnp.int32)
    hists = _tile_hists_3d(u8, grid_size)

    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_vox / NBINS), 1))
        hists = H._clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = jnp.clip(jnp.rint(cdf * (jnp.float32(NBINS - 1) / tile_vox)), 0, 255)
    elif convention == "fraction":
        clip_value = jnp.float32(max(clip_limit * tile_vox, 1.0))
        hists = H._clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts = cdf / tile_vox
    else:
        raise ValueError(f"unknown CLAHE convention: {convention!r}")
    luts = luts.reshape(gz, gy, gx, NBINS)
    if jax.default_backend() == "tpu":
        # tile33z-eligible opencv shapes already returned via the fully-
        # fused fast path above, so TPU opencv here means tw % 64 != 0:
        # two 2-D applies + outer z-lerp — bit-exact, no 6-D block
        # transposes (they cost more than the selection kernel —
        # docs/KERNELS.md rounds 4-5; 64x256x256 measured 2.99 -> 2.67).
        # Fraction LUTs stay on _selection: the 2-D kernel's bf16 hi/lo
        # split is exact only for integer values.
        if convention == "opencv":
            res = _apply_luts_trilinear_2d2(
                u8, luts, grid_size, integer_luts=True
            )
        else:
            res = _apply_luts_trilinear_selection(
                u8, luts, grid_size, integer_luts=False
            )
    else:
        # CPU keeps the fast advanced-indexing gather (selection-by-
        # matmul is the slow form off-TPU), matching the 2-D dispatch
        res = _apply_luts_trilinear_gather(u8, luts, grid_size)

    if convention == "opencv":
        out = jnp.clip(jnp.rint(res), 0, 255) / 255.0
    else:
        out = jnp.clip(res, 0.0, 1.0)
    return out.astype(jnp.float32)


def _box3d(vol: Array, kernel_size: int, mode: str) -> Array:
    """Separable 3-D box mean via shifted adds along each axis."""
    from mies_tpu.ops.filters import _PAD_MODE

    r = kernel_size // 2
    inv = np.float32(1.0 / kernel_size)
    x = vol.astype(jnp.float32)
    if r == 0:
        return x
    for axis in range(3):
        pads = [(0, 0)] * 3
        pads[axis] = (r, r)
        xp = jnp.pad(x, pads, mode=_PAD_MODE[mode])
        acc = inv * jax.lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis)
        for t in range(1, kernel_size):
            acc = acc + inv * jax.lax.slice_in_dim(
                xp, t, t + x.shape[axis], axis=axis
            )
        x = acc
    return x


def guided_blur3d(
    vol: Array,
    kernel_size: int = 3,
    eps: float = 1e-2,
    mode: str = "reflect",
) -> Array:
    """Volumetric self-guided filter (He et al. 2010 extended to 3-D
    windows): z-consistent edge-preserving denoising — the guided-filter
    sibling of clahe3d's motivation (slice-by-slice filtering flickers
    between slices; cubic windows don't). Pure separable box means —
    zero gathers. Golden: tests/goldens/golden_ops.py::guided_blur3d.
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    from mies_tpu.ops.filters import _guided_dataflow

    return _guided_dataflow(
        lambda v: _box3d(v, kernel_size, mode),
        vol.astype(jnp.float32),
        eps,
    )


def gaussian_blur3d(
    vol: Array, sigma: float = 1.0, truncate: float = 4.0, mode: str = "nearest"
) -> Array:
    """Separable 3-D Gaussian over [Z, H, W] (scipy tap order per axis)."""
    from mies_tpu.ops.filters import _PAD_MODE, gaussian_kernel1d

    if sigma <= 0:
        return vol
    radius = int(truncate * float(sigma) + 0.5)
    k = gaussian_kernel1d(float(sigma), radius)
    x = vol.astype(jnp.float32)
    for axis in range(3):
        pads = [(0, 0)] * 3
        pads[axis] = (radius, radius)
        xp = jnp.pad(x, pads, mode=_PAD_MODE[mode])
        acc = np.float32(k[0]) * jax.lax.slice_in_dim(xp, 0, x.shape[axis], axis=axis)
        for t in range(1, len(k)):
            acc = acc + np.float32(k[t]) * jax.lax.slice_in_dim(
                xp, t, t + x.shape[axis], axis=axis
            )
        x = acc
    return x


def median_blur3d(
    vol: Array, kernel_size: int = 3, mode: str = "nearest"
) -> Array:
    """3-D median filter over a cubic footprint.

    scipy.ndimage.median_filter(size=k, mode='nearest') semantics —
    skimage.filters.median is n-dimensional, so the declared surface
    (/root/reference/pyproject.toml:12) extends to volumes; the 2-D
    ``median_blur`` z-flickers on CT noise, the cubic footprint is
    z-consistent. Same design as the 2-D op: a Batcher min/max network
    over the k^3 shifted-volume stack — every comparator is one VPU
    min+max over the whole volume, no gathers, no generic sort.
    Golden: tests/goldens/golden_ops.py::median_blur (n-d scipy).
    """
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    from mies_tpu.ops.filters import _PAD_MODE, _batcher_network

    k = kernel_size
    r = k // 2
    x = vol.astype(jnp.float32)
    if r == 0:
        return x
    z, h, w = x.shape
    xp = jnp.pad(x, ((r, r), (r, r), (r, r)), mode=_PAD_MODE[mode])
    vals = [
        jax.lax.dynamic_slice(xp, (dz, dy, dx), (z, h, w))
        for dz in range(k)
        for dy in range(k)
        for dx in range(k)
    ]
    n = k * k * k
    for i, j in _batcher_network(n):
        lo = jnp.minimum(vals[i], vals[j])
        hi = jnp.maximum(vals[i], vals[j])
        vals[i], vals[j] = lo, hi
    return vals[n // 2]


def unsharp_mask3d(
    vol: Array,
    radius: float = 1.0,
    amount: float = 1.0,
    mode: str = "nearest",
    clip: bool = True,
) -> Array:
    """3-D unsharp masking: ``vol + amount * (vol - gaussian3d(vol))``.

    skimage.filters.unsharp_mask is n-dimensional (same formula, nD
    gaussian); sharpening each slice independently amplifies z-noise
    differently per slice — the volumetric residual is z-consistent.
    Golden: compose tests/goldens/golden_ops.py gaussian semantics in 3-D.
    """
    blurred = gaussian_blur3d(vol, sigma=radius, mode=mode)
    x = vol.astype(jnp.float32)
    out = x + amount * (x - blurred)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out


def _extremum3d(vol: Array, kernel_size: int, mode: str, maximum: bool) -> Array:
    """Separable cubic min/max: one shifted-extremum pass per axis.

    A flat rect (cube) structuring element factorizes exactly:
    min/max over the k^3 window == composition of three axis passes —
    3k shifted reads instead of k^3 (the same separability _box3d
    exploits for the mean). 'ignore' pads the constant the reduction
    ignores (scipy grey_erosion/dilation mode='constant' with
    cval=+/-inf — morphology's "outside contributes nothing" border);
    other modes use the shared _PAD_MODE table.
    """
    from mies_tpu.ops.filters import _PAD_MODE

    k = int(kernel_size)
    if k % 2 != 1:
        raise ValueError("kernel_size must be odd")
    r = k // 2
    x = vol.astype(jnp.float32)
    if r == 0:
        return x
    red = jnp.maximum if maximum else jnp.minimum
    from mies_tpu.ops.morphology import _sliding_red

    for axis in range(3):
        pads = [(0, 0)] * 3
        pads[axis] = (r, r)
        if mode == "ignore":
            fill = np.float32(-np.inf if maximum else np.inf)
            xp = jnp.pad(x, pads, mode="constant", constant_values=fill)
        else:
            xp = jnp.pad(x, pads, mode=_PAD_MODE[mode])
        # flat chain for small k; van Herk doubling (~log2 k reads) for
        # the large footprints volumetric background estimation uses
        x = _sliding_red(xp, k, red, axis=axis)
    return x


def erode3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """Volumetric grayscale erosion over a cubic footprint.

    scipy.ndimage.grey_erosion(size=(k,k,k)) semantics ('ignore' ==
    mode='constant', cval=+inf; 'nearest' == mode='nearest'); the 3-D
    sibling of ops.morphology.erode — slice-wise 2-D morphology is not
    z-consistent on CT volumes. Golden: real scipy in tests.
    """
    return _extremum3d(vol, kernel_size, mode, maximum=False)


def dilate3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """Volumetric grayscale dilation (scipy.ndimage.grey_dilation)."""
    return _extremum3d(vol, kernel_size, mode, maximum=True)


def morph_open3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """3-D opening: dilate3d(erode3d(vol)) — removes small bright blobs."""
    return dilate3d(erode3d(vol, kernel_size, mode), kernel_size, mode)


def morph_close3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """3-D closing: erode3d(dilate3d(vol)) — fills small dark cavities."""
    return erode3d(dilate3d(vol, kernel_size, mode), kernel_size, mode)


def morph_gradient3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """3-D morphological gradient: dilate3d - erode3d (surface outlines)."""
    return (dilate3d(vol, kernel_size, mode)
            - erode3d(vol, kernel_size, mode))


def top_hat3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """3-D white top-hat: vol - open3d(vol) — small bright structures
    (vessels, calcifications) pulled off the volumetric background."""
    return vol.astype(jnp.float32) - morph_open3d(vol, kernel_size, mode)


def black_hat3d(vol: Array, kernel_size: int = 3, mode: str = "ignore") -> Array:
    """3-D black top-hat: close3d(vol) - vol — small dark structures."""
    return morph_close3d(vol, kernel_size, mode) - vol.astype(jnp.float32)


def _linear_resize_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] linear-interpolation matrix, align-corners
    convention: output sample i reads input coordinate
    i*(n_in-1)/(n_out-1) (the center for a single-sample axis). Host-
    side and static — the resample becomes three banded matmuls, the
    MXU-friendly form of axis-aligned trilinear interpolation (no
    gathers; scipy.ndimage.map_coordinates(order=1) on the same
    coordinates is the golden)."""
    w = np.zeros((n_out, n_in), np.float32)
    if n_out == 1:
        c = 0.5 * (n_in - 1)
        lo = int(np.floor(c))
        f = c - lo
        w[0, lo] = 1.0 - f
        if f > 0:
            w[0, lo + 1] = f
        return w
    coords = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.clip(np.floor(coords).astype(int), 0, max(n_in - 2, 0))
    f = (coords - lo).astype(np.float32)
    rows = np.arange(n_out)
    w[rows, lo] = 1.0 - f
    if n_in > 1:
        w[rows, lo + 1] += f
    return w


def resample3d(
    vol: Array, depth: int, height: int, width: int
) -> Array:
    """Trilinear volume resample to [depth, height, width].

    The volumetric sibling of ops.geometry.resize for the isotropic-
    spacing preprocessing step standard in CT workflows (CLI
    `enhance-volume --isotropic`): anisotropic voxels (e.g. 0.7 x 0.7 x
    5 mm) resample to a uniform grid BEFORE 3-D filters so cubic
    footprints are physically cubic. Runs as three separable banded
    matmuls (static shapes, no gathers); matches
    scipy.ndimage.map_coordinates(order=1) on the align-corners
    coordinate grid to float32 tolerance. Works on raw HU (int16 casts
    to f32) — resample first, window later, the clinical order.
    """
    for name, v in (("depth", depth), ("height", height), ("width", width)):
        if int(v) < 1:
            raise ValueError(f"{name} must be >= 1")
    z, h, w = vol.shape
    x = vol.astype(jnp.float32)
    if (z, h, w) == (depth, height, width):
        return x
    prec = jax.lax.Precision.HIGHEST
    if z != depth:
        x = jnp.einsum("oz,zhw->ohw", jnp.asarray(
            _linear_resize_matrix(z, depth)), x, precision=prec)
    if h != height:
        x = jnp.einsum("oh,zhw->zow", jnp.asarray(
            _linear_resize_matrix(h, height)), x, precision=prec)
    if w != width:
        x = jnp.einsum("ow,zhw->zho", jnp.asarray(
            _linear_resize_matrix(w, width)), x, precision=prec)
    return x


def difference_of_gaussians3d(
    vol: Array,
    low_sigma: float = 1.0,
    high_sigma: float | None = None,
    truncate: float = 4.0,
    mode: str = "nearest",
) -> Array:
    """Volumetric band-pass: the [Z, H, W] sibling of
    ``difference_of_gaussians`` (skimage's filter is n-dimensional).
    One isotropic 3-D Gaussian per band keeps the response
    z-consistent. Golden: tests/goldens/golden_ops.py::
    difference_of_gaussians (n-d scipy)."""
    if high_sigma is None:
        high_sigma = float(low_sigma) * 1.6
    if high_sigma < low_sigma:
        raise ValueError(
            f"high_sigma ({high_sigma}) must be >= low_sigma ({low_sigma})"
        )
    x = vol.astype(jnp.float32)
    return gaussian_blur3d(x, float(low_sigma), truncate, mode) - (
        gaussian_blur3d(x, float(high_sigma), truncate, mode)
    )

"""Spatially-sharded CLAHE: tile-aligned bands + LUT all-gather.

CLAHE has tile-grid (not fixed-radius) data dependence, so it cannot use
the halo-exchange path — but it "shards cleanly on tile boundaries"
(SURVEY.md section 5.7): split the image into row bands aligned with
tile rows; each device histograms ONLY its own tiles (exact — tiles
never straddle devices), the per-tile LUTs are all-gathered over ICI
(tiny: gy*gx*256 floats), and each device interpolates its own rows
against the full LUT grid using its global row offset.

Communication per image: ONE all_gather of [gy, gx, 256] f32 (256 KB
for an 8x8 grid) — independent of image size, so a 4096^2 mammogram
CLAHE scales across chips at essentially zero comm cost.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mies_tpu.ops import histogram as H
from mies_tpu.pipeline.compiler import _quantize_u8


def clahe_band(
    band,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int] = (8, 8),
    convention: str = "opencv",
    axis_name: str = "space",
):
    """CLAHE on one row band of a sharded slice (inside a shard_map).

    The band must be tile-aligned: gy divisible by the axis size, band
    rows divisible by the local tile rows, width by gx. Bit-exact vs the
    unsharded op — local histograms (tiles never straddle devices), ONE
    LUT all_gather over ICI, local interpolation at the global row
    offset. Returns float [0,1] (caller quantizes).
    """
    n = lax.axis_size(axis_name)
    gy, gx = grid_size
    if gy % n:
        raise ValueError(f"grid rows {gy} not divisible by axis size {n}")
    hb, w = band.shape
    gy_local = gy // n
    if hb % gy_local or w % gx:
        raise ValueError(
            f"band {band.shape} not tile-aligned for grid {grid_size}"
        )
    if convention not in ("opencv", "fraction"):
        raise ValueError(
            f"convention {convention!r} does not spatially shard (skimage "
            "regions straddle band boundaries; kornia's even-ceil tiles + "
            "half-tile interp grid don't align with the band contract); "
            "use opencv or fraction"
        )
    th, tw = hb // gy_local, w // gx
    tile_area = th * tw
    idx = lax.axis_index(axis_name)

    u8 = jnp.clip(
        jnp.round(band.astype(jnp.float32) * 255.0), 0, 255
    ).astype(jnp.int32)

    # local tile histograms (tiles never straddle devices) — via the
    # nibble onehot matmul, NOT the scatter form: TPU has no fast
    # scatter (the scatter-hist half of the 910 ms sharded-CLAHE bug)
    from mies_tpu.kernels.clahe import _tile_hists_onehot

    hists = _tile_hists_onehot(u8[None], gy_local, gx)[0].reshape(
        gy_local * gx, 256
    )

    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_area / 256), 1))
        hists = H._clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        lut_scale = jnp.float32(255) / tile_area
        luts_local = jnp.clip(jnp.rint(cdf * lut_scale), 0, 255)
    else:
        clip_value = jnp.float32(max(clip_limit * tile_area, 1.0))
        hists = H._clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts_local = cdf / tile_area

    luts_local = luts_local.reshape(gy_local, gx, 256)
    # the ONE collective: full LUT grid everywhere (tiny)
    luts = lax.all_gather(luts_local, axis_name, tiled=True)  # [gy,gx,256]

    if jax.default_backend() == "tpu":
        # selection-by-matmul: the gather form measured 910 ms for one
        # 4096^2 band program on chip (gather loops); identical
        # arithmetic, MXU selection (ops.histogram docstring)
        out = H._bilinear_lut_apply_selection(
            u8, luts, (gy, gx), tile_shape=(th, tw), y_offset=idx * hb,
            integer_luts=(convention == "opencv"),
        )
    else:
        out = H._bilinear_lut_apply(
            u8, luts, (gy, gx), tile_shape=(th, tw), y_offset=idx * hb
        )
    if convention == "opencv":
        out = jnp.clip(jnp.rint(out), 0, 255) / 255.0
    else:
        out = jnp.clip(out, 0.0, 1.0)
    return out.astype(jnp.float32)


def clahe_spatial_shard(
    mesh: Mesh,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int] = (8, 8),
    convention: str = "opencv",
    quantize: bool = True,
    axis_name: str = "space",
) -> Callable:
    """Compile CLAHE for ONE [H, W] slice row-sharded over ``axis_name``.

    Requirements: gy divisible by the axis size, H divisible by gy, W by
    gx (tile-aligned bands; no padding path). Output equals the
    unsharded mies_tpu.ops.histogram.clahe bit for bit (same histogram,
    LUT, and OpenCV-weight arithmetic — only the location of the
    compute moves).
    """
    gy, gx = grid_size
    n = mesh.shape[axis_name]
    if gy % n:
        raise ValueError(f"grid rows {gy} not divisible by axis size {n}")

    def band_fn(band):  # [H/n, W] float [0,1]
        out = clahe_band(
            band, clip_limit, grid_size, convention, axis_name
        )
        return _quantize_u8(out) if quantize else out

    sharded = shard_map(
        band_fn,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
        check_vma=False,  # Pallas inside shard_map: out_shape has no vma info
    )
    return jax.jit(sharded)

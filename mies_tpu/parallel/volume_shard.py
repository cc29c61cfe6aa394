"""Z-sharded volume pipelines: one [Z, H, W] SPMD program over the mesh.

The 3-D sibling of ``parallel.halo.spatial_shard_apply`` (SURVEY.md
section 5.7's "long-context analogue", section 2d's SP row): a CT/MRI
volume too large for one chip's HBM is sharded into z-slabs across the
mesh's 'space' axis and the WHOLE volume chain runs as one SPMD
program, bit-exact vs the unsharded ``compile_volume_pipeline``:

- 3-D stencil stages (gaussian/median/unsharp/guided) extend their slab
  with real neighbor slices over ICI (``halo_extend_rows`` on axis 0 —
  two ppermutes per stage) and crop after.
- ``clahe3d`` shards on z-TILE boundaries: each device histograms only
  its own tiles (exact — tiles never straddle devices when gz divides
  by the axis size), the per-tile LUTs are all-gathered (tiny:
  gz*gy*gx*256 floats, independent of volume size), and each device
  runs the trilinear apply at its global z offset.
- Global-statistics stages use collectives: ``normalize`` /
  ``rescale_intensity`` take pmin/pmax (min/max are associative — bit
  cheap and exact), ``equalize_hist`` psums the per-device histogram
  (integer counts sum exactly in f32) and reuses the unsharded
  interpolation arithmetic verbatim.
- Pointwise stages run locally.

Communication per step: two slab ppermutes per stencil stage, one
all_gather of the LUT grid per clahe3d, one pmin/pmax or psum(256) per
global stage — everything rides ICI; nothing scales with volume size
except the stencil halos (halo * H * W voxels).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mies_tpu.ops import histogram as H
from mies_tpu.ops import intensity as I
from mies_tpu.ops import volume3d as V
from mies_tpu.parallel.halo import halo_extend_rows
from mies_tpu.pipeline.compiler import _quantize_u8
from mies_tpu.pipeline.config import PipelineConfig

NBINS = H.NBINS


# ---------------------------------------------------------------------------
# clahe3d on a z-slab band
# ---------------------------------------------------------------------------


def _trilinear_zband_gather(u8, luts, grid, Z: int, z0):
    """Gather form of the z-band trilinear apply (CPU backends).

    Identical arithmetic to ops.volume3d._apply_luts_trilinear_gather
    with the z axis weights computed from GLOBAL slice indices
    (z0 + local z): the per-voxel output depends only on the voxel's
    value and its global position, so a band needs no neighbor voxels —
    only the full (all-gathered) LUT grid.
    """
    gz, gy, gx = grid
    zb, h, w = u8.shape
    tz, th, tw = Z // gz, h // gy, w // gx

    # global-z weights: same f32 expression as _axis_weights, evaluated
    # at indices z0..z0+zb (exact: ints < 2^24 in f32)
    inv = jnp.float32(1.0) / jnp.float32(tz)
    f = (z0 + jnp.arange(zb, dtype=jnp.int32)).astype(jnp.float32) * inv - (
        jnp.float32(0.5)
    )
    zlo_f = jnp.floor(f)
    za = f - zlo_f
    zlo = jnp.maximum(zlo_f.astype(jnp.int32), 0)
    zhi = jnp.minimum(zlo_f.astype(jnp.int32) + 1, gz - 1)
    ylo, yhi, ya = V._axis_weights(h, th, gy)
    xlo, xhi, xa = V._axis_weights(w, tw, gx)

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


def _trilinear_zband_selection(u8, luts, grid, Z: int, z0, integer_luts):
    """Gatherless (selection-by-matmul) z-band trilinear apply — the TPU
    form, mirroring ops.volume3d._apply_luts_trilinear_selection with
    the cell decomposition relocated by the band's global z offset.

    Per-voxel independence makes the half-tile z padding FREE of
    communication: padded positions produce outputs that are cropped
    (they belong to the neighbor band, which computes them from its own
    real voxels), so local edge padding is sufficient — only the cell
    ids (offset by z0 // tz into the all-gathered LUT grid) and the z
    fracs (global indices) must be global.
    """
    gz, gy, gx = grid
    zb, h, w = u8.shape
    tz, th, tw = Z // gz, h // gy, w // gx
    pz, py, px = tz // 2, th // 2, tw // 2
    pads = ((pz, tz - pz), (py, th - py), (px, tw - px))
    up = jnp.pad(u8, pads, mode="edge")
    nz1b = zb // tz + 1  # local z cells (+1: cells straddle tile bounds)
    ny1, nx1 = gy + 1, gx + 1
    p_vox = tz * th * tw
    nb = nz1b * ny1 * nx1

    def to_blocks(vol):
        return (
            vol.reshape(nz1b, tz, ny1, th, nx1, tw)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(nb, p_vox)
        )

    blocks = to_blocks(up)
    lp = jnp.pad(luts, ((1, 1), (1, 1), (1, 1), (0, 0)), mode="edge")
    c0 = z0 // tz  # first global z cell of this band (traced)
    lpz = lax.dynamic_slice_in_dim(lp, c0, nz1b + 1, axis=0)
    m8 = jnp.stack(
        [
            lpz[ez : ez + nz1b, ey : ey + ny1, ex : ex + nx1]
            for ez in range(2)
            for ey in range(2)
            for ex in range(2)
        ],
        axis=3,
    ).reshape(nb, 8, NBINS)

    sels = H._select_blocks(blocks, m8, NBINS, integer_maps=integer_luts)

    # weights: y/x as the full volume; z from GLOBAL indices (padded
    # positions get out-of-range garbage — their outputs are cropped)
    _, _, ya = V._axis_weights(h, th, gy)
    _, _, xa = V._axis_weights(w, tw, gx)
    yap = jnp.pad(ya, pads[1], mode="edge")
    xap = jnp.pad(xa, pads[2], mode="edge")
    inv = jnp.float32(1.0) / jnp.float32(tz)
    zg = z0 + jnp.arange(zb + tz, dtype=jnp.int32) - pz
    fz = zg.astype(jnp.float32) * inv - jnp.float32(0.5)
    zap = fz - jnp.floor(fz)

    shape_p = (zb + tz, h + th, w + tw)
    zab = to_blocks(jnp.broadcast_to(zap[:, None, None], shape_p))
    yab = to_blocks(jnp.broadcast_to(yap[None, :, None], shape_p))
    xab = to_blocks(jnp.broadcast_to(xap[None, None, :], shape_p))

    c00 = sels[:, :, 0] * (1.0 - xab) + sels[:, :, 1] * xab
    c01 = sels[:, :, 2] * (1.0 - xab) + sels[:, :, 3] * xab
    c10 = sels[:, :, 4] * (1.0 - xab) + sels[:, :, 5] * xab
    c11 = sels[:, :, 6] * (1.0 - xab) + sels[:, :, 7] * xab
    c0_ = c00 * (1.0 - yab) + c01 * yab
    c1_ = c10 * (1.0 - yab) + c11 * yab
    res = c0_ * (1.0 - zab) + c1_ * zab

    resp = (
        res.reshape(nz1b, ny1, nx1, tz, th, tw)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(*shape_p)
    )
    return resp[pz : pz + zb, py : py + h, px : px + w]


def clahe3d_band(
    band,
    clip_limit: float = 2.0,
    grid_size: tuple[int, int, int] = (4, 8, 8),
    convention: str = "opencv",
    axis_name: str = "space",
):
    """clahe3d on one z-slab of a sharded volume (inside a shard_map).

    Requirements: gz divisible by the axis size; the slab's Z by the
    local tiles; H, W by gy, gx. Bit-exact vs the unsharded
    ops.volume3d.clahe3d — local tile histograms, ONE LUT all_gather,
    local trilinear apply at the global z offset. Returns float [0,1].
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    gz, gy, gx = grid_size
    if gz % n:
        raise ValueError(f"grid z {gz} not divisible by axis size {n}")
    zb, h, w = band.shape
    gz_local = gz // n
    if zb % gz_local or h % gy or w % gx:
        raise ValueError(
            f"slab {band.shape} not tile-aligned for grid {grid_size}"
        )
    if convention not in ("opencv", "fraction"):
        raise ValueError(
            f"convention {convention!r} does not z-shard (skimage regions "
            "straddle slab boundaries); use opencv or fraction"
        )
    tz, th, tw = zb // gz_local, h // gy, w // gx
    tile_vox = tz * th * tw

    u8 = jnp.clip(
        jnp.round(band.astype(jnp.float32) * 255.0), 0, 255
    ).astype(jnp.int32)
    hists = V._tile_hists_3d(u8, (gz_local, gy, gx))

    if convention == "opencv":
        clip_value = jnp.float32(max(int(clip_limit * tile_vox / NBINS), 1))
        hists = H._clip_redistribute_opencv(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts_local = jnp.clip(
            jnp.rint(cdf * (jnp.float32(NBINS - 1) / tile_vox)), 0, 255
        )
    else:
        clip_value = jnp.float32(max(clip_limit * tile_vox, 1.0))
        hists = H._clip_redistribute_fraction(hists, clip_value)
        cdf = jnp.cumsum(hists, axis=1)
        luts_local = cdf / tile_vox

    luts_local = luts_local.reshape(gz_local, gy, gx, NBINS)
    # the ONE collective: the full LUT grid everywhere (tiny)
    luts = lax.all_gather(luts_local, axis_name, tiled=True)

    Z = zb * n
    z0 = idx * zb
    if jax.default_backend() == "tpu":
        res = _trilinear_zband_selection(
            u8, luts, grid_size, Z, z0,
            integer_luts=(convention == "opencv"),
        )
    else:
        res = _trilinear_zband_gather(u8, luts, grid_size, Z, z0)

    if convention == "opencv":
        out = jnp.clip(jnp.rint(res), 0, 255) / 255.0
    else:
        out = jnp.clip(res, 0.0, 1.0)
    return out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# per-stage z sharding rules
# ---------------------------------------------------------------------------


def volume_stage_z_field(op: str, params: dict) -> int:
    """z-slice radius a volume stage reads beyond its output voxel."""
    if op in ("gaussian_blur3d", "unsharp_mask3d"):
        sigma = params.get("sigma", params.get("radius", 1.0))
        truncate = params.get("truncate", 4.0)
        return int(truncate * float(sigma) + 0.5)
    if op == "median_blur3d":
        return params.get("kernel_size", 3) // 2
    if op == "guided_blur3d":
        return 2 * (params.get("kernel_size", 3) // 2)
    if op == "denoise_nl_means3d":
        # single-pass patch stencil: search radius + patch radius
        s = params.get("patch_size", 5)
        s = s if s % 2 == 1 else s + 1
        return params.get("patch_distance", 5) + s // 2
    if op == "srad3d":
        # 2 slabs/iteration (the c ring reads the 2-neighborhood)
        return 2 * int(params.get("niter", 15))
    if op == "anisotropic_diffusion3d":
        # 1 slab/iteration; the slab form refreshes the halo each
        # iteration (see parallel/halo.py's 2-D branch)
        return int(params.get("niter", 10))
    if op == "denoise_tv3d":
        raise ValueError(
            "denoise_tv3d is not z-shardable: its convergence test sums "
            "energy over the WHOLE volume (global extent)"
        )
    if op == "denoise_wavelet3d":
        raise ValueError(
            "denoise_wavelet3d is not z-shardable: the multilevel DWT's "
            "subband thresholds are WHOLE-volume statistics and the "
            "decimated grids don't tile along z (global extent)"
        )
    if op == "meijering3d":
        raise ValueError(
            "meijering3d is not z-shardable: each scale's response is "
            "normalized by its VOLUME-WIDE max (global extent)"
        )
    if op in ("butterworth3d", "homomorphic3d", "wiener3d"):
        raise ValueError(
            f"op {op!r} is not z-shardable: the 3-D FFT reads every "
            "voxel for every output (global extent)"
        )
    if op == "difference_of_gaussians3d":
        low = params.get("low_sigma", 1.0)
        high = params.get("high_sigma")
        if high is None:
            high = 1.6 * float(low)
        return int(params.get("truncate", 4.0) * float(high) + 0.5)
    if op in ("frangi3d", "vessel_enhance3d", "sato3d", "hessian3d"):
        if op == "hessian3d":
            params = {**params, "gamma": params.get("gamma", 15.0)}
        if op not in ("sato3d",) and params.get("gamma") is None:
            raise ValueError(
                f"op {op!r} with gamma=None normalizes by the per-scale "
                "GLOBAL max Frobenius norm and is not z-shardable; pass "
                "an explicit gamma"
            )
        return max(
            int(4.0 * float(s) + 0.5)
            for s in params.get("sigmas", (1.0, 2.0, 4.0))
        )
    if op in ("erode3d", "dilate3d", "morph_gradient3d"):
        return params.get("kernel_size", 3) // 2
    if op in ("morph_open3d", "morph_close3d", "top_hat3d", "black_hat3d"):
        # two morphology levels (erode then dilate or vice versa)
        return 2 * (params.get("kernel_size", 3) // 2)
    _LOCAL = {
        # pointwise, or global-stat ops the band fn handles explicitly
        "window_hu", "adjust_gamma", "adjust_log", "adjust_sigmoid",
        "invert", "normalize_meanstd", "denormalize_meanstd",
        "clahe3d", "normalize", "rescale_intensity", "equalize_hist",
    }
    if op == "resample3d":
        # shape-changing banded matmuls; the z band's halo is computed
        # from the resize matrix inside resample3d_zband (needs the
        # static device count, so it can't be expressed as a plain
        # halo radius here)
        return 0
    if op not in _LOCAL:
        raise ValueError(f"op {op!r} is not z-shardable")
    return 0


def _resample_band_geometry(
    z: int, depth: int, n: int
) -> tuple[np.ndarray, int]:
    """Static per-device z-resize matrices for a z-sharded resample.

    Returns (stacked [n, depth//n, z//n + 2*halo] matrices, halo). The
    global align-corners matrix M is 2-tap banded (each output row
    interpolates two adjacent input rows), so device k's output band
    [k*dl, (k+1)*dl) reads a contiguous input window around its own
    band [k*zl, (k+1)*zl); halo = the worst-case overhang, exchanged
    once via ppermute. Matrix columns that fall outside [0, Z) (they
    align with halo_extend_rows' global-edge fill rows) are ZERO, so
    the fill rows are never consumed — 0.0 * fill == 0.0 exactly.
    """
    from mies_tpu.ops.volume3d import _linear_resize_matrix

    if depth % n or z % n:
        raise ValueError(
            f"z-sharded resample3d needs input z ({z}) and output depth "
            f"({depth}) divisible by the axis size ({n}); pick a target "
            f"depth that is a multiple of {n} (or run without "
            f"--data-parallel)"
        )
    m = _linear_resize_matrix(z, depth)  # [depth, z], 2-tap rows
    dl, zl = depth // n, z // n
    halo = 0
    for k in range(n):
        rows = m[k * dl:(k + 1) * dl]
        cols = np.nonzero(rows.any(axis=0))[0]
        halo = max(halo, int(k * zl - cols.min()),
                   int(cols.max() + 1 - (k + 1) * zl))
    halo = max(halo, 0)
    if halo > zl:
        raise ValueError(
            f"z-sharded resample3d: the {z}->{depth} resize needs a "
            f"{halo}-slab halo but each device holds only {zl} slabs — "
            f"use fewer devices or resample unsharded first"
        )
    mpad = np.zeros((depth, z + 2 * halo), np.float32)
    mpad[:, halo:halo + z] = m
    stacked = np.stack(
        [
            mpad[k * dl:(k + 1) * dl, k * zl:k * zl + zl + 2 * halo]
            for k in range(n)
        ]
    )
    return stacked, halo


def resample3d_zband(
    x: jax.Array,
    depth: int,
    height: int,
    width: int,
    axis_name: str,
    n: int,
) -> jax.Array:
    """z-sharded ``ops.volume3d.resample3d``: [z/n, H, W] per-device
    slab -> [depth/n, height, width]. The h/w resamples are pure
    per-slice matmuls (local); the z resample exchanges a static halo
    (one ppermute round) and contracts each device's output band with
    its own static slice of the global resize matrix — the same
    numbers the unsharded einsum sums, in the same ascending-z order
    (the extra terms are exact zeros). VERDICT r3 item 8.
    """
    from mies_tpu.ops.volume3d import _linear_resize_matrix

    zl, h, w = x.shape
    z = zl * n
    prec = jax.lax.Precision.HIGHEST
    x = x.astype(jnp.float32)
    # axis order matches the unsharded op (z, then h, then w) — the
    # separable passes commute mathematically but not bit-wise in f32
    if z != depth:
        stacked, halo = _resample_band_geometry(z, depth, n)
        ext = halo_extend_rows(x, halo, axis_name, mode="nearest")
        mk = jnp.take(
            jnp.asarray(stacked), lax.axis_index(axis_name), axis=0
        )
        x = jnp.einsum("oz,zhw->ohw", mk, ext, precision=prec)
    if h != height:
        x = jnp.einsum("oh,zhw->zow", jnp.asarray(
            _linear_resize_matrix(h, height)), x, precision=prec)
    if w != width:
        x = jnp.einsum("ow,zhw->zho", jnp.asarray(
            _linear_resize_matrix(w, width)), x, precision=prec)
    return x


def _build_zslab_fn(
    cfg: PipelineConfig, quantize: bool, axis_name: str,
    n_devices: int | None = None,
) -> Callable:
    """Per-device slab function for a z-sharded volume chain.

    ``n_devices`` (the 'space' axis size) is needed statically only by
    shape-changing stages (resample3d builds per-device slices of the
    global resize matrix); volume_shard_apply passes it from the mesh.
    """
    from mies_tpu.pipeline.compiler import _volume_registry

    reg = _volume_registry()
    stages = []
    for s in cfg.stages:
        params = s.kwargs()
        if s.op not in reg:
            raise ValueError(
                f"op {s.op!r} is not volume-capable; available: {sorted(reg)}"
            )
        volume_stage_z_field(s.op, params)  # reject non-shardable early
        if s.op == "resample3d" and n_devices is None:
            raise ValueError(
                "resample3d in a z-sharded chain needs the static device "
                "count (use volume_shard_apply, which passes it)"
            )
        stages.append((s.op, params))

    def slab_fn(slab):  # [Z/n, H, W] on each device
        x = slab
        for op, params in stages:
            if op == "resample3d":
                x = resample3d_zband(
                    x, params["depth"], params["height"], params["width"],
                    axis_name, n_devices,
                )
            elif op == "clahe3d":
                p = dict(params)
                p.pop("kernel_size", None)
                x = clahe3d_band(x, axis_name=axis_name, **p)
            elif op in ("gaussian_blur3d", "median_blur3d",
                        "unsharp_mask3d", "denoise_nl_means3d",
                        "frangi3d", "vessel_enhance3d", "sato3d",
                        "hessian3d", "difference_of_gaussians3d"):
                r = volume_stage_z_field(op, params)
                # per-op border defaults: nl-means has no mode param and
                # pads np 'reflect' (our 'mirror'); the ridge ops default
                # to 'reflect'
                if op == "denoise_nl_means3d":
                    mode = "mirror"
                elif op in ("frangi3d", "vessel_enhance3d", "sato3d",
                            "hessian3d"):
                    mode = params.get("mode", "reflect")
                else:
                    mode = params.get("mode", "nearest")
                fn = functools.partial(reg[op], **params)
                if r == 0:
                    x = fn(x)
                else:
                    ext = halo_extend_rows(x, r, axis_name, mode=mode)
                    x = fn(ext)[r:-r]
            elif op == "srad3d":
                from mies_tpu.ops.restoration import _srad_step3d

                p = dict(params)
                _dt = float(p.get("dt", 0.15))
                _q0 = float(p.get("q0", 1.0))
                _rho = float(p.get("rho", 0.2))
                _eps = float(p.get("eps", 1e-6))

                def srad_body(t, v, _d=_dt, _q=_q0, _r=_rho, _e=_eps):
                    q0t = np.float32(_q) * jnp.exp(
                        -np.float32(_r) * t.astype(jnp.float32)
                    )
                    ext = halo_extend_rows(v, 2, axis_name, mode="edge")
                    return _srad_step3d(ext, _d, q0t, _e)

                x = lax.fori_loop(
                    0, int(p.get("niter", 15)), srad_body,
                    x.astype(jnp.float32),
                )
            elif op == "anisotropic_diffusion3d":
                from mies_tpu.ops.restoration import _pm_step

                p = dict(params)
                kappa = p.get("kappa", 50.0)
                gamma = p.get("gamma", 0.1)
                option = int(p.get("option", 1))
                vs = p.get("voxelspacing") or (1.0, 1.0, 1.0)
                sp = tuple(float(v) for v in vs)

                # per-ITERATION slab exchange: edge-replicate pads zero
                # the z boundary fluxes, so each step matches the
                # unsharded op's jnp.pad('edge') bit for bit (the 2-D
                # band builder's diffusion rule, parallel/halo.py)
                def pm_body(_, v, _k=kappa, _g=gamma, _o=option, _s=sp):
                    ext = halo_extend_rows(v, 1, axis_name, mode="edge")
                    return _pm_step(ext, _k, _g, _o, _s)

                x = lax.fori_loop(
                    0, int(p.get("niter", 10)), pm_body,
                    x.astype(jnp.float32),
                )
            elif op in ("erode3d", "dilate3d", "morph_open3d",
                        "morph_close3d", "morph_gradient3d", "top_hat3d",
                        "black_hat3d"):
                k = params.get("kernel_size", 3)
                mmode = params.get("mode", "ignore")
                rm = k // 2

                def prim(v, maximum, _k=k, _m=mmode, _r=rm):
                    """One erode/dilate level under (extend, run, crop) —
                    the 'ignore' border extends the GLOBAL z edges with
                    the constant the reduction ignores (the 2-D band
                    builder's morphology rule, parallel/halo.py)."""
                    if _r == 0:
                        return v
                    emode = (
                        float(np.float32("-inf" if maximum else "inf"))
                        if _m == "ignore" else _m
                    )
                    ext = halo_extend_rows(v, _r, axis_name, mode=emode)
                    return V._extremum3d(ext, _k, _m, maximum)[_r:-_r]

                if op == "erode3d":
                    x = prim(x, False)
                elif op == "dilate3d":
                    x = prim(x, True)
                elif op == "morph_open3d":
                    x = prim(prim(x, False), True)
                elif op == "morph_close3d":
                    x = prim(prim(x, True), False)
                elif op == "morph_gradient3d":
                    # one slab exchange, both borders
                    from mies_tpu.parallel.halo import (
                        halo_extend_rows_multi,
                    )

                    if rm == 0:
                        x = jnp.zeros_like(x)
                    else:
                        if mmode == "ignore":
                            gmodes = (float(np.float32("-inf")),
                                      float(np.float32("inf")))
                        else:
                            gmodes = (mmode, mmode)
                        ed, ee = halo_extend_rows_multi(
                            x, rm, axis_name, gmodes)
                        x = (
                            V._extremum3d(ed, k, mmode, True)[rm:-rm]
                            - V._extremum3d(ee, k, mmode, False)[rm:-rm]
                        )
                elif op == "top_hat3d":
                    x = x.astype(jnp.float32) - prim(prim(x, False), True)
                else:  # black_hat3d
                    x = prim(prim(x, True), False) - x.astype(jnp.float32)
            elif op == "guided_blur3d":
                from mies_tpu.ops.filters import _guided_dataflow

                k = params.get("kernel_size", 3)
                eps = params.get("eps", 1e-2)
                gmode = params.get("mode", "reflect")
                rb = k // 2

                def fbox(v, _k=k, _m=gmode, _r=rb):
                    # each box halo-wraps individually: reflect(a(x)) !=
                    # a(reflect(x)) at the global edges (same subtlety
                    # the 2-D guided band hit — parallel/halo.py)
                    if _r == 0:
                        return V._box3d(v, _k, _m)
                    ext = halo_extend_rows(v, _r, axis_name, mode=_m)
                    return V._box3d(ext, _k, _m)[_r:-_r]

                x = _guided_dataflow(fbox, x.astype(jnp.float32), eps)
            elif op == "normalize":
                lo = lax.pmin(jnp.min(x), axis_name)
                hi = lax.pmax(jnp.max(x), axis_name)
                eps = params.get("eps", 1e-12)
                x = (x - lo) / jnp.maximum(hi - lo, eps)
            elif op == "rescale_intensity":
                in_range = params.get("in_range")
                if in_range is None:
                    imin = lax.pmin(jnp.min(x), axis_name)
                    imax = lax.pmax(jnp.max(x), axis_name)
                else:
                    imin = jnp.asarray(in_range[0], x.dtype)
                    imax = jnp.asarray(in_range[1], x.dtype)
                omin, omax = params.get("out_range", (0.0, 1.0))
                xc = jnp.clip(x, imin, imax)
                scale = (omax - omin) / jnp.maximum(imax - imin, 1e-12)
                x = (xc - imin) * scale + omin
            elif op == "equalize_hist":
                nbins = params.get("nbins", NBINS)
                x = x.astype(jnp.float32)
                lo = lax.pmin(jnp.min(x), axis_name)
                hi = lax.pmax(jnp.max(x), axis_name)
                span = jnp.maximum(hi - lo, 1e-12)
                idx8 = jnp.clip(
                    ((x - lo) / span * nbins).astype(jnp.int32), 0, nbins - 1
                )
                hist = lax.psum(
                    H._global_hist_onehot(idx8.ravel(), nbins), axis_name
                )
                x = H._equalize_from_hist(x, lo, span, hist, nbins)
            else:  # pointwise
                x = functools.partial(reg[op], **params)(x)
        return _quantize_u8(x) if quantize else x

    return slab_fn


def volume_shard_apply(
    cfg: PipelineConfig,
    mesh: Mesh,
    quantize: bool = True,
    axis_name: str = "space",
) -> Callable:
    """Compile cfg into ONE SPMD program z-sharding a [Z, H, W] volume.

    Z must be divisible by the 'space' axis size (and clahe3d's gz by
    the axis size, Z by gz). The result equals
    ``compile_volume_pipeline(cfg, quantize)`` on the whole volume bit
    for bit — tests/test_parallel.py proves it per stage and for mixed
    chains on the 8-device CPU mesh.
    """
    sharded = shard_map(
        _build_zslab_fn(
            cfg, quantize, axis_name,
            n_devices=mesh.shape[axis_name],
        ),
        mesh=mesh,
        in_specs=P(axis_name, None, None),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    return jax.jit(sharded)

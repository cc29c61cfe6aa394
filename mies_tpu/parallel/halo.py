"""Spatial sharding with halo exchange — the ring-attention analogue.

An oversized single slice (e.g. a 4096x4096 mammogram) is split into
horizontal bands across the mesh's 'space' axis. Stencil stages
(gaussian / median / bilateral / unsharp) stay exact if each band is
extended with ``halo`` rows of REAL neighbor data before the chain and
cropped after — neighbor rows move over ICI with ``lax.ppermute``
(SURVEY.md section 5.7). At the global top/bottom edges the op's own
border mode is reproduced locally, so the sharded result equals the
unsharded one bit for bit whenever the chain's total receptive field
fits in the halo.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mies_tpu.ops.filters import _PAD_MODE
from mies_tpu.pipeline.compiler import _quantize_u8
from mies_tpu.pipeline.config import PipelineConfig

_MORPH_OPS = frozenset((
    "erode", "dilate", "morph_open", "morph_close", "morph_gradient",
    "top_hat", "black_hat",
))


def halo_extend_rows(
    x: jax.Array, halo: int, axis_name: str, mode: str = "nearest"
) -> jax.Array:
    """Extend a band by `halo` positions on each side of AXIS 0.

    Rank-agnostic: [h, W] row bands of a sharded slice and [z, H, W]
    slab bands of a z-sharded volume both shard on axis 0. Interior
    boundaries receive true neighbor rows/slabs via two ppermutes
    (up-ring and down-ring — both directions of the ICI links); global
    boundaries fall back to the local border-mode rows, matching what
    the unsharded op's padding would produce.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if halo <= 0:
        return x
    if n > 1 and halo > x.shape[0]:
        raise ValueError(
            f"halo {halo} exceeds the local band size {x.shape[0]} "
            f"(single-hop neighbor exchange); use fewer devices along "
            f"the axis or larger bands"
        )

    # global edges: reproduce the border mode locally. mode may be a
    # float: constant-VALUE rows (morphology's 'ignore' border pads
    # +/-inf so the outside never wins the min/max)
    if isinstance(mode, float):
        pad_top = pad_bot = jnp.full(
            (halo,) + x.shape[1:], mode, dtype=x.dtype
        )
    else:
        pad_w = ((halo, halo),) + ((0, 0),) * (x.ndim - 1)
        pad_top = jnp.pad(x, pad_w, mode=_PAD_MODE[mode])[:halo]
        pad_bot = jnp.pad(x, pad_w, mode=_PAD_MODE[mode])[-halo:]
    if n == 1:
        # degenerate mesh: both boundaries are global edges, but the
        # caller still crops `halo` rows per stage — extend locally so
        # fn(ext)[halo:-halo] preserves shape and equals the unsharded op
        return jnp.concatenate([pad_top, x, pad_bot], axis=0)

    top_rows = x[:halo]
    bot_rows = x[-halo:]
    # device i receives the bottom rows of i-1 (shift down the ring) ...
    from_above = lax.ppermute(
        bot_rows, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    # ... and the top rows of i+1 (shift up the ring)
    from_below = lax.ppermute(
        top_rows, axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    top = jnp.where(idx == 0, pad_top, from_above)
    bot = jnp.where(idx == n - 1, pad_bot, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def halo_extend_rows_multi(
    x: jax.Array, halo: int, axis_name: str, modes: tuple
) -> tuple:
    """One neighbor exchange, several border modes: returns one extended
    band per entry of ``modes`` (each as halo_extend_rows would build
    it). The ppermutes — the ICI cost — run ONCE; only the global-edge
    pad rows differ per mode. Used by the morphology gradient band,
    whose erode and dilate levels read the same neighbor rows but pad
    opposite constants (the fbox2 pattern, one function up)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if halo <= 0:
        return tuple(x for _ in modes)
    if n > 1 and halo > x.shape[0]:
        raise ValueError(
            f"halo {halo} exceeds the local band size {x.shape[0]} "
            f"(single-hop neighbor exchange); use fewer devices along "
            f"the axis or larger bands"
        )

    def pads(mode):
        if isinstance(mode, float):
            p = jnp.full((halo,) + x.shape[1:], mode, dtype=x.dtype)
            return p, p
        pad_w = ((halo, halo),) + ((0, 0),) * (x.ndim - 1)
        padded = jnp.pad(x, pad_w, mode=_PAD_MODE[mode])
        return padded[:halo], padded[-halo:]

    if n == 1:
        return tuple(
            jnp.concatenate([t, x, b], axis=0)
            for t, b in (pads(m) for m in modes)
        )
    from_above = lax.ppermute(
        x[-halo:], axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )
    from_below = lax.ppermute(
        x[:halo], axis_name, perm=[(i + 1, i) for i in range(n - 1)]
    )
    out = []
    for m in modes:
        pad_top, pad_bot = pads(m)
        top = jnp.where(idx == 0, pad_top, from_above)
        bot = jnp.where(idx == n - 1, pad_bot, from_below)
        out.append(jnp.concatenate([top, x, bot], axis=0))
    return tuple(out)


def stage_receptive_field(op: str, params: dict) -> int:
    """Row radius a stage reads beyond its output pixel (0 = pointwise)."""
    if op in ("gaussian_blur", "unsharp_mask"):
        sigma = params.get("sigma", params.get("radius", 1.0))
        truncate = params.get("truncate", 4.0)
        return int(truncate * float(sigma) + 0.5)
    if op in ("median_blur", "box_blur", "bilateral_blur"):
        return params.get("kernel_size", 5 if op == "bilateral_blur" else 3) // 2
    if op == "motion_blur":
        return params.get("kernel_size", 9) // 2
    if op == "guided_blur":
        # two box-filter levels: image statistics, then the a/b means
        return 2 * (params.get("kernel_size", 3) // 2)
    if op == "denoise_bilateral":
        ss = params.get("sigma_spatial", 1.0)
        return max(5, 2 * int(np.ceil(3.0 * float(ss))) + 1) // 2
    if op in (
        "sobel_edges", "scharr_edges", "prewitt_edges", "roberts_edges",
        "laplace", "laplacian_sharpen", "sharpness",
    ):
        # roberts reads only the forward (+1) diagonal but the
        # symmetric 1-row halo covers it
        return 1
    if op == "farid_edges":
        return 2  # 5-tap Farid-Simoncelli pair
    if op == "denoise_nl_means":
        # single-pass patch stencil: search radius + patch radius
        s = params.get("patch_size", 7)
        s = s if s % 2 == 1 else s + 1
        return params.get("patch_distance", 11) + s // 2
    if op in ("frangi", "vessel_enhance", "sato", "hessian"):
        if op == "hessian":
            # skimage's fixed gamma=15 default — no global statistic
            params = {**params, "gamma": params.get("gamma", 15.0)}
        if op not in ("sato",) and params.get("gamma") is None:
            raise ValueError(
                f"op {op!r} with gamma=None normalizes by the per-scale "
                "GLOBAL max Frobenius norm and cannot be spatially "
                "sharded; pass an explicit gamma"
            )
        # per-scale Gaussian-derivative convs read int(4*sigma + 0.5);
        # sato has NO global statistic — always a plain stencil
        return max(
            int(4.0 * float(s) + 0.5)
            for s in params.get("sigmas", (1.0, 2.0, 4.0))
        )
    if op == "difference_of_gaussians":
        low = params.get("low_sigma", 1.0)
        high = params.get("high_sigma")
        if high is None:
            high = 1.6 * float(low)
        return int(params.get("truncate", 4.0) * float(high) + 0.5)
    if op in ("gabor", "gabor_bank"):
        from mies_tpu.ops.filters import gabor_kernel

        if op == "gabor":
            thetas = [float(params.get("theta", 0.0))]
        else:
            n = int(params.get("n_orientations", 8))
            thetas = [k * np.pi / n for k in range(n)]
        return max(
            gabor_kernel(
                float(params.get("frequency", 0.1)),
                th,
                float(params.get("bandwidth", 1.0)),
                None if params.get("sigma_x") is None
                else float(params["sigma_x"]),
                None if params.get("sigma_y") is None
                else float(params["sigma_y"]),
                int(params.get("n_stds", 3)),
                float(params.get("offset", 0.0)),
            ).shape[0] // 2  # row radius of the rotated support
            for th in thetas
        )
    if op == "lee_filter":
        if params.get("sigma") is None:
            raise ValueError(
                "lee_filter with sigma=None estimates the noise from "
                "the IMAGE-WIDE mean local variance and cannot be "
                "spatially sharded; pass an explicit sigma"
            )
        return params.get("kernel_size", 5) // 2
    if op == "kuwahara":
        return params.get("kernel_size", 5) // 2
    if op == "retinex":
        if params.get("rescale", "clip") == "minmax":
            raise ValueError(
                "retinex with rescale='minmax' stretches by the "
                "IMAGE-WIDE min/max (global extent); use "
                "rescale='clip' or batch sharding"
            )
        truncate = params.get("truncate", 4.0)
        return max(
            int(truncate * float(s) + 0.5)
            for s in params.get("sigmas", (2.0, 8.0, 30.0))
        )
    if op == "srad":
        # 2 px/iteration (the c ring reads the I 2-neighborhood); the
        # band form refreshes the halo each iteration
        return 2 * int(params.get("niter", 15))
    if op == "anisotropic_diffusion":
        # 1 px/iteration; the band form refreshes the halo each
        # iteration (stale-halo contamination would otherwise reach the
        # interior), so this is only the TOTAL extent diagnostic
        return int(params.get("niter", 10))
    if op in ("erode", "dilate", "morph_gradient"):
        return params.get("kernel_size", 3) // 2
    if op in ("morph_open", "morph_close", "top_hat", "black_hat"):
        # two morphology levels (erode then dilate or vice versa)
        return 2 * (params.get("kernel_size", 3) // 2)
    if op == "subtract_background":
        from mies_tpu.ops.morphology import _resolve_downscale

        if _resolve_downscale(params.get("downscale", "auto"),
                              params.get("radius", 25.0)) > 1:
            raise ValueError(
                "subtract_background with an effective downscale > 1 "
                "(explicit, or 'auto' at radius > 10) runs on "
                "decimated pyramid grids which don't tile along rows; "
                "use downscale=1 or batch sharding"
            )
        # non-flat ball opening: two levels of ceil(radius) each
        return 2 * int(np.ceil(params.get("radius", 25.0)))
    if op in (
        "equalize_hist", "equalize", "clahe", "normalize",
        "rescale_intensity", "resize", "center_crop", "flip", "rot90",
        "rotate", "affine_warp", "perspective_warp",  # global extent: a
        # warped pixel can read from anywhere — no fixed halo exists
        "histogram_match",  # per-image CDF = global extent
        "denoise_tv",  # convergence test sums energy over the image
        "richardson_lucy",  # zero-pad border applied to INTERMEDIATES
        # each iteration — extend-run-crop cannot reproduce it
        "denoise_wavelet",  # multilevel global transform: thresholds
        # are whole-subband statistics and the decimated grids don't
        # tile along rows — use batch sharding
        "meijering",  # per-scale response normalized by its IMAGE-WIDE
        # max (the paper's lambda_min normalization) = global extent
        "butterworth", "homomorphic",  # FFT: every output pixel reads
        # every input pixel — no fixed halo exists
        "canny",  # hysteresis is global connectivity (and quantile
        # thresholds are whole-image statistics)
        "wiener",  # circulant FFT deconvolution = global extent
        "musica",  # decimated pyramid grids don't tile along rows
        # (each level halves the grid; band rows mix across devices)
        "cycle_spin",  # circular rolls wrap rows across the image
        # (and the inner wavelet transform is global anyway)
    ):
        raise ValueError(
            f"op {op!r} has global/tile extent and cannot be spatially "
            "sharded with a fixed halo; use batch sharding for chains "
            "containing it (clahe has its own tile-aligned shard path)"
        )
    _POINTWISE = {
        "adjust_gamma", "adjust_log", "adjust_sigmoid", "invert",
        "window_hu", "normalize_meanstd", "denormalize_meanstd",
        "adjust_brightness", "adjust_contrast", "solarize", "posterize",
    }
    if op == "learned_denoise":
        raise ValueError("learned_denoise receptive field is model-dependent")
    if op not in _POINTWISE:
        raise ValueError(f"unknown op {op!r} for spatial sharding")
    return 0  # pointwise intensity ops


def chain_receptive_field(cfg: PipelineConfig) -> int:
    """Total halo needed so the sharded chain is exact: sum of radii."""
    return sum(stage_receptive_field(s.op, s.kwargs()) for s in cfg.stages)


_DEFAULT_MODE = {
    # per-op default border mode (must match mies_tpu.ops.filters defaults)
    "gaussian_blur": "nearest",
    "unsharp_mask": "nearest",
    "median_blur": "nearest",
    "box_blur": "reflect",
    "bilateral_blur": "reflect",
    "denoise_bilateral": "edge",
    "sobel_edges": "reflect",
    "scharr_edges": "reflect",
    "prewitt_edges": "reflect",
    "farid_edges": "reflect",
    "roberts_edges": "reflect",
    "laplace": "reflect",
    "laplacian_sharpen": "reflect",
    # nl-means has no mode param: skimage pads np 'reflect' == our 'mirror'
    "denoise_nl_means": "mirror",
    "frangi": "reflect",
    "vessel_enhance": "reflect",
    "sato": "reflect",
    "hessian": "reflect",
    "difference_of_gaussians": "nearest",
    "gabor": "reflect",
    "gabor_bank": "reflect",
    "retinex": "nearest",
    "lee_filter": "reflect",
    "kuwahara": "reflect",
    "motion_blur": "constant",
}


def _build_band_fn(
    cfg: PipelineConfig, quantize: bool, axis_name: str
) -> Callable:
    """Build the per-device band function for a row-sharded chain.

    Stencil stages wrap in (halo exchange of their own radius/border
    mode) -> stage -> crop; pointwise stages run directly; a ``clahe``
    stage runs the tile-aligned band algorithm (local histograms + ONE
    LUT all-gather — mies_tpu.parallel.clahe_shard.clahe_band). The
    sharded chain is exact by induction: every stage sees the same
    pixels the unsharded program would.
    """
    from mies_tpu.pipeline.compiler import OP_REGISTRY

    stages = []  # (op, fn, radius, mode); clahe -> (op, params, None, None)
    for s in cfg.stages:
        params = s.kwargs()
        if (s.op in ("clahe", "guided_blur", "anisotropic_diffusion",
                     "subtract_background", "srad")
                or s.op in _MORPH_OPS):
            # stages whose band form is NOT (extend, run, crop): clahe
            # needs the tile-aligned band algorithm; guided_blur nests
            # box filters, and reflect(a(x)) != a(reflect(x)) at the
            # GLOBAL edges — each box must halo-wrap individually;
            # morphology composites interleave erode/dilate levels whose
            # 'ignore' border pads OPPOSITE constants (+inf vs -inf), so
            # each level halo-wraps with its own pad
            stages.append((s.op, params, None, None))
            continue
        r = stage_receptive_field(s.op, params)
        mode = params.get("mode", _DEFAULT_MODE.get(s.op, "nearest"))
        stages.append(
            (s.op, functools.partial(OP_REGISTRY[s.op], **params), r, mode)
        )

    def band_fn(band):  # [H/n, W] on each device
        from mies_tpu.parallel.clahe_shard import clahe_band

        n = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)
        x = band
        for op, fn, r, mode in stages:
            if op == "clahe":
                p = dict(fn)
                # only 256 bins exist; kernel_size is skimage-only and
                # that convention is rejected inside clahe_band
                p.pop("nbins", None)
                p.pop("kernel_size", None)
                x = clahe_band(x, axis_name=axis_name, **p)
            elif op == "guided_blur":
                from mies_tpu.ops.filters import _guided_dataflow, box_blur

                p = dict(fn)
                k = p.get("kernel_size", 3)
                eps = p.get("eps", 1e-2)
                gmode = p.get("mode", "reflect")
                rb = k // 2

                def fbox(v):
                    if rb == 0:
                        return box_blur(v, k, gmode)
                    ext = halo_extend_rows(v, rb, axis_name, mode=gmode)
                    return box_blur(ext, k, gmode)[rb:-rb]

                def fbox2(u, v):
                    """Pair the two boxes of each dataflow level into
                    ONE halo exchange: column-concat, exchange rows
                    once, split, box each half (each half's own column
                    padding is applied after the split, so results are
                    identical to independent boxes — this halves the
                    ppermute rounds per guided stage)."""
                    if rb == 0:
                        return box_blur(u, k, gmode), box_blur(v, k, gmode)
                    wcols = u.shape[1]
                    ext = halo_extend_rows(
                        jnp.concatenate([u, v], axis=1), rb, axis_name,
                        mode=gmode,
                    )
                    return (
                        box_blur(ext[:, :wcols], k, gmode)[rb:-rb],
                        box_blur(ext[:, wcols:], k, gmode)[rb:-rb],
                    )

                # the shared dataflow with every box halo-wrapped: each
                # box is exact under (extend, run, crop) including the
                # global edges, so the whole filter is
                x = _guided_dataflow(fbox, x, eps, box2=fbox2)
            elif op == "subtract_background":
                from mies_tpu.ops.morphology import _ball_table, _rb_pass

                p = dict(fn)
                stage_receptive_field(op, p)  # rejects downscale > 1
                _rad = float(p.get("radius", 25.0))
                _int = p.get("intensity")
                table = _ball_table(
                    _rad,
                    _rad / 255.0 if _int is None else float(_int),
                )
                rr = table.shape[0] // 2

                def rb_band(v, _t=table, _r=rr):
                    """Non-flat ball opening with each level halo-wrapped
                    under its own ignored constant (+inf for the min
                    pass, -inf for the max — the flat-morphology rule
                    above); min/max trees are reassociation-insensitive,
                    so band == unsharded bit for bit."""
                    ext = halo_extend_rows(
                        v, _r, axis_name, mode=float(np.float32("inf"))
                    )
                    e = _rb_pass(ext, _t, maximum=False)
                    ext2 = halo_extend_rows(
                        e, _r, axis_name, mode=float(np.float32("-inf"))
                    )
                    return _rb_pass(ext2, _t, maximum=True)

                x = x.astype(jnp.float32)
                if p.get("light_background", False):
                    inv = 1.0 - x
                    x = 1.0 - jnp.clip(inv - rb_band(inv), 0.0, 1.0)
                else:
                    x = jnp.clip(x - rb_band(x), 0.0, 1.0)
            elif op == "srad":
                from mies_tpu.ops.restoration import _srad_step

                p = dict(fn)
                _dt = float(p.get("dt", 0.15))
                _q0 = float(p.get("q0", 1.0))
                _rho = float(p.get("rho", 0.2))
                _eps = float(p.get("eps", 1e-6))

                # per-ITERATION 2-row halo refresh (the diffusion rule
                # below, with the wider c-ring support)
                def srad_body(t, v):
                    q0t = np.float32(_q0) * jnp.exp(
                        -np.float32(_rho) * t.astype(jnp.float32)
                    )
                    ext = halo_extend_rows(v, 2, axis_name, mode="edge")
                    return _srad_step(ext, _dt, q0t, _eps)

                x = lax.fori_loop(
                    0, int(p.get("niter", 15)), srad_body,
                    x.astype(jnp.float32),
                )
            elif op == "anisotropic_diffusion":
                from mies_tpu.ops.restoration import _pm_step

                p = dict(fn)
                kappa = p.get("kappa", 50.0)
                gamma = p.get("gamma", 0.1)
                option = int(p.get("option", 1))

                # iterative stencil: the halo must be REFRESHED every
                # iteration (an up-front niter-row halo goes stale after
                # one step — per-iteration zero-flux borders, like
                # richardson_lucy's rejection note, except here one
                # 1-row exchange per iteration reproduces it exactly:
                # edge-replicate pads zero the boundary fluxes, matching
                # the unsharded op's jnp.pad('edge') step bit for bit)
                def pm_body(_, v):
                    ext = halo_extend_rows(v, 1, axis_name, mode="edge")
                    return _pm_step(ext, kappa, gamma, option, (1.0, 1.0))

                x = lax.fori_loop(
                    0, int(p.get("niter", 10)), pm_body,
                    x.astype(jnp.float32),
                )
            elif op in _MORPH_OPS:
                from mies_tpu.ops import morphology as M

                p = dict(fn)
                k = p.get("kernel_size", 3)
                shp = p.get("shape", "rect")
                mmode = p.get("mode", "ignore")
                rm = k // 2

                def prim(v, maximum):
                    """One erode/dilate level under (extend, run, crop).

                    'ignore' extends the GLOBAL edges with the constant
                    the reduction ignores (+inf for min, -inf for max —
                    cv2's default morphology border); explicit modes
                    extend with their own border rows."""
                    if rm == 0:
                        return v
                    emode = (
                        float(np.float32("-inf" if maximum else "inf"))
                        if mmode == "ignore" else mmode
                    )
                    ext = halo_extend_rows(v, rm, axis_name, mode=emode)
                    return M._extremum(ext, k, shp, mmode, maximum)[rm:-rm]

                if op == "erode":
                    x = prim(x, False)
                elif op == "dilate":
                    x = prim(x, True)
                elif op == "morph_open":
                    x = prim(prim(x, False), True)
                elif op == "morph_close":
                    x = prim(prim(x, True), False)
                elif op == "morph_gradient":
                    # one exchange, both borders (halo_extend_rows_multi)
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
                            M._extremum(ed, k, shp, mmode, True)[rm:-rm]
                            - M._extremum(ee, k, shp, mmode, False)[rm:-rm]
                        )
                elif op == "top_hat":
                    x = x - prim(prim(x, False), True)
                else:  # black_hat
                    x = prim(prim(x, True), False) - x
            elif r > 0:
                x_in = x
                ext = halo_extend_rows(x, r, axis_name, mode=mode)
                x = fn(ext)[r:-r]
                if op == "sharpness":
                    # PIL interior-only semantics: the GLOBAL top/bottom
                    # rows pass through unsmoothed (= clip of the input,
                    # since smoothed==img there makes the blend the
                    # identity). The halo makes band boundaries interior,
                    # so restore pass-through on the edge devices only.
                    x = x.at[0].set(
                        jnp.where(idx == 0, jnp.clip(x_in[0], 0.0, 1.0), x[0])
                    )
                    x = x.at[-1].set(
                        jnp.where(
                            idx == n - 1, jnp.clip(x_in[-1], 0.0, 1.0), x[-1]
                        )
                    )
            else:
                x = fn(x)
        return _quantize_u8(x) if quantize else x

    return band_fn


def spatial_shard_apply(
    cfg: PipelineConfig,
    mesh: Mesh,
    quantize: bool = True,
    axis_name: str = "space",
) -> Callable:
    """Compile cfg into ONE SPMD program sharding a [H, W] slice by rows.

    H must be divisible by the 'space' axis size. Stencil stages use
    per-stage halo exchange; ``clahe`` stages use the tile-aligned band
    + LUT all-gather path INSIDE the same program (VERDICT round 1,
    missing #4) — so the flagship chain on a 4096^2 mammogram runs as a
    single sharded program, bit-exact vs unsharded. For clahe: grid rows
    divisible by the axis size; H, W divisible by the grid.

    This is the structural cousin of ring attention (SURVEY.md 5.7):
    neighbor-band ppermutes over ICI, local stencil compute, one tiny
    all_gather per clahe stage, no gather/all-to-all.
    """
    sharded = shard_map(
        _build_band_fn(cfg, quantize, axis_name),
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
        check_vma=False,  # Pallas inside shard_map: out_shape has no vma info
    )
    return jax.jit(sharded)


def batch_spatial_shard_apply(
    cfg: PipelineConfig,
    mesh: Mesh,
    quantize: bool = True,
    data_axis: str = "data",
    space_axis: str = "space",
) -> Callable:
    """('data', 'space') program: fn([B, H, W]) with the batch sharded
    over ``data_axis`` AND every slice row-sharded over ``space_axis`` —
    batches of oversized slices (e.g. 8 x 4096^2 mammograms) run as one
    SPMD program over the full 2-D mesh (VERDICT round 1, missing #4).

    B must divide by the data axis size, H by the space axis size (plus
    the clahe tile-alignment rules of spatial_shard_apply).
    """
    band_fn = _build_band_fn(cfg, quantize, space_axis)
    sharded = shard_map(
        jax.vmap(band_fn),
        mesh=mesh,
        in_specs=P(data_axis, space_axis, None),
        out_specs=P(data_axis, space_axis, None),
        check_vma=False,  # Pallas inside shard_map: out_shape has no vma info
    )
    return jax.jit(sharded)

"""Compile a PipelineConfig into one jitted XLA program.

The whole chain — including int16->float windowing on the way in and
uint8 quantization on the way out — traces into a single ``jax.jit``
program, so XLA fuses every elementwise stage into its neighbors and
host<->device crossings happen exactly twice per call (SURVEY.md
section 3.1). Batches are handled with ``jax.vmap`` over a leading axis.

The config is hashable, so ``compile_pipeline`` results are cached:
the same config never retraces.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import Array

from mies_tpu.ops import feature as FT
from mies_tpu.ops import filters as F
from mies_tpu.ops import frequency as FQ
from mies_tpu.ops import geometry as GEO
from mies_tpu.ops import histogram as H
from mies_tpu.ops import intensity as I
from mies_tpu.ops import morphology as M
from mies_tpu.ops import pyramid as PYR
from mies_tpu.ops import restoration as REST
from mies_tpu.ops import ridges as RG
from mies_tpu.ops import wavelet as WV
from mies_tpu.pipeline.config import PipelineConfig

# Every op the config schema can name. Signature: fn(img, **params) -> img.
# (clahe is re-wrapped to drop its own jit; the chain jit subsumes it.)
OP_REGISTRY: dict[str, Callable] = {
    # intensity
    "adjust_gamma": I.adjust_gamma,
    "adjust_log": I.adjust_log,
    "adjust_sigmoid": I.adjust_sigmoid,
    "invert": I.invert,
    "normalize": I.normalize_minmax,
    "rescale_intensity": I.rescale_intensity,
    "window_hu": I.window_hu,
    "adjust_brightness": I.adjust_brightness,
    "adjust_contrast": I.adjust_contrast,
    "solarize": I.solarize,
    "posterize": I.posterize,
    "sharpness": I.sharpness,
    # histogram
    "equalize_hist": H.equalize_hist,
    "equalize": H.equalize,  # kornia/PIL integer-LUT variant
    "clahe": H.clahe.__wrapped__,  # un-jitted body; chain jit covers it
    # filters
    "gaussian_blur": F.gaussian_blur,
    "box_blur": F.box_blur,
    "unsharp_mask": F.unsharp_mask,
    "median_blur": F.median_blur,
    "bilateral_blur": F.bilateral_blur,
    "denoise_bilateral": F.denoise_bilateral,
    "guided_blur": F.guided_blur,
    "sobel_edges": F.sobel_edges,
    "scharr_edges": F.scharr_edges,
    "prewitt_edges": F.prewitt_edges,
    "farid_edges": F.farid_edges,
    "roberts_edges": F.roberts_edges,
    "laplace": F.laplace,
    "laplacian_sharpen": F.laplacian_sharpen,
    "difference_of_gaussians": F.difference_of_gaussians,
    "gabor": F.gabor,
    "gabor_bank": F.gabor_bank,
    "retinex": F.retinex,
    "lee_filter": F.lee_filter,
    "kuwahara": F.kuwahara,
    "motion_blur": F.motion_blur,
    "canny": FT.canny,
    # frequency domain (FFT)
    "butterworth": FQ.butterworth,
    "homomorphic": FQ.homomorphic,
    # restoration (skimage.restoration surface)
    "denoise_nl_means": REST.denoise_nl_means,
    "denoise_tv": REST.denoise_tv,
    "anisotropic_diffusion": REST.anisotropic_diffusion,
    "srad": REST.srad,
    # multiscale (Laplacian pyramid)
    "musica": PYR.musica,
    "richardson_lucy": REST.richardson_lucy,
    "wiener": REST.wiener,
    "denoise_wavelet": WV.denoise_wavelet,
    "cycle_spin": WV.cycle_spin,
    # ridge / vesselness (Frangi 1998 / Sato 1998 / Meijering 2004)
    "frangi": RG.frangi,
    "vessel_enhance": RG.vessel_enhance,
    "sato": RG.sato,
    "meijering": RG.meijering,
    "hessian": RG.hessian,
    # morphology (cv2-compatible flat structuring elements)
    "erode": M.erode,
    "dilate": M.dilate,
    "morph_open": M.morph_open,
    "morph_close": M.morph_close,
    "morph_gradient": M.morph_gradient,
    "top_hat": M.top_hat,
    "black_hat": M.black_hat,
    "subtract_background": M.subtract_background,
    # volumetric (3-D) stages — validated here, executed by
    # compile_volume_pipeline (2-D chains reject them by ndim)
    # (values filled in lazily below to avoid import cycles)
    # geometry
    "resize": GEO.resize,
    "center_crop": GEO.center_crop,
    "flip": GEO.flip,
    "rot90": GEO.rot90,
    "rotate": GEO.rotate,
    "affine_warp": GEO.affine_warp,
    "perspective_warp": GEO.perspective_warp,
    "normalize_meanstd": GEO.normalize_meanstd,
    "denormalize_meanstd": GEO.denormalize_meanstd,
}


def _learned_denoise_builder(checkpoint: str):
    """Stage builder: restore the orbax checkpoint EAGERLY (host-side, at
    chain-build time) so the weights become constants of the jitted
    program — restoring inside a trace would hand orbax tracers."""
    from mies_tpu.models.denoiser import denoise, load_denoiser

    try:
        params, features, depth, arch = load_denoiser(checkpoint)
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"learned_denoise stage: checkpoint {checkpoint!r} not found "
            f"(train one with `mies-tpu train-denoiser -o {checkpoint}`)"
        ) from e

    def stage(img):
        return denoise(params, img, features=features, depth=depth, arch=arch)

    return stage


def _histogram_match_builder(reference: str):
    """Stage builder: load the reference image HOST-side at chain-build
    time and bake its (values, quantiles) CDF into the program as
    constants — every processed image is intensity-matched to it
    (skimage match_histograms; cross-scanner harmonization)."""
    import numpy as np

    from mies_tpu.io.image import load_image
    from mies_tpu.ops.histogram import match_histograms, reference_cdf

    try:
        ref = load_image(reference)
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"histogram_match stage: reference image {reference!r} not found"
        ) from e
    values, quantiles = reference_cdf(np.asarray(ref))
    import jax.numpy as _jnp

    vj, qj = _jnp.asarray(values), _jnp.asarray(quantiles)

    def stage(img):
        return match_histograms(img, vj, qj)

    return stage


# Ops whose parameters require host-side work at build time (checkpoint
# loads). Signature: builder(**params) -> fn(img) -> img.
STAGE_BUILDERS: dict[str, Callable] = {
    "learned_denoise": _learned_denoise_builder,
    "histogram_match": _histogram_match_builder,
}


# validation needs learned ops visible in the registry namespace
OP_REGISTRY["learned_denoise"] = _learned_denoise_builder
OP_REGISTRY["histogram_match"] = _histogram_match_builder


# Ops that ONLY operate on [Z, H, W] volumes (single source of truth —
# stage_costs and the registries key off this; a new 3-D op added to
# the registry without updating a parallel set regressed once).
VOLUME_ONLY_OPS = frozenset(
    {"clahe3d", "gaussian_blur3d", "guided_blur3d", "median_blur3d",
     "unsharp_mask3d", "erode3d", "dilate3d", "morph_open3d",
     "morph_close3d", "morph_gradient3d", "top_hat3d", "black_hat3d",
     "resample3d", "denoise_nl_means3d", "denoise_tv3d", "frangi3d",
     "vessel_enhance3d", "denoise_wavelet3d", "sato3d", "meijering3d",
     "difference_of_gaussians3d", "butterworth3d", "homomorphic3d",
     "wiener3d", "anisotropic_diffusion3d", "srad3d", "hessian3d"}
)


_VOLUME_FILTER_OPS = (
    "gaussian_blur3d", "guided_blur3d", "median_blur3d", "unsharp_mask3d",
    "erode3d", "dilate3d", "morph_open3d", "morph_close3d",
    "morph_gradient3d", "top_hat3d", "black_hat3d", "resample3d",
    "denoise_nl_means3d", "denoise_tv3d", "frangi3d", "vessel_enhance3d",
    "denoise_wavelet3d", "sato3d", "meijering3d",
    "difference_of_gaussians3d", "butterworth3d", "homomorphic3d",
    "wiener3d", "anisotropic_diffusion3d", "srad3d", "hessian3d",
)


def _reject_volume_only(cfg: PipelineConfig) -> None:
    """2-D chain builders fail at BUILD time with the stage named —
    validate() must accept volume ops (the same config file drives
    `enhance-volume --mode 3d`), so the 2-D/3-D split is enforced here,
    never as a mid-trace traceback (review finding, round 4)."""
    bad = [s.op for s in cfg.stages if s.op in VOLUME_ONLY_OPS]
    if bad:
        raise ValueError(
            f"op(s) {bad} are volume-only ([Z, H, W]); run this config "
            f"through compile_volume_pipeline / `enhance-volume --mode 3d`"
        )


def _register_volume_ops() -> None:
    from mies_tpu.ops import volume3d as V3

    OP_REGISTRY.setdefault("clahe3d", V3.clahe3d.__wrapped__)
    for _name in _VOLUME_FILTER_OPS:
        OP_REGISTRY.setdefault(_name, getattr(V3, _name))


_register_volume_ops()


# Ops with a natively-batched TPU fast path: fn([B, H, W], **params).
# The compiler calls these directly on the batch instead of vmapping the
# per-image op, so their Pallas kernels see the real batch dimension.
def _batched_registry() -> dict[str, Callable]:
    from mies_tpu.kernels.bilateral import bilateral_batched
    from mies_tpu.kernels.clahe import clahe_batched
    from mies_tpu.kernels.diffusion import (
        anisotropic_diffusion_batched,
        srad_batched,
    )
    from mies_tpu.kernels.nlmeans import nl_means_batched
    from mies_tpu.kernels.tv import denoise_tv_batched
    from mies_tpu.ops.wavelet import cycle_spin_batched

    return {
        "clahe": clahe_batched,
        "bilateral_blur": bilateral_batched,
        "equalize_hist": H.equalize_hist_batched,
        "equalize": H.equalize_batched,
        # VMEM-resident Perona-Malik: all iterations in-register, one
        # HBM round trip per slice instead of one PER ITERATION
        # (measured 4.26 -> 0.23 ms for niter=6 b32 512^2 on v5e)
        "anisotropic_diffusion": anisotropic_diffusion_batched,
        "srad": srad_batched,
        # VMEM-resident static-pair-table NL-means, CHUNKED across
        # small Mosaic kernels (round 9; the round-6 dynamic-rotate
        # kernel lost 1.5x, the round-7 84-pair monolith never finished
        # compiling — a 12-pair chunk compiles in ~19 min and runs
        # 0.26 ms/pair vs the jnp loop's 0.57; numbers and the design
        # trail in docs/KERNELS.md rounds 6-9)
        "denoise_nl_means": nl_means_batched,
        # VMEM-resident Chambolle TV: the dual field never leaves the
        # kernel — two HBM round trips per slice total instead of
        # ~6 plane trips per iteration (kernels/tv.py)
        "denoise_tv": denoise_tv_batched,
        # shift grid flattened into the leading batch ([S*B, H, W]
        # instead of the nested [B, S, H, W] vmap layout): 112.4 ->
        # ~77 ms/b32 at S=16 on v5e (benchmarks/cyclespin_ab.py, r5)
        "cycle_spin": cycle_spin_batched,
    }


def build_chain(cfg: PipelineConfig) -> Callable[[Array], Array]:
    """Fold the stage list into one pure function [H, W] -> [H, W].

    Params are bound statically (Python closure), so XLA sees constants —
    kernels, clip limits, and LUT shapes all specialize at compile time.
    Stages with a natively-batched Pallas fast path run it on a leading
    batch-1 axis (identical numerics; the single-slice jnp forms are
    gather-based and ~5x slower per call on TPU — batch-1 p50 latency
    dropped 12.7 -> per-call Pallas time with this).
    """
    _reject_volume_only(cfg)
    batched_ops = _batched_registry()
    bound = []
    for s in cfg.stages:
        if s.op in batched_ops:
            fast = functools.partial(batched_ops[s.op], **s.kwargs())
            bound.append(lambda x, fast=fast: fast(x[None])[0])
        elif s.op in STAGE_BUILDERS:
            bound.append(STAGE_BUILDERS[s.op](**s.kwargs()))
        else:
            bound.append(functools.partial(OP_REGISTRY[s.op], **s.kwargs()))

    def chain(img: Array) -> Array:
        x = img
        for fn in bound:
            x = fn(x)
        return x

    return chain


def _try_fuse_tail(cfg: PipelineConfig, quantize: bool):
    """Peephole: trailing [bilateral_blur -> unsharp_mask('nearest')] on
    TPU fuses into ONE Pallas kernel (optionally emitting uint8), saving
    two HBM round-trips + the quantize pass (~1.3 ms per batch-32 at
    512^2). Returns (prefix_stages, fused_fn | None).

    The fused kernel is numerically equivalent to the unfused pair (f32
    sum-order ULPs only; exact border semantics — see kernels/fused.py).

    DISABLED by default: measured A/B on v5e shows the fusion is net
    NEGATIVE (6.65 vs 6.02 ms per batch-32 at 512^2) — XLA already
    fuses unsharp+quantize into one pass, while the fused kernel must
    recompute the bilateral on gaussian-halo rows (+37% bilateral
    work). Kept behind MIES_TPU_FUSE_TAIL=1 for future hardware where
    HBM bandwidth, not VPU compute, bounds this tail.
    """
    import os

    if os.environ.get("MIES_TPU_FUSE_TAIL") != "1":
        return cfg.stages, None
    if jax.default_backend() != "tpu" or len(cfg.stages) < 2:
        return cfg.stages, None
    a, b = cfg.stages[-2], cfg.stages[-1]
    if a.op != "bilateral_blur" or b.op != "unsharp_mask":
        return cfg.stages, None
    ak, bk = a.kwargs(), b.kwargs()
    if bk.get("mode", "nearest") != "nearest" or not bk.get("clip", True):
        return cfg.stages, None

    from mies_tpu.kernels.fused import bilateral_unsharp_tpu, fused_supported

    k = ak.get("kernel_size", 5)
    radius = bk.get("radius", 1.0)

    def fused(batch: Array) -> Array:
        if not fused_supported(batch.shape[-2:], k, radius):
            return None  # signal: fall back (shape checked at trace time)
        return bilateral_unsharp_tpu(
            batch,
            kernel_size=k,
            sigma_color=ak.get("sigma_color", 0.1),
            sigma_space=ak.get("sigma_space", 1.5),
            bilateral_mode=ak.get("mode", "reflect"),
            radius=radius,
            amount=bk.get("amount", 1.0),
            quantize=quantize,
        )

    return cfg.stages[:-2], fused


def _try_fuse_unsharp_quant(cfg: PipelineConfig, quantize: bool):
    """Peephole: a trailing unsharp_mask('nearest', clip=True) runs as
    ONE Pallas pass with the uint8 quantize folded in — no separable-
    blur HBM intermediate, no separate quantize pass. Bit-exact vs the
    unfused tail (same shifted-add tap order; kernels/unsharp_gauss).
    Returns (prefix_stages, fused_fn | None)."""
    if not cfg.stages or cfg.stages[-1].op != "unsharp_mask":
        return cfg.stages, None
    bk = cfg.stages[-1].kwargs()
    if bk.get("mode", "nearest") != "nearest" or not bk.get("clip", True):
        return cfg.stages, None
    radius = float(bk.get("radius", 1.0))
    amount = float(bk.get("amount", 1.0))
    truncate = float(bk.get("truncate", 4.0))
    if radius <= 0:
        return cfg.stages, None

    from mies_tpu.kernels.unsharp_gauss import (
        unsharp_quant_supported,
        unsharp_quant_tpu,
    )

    def fused(batch: Array):
        if jax.default_backend() != "tpu" or not unsharp_quant_supported(
            batch.shape[-2:], radius, truncate
        ):
            return None  # trace-time fallback: run unfused + quantize
        return unsharp_quant_tpu(
            batch, radius=radius, amount=amount, truncate=truncate,
            quantize=quantize,
        )

    return cfg.stages[:-1], fused


def _bind_batched_stage(s, batched_ops):
    if s.op in batched_ops:
        return functools.partial(batched_ops[s.op], **s.kwargs())
    if s.op in STAGE_BUILDERS:
        return jax.vmap(STAGE_BUILDERS[s.op](**s.kwargs()))
    return jax.vmap(functools.partial(OP_REGISTRY[s.op], **s.kwargs()))


def _try_fuse_unsharp_gauss(a, b):
    """Peephole: adjacent [unsharp_mask -> gaussian_blur], both
    mode='nearest' + clip, fuse into ONE Pallas kernel on TPU (BASELINE
    workload 3 is literally this pair "fused"): bit-exact vs the
    unfused ops, measured 1.20 -> 0.92 ms per batch-8 1024^2. Returns a
    batched fn with a trace-time shape guard (None -> run unfused), or
    None if the pair doesn't match.
    """
    if a.op != "unsharp_mask" or b.op != "gaussian_blur":
        return None
    ak, bk = a.kwargs(), b.kwargs()
    if ak.get("mode", "nearest") != "nearest" or not ak.get("clip", True):
        return None
    if bk.get("mode", "nearest") != "nearest":
        return None
    if bk.get("sigma", 1.0) <= 0:
        return None

    from mies_tpu.kernels.unsharp_gauss import (
        unsharp_gauss_supported,
        unsharp_gauss_tpu,
    )

    radius = float(ak.get("radius", 1.0))
    amount = float(ak.get("amount", 1.0))
    sigma = float(bk.get("sigma", 1.0))
    tr_a = float(ak.get("truncate", 4.0))
    tr_b = float(bk.get("truncate", 4.0))
    if tr_a != tr_b:
        return None

    def fused(batch: Array):
        if jax.default_backend() != "tpu" or not unsharp_gauss_supported(
            batch.shape[-2:], radius, sigma, tr_a
        ):
            return None  # trace-time fallback: run the pair unfused
        return unsharp_gauss_tpu(
            batch, radius=radius, amount=amount, sigma=sigma, truncate=tr_a
        )

    return fused


def build_batched_chain(
    cfg: PipelineConfig, quantize: bool | None = None
) -> Callable[[Array], Array]:
    """Batch-level chain [B, H, W] -> [B, H, W].

    Stages with a native batched implementation (Pallas kernels that
    grid over the batch) run directly; the rest are vmapped. Numerics
    are identical either way. When ``quantize`` is not None the chain
    ALSO handles the final uint8 conversion (enables tail fusion).
    """
    _reject_volume_only(cfg)
    batched_ops = _batched_registry()
    stages, fused_tail = (
        _try_fuse_tail(cfg, bool(quantize)) if quantize is not None
        else (cfg.stages, None)
    )
    if fused_tail is None and quantize is not None:
        stages, fused_tail = _try_fuse_unsharp_quant(cfg, bool(quantize))
    # pairwise peephole: each entry is (fused_fn_or_None, unfused_fns)
    bound: list[tuple] = []
    i = 0
    while i < len(stages):
        if i + 1 < len(stages):
            fused = _try_fuse_unsharp_gauss(stages[i], stages[i + 1])
            if fused is not None:
                pair = [
                    _bind_batched_stage(stages[i], batched_ops),
                    _bind_batched_stage(stages[i + 1], batched_ops),
                ]
                bound.append((fused, pair))
                i += 2
                continue
        bound.append((None, [_bind_batched_stage(stages[i], batched_ops)]))
        i += 1
    # fallback chain for shapes the fused tail kernel doesn't support
    tail_bound = [
        _bind_batched_stage(s, batched_ops) for s in cfg.stages[len(stages):]
    ]

    def chain(batch: Array) -> Array:
        x = _ingest(batch)
        for fused, fns in bound:
            y = fused(x) if fused is not None else None
            if y is not None:
                x = y
            else:
                for fn in fns:
                    x = fn(x)
        if fused_tail is not None:
            y = fused_tail(x)
            if y is not None:
                return y
        for fn in tail_bound:
            x = fn(x)
        if quantize is not None:
            x = _quantize_u8(x) if quantize else x
        return x

    return chain


def _quantize_u8(x: Array) -> Array:
    """float [0,1] -> uint8 (round-half-even like cv2/np.rint, clipped)."""
    return jnp.clip(jnp.rint(x * 255.0), 0, 255).astype(jnp.uint8)


def _ingest(x: Array) -> Array:
    """On-device normalization of integer inputs to the float [0,1]
    convention — lets callers ship uint8/uint16 over the host link (4x /
    2x less traffic than float32) with bit-identical results (the cast
    and divide are exactly what the host would have computed). int16
    (HU) passes through for window_hu.
    """
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    if x.dtype == jnp.uint16:
        return x.astype(jnp.float32) / 65535.0
    return x


# ---------------------------------------------------------------------------
# Volume-level (3-D) pipelines
# ---------------------------------------------------------------------------

# Ops that operate on a whole [Z, H, W] volume. Pointwise 2-D ops are
# shape-polymorphic and reused directly.
def _volume_registry() -> dict[str, Callable]:
    from mies_tpu.ops import volume3d as V3

    return {
        "clahe3d": V3.clahe3d.__wrapped__,
        **{name: getattr(V3, name) for name in _VOLUME_FILTER_OPS},
        # global equalization is shape-polymorphic: one CDF over the
        # WHOLE volume (the volumetric sibling of kornia's equalize3d)
        "equalize_hist": H.equalize_hist,
        # shape-polymorphic pointwise ops
        "window_hu": I.window_hu,
        "adjust_gamma": I.adjust_gamma,
        "adjust_log": I.adjust_log,
        "adjust_sigmoid": I.adjust_sigmoid,
        "invert": I.invert,
        "normalize": I.normalize_minmax,
        "rescale_intensity": I.rescale_intensity,
        "normalize_meanstd": GEO.normalize_meanstd,
        "denormalize_meanstd": GEO.denormalize_meanstd,
    }


@functools.lru_cache(maxsize=32)
def compile_volume_pipeline(
    cfg: PipelineConfig, quantize: bool = True
) -> Callable[[Array], Array]:
    """Config -> jitted [Z, H, W] -> [Z, H, W] whole-volume program.

    Unlike the per-slice path (which streams slabs through a 2-D chain),
    this treats the volume as one 3-D array so truly volumetric stages
    (clahe3d, gaussian_blur3d) see the z axis. Only volume-capable ops
    are allowed; per-slice configs belong in runner.enhance_volume.
    """
    reg = _volume_registry()
    bound = []
    for s in cfg.stages:
        if s.op not in reg:
            raise ValueError(
                f"op {s.op!r} is not volume-capable; available: {sorted(reg)}"
            )
        bound.append(functools.partial(reg[s.op], **s.kwargs()))

    def run(vol: Array) -> Array:
        x = vol
        for fn in bound:
            x = fn(x)
        return _quantize_u8(x) if quantize else x

    return jax.jit(run)


@functools.lru_cache(maxsize=128)
def compile_pipeline(
    cfg: PipelineConfig,
    batched: bool = False,
    quantize: bool = True,
    donate: bool = True,
) -> Callable[[Array], Array]:
    """Config -> jitted callable.

    batched=False: input [H, W]; batched=True: input [B, H, W] (vmapped —
    one XLA program for the whole batch, MXU/VPU-parallel across slices).
    quantize=True appends float->uint8 conversion on-device so only uint8
    crosses back to the host (4x less PCIe/DMA traffic than float32).
    donate=True donates the input buffer (safe: callers pass ingest
    buffers they don't reuse), letting XLA alias working memory.
    """
    bchain = build_batched_chain(cfg, quantize=quantize)
    if batched:
        # the batched chain owns quantization so the tail can fuse
        # bilateral+unsharp+quantize into one Pallas kernel. A 4-D
        # [B, C, H, W] input (io.channels: per-channel) folds C into the
        # batch axis so the Pallas kernels grid over B*C channels, then
        # unfolds — per-channel processing at full batched throughput.
        def run(x: Array) -> Array:
            if x.ndim == 4:
                b, c = x.shape[:2]
                out = bchain(x.reshape(b * c, *x.shape[2:]))
                return out.reshape(b, c, *out.shape[1:])
            return bchain(x)
    else:
        chain = build_chain(cfg)

        def run(img: Array) -> Array:
            if img.ndim == 3:
                # [C, H, W] per-channel: channels ride the batch axis
                return bchain(img)
            x = chain(_ingest(img))
            return _quantize_u8(x) if quantize else x

    return jax.jit(run, donate_argnums=(0,) if donate else ())

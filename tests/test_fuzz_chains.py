"""Fuzz: random op chains must validate, compile, and run (small shapes).

Catches registry/signature drift that targeted tests miss — every op in
OP_REGISTRY must be composable with every other in any order (on float
[0,1] 2-D inputs; volume-only and checkpoint ops excluded).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mies_tpu.pipeline.compiler import OP_REGISTRY, compile_pipeline
from mies_tpu.pipeline.config import PipelineConfig, validate

# ops safe to chain in any order on [H, W] float [0,1] with defaults
_CHAINABLE = [
    ("adjust_gamma", {"gamma": 0.8}),
    ("adjust_log", {}),
    ("adjust_sigmoid", {}),
    ("invert", {}),
    ("normalize", {}),
    ("rescale_intensity", {}),
    ("equalize_hist", {}),
    ("equalize", {}),
    ("clahe", {"clip_limit": 0.01, "convention": "skimage"}),
    ("clahe", {"clip_limit": 0.02, "convention": "fraction"}),
    ("clahe", {"clip_limit": 2.0, "grid_size": (4, 4)}),
    ("gaussian_blur", {"sigma": 1.0}),
    ("box_blur", {}),
    ("unsharp_mask", {}),
    ("median_blur", {}),
    ("bilateral_blur", {}),
    ("denoise_bilateral", {}),
    ("guided_blur", {"kernel_size": 3, "eps": 0.01}),
    ("sobel_edges", {}),
    ("scharr_edges", {}),
    ("prewitt_edges", {}),
    ("farid_edges", {}),
    ("roberts_edges", {}),
    ("laplace", {}),
    ("cycle_spin", {"max_shifts": 1, "sigma": 0.05}),
    ("laplacian_sharpen", {}),
    ("denoise_nl_means", {"patch_size": 5, "patch_distance": 3}),
    ("subtract_background", {"radius": 4.0}),
    ("musica", {"levels": 3, "p": 0.7, "gain": 1.4}),
    ("anisotropic_diffusion", {"niter": 4, "kappa": 0.1, "gamma": 0.2}),
    ("srad", {"niter": 4}),
    ("hessian", {"sigmas": (1.0, 2.0)}),
    ("denoise_tv", {"weight": 0.1, "max_num_iter": 25}),
    ("richardson_lucy", {"psf_sigma": 1.0, "psf_size": 5, "num_iter": 4}),
    ("wiener", {"psf_sigma": 1.0, "psf_size": 5, "balance": 0.1}),
    ("frangi", {"sigmas": (1.0, 2.0)}),
    ("denoise_wavelet", {"wavelet_levels": 2}),
    ("vessel_enhance", {"sigmas": (1.0, 2.0), "amount": 0.5}),
    ("sato", {"sigmas": (1.0, 2.0)}),
    ("meijering", {"sigmas": (1.0, 2.0)}),
    ("difference_of_gaussians", {"low_sigma": 1.0}),
    ("gabor", {"frequency": 0.2}),
    ("retinex", {"sigmas": (1.5, 4.0)}),
    ("lee_filter", {"kernel_size": 5, "sigma": 0.05}),
    ("kuwahara", {"kernel_size": 5}),
    ("gabor_bank", {"frequency": 0.2, "n_orientations": 3}),
    ("butterworth", {"cutoff_frequency_ratio": 0.05}),
    ("homomorphic", {"npad": 4}),
    ("erode", {}),
    ("dilate", {"kernel_size": 5, "shape": "ellipse"}),
    ("morph_open", {"shape": "cross"}),
    ("morph_close", {"mode": "nearest"}),
    ("morph_gradient", {}),
    ("top_hat", {"kernel_size": 5}),
    ("black_hat", {}),
    ("flip", {}),
    ("rot90", {"k": 2}),
    ("rotate", {"angle": 12.5, "mode": "nearest"}),
    ("affine_warp", {"matrix": ((0.9, 0.1), (-0.1, 0.9)),
                     "offset": (1.0, -1.0), "mode": "nearest"}),
    ("perspective_warp", {"matrix": ((0.95, 0.05, 1.0), (-0.05, 0.95, 0.5),
                                     (0.0005, -0.0004, 1.0)),
                          "mode": "nearest"}),
    ("motion_blur", {"kernel_size": 5, "angle": 30.0}),
    ("canny", {"sigma": 1.5}),
    ("center_crop", {"height": 64, "width": 64}),
    ("adjust_brightness", {"factor": 0.1}),
    ("adjust_contrast", {"factor": 1.2}),
    ("solarize", {}),
    ("posterize", {"bits": 6}),
    ("sharpness", {"factor": 1.3}),
]


@pytest.mark.parametrize("seed", range(12))
def test_random_chain_compiles_and_runs(rng, seed):
    r = np.random.default_rng(seed)
    n = int(r.integers(1, 5))
    picks = [_CHAINABLE[i] for i in r.choice(len(_CHAINABLE), n)]
    cfg = PipelineConfig.make(picks, name=f"fuzz{seed}")
    validate(cfg)
    img = rng.random((64, 64)).astype(np.float32)
    out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
    assert out.dtype == np.uint8
    assert np.isfinite(out.astype(np.float32)).all()
    # batched path must agree in shape
    outb = np.asarray(
        compile_pipeline(cfg, batched=True, donate=False)(
            jnp.asarray(np.stack([img] * 2))
        )
    )
    assert outb.shape[0] == 2 and outb.shape[1:] == out.shape


def test_every_registered_2d_op_has_defaults_or_coverage():
    """Every op in the registry is either exercised by _CHAINABLE or is a
    known special case (params/volume/checkpoint ops)."""
    from mies_tpu.pipeline.compiler import VOLUME_ONLY_OPS

    special = {
        "window_hu",  # int16 path, needs center/width
        "resize",  # needs height/width
        "learned_denoise",  # needs a checkpoint
        "histogram_match",  # needs a reference image file
        "normalize_meanstd", "denormalize_meanstd",  # trivially pointwise
    } | set(VOLUME_ONLY_OPS)
    covered = {op for op, _ in _CHAINABLE}
    missing = set(OP_REGISTRY) - covered - special
    assert not missing, f"registry ops with no fuzz coverage: {missing}"


_CHAINABLE_3D = [
    ("adjust_gamma", {"gamma": 1.1}),
    ("adjust_log", {}),
    ("adjust_sigmoid", {}),
    ("invert", {}),
    ("normalize", {}),
    ("rescale_intensity", {}),
    ("equalize_hist", {}),
    ("clahe3d", {"clip_limit": 2.0, "grid_size": (4, 4, 4)}),
    ("gaussian_blur3d", {"sigma": 1.0}),
    ("guided_blur3d", {"kernel_size": 3, "eps": 0.01}),
    ("median_blur3d", {"kernel_size": 3}),
    ("unsharp_mask3d", {"radius": 1.0}),
    ("denoise_nl_means3d", {"patch_size": 3, "patch_distance": 2}),
    ("frangi3d", {"sigmas": (1.0,)}),
    ("denoise_wavelet3d", {"wavelet_levels": 1}),
    ("vessel_enhance3d", {"sigmas": (1.0,), "amount": 0.5}),
    ("sato3d", {"sigmas": (1.0,)}),
    ("meijering3d", {"sigmas": (1.0,)}),
    ("difference_of_gaussians3d", {"low_sigma": 1.0}),
    ("butterworth3d", {"cutoff_frequency_ratio": 0.1}),
    ("homomorphic3d", {"npad": 2}),
    ("wiener3d", {"psf_sigma": 1.0, "psf_size": 3}),
    ("anisotropic_diffusion3d", {"niter": 3, "kappa": 0.1}),
    ("srad3d", {"niter": 3}),
    ("hessian3d", {"sigmas": (1.0,)}),
    ("denoise_tv3d", {"weight": 0.1, "max_num_iter": 15}),
    ("erode3d", {}),
    ("dilate3d", {"kernel_size": 5}),
    ("morph_open3d", {}),
    ("morph_close3d", {"mode": "nearest"}),
    ("morph_gradient3d", {}),
    ("top_hat3d", {}),
    ("black_hat3d", {}),
    ("resample3d", {"depth": 16, "height": 32, "width": 32}),
]


@pytest.mark.parametrize("seed", range(6))
def test_random_volume_chain_compiles_and_runs(rng, seed):
    """Every volume op composes with every other in any order through
    compile_volume_pipeline (resample3d changes the grid mid-chain —
    downstream stages must accept the new shape)."""
    from mies_tpu.pipeline.compiler import compile_volume_pipeline

    r = np.random.default_rng(100 + seed)
    n = int(r.integers(1, 4))
    picks = [_CHAINABLE_3D[i] for i in r.choice(len(_CHAINABLE_3D), n)]
    cfg = PipelineConfig.make(picks, name=f"volfuzz{seed}")
    validate(cfg)
    vol = jnp.asarray(rng.random((16, 32, 32)).astype(np.float32))
    out = np.asarray(compile_volume_pipeline(cfg, quantize=False)(vol))
    assert np.isfinite(out).all()


def test_every_volume_op_has_fuzz_coverage():
    from mies_tpu.pipeline.compiler import _volume_registry

    covered = {op for op, _ in _CHAINABLE_3D}
    special = {
        "window_hu",  # int16 path, needs center/width
        "equalize", "normalize_meanstd", "denormalize_meanstd",
    }
    missing = set(_volume_registry()) - covered - special
    assert not missing, f"volume ops with no fuzz coverage: {missing}"

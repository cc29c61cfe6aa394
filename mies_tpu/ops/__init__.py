"""Pure-JAX enhancement ops (device compute path).

Every op is a pure function ``f(img, **params) -> img`` on float32 arrays
in [0, 1], shape [H, W] (batch via ``jax.vmap`` in the pipeline compiler).
Semantics mirror the documented behavior of the reference's pinned
dependencies (SURVEY.md section 4): scikit-image 0.26 / kornia 0.8.2 /
OpenCV conventions, with NumPy goldens in tests/goldens.
"""

from mies_tpu.ops.intensity import (
    adjust_brightness,
    adjust_contrast,
    adjust_gamma,
    adjust_log,
    adjust_sigmoid,
    invert,
    normalize_minmax,
    rescale_intensity,
    solarize,
    posterize,
    sharpness,
    is_low_contrast,
    window_hu,
)
from mies_tpu.ops.histogram import (
    clahe,
    equalize_hist,
    match_histograms,
    reference_cdf,
)
from mies_tpu.ops.geometry import (
    resize,
    center_crop,
    flip,
    rot90,
    rotate,
    affine_warp,
    normalize_meanstd,
    denormalize_meanstd,
)
from mies_tpu.ops.filters import (
    gaussian_blur,
    unsharp_mask,
    median_blur,
    bilateral_blur,
    box_blur,
    guided_blur,
    joint_bilateral_blur,
    laplacian_sharpen,
    sobel_edges,
)
from mies_tpu.ops.ridges import (
    frangi,
    frangi3d,
    vessel_enhance,
    vessel_enhance3d,
)
from mies_tpu.ops.pyramid import (
    laplacian_pyramid,
    musica,
    pyr_down,
    pyr_up,
)
from mies_tpu.ops.restoration import (
    anisotropic_diffusion,
    anisotropic_diffusion3d,
    denoise_nl_means,
    denoise_nl_means3d,
    denoise_tv,
    denoise_tv3d,
    richardson_lucy,
)
from mies_tpu.ops.wavelet import (
    denoise_wavelet,
    denoise_wavelet3d,
    estimate_sigma,
)
from mies_tpu.ops.morphology import (
    rolling_ball,
    subtract_background,
    black_hat,
    dilate,
    erode,
    morph_close,
    morph_gradient,
    morph_open,
    structuring_element,
    top_hat,
)

__all__ = [
    "adjust_gamma",
    "adjust_log",
    "adjust_sigmoid",
    "invert",
    "normalize_minmax",
    "rescale_intensity",
    "adjust_brightness",
    "adjust_contrast",
    "solarize",
    "posterize",
    "sharpness",
    "is_low_contrast",
    "window_hu",
    "equalize_hist",
    "match_histograms",
    "reference_cdf",
    "clahe",
    "resize",
    "center_crop",
    "flip",
    "rot90",
    "rotate",
    "affine_warp",
    "normalize_meanstd",
    "denormalize_meanstd",
    "gaussian_blur",
    "unsharp_mask",
    "median_blur",
    "bilateral_blur",
    "guided_blur",
    "joint_bilateral_blur",
    "box_blur",
    "laplacian_sharpen",
    "sobel_edges",
    "frangi",
    "frangi3d",
    "vessel_enhance",
    "vessel_enhance3d",
    "denoise_nl_means",
    "denoise_nl_means3d",
    "anisotropic_diffusion",
    "anisotropic_diffusion3d",
    "rolling_ball",
    "subtract_background",
    "laplacian_pyramid",
    "musica",
    "pyr_down",
    "pyr_up",
    "denoise_tv",
    "denoise_tv3d",
    "richardson_lucy",
    "denoise_wavelet",
    "denoise_wavelet3d",
    "estimate_sigma",
    "erode",
    "dilate",
    "morph_open",
    "morph_close",
    "morph_gradient",
    "top_hat",
    "black_hat",
    "structuring_element",
]

"""Quality evaluation: full-reference metric suite + visual reports."""

from mies_tpu.eval.metrics import (
    mse,
    rmse,
    psnr,
    uqi,
    ssim,
    msssim,
    ergas,
    scc,
    rase,
    sam,
    vifp,
    psnrb,
    evaluate,
    evaluate_volume,
    METRIC_REGISTRY,
)

__all__ = [
    "mse", "rmse", "psnr", "uqi", "ssim", "msssim", "ergas", "scc",
    "rase", "sam", "vifp", "psnrb", "evaluate", "evaluate_volume", "METRIC_REGISTRY",
]

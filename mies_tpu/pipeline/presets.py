"""Canonical benchmark configs — ONE definition of the headline chain.

bench.py, benchmarks/workloads.py (w5 + the volume chain),
benchmarks/batch_sweep.py, and __graft_entry__ all measure "the
flagship chain"; before this module each carried its own copy of the
stage list, so a parameter change could silently leave them measuring
different pipelines while all claiming the same name.
"""

from __future__ import annotations

from mies_tpu.pipeline.config import PipelineConfig


def flagship_config(name: str = "flagship-clahe-denoise-sharpen") -> PipelineConfig:
    """The headline CLAHE + bilateral + unsharp chain (BASELINE w5)."""
    return PipelineConfig.make(
        [
            ("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                       "convention": "opencv"}),
            ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1,
                                "sigma_space": 1.5}),
            ("unsharp_mask", {"radius": 1.5, "amount": 1.0}),
        ],
        name=name,
    )


def flagship_volume_config(name: str = "flagship-volume") -> PipelineConfig:
    """The streamed-volume variant: HU windowing + the flagship chain."""
    return PipelineConfig.make(
        [("window_hu", {"center": 40.0, "width": 400.0})]
        + list(flagship_config().stages),
        name=name,
    )


def latency_config(name: str = "latency-clahe-denoise") -> PipelineConfig:
    """BASELINE metric 2: the batch-1 CLAHE + denoise latency chain."""
    return PipelineConfig.make(
        [
            ("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                       "convention": "opencv"}),
            ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1,
                                "sigma_space": 1.5}),
        ],
        name=name,
    )

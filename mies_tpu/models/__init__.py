"""Learned enhancement stages (optional model family).

The reference ships torch + ``*.pt``/``*.pth`` in .gitignore (reference
.gitignore:8-9, pyproject.toml:14; SURVEY.md section 2a R6, 2b D3) — i.e. learned weights were anticipated alongside
the classical filter chain. This package provides that capability
TPU-natively: two residual model families — a DnCNN-style CNN and a
U-Net encoder-decoder (``build_model``'s registry) — in flax, trained
with optax under data-parallel sharding (noise2clean or Noise2Void),
checkpointed with orbax, and exposed to the pipeline as the
``learned_denoise`` op (the checkpoint's meta.json records the arch).
"""

from mies_tpu.models.denoiser import (
    DenoiserCNN,
    build_model,
    denoise,
    load_denoiser,
)
from mies_tpu.models.train import TrainState, make_train_step, train_denoiser
from mies_tpu.models.unet import UNetDenoiser

__all__ = [
    "DenoiserCNN",
    "UNetDenoiser",
    "build_model",
    "denoise",
    "load_denoiser",
    "TrainState",
    "make_train_step",
    "train_denoiser",
]

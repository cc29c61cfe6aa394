"""Learned enhancement stages (optional model family).

The reference ships torch + ``*.pt``/``*.pth`` in .gitignore (reference
.gitignore:8-9, pyproject.toml:14; SURVEY.md section 2a R6, 2b D3) — i.e. learned weights were anticipated alongside
the classical filter chain. This package provides that capability
TPU-natively: a residual denoising CNN (DnCNN-style) in flax, trained
with optax under data-parallel sharding, checkpointed with orbax, and
exposed to the pipeline as the ``learned_denoise`` op.
"""

from mies_tpu.models.denoiser import DenoiserCNN, denoise, load_denoiser
from mies_tpu.models.train import TrainState, make_train_step, train_denoiser

__all__ = [
    "DenoiserCNN",
    "denoise",
    "load_denoiser",
    "TrainState",
    "make_train_step",
    "train_denoiser",
]

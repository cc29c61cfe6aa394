"""U-Net residual denoiser — the second learned model family.

Same contract as the DnCNN-style ``DenoiserCNN`` (predicts the NOISE
residual of a [..., H, W, 1] image; output = input - noise), different
inductive bias: an encoder-decoder with skip connections sees a much
larger receptive field per FLOP, which wins on structured/low-frequency
noise where the all-3x3 stack must go deep.

TPU-first choices:
- Downsampling is a stride-2 3x3 conv (one MXU pass), NOT max-pool —
  pooling is a VPU reduction that halves MXU occupancy for no accuracy
  gain at this scale.
- Upsampling is nearest-resize + 3x3 conv (resize is a free XLA
  broadcast-reshape; ConvTranspose lowers to a padded conv with worse
  tiling on Mosaic).
- bfloat16 activations / float32 params, like DenoiserCNN.
- The two bottleneck convs run under ``nn.remat`` — the deepest
  activations are the widest; rematerializing them in backward trades
  cheap MXU FLOPs for HBM.
- Arbitrary shapes: the forward reflect-pads H/W to a multiple of
  2**levels and crops back, so the pipeline can run it on 251x333 CTs
  just like any classical op.

Cites: reference .gitignore:8-9 (anticipated *.pt/*.pth weights),
pyproject.toml:14 (torch); SURVEY.md section 2b D3.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array


def _pad_to_multiple(x: Array, m: int) -> tuple[Array, int, int]:
    """Reflect-pad [..., H, W, C] so H and W divide ``m``."""
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % m
    pw = (-w) % m
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, pad, mode="reflect")
    return x, h, w


class _ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, h: Array) -> Array:
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return nn.relu(h)


class UNetDenoiser(nn.Module):
    """Predicts the noise residual of a [..., H, W, 1] image.

    ``features`` is the stem width (doubles per level); ``levels`` is
    the number of stride-2 downsamplings (receptive field grows as
    ~2**levels * 3).
    """

    features: int = 24
    levels: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.astype(self.dtype)
        h, h0, w0 = _pad_to_multiple(h, 2 ** self.levels)

        skips = []
        for lvl in range(self.levels):
            h = _ConvBlock(self.features * (2 ** lvl), self.dtype)(h)
            skips.append(h)
            h = nn.Conv(
                self.features * (2 ** (lvl + 1)), (3, 3), strides=(2, 2),
                padding="SAME", dtype=self.dtype,
            )(h)
            h = nn.relu(h)

        h = nn.remat(_ConvBlock)(
            self.features * (2 ** self.levels), self.dtype
        )(h)

        for lvl in reversed(range(self.levels)):
            skip = skips[lvl]
            nh, nw = skip.shape[-3], skip.shape[-2]
            h = jnp.repeat(jnp.repeat(h, 2, axis=-3), 2, axis=-2)
            h = h[..., :nh, :nw, :]
            h = nn.Conv(
                self.features * (2 ** lvl), (3, 3), padding="SAME",
                dtype=self.dtype,
            )(h)
            h = nn.relu(h)
            h = jnp.concatenate([h, skip], axis=-1)
            h = _ConvBlock(self.features * (2 ** lvl), self.dtype)(h)

        noise = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return noise[..., :h0, :w0, :].astype(jnp.float32)

"""Residual denoising CNN (DnCNN-style) for medical slices.

Architecture: conv-relu, (depth-2) x [conv-relu] with remat, conv —
predicting the NOISE residual; output = input - predicted noise. All
convs are 3x3 'SAME', channels-last NHWC with C=1 grayscale. bfloat16
activations on the MXU, float32 params — TPU's native mixed precision.

Inference integrates with the pipeline as the ``learned_denoise`` op:
the checkpoint is loaded host-side at chain-build time and the weights
become constants of the jitted program.
"""

from __future__ import annotations

import functools
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


class DenoiserCNN(nn.Module):
    """Predicts the noise residual of a [..., H, W, 1] image."""

    features: int = 32
    depth: int = 6
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x.astype(self.dtype)
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        h = nn.relu(h)

        # Middle blocks under remat: activations are recomputed in the
        # backward pass, trading FLOPs for HBM (jax.checkpoint).
        block = nn.remat(_MidBlock)
        for _ in range(self.depth - 2):
            h = block(self.features, self.dtype)(h)

        noise = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return noise.astype(jnp.float32)


class _MidBlock(nn.Module):
    features: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, h: Array) -> Array:
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        return nn.relu(h)


def build_model(arch: str = "dncnn", features: int = 32, depth: int = 6):
    """Model-family registry: ``arch`` in {'dncnn', 'unet'}.

    Both families share the residual contract (module output = noise,
    denoised = input - noise). For 'unet', ``depth`` is the number of
    stride-2 levels (2-3 is the useful range; DnCNN's 6+ would shrink
    a 64-pixel patch past usefulness).
    """
    if arch == "dncnn":
        return DenoiserCNN(features=features, depth=depth)
    if arch == "unet":
        from mies_tpu.models.unet import UNetDenoiser

        if not 1 <= depth <= 4:
            raise ValueError(
                f"unet depth (stride-2 levels) must be 1..4, got {depth}"
            )
        return UNetDenoiser(features=features, levels=depth)
    raise ValueError(f"unknown denoiser arch {arch!r}; use 'dncnn' or 'unet'")


def init_params(
    rng: jax.Array, features: int = 32, depth: int = 6, patch: int = 64,
    arch: str = "dncnn",
):
    model = build_model(arch, features, depth)
    return model.init(rng, jnp.zeros((1, patch, patch, 1), jnp.float32))


def denoise(
    params, img: Array, features: int = 32, depth: int = 6,
    arch: str = "dncnn",
) -> Array:
    """Apply the denoiser to [H, W] float [0,1]; returns [H, W]."""
    model = build_model(arch, features, depth)
    x = img[None, :, :, None].astype(jnp.float32)
    noise = model.apply(params, x)
    return jnp.clip((x - noise)[0, :, :, 0], 0.0, 1.0)


# ---------------------------------------------------------------------------
# Checkpointing (orbax — the .pt/.pth role, SURVEY.md section 5.4)
# ---------------------------------------------------------------------------


def save_denoiser(
    path: str | Path, params, features: int, depth: int,
    arch: str = "dncnn",
) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "params", params, force=True)
    ckptr.wait_until_finished()
    (path / "meta.json").write_text(
        __import__("json").dumps(
            {"features": features, "depth": depth, "arch": arch}
        )
    )


@functools.lru_cache(maxsize=8)
def load_denoiser(path: str):
    """Load (params, features, depth, arch) from an orbax checkpoint
    dir. Checkpoints written before the model-family registry carry no
    'arch' key and load as 'dncnn'."""
    import json

    import orbax.checkpoint as ocp

    p = Path(path).absolute()
    meta = json.loads((p / "meta.json").read_text())
    arch = meta.get("arch", "dncnn")
    template = init_params(
        jax.random.PRNGKey(0), meta["features"], meta["depth"], arch=arch
    )
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(p / "params", target=template)
    return params, meta["features"], meta["depth"], arch


# NOTE: the pipeline's 'learned_denoise' op is a STAGE BUILDER
# (mies_tpu.pipeline.compiler._learned_denoise_builder) that restores
# the checkpoint EAGERLY at chain-build time; an op-shaped variant here
# would perform orbax IO inside a jit trace if ever wired into one, so
# none is provided.

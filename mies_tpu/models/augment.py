"""Device-side stochastic augmentation for denoiser training.

The kornia.augmentation analogue (SURVEY.md section 2b D1 — the
reference pins kornia, whose augmentation subsystem is the standard
training-time companion of its op surface; no reference code exists,
section 0): a jit-safe, key-driven batch transform. Everything is
static-shape and data-independent-control-flow-free, so it traces into
the SAME jitted program as the train step — augmentation runs on the
TPU, not the host loader:

  * geometric: horizontal/vertical flips, random 90-degree rotations
    (square patches) — selected per image with ``jnp.where`` over the
    precomputed variants (8 variants == the dihedral group D4; a flat
    select, no gather, no dynamic shapes)
  * photometric: brightness shift, contrast scale about the mean, gamma
    jitter (log-uniform, the kornia RandomGamma convention), additive
    Gaussian noise
  * elastic deformation (Ronneberger et al. 2015 — THE biomedical
    augmentation): a smooth random displacement field warps the patch
    with bilinear sampling; geometric, so it moves input and target
    together

Paired semantics: ``augment_pair`` applies the SAME geometric transform
to (noisy, clean) — targets must move with their inputs — while
photometric jitter and noise go on the INPUT only (the target stays the
ground truth; brightness-shifting a clean target would teach the model
to shift brightness).

All randomness flows from one ``jax.random`` key: the same key gives
the same batch bit-for-bit on every backend (reproducible training,
dp-shardable — the key is traced data, so sharded steps see identical
draws).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import Array


@dataclass(frozen=True)
class AugmentConfig:
    """Probabilities / ranges; zeros disable a transform entirely (its
    ops then trace away — a disabled transform costs nothing)."""

    hflip: float = 0.5          # P(horizontal flip)
    vflip: float = 0.5          # P(vertical flip)
    rot90: bool = True          # uniform k in {0,1,2,3} (square patches)
    brightness: float = 0.0     # shift ~ U(-b, +b)
    contrast: float = 0.0       # scale ~ U(1-c, 1+c) about the image mean
    gamma: float = 0.0          # exponent ~ exp(U(-g, +g)) (log-uniform)
    noise_sigma: float = 0.0    # additive N(0, sigma^2)
    elastic: float = 0.0        # peak displacement in pixels (0 = off)
    elastic_sigma: float = 8.0  # smoothness of the displacement field
    clip: bool = True           # clip photometric output back to [0, 1]


def _dihedral(img: Array, code: Array) -> Array:
    """Apply element ``code`` in 0..7 of the dihedral group D4: low bit
    = horizontal flip, upper bits = number of 90-degree rotations. A
    flat 8-way select over precomputed variants — every variant is a
    pure transpose/reverse (free-ish relayouts XLA handles natively),
    and the select is one vectorized where-tree, no lax.switch
    trace-duplication of downstream consumers."""
    f = img[:, ::-1]
    if img.shape[0] == img.shape[1]:
        variants = [img, f]
        for _ in range(3):
            img = jnp.rot90(img)
            f = jnp.rot90(f)
            variants += [img, f]
    else:
        # non-square: only the shape-preserving half of D4 (identity,
        # hflip, 180-degree, 180+hflip == vflip); _geometric_codes never
        # draws the other four codes for non-square patches
        variants = [img, f, None, None, jnp.rot90(img, 2),
                    jnp.rot90(f, 2), None, None]
    out = variants[0]
    for k in range(1, 8):
        if variants[k] is not None:
            out = jnp.where(code == k, variants[k], out)
    return out


def _geometric_codes(key: Array, n: int, cfg: AugmentConfig,
                     square: bool) -> Array:
    """Per-image D4 element codes drawn per cfg: rotations only when
    enabled AND the patch is square (a 90-degree rotation of a
    non-square patch changes its shape — statically rejected)."""
    kh, kv, kr = jax.random.split(key, 3)
    hf = (jax.random.uniform(kh, (n,)) < cfg.hflip).astype(jnp.int32)
    # a vertical flip == hflip + two rotations: vf contributes rot 2
    vf = (jax.random.uniform(kv, (n,)) < cfg.vflip).astype(jnp.int32)
    rot = (
        jax.random.randint(kr, (n,), 0, 4)
        if (cfg.rot90 and square) else jnp.zeros((n,), jnp.int32)
    )
    rot = (rot + 2 * vf) % 4
    return 2 * rot + (hf ^ vf)


def _photometric(key: Array, x: Array, cfg: AugmentConfig) -> Array:
    """Input-only intensity jitter; each factor is per-image. Rank-
    agnostic: [B, H, W] or [B, H, W, C] (training batches are NHWC)."""
    n = x.shape[0]
    per_img = (n,) + (1,) * (x.ndim - 1)
    axes = tuple(range(1, x.ndim))
    kb, kc, kg, kn = jax.random.split(key, 4)
    if cfg.contrast > 0.0:
        c = jax.random.uniform(
            kc, per_img, minval=1.0 - cfg.contrast,
            maxval=1.0 + cfg.contrast)
        mean = jnp.mean(x, axis=axes, keepdims=True)
        x = (x - mean) * c + mean
    if cfg.brightness > 0.0:
        b = jax.random.uniform(
            kb, per_img, minval=-cfg.brightness, maxval=cfg.brightness)
        x = x + b
    if cfg.gamma > 0.0:
        g = jnp.exp(jax.random.uniform(
            kg, per_img, minval=-cfg.gamma, maxval=cfg.gamma))
        x = jnp.power(jnp.clip(x, 0.0, 1.0), g)
    if cfg.noise_sigma > 0.0:
        x = x + cfg.noise_sigma * jax.random.normal(kn, x.shape)
    if cfg.clip:
        x = jnp.clip(x, 0.0, 1.0)
    return x


def _elastic_fields(key: Array, n: int, hw: tuple,
                    cfg: AugmentConfig) -> Array:
    """Per-image smooth random displacement fields [n, 2, H, W].

    The U-Net paper's biomedical augmentation (Ronneberger et al.
    2015): coarse Gaussian noise smoothed into a continuous warp.
    Smoothing runs as a separable conv at a DOWNSAMPLED grid (the field
    varies on the elastic_sigma scale, so an 8x-coarser grid loses
    nothing) and upsamples bilinearly — cheap even inside the jitted
    train step."""
    h, w = hw
    s = max(2, int(cfg.elastic_sigma) // 2)
    ch, cw = max(2, h // s), max(2, w // s)
    raw = jax.random.normal(key, (n, 2, ch, cw))
    # smooth on the coarse grid (3-tap binomial, twice) then upsample
    k3 = jnp.asarray([0.25, 0.5, 0.25])

    def smooth1(v, axis):
        vp = jnp.pad(v, [(0, 0)] * axis + [(1, 1)] +
                     [(0, 0)] * (v.ndim - axis - 1), mode="edge")
        sl = [slice(None)] * v.ndim
        out = 0.0
        for i in range(3):
            sl[axis] = slice(i, i + v.shape[axis])
            out = out + k3[i] * vp[tuple(sl)]
        return out

    f = raw
    for _ in range(2):
        f = smooth1(smooth1(f, 2), 3)
    f = jax.image.resize(f, (n, 2, h, w), method="linear")
    # normalize each field's peak to the configured amplitude
    peak = jnp.max(jnp.abs(f), axis=(1, 2, 3), keepdims=True)
    return f * (cfg.elastic / jnp.maximum(peak, 1e-6))


def _elastic_warp(img: Array, field: Array) -> Array:
    """Bilinear-sample img ([H, W] or [H, W, C]) at the displaced grid
    (edge-clamped — scipy map_coordinates(order=1, mode='nearest'))."""
    from jax.scipy.ndimage import map_coordinates

    h, w = img.shape[0], img.shape[1]
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + field[0]
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + field[1]

    def one(ch):
        return map_coordinates(ch, [yy, xx], order=1, mode="nearest")

    if img.ndim == 2:
        return one(img)
    return jnp.stack([one(img[..., c]) for c in range(img.shape[-1])],
                     axis=-1)


def augment_batch(key: Array, batch: Array,
                  cfg: AugmentConfig = AugmentConfig()) -> Array:
    """Augment a [B, H, W] or [B, H, W, C] batch (geometric +
    photometric), jit-safe; spatial axes are 1 and 2."""
    kgeo, kpho, kel = jax.random.split(key, 3)
    n = batch.shape[0]
    codes = _geometric_codes(kgeo, n, cfg, batch.shape[1] == batch.shape[2])
    out = jax.vmap(_dihedral)(batch, codes)
    if cfg.elastic > 0.0:
        fields = _elastic_fields(kel, n, batch.shape[1:3], cfg)
        out = jax.vmap(_elastic_warp)(out, fields)
    return _photometric(kpho, out, cfg)


def augment_pair(
    key: Array, noisy: Array, clean: Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> tuple[Array, Array]:
    """Same GEOMETRIC transform on both members of a (noisy, clean)
    pair; photometric jitter + noise on the noisy input only."""
    kgeo, kpho, kel = jax.random.split(key, 3)
    n = noisy.shape[0]
    codes = _geometric_codes(kgeo, n, cfg, noisy.shape[1] == noisy.shape[2])
    gn = jax.vmap(_dihedral)(noisy, codes)
    gc = jax.vmap(_dihedral)(clean, codes)
    if cfg.elastic > 0.0:
        # the SAME warp on both members — targets move with inputs
        fields = _elastic_fields(kel, n, noisy.shape[1:3], cfg)
        gn = jax.vmap(_elastic_warp)(gn, fields)
        gc = jax.vmap(_elastic_warp)(gc, fields)
    return _photometric(kpho, gn, cfg), gc

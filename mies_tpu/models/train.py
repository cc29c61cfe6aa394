"""Training for the learned denoiser: optax + data-parallel sharding.

The train step is ONE jitted SPMD program: batch sharded over the
mesh's 'data' axis, parameters replicated, gradients combined by XLA's
automatic all-reduce over ICI (inserted by the partitioner — no manual
psum needed with jit sharding constraints). Runs identically on N fake
CPU devices (how tests and the driver's dry-run exercise it).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mies_tpu.models.denoiser import build_model, init_params


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: int = 0


TRAIN_LOSSES = ("l2", "l1", "ssim", "mix")


def _ssim_loss(denoised, clean, ws: int = 7):
    """1 - mean SSIM over the batch (differentiable; sewar's uniform
    window via eval.metrics._ssim_maps, max_val=1 for [0,1] floats).
    ws=7 keeps a meaningful valid region on small training patches."""
    from mies_tpu.eval.metrics import _ssim_maps

    def one(d, c):
        m, _ = _ssim_maps(c, d, ws, 0.01, 0.03, 1.0)
        return jnp.mean(m)

    d2 = denoised[..., 0] if denoised.ndim == 4 else denoised
    c2 = clean[..., 0] if clean.ndim == 4 else clean
    return 1.0 - jnp.mean(jax.vmap(one)(d2, c2))


def make_train_step(
    features: int = 32,
    depth: int = 6,
    learning_rate: float = 1e-3,
    mesh: Mesh | None = None,
    self_supervised: bool = False,
    arch: str = "dncnn",
    loss: str = "l2",
) -> tuple[Callable, Callable, optax.GradientTransformation]:
    """Returns (init_fn, train_step).

    self_supervised=False (noise2clean): train_step(state, noisy, clean)
    — L2 on the predicted residual vs the true noise.
    self_supervised=True (Noise2Void blind-spot): train_step(state,
    masked, target, mask) — the input has a random pixel subset replaced
    by neighbors (n2v_mask_batch), and the loss is the masked-pixel MSE
    of the DENOISED estimate against the original noisy values; with
    pixelwise-independent zero-mean noise the minimizer is the clean
    signal, so the model learns to denoise WITHOUT clean targets.

    With a mesh, the batch is sharded over 'data' and params are
    replicated; XLA inserts the gradient all-reduce.
    """
    if loss not in TRAIN_LOSSES:
        raise ValueError(f"loss must be one of {TRAIN_LOSSES}, got {loss!r}")
    if self_supervised and loss in ("ssim", "mix"):
        raise ValueError(
            "ssim/mix losses need dense targets; Noise2Void's blind-spot "
            "objective is defined only on the masked pixels — use l1/l2"
        )
    model = build_model(arch, features, depth)
    tx = optax.adamw(learning_rate)

    def loss_fn(params, noisy, clean):
        pred_noise = model.apply(params, noisy)
        true_noise = noisy - clean
        if loss == "l2":
            return jnp.mean((pred_noise - true_noise) ** 2)
        if loss == "l1":
            return jnp.mean(jnp.abs(pred_noise - true_noise))
        denoised = noisy - pred_noise
        if loss == "ssim":
            return _ssim_loss(denoised, clean)
        # 'mix': the Zhao et al. 2017 restoration recipe — L1 keeps
        # intensities honest, SSIM keeps structure (alpha = 0.84 SSIM)
        return (0.16 * jnp.mean(jnp.abs(pred_noise - true_noise))
                + 0.84 * _ssim_loss(denoised, clean))

    def n2v_loss_fn(params, masked, target, mask):
        denoised = masked - model.apply(params, masked)
        err = denoised - target
        e = jnp.abs(err) if loss == "l1" else err * err
        return jnp.sum(e * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    if self_supervised:

        def train_step(state: TrainState, masked, target, mask):
            loss, grads = jax.value_and_grad(n2v_loss_fn)(
                state.params, masked, target, mask
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

    else:

        def train_step(state: TrainState, noisy, clean):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, noisy, clean)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1), loss

    def init_fn(rng) -> TrainState:
        params = init_params(rng, features, depth, arch=arch)
        return TrainState(params, tx.init(params), 0)

    if mesh is None:
        return init_fn, jax.jit(train_step), tx

    batch_spec = NamedSharding(mesh, P("data", None, None, None))
    rep = NamedSharding(mesh, P())
    state_spec = TrainState(
        params=jax.tree.map(lambda _: rep, jax.eval_shape(init_fn, jax.random.PRNGKey(0)).params),
        opt_state=jax.tree.map(
            lambda _: rep,
            jax.eval_shape(init_fn, jax.random.PRNGKey(0)).opt_state,
        ),
        step=rep,
    )
    n_batch_args = 3 if self_supervised else 2
    sharded_step = jax.jit(
        train_step,
        in_shardings=(state_spec, *([batch_spec] * n_batch_args)),
        out_shardings=(state_spec, rep),
    )
    return init_fn, sharded_step, tx


def n2v_mask_batch(
    rng: np.random.Generator,
    noisy: np.ndarray,
    frac: float = 0.01,
    radius: int = 2,
):
    """Noise2Void blind-spot masking (Krull et al., CVPR 2019 —
    uniform pixel selection variant).

    Replaces ``frac`` of each patch's pixels with a RANDOM NEIGHBOR
    within ``radius`` (never the pixel itself — that would leak the
    value the network must predict). Returns (masked, target, mask),
    all [B, p, p, 1]; target is the untouched noisy batch.
    """
    b, p = noisy.shape[0], noisy.shape[1]
    n_mask = max(1, int(frac * p * p))
    masked = noisy.copy()
    mask = np.zeros_like(noisy)
    for i in range(b):
        ys = rng.integers(0, p, n_mask)
        xs = rng.integers(0, p, n_mask)
        dy = rng.integers(-radius, radius + 1, n_mask)
        dx = rng.integers(-radius, radius + 1, n_mask)
        dx = np.where((dy == 0) & (dx == 0), 1, dx)  # exclude the center
        sy = np.clip(ys + dy, 0, p - 1)
        sx = np.clip(xs + dx, 0, p - 1)
        # border clipping can land back ON the masked pixel (leaking the
        # value the blind spot must hide) — step off it deterministically
        collide = (sy == ys) & (sx == xs)
        sx = np.where(collide, np.where(xs > 0, xs - 1, xs + 1), sx)
        masked[i, ys, xs, 0] = noisy[i, sy, sx, 0]
        mask[i, ys, xs, 0] = 1.0
    return masked, noisy, mask


def synth_batch(rng: np.random.Generator, batch: int, patch: int, sigma: float = 0.08):
    """Synthetic clean/noisy pairs: smooth phantoms + gaussian noise."""
    y, x = np.mgrid[0:patch, 0:patch].astype(np.float32) / patch
    clean = []
    for _ in range(batch):
        cx, cy, s = rng.random(3)
        img = np.exp(-(((x - cx) ** 2 + (y - cy) ** 2) / (0.05 + 0.2 * s)))
        img += 0.2 * np.sin(12 * x * rng.random()) * np.cos(9 * y * rng.random())
        clean.append(np.clip(img, 0, 1))
    clean = np.stack(clean)[..., None].astype(np.float32)
    noisy = np.clip(
        clean + rng.normal(0, sigma, clean.shape).astype(np.float32), 0, 1
    )
    return noisy, clean


class FileDataset:
    """Clean patches from a directory of real slices (VERDICT r1 #10).

    Accepts .png/.jpg/.tif (Pillow), .npy arrays, and .dcm DICOM slices;
    images normalize to float [0,1] (int16 HU windowed to the dataset's
    own 1st..99th percentile range). Batches are random patch crops with
    synthetic gaussian noise added — the standard noise2clean setup when
    only clean acquisitions exist (reference .gitignore:8-9 anticipated
    trained weights; no paired data ships with it).
    """

    _IMG = (".png", ".jpg", ".jpeg", ".tif", ".tiff")

    def __init__(self, data_dir, patch: int = 64, max_images: int = 256):
        from pathlib import Path

        self.patch = patch
        paths = sorted(
            p
            for p in Path(data_dir).iterdir()
            if p.suffix.lower() in (*self._IMG, ".npy", ".dcm")
        )
        if not paths:
            raise FileNotFoundError(
                f"no trainable images (png/jpg/tif/npy/dcm) in {data_dir}"
            )
        self.images = [self._load(p) for p in paths[:max_images]]
        small = [
            p for p, im in zip(paths, self.images)
            if min(im.shape) < patch
        ]
        if small:
            raise ValueError(
                f"{len(small)} image(s) smaller than patch={patch}, "
                f"e.g. {small[0]}"
            )

    def _load(self, p) -> np.ndarray:
        if p.suffix.lower() == ".npy":
            arr = np.load(p)
        elif p.suffix.lower() == ".dcm":
            from mies_tpu.io.dicom import read_dicom

            arr = read_dicom(p).pixels
        else:
            from mies_tpu.io.image import load_image

            return load_image(p, dtype="float32")
        arr = arr.astype(np.float32)
        if arr.ndim != 2:
            raise ValueError(f"{p}: expected a 2-D slice, got {arr.shape}")
        lo, hi = np.percentile(arr, (1.0, 99.0))
        return np.clip((arr - lo) / max(hi - lo, 1e-6), 0.0, 1.0)

    def crops(self, rng: np.random.Generator, batch: int) -> np.ndarray:
        """Random raw patch crops [B, p, p, 1] — no synthetic noise
        (the Noise2Void input: the data's OWN noise is the noise)."""
        p = self.patch
        out = []
        for _ in range(batch):
            im = self.images[rng.integers(len(self.images))]
            y = rng.integers(im.shape[0] - p + 1)
            x = rng.integers(im.shape[1] - p + 1)
            out.append(im[y : y + p, x : x + p])
        return np.stack(out)[..., None].astype(np.float32)

    def batch(self, rng: np.random.Generator, batch: int, sigma: float):
        """Random crops + gaussian noise -> (noisy, clean) [B,p,p,1]."""
        clean = self.crops(rng, batch)
        noisy = np.clip(
            clean + rng.normal(0, sigma, clean.shape).astype(np.float32), 0, 1
        )
        return noisy, clean


def _eval_vs_bilateral(params, features: int, depth: int, sigma: float,
                       seed: int = 1234, arch: str = "dncnn") -> dict:
    """PSNR of the trained denoiser vs the bilateral baseline on a fixed
    held-out phantom set (the VERDICT r1 #10 acceptance check)."""
    from mies_tpu.eval.metrics import psnr
    from mies_tpu.models.denoiser import denoise
    from mies_tpu.ops.filters import denoise_bilateral

    rng = np.random.default_rng(seed)
    noisy, clean = synth_batch(rng, 16, 128, sigma)
    noisy2d = jnp.asarray(noisy[..., 0])
    clean2d = jnp.asarray(clean[..., 0])

    def psnr_of(pred):
        return float(
            jnp.mean(
                jax.vmap(lambda a, b: psnr(a, b, max_val=1.0))(clean2d, pred)
            )
        )

    model_out = jax.vmap(
        lambda im: denoise(params, im, features=features, depth=depth,
                           arch=arch)
    )(noisy2d)
    bilat_out = jax.vmap(
        lambda im: denoise_bilateral(im, sigma_color=2 * sigma, sigma_spatial=1.5)
    )(noisy2d)
    return {
        "psnr_noisy": psnr_of(noisy2d),
        "psnr_model": psnr_of(model_out),
        "psnr_bilateral": psnr_of(bilat_out),
    }


def train_denoiser(
    steps: int = 200,
    batch: int = 32,
    patch: int = 64,
    features: int = 32,
    depth: int = 6,
    sigma: float = 0.08,
    seed: int = 0,
    mesh: Mesh | None = None,
    checkpoint_dir: str | None = None,
    log_every: int = 50,
    data_dir: str | None = None,
    evaluate: bool = False,
    self_supervised: bool = False,
    arch: str = "dncnn",
    augment: "AugmentConfig | None" = None,
    loss: str = "l2",
) -> tuple[TrainState, list[float], dict]:
    """Train the denoiser; returns (state, losses, report).

    data_dir=None trains on synthetic phantoms; with a directory,
    patches come from the real slices in it (FileDataset). With
    evaluate=True the report carries PSNR vs the bilateral baseline on a
    held-out phantom set; it is also saved next to the checkpoint.

    self_supervised=True trains Noise2Void-style: NO clean targets — the
    model learns from the (noisy) data alone via blind-spot masking.
    This is the realistic medical setup, where clean references don't
    exist; with a data_dir the raw crops' own noise is the noise (no
    synthetic corruption added).

    augment (models.augment.AugmentConfig) enables device-side
    stochastic augmentation (kornia.augmentation analogue): the SAME
    geometric transform on input and target, photometric jitter on the
    input only; in the self-supervised path the crops are augmented
    BEFORE blind-spot masking (masking statistics stay untouched).
    """
    init_fn, step_fn, _ = make_train_step(
        features, depth, mesh=mesh, self_supervised=self_supervised,
        arch=arch, loss=loss,
    )
    state = init_fn(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    dataset = FileDataset(data_dir, patch=patch) if data_dir else None
    if augment is not None:
        from mies_tpu.models.augment import augment_batch, augment_pair

        aug_key = jax.random.PRNGKey(seed ^ 0x5A5A5A)
        aug_one = jax.jit(lambda k, x: augment_batch(k, x, augment))
        aug_two = jax.jit(lambda k, x, y: augment_pair(k, x, y, augment))
    losses = []
    for i in range(steps):
        if self_supervised:
            if dataset is not None:
                noisy = dataset.crops(rng, batch)
            else:
                noisy, _ = synth_batch(rng, batch, patch, sigma)
            if augment is not None:
                aug_key, k_ = jax.random.split(aug_key)
                noisy = np.asarray(aug_one(k_, jnp.asarray(noisy)))
            masked, target, mask = n2v_mask_batch(rng, noisy)
            state, loss_val = step_fn(
                state, jnp.asarray(masked), jnp.asarray(target),
                jnp.asarray(mask),
            )
        else:
            if dataset is not None:
                noisy, clean = dataset.batch(rng, batch, sigma)
            else:
                noisy, clean = synth_batch(rng, batch, patch, sigma)
            noisy, clean = jnp.asarray(noisy), jnp.asarray(clean)
            if augment is not None:
                aug_key, k_ = jax.random.split(aug_key)
                noisy, clean = aug_two(k_, noisy, clean)
            state, loss_val = step_fn(state, noisy, clean)
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss_val))
    report = {
        "steps": steps,
        "arch": arch,
        "data": data_dir or "synthetic-phantoms",
        "objective": "noise2void" if self_supervised else "noise2clean",
        "loss": loss,
        "augment": None if augment is None else dataclasses.asdict(augment),
        "final_loss": losses[-1] if losses else None,
    }
    if evaluate:
        report.update(
            _eval_vs_bilateral(state.params, features, depth, sigma, arch=arch)
        )
    if checkpoint_dir is not None:
        import json
        from pathlib import Path

        from mies_tpu.models.denoiser import save_denoiser

        save_denoiser(checkpoint_dir, state.params, features, depth, arch=arch)
        (Path(checkpoint_dir) / "train_report.json").write_text(
            json.dumps(report, indent=2) + "\n"
        )
    return state, losses, report

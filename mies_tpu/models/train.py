"""Training for the learned denoiser: optax + data-parallel sharding.

The train step is ONE jitted SPMD program: batch sharded over the
mesh's 'data' axis, parameters replicated, gradients combined by XLA's
automatic all-reduce over ICI (inserted by the partitioner — no manual
psum needed with jit sharding constraints). Runs identically on N fake
CPU devices (how tests and the driver's dry-run exercise it).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mies_tpu.models.denoiser import DenoiserCNN, init_params


@struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: int = 0


def make_train_step(
    features: int = 32,
    depth: int = 6,
    learning_rate: float = 1e-3,
    mesh: Mesh | None = None,
) -> tuple[Callable, Callable, optax.GradientTransformation]:
    """Returns (init_fn, train_step) for noise2clean L2 training.

    train_step(state, noisy, clean) -> (state, loss). With a mesh, the
    batch is sharded over 'data' and params are replicated; XLA inserts
    the gradient all-reduce.
    """
    model = DenoiserCNN(features=features, depth=depth)
    tx = optax.adamw(learning_rate)

    def loss_fn(params, noisy, clean):
        pred_noise = model.apply(params, noisy)
        true_noise = noisy - clean
        return jnp.mean((pred_noise - true_noise) ** 2)

    def train_step(state: TrainState, noisy, clean):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, noisy, clean)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def init_fn(rng) -> TrainState:
        params = init_params(rng, features, depth)
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
    sharded_step = jax.jit(
        train_step,
        in_shardings=(state_spec, batch_spec, batch_spec),
        out_shardings=(state_spec, rep),
    )
    return init_fn, sharded_step, tx


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
) -> tuple[TrainState, list[float]]:
    """Train on synthetic pairs; optionally save an orbax checkpoint."""
    init_fn, step_fn, _ = make_train_step(features, depth, mesh=mesh)
    state = init_fn(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    losses = []
    for i in range(steps):
        noisy, clean = synth_batch(rng, batch, patch, sigma)
        state, loss = step_fn(state, jnp.asarray(noisy), jnp.asarray(clean))
        if i % log_every == 0 or i == steps - 1:
            losses.append(float(loss))
    if checkpoint_dir is not None:
        from mies_tpu.models.denoiser import save_denoiser

        save_denoiser(checkpoint_dir, state.params, features, depth)
    return state, losses

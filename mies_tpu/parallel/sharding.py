"""Data-parallel batch sharding of the enhancement chain.

The batch axis is the one meaningful parallel axis for a stateless
slice pipeline (SURVEY.md section 2d): shard [B, H, W] over the mesh's
'data' axis; per-image work needs no communication, and batch-level
quality metrics reduce with one psum over ICI.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mies_tpu.pipeline.compiler import build_batched_chain, _ingest, _quantize_u8
from mies_tpu.pipeline.config import PipelineConfig


@functools.lru_cache(maxsize=64)
def shard_pipeline(
    cfg: PipelineConfig,
    mesh: Mesh,
    quantize: bool = True,
    donate: bool = False,
) -> Callable:
    """Compile cfg into a jitted program whose batch dim is mesh-sharded.

    Returns fn([B, H, W]) -> [B, H, W] with B divisible by the 'data'
    axis size. Sharding is expressed with in/out shardings on jit — XLA
    partitions the program SPMD; no collectives are needed in the chain
    itself, so scaling is linear over ICI. Cached like compile_pipeline
    (cfg and Mesh are both hashable) — repeated runner calls must not
    re-trace a Pallas-containing program (5-20 min remote compiles on
    this platform).
    """
    chain = build_batched_chain(cfg)

    def run(batch):
        out = chain(batch)
        return _quantize_u8(out) if quantize else out

    # batch shards over ALL mesh axes: on a ('data','space') mesh used
    # purely data-parallel, leaving 'space' out of the spec would
    # REPLICATE the whole computation across it (wasted chips).
    spec = NamedSharding(mesh, P(tuple(mesh.axis_names), None, None))
    return jax.jit(
        run,
        in_shardings=spec,
        out_shardings=spec,
        donate_argnums=(0,) if donate else (),
    )


def sharded_evaluate(
    cfg: PipelineConfig,
    mesh: Mesh,
    metric_names: tuple[str, ...] = ("psnr", "ssim"),
    max_val: float = 1.0,
) -> Callable:
    """One program: enhance a sharded batch AND reduce quality metrics.

    Returns fn(batch) -> (enhanced_u8, {name: batch-mean scalar}).
    Metrics are computed per-shard and combined with jnp.mean — under
    SPMD partitioning XLA lowers the mean over the sharded batch axis
    to a psum over the 'data' axis (the only collective in the program).
    """
    from mies_tpu.eval.metrics import METRIC_REGISTRY

    chain = build_batched_chain(cfg)

    def run(batch):
        enhanced = chain(batch)
        # ground truth goes through the SAME ingest normalization the
        # chain applies (uint8/uint16 -> float [0,1]) before rescaling,
        # or integer inputs would be compared 255x/65535x off-scale
        scaled_in = _ingest(batch) * max_val
        scaled_out = enhanced * max_val

        def per_image(gt, p):
            return {
                n: METRIC_REGISTRY[n](gt, p, max_val=max_val)
                if n in ("psnr", "ssim", "msssim", "psnrb")
                else METRIC_REGISTRY[n](gt, p)
                for n in metric_names
            }

        per = jax.vmap(per_image)(scaled_in, scaled_out)
        means = {k: jnp.mean(v) for k, v in per.items()}
        return _quantize_u8(enhanced), means

    spec = NamedSharding(mesh, P(tuple(mesh.axis_names), None, None))
    rep = NamedSharding(mesh, P())
    return jax.jit(
        run,
        in_shardings=spec,
        out_shardings=(spec, {n: rep for n in metric_names}),
    )

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
    # the batched chain owns quantization so the fused Pallas
    # unsharp(+quantize) tail applies on the sharded path too — the
    # multi-chip program must not silently take a slower tail than
    # compile_pipeline's (review finding, round 4)
    run = build_batched_chain(cfg, quantize=quantize)

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


@functools.lru_cache(maxsize=64)
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
    Cached like shard_pipeline: repeated calls must not re-trace a
    Pallas-containing program.
    """
    from mies_tpu.eval.metrics import METRIC_REGISTRY

    chain = build_batched_chain(cfg)
    # int16 HU input has no [0,1] normalization in _ingest; the
    # meaningful comparison baseline is the chain's own HU window
    # (matching the CLI report path) — without one the metrics would
    # silently compare raw HU against [0,1] outputs
    wstage = next((s for s in cfg.stages if s.op == "window_hu"), None)

    def run(batch):
        enhanced = chain(batch)
        # ground truth goes through the SAME ingest normalization the
        # chain applies (uint8/uint16 -> float [0,1]) before rescaling,
        # or integer inputs would be compared 255x/65535x off-scale
        gt = _ingest(batch)
        if jnp.issubdtype(batch.dtype, jnp.signedinteger):
            if wstage is None:
                raise ValueError(
                    "sharded_evaluate: int16 HU input needs a window_hu "
                    "stage in the config to define the metric baseline"
                )
            from mies_tpu.ops.intensity import window_hu

            gt = window_hu(gt, **wstage.kwargs())
        scaled_in = gt * max_val
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

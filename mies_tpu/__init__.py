"""mies_tpu — TPU-native medical image enhancement framework.

A from-scratch JAX / XLA / Pallas rebuild of the capability surface of
``GregOratOr/medical-image-enhancement-system`` (see /root/repo/SURVEY.md):
a config-driven enhancement pipeline (global histogram equalization, CLAHE,
gamma, HU windowing, Gaussian / median / bilateral denoising, unsharp-mask
sharpening), host-side image & volume I/O, a full-reference quality-metric
suite, and multi-chip scaling via ``jax.sharding`` meshes.

Design (TPU-first, not a port):
  * every enhancement stage is a pure function on float32 [0, 1] arrays;
  * a declarative config compiles to ONE jitted XLA program per chain —
    host<->device crossings happen exactly twice per batch;
  * batches are vmapped; multi-chip = batch sharding over a ``Mesh`` with
    collectives over ICI; oversized slices spatially shard with halo
    exchange (``lax.ppermute``);
  * hot non-XLA-friendly stages (tiled CLAHE histograms, rank filters)
    have Pallas kernels in ``mies_tpu.kernels``.

Reference capability map: SURVEY.md section 2b (D1..D11).
"""

__version__ = "0.1.0"

from mies_tpu.pipeline.config import PipelineConfig, StageConfig, load_config
from mies_tpu.pipeline.compiler import compile_pipeline

__all__ = [
    "PipelineConfig",
    "StageConfig",
    "load_config",
    "compile_pipeline",
    "__version__",
]

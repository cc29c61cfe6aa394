"""Multi-chip scaling: device meshes, batch sharding, halo exchange.

The reference has zero parallelism code (SURVEY.md section 2d — only
transitive NCCL wheels). The TPU-native scaling story implemented here:

* data parallelism — the meaningful axis for an embarrassingly parallel
  slice pipeline: the batch dim sharded over a ``Mesh`` axis, compute
  via ``shard_map``, metrics reduced with ``psum`` over ICI;
* spatial sharding — the domain's ring-attention analogue (SURVEY.md
  section 5.7): one oversized slice split into row bands across chips,
  stencil ops made exact with halo exchange via ``lax.ppermute``.

Everything works identically on N fake CPU devices
(``--xla_force_host_platform_device_count=N``) — that is how CI tests it.
"""

from mies_tpu.parallel.mesh import init_distributed, make_mesh, mesh_devices
from mies_tpu.parallel.sharding import shard_pipeline, sharded_evaluate
from mies_tpu.parallel.clahe_shard import clahe_spatial_shard
from mies_tpu.parallel.halo import (
    batch_spatial_shard_apply,
    halo_extend_rows,
    spatial_shard_apply,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "mesh_devices",
    "shard_pipeline",
    "sharded_evaluate",
    "halo_extend_rows",
    "spatial_shard_apply",
    "batch_spatial_shard_apply",
    "clahe_spatial_shard",
]

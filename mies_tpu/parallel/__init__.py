"""Multi-chip scaling: device meshes, batch sharding, halo exchange.

The reference has zero parallelism code (SURVEY.md section 2d — only
transitive NCCL wheels). The TPU-native scaling story implemented here:

* data parallelism — the meaningful axis for an embarrassingly parallel
  slice pipeline: the batch dim sharded over a ``Mesh`` axis, compute
  via ``shard_map``, metrics reduced with ``psum`` over ICI;
* spatial sharding — the domain's ring-attention analogue (SURVEY.md
  section 5.7): one oversized slice split into row bands across chips,
  stencil ops made exact with halo exchange via ``lax.ppermute``;
* volume z-sharding — the same idea one dimension up: a whole [Z, H, W]
  volume sharded into z-slabs, 3-D stencils halo-exchanged, clahe3d on
  tile-aligned z-bands with one LUT all_gather, global statistics via
  pmin/pmax/psum (``volume_shard_apply``).

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
from mies_tpu.parallel.volume_shard import clahe3d_band, volume_shard_apply

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
    "clahe3d_band",
    "volume_shard_apply",
]

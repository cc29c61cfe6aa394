"""Declarative pipeline: config schema -> one jitted XLA program."""

from mies_tpu.pipeline.config import PipelineConfig, StageConfig, load_config
from mies_tpu.pipeline.compiler import compile_pipeline, OP_REGISTRY
from mies_tpu.pipeline.export import (
    export_pipeline,
    load_exported,
    read_export_header,
)

__all__ = [
    "PipelineConfig",
    "StageConfig",
    "load_config",
    "compile_pipeline",
    "OP_REGISTRY",
    "export_pipeline",
    "load_exported",
    "read_export_header",
]

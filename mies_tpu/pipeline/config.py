"""Config schema for the declarative enhancement pipeline.

The reference's single authored structural decision was a ``configs/``
package (SURVEY.md section 5.6 — "config-driven filter chain"). Here a
config is data (dataclasses, loadable from JSON/YAML), and compiling it
yields ONE pure jitted function. The config is hashable so it keys the
jit cache: same config -> same compiled XLA program, no retrace.

Schema (YAML/JSON):

    name: chest-xray-clahe
    pipeline:
      - op: window_hu          # only for int16 CT input
        center: 40.0
        width: 400.0
      - op: clahe
        clip_limit: 2.0
        grid_size: [8, 8]
        convention: opencv
      - op: bilateral_blur
        kernel_size: 5
        sigma_color: 0.1
        sigma_space: 1.5
      - op: unsharp_mask
        radius: 1.5
        amount: 1.0
    io:
      dtype: uint8             # or int16 (CT)
    eval:
      metrics: [psnr, ssim]
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path
from typing import Any, Mapping, Sequence


def _freeze(v: Any) -> Any:
    """Recursively convert JSON-ish values to hashable equivalents."""
    if isinstance(v, Mapping):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _thaw(v: Any) -> Any:
    """Inverse of _freeze for param dicts (tuples stay tuples)."""
    if isinstance(v, tuple) and v and all(
        isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], str) for x in v
    ):
        return {k: _thaw(x) for k, x in v}
    return v


@dataclasses.dataclass(frozen=True)
class StageConfig:
    """One pipeline stage: op name + frozen (hashable) params."""

    op: str
    params: tuple = ()  # frozen key/value tuple, see _freeze

    @classmethod
    def make(cls, op: str, **params: Any) -> "StageConfig":
        return cls(op=op, params=_freeze(params))

    def kwargs(self) -> dict[str, Any]:
        out = {}
        for k, v in self.params:
            out[k] = _thaw(v)
        return out


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """A full pipeline: ordered stages + io/eval metadata."""

    stages: tuple[StageConfig, ...]
    name: str = "pipeline"
    io: tuple = ()
    eval: tuple = ()

    @classmethod
    def make(
        cls,
        stages: Sequence[tuple[str, dict[str, Any]] | StageConfig],
        name: str = "pipeline",
        io: Mapping[str, Any] | None = None,
        eval: Mapping[str, Any] | None = None,
    ) -> "PipelineConfig":
        built = []
        for s in stages:
            if isinstance(s, StageConfig):
                built.append(s)
            else:
                op, params = s
                built.append(StageConfig.make(op, **params))
        return cls(
            stages=tuple(built),
            name=name,
            io=_freeze(dict(io or {})),
            eval=_freeze(dict(eval or {})),
        )

    def io_dict(self) -> dict[str, Any]:
        return {k: _thaw(v) for k, v in self.io}

    def eval_dict(self) -> dict[str, Any]:
        return {k: _thaw(v) for k, v in self.eval}

    def cache_key(self) -> str:
        """Stable content hash — names the compiled program & run manifests."""
        payload = json.dumps(self.to_dict(), sort_keys=True).encode()
        return hashlib.sha256(payload).hexdigest()[:16]

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "pipeline": [{"op": s.op, **s.kwargs()} for s in self.stages],
            "io": self.io_dict(),
            "eval": self.eval_dict(),
        }

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.to_dict(), indent=2) + "\n")


def from_dict(d: Mapping[str, Any]) -> PipelineConfig:
    stages = []
    for entry in d.get("pipeline", []):
        entry = dict(entry)
        op = entry.pop("op")
        # YAML lists -> tuples for hashability (grid_size etc.)
        stages.append((op, entry))
    return PipelineConfig.make(
        stages,
        name=d.get("name", "pipeline"),
        io=d.get("io"),
        eval=d.get("eval"),
    )


def load_config(path: str | Path) -> PipelineConfig:
    """Load a pipeline config from a .json / .yaml / .yml file."""
    path = Path(path)
    text = path.read_text()
    if path.suffix in (".yaml", ".yml"):
        import yaml

        d = yaml.safe_load(text)
    else:
        d = json.loads(text)
    if not isinstance(d, Mapping):
        raise ValueError(f"config root must be a mapping: {path}")
    cfg = from_dict(d)
    validate(cfg)
    return cfg


def validate(cfg: PipelineConfig) -> None:
    """Check ops exist and params are accepted — fail at load, not trace."""
    import inspect

    from mies_tpu.pipeline.compiler import OP_REGISTRY

    for s in cfg.stages:
        if s.op not in OP_REGISTRY:
            raise ValueError(
                f"unknown op {s.op!r}; available: {sorted(OP_REGISTRY)}"
            )
        fn = OP_REGISTRY[s.op]
        sig = inspect.signature(fn)
        for k in s.kwargs():
            if k not in sig.parameters:
                raise ValueError(
                    f"op {s.op!r} does not accept param {k!r}; "
                    f"accepted: {[p for p in sig.parameters if p != 'img']}"
                )

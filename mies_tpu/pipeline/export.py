"""AOT pipeline export: a compiled chain as a portable artifact.

The reference's torch stack ships models to production via
TorchScript/ONNX export (SURVEY.md section 2b D3 — no reference code
exists, section 0); the TPU-native equivalent is ``jax.export``:
the jitted chain serializes to StableHLO, loadable WITHOUT the config
system, the op registry, or retracing — deployment hosts call one
artifact with one function in it.

Format (``.mies``): 8-byte magic ``MIESEXP1`` + u32 little-endian JSON
header length + JSON header (config dict, input spec, creation
platform) + the jax.export blob. The header is readable without jax.

Platform note: the chain specializes at TRACE time (Pallas kernels on
TPU, jnp fallbacks on CPU), so an artifact exported on a TPU host
contains Mosaic custom calls and runs on TPU runtimes; one exported on
CPU is CPU-portable. ``load_exported`` checks and reports this instead
of failing inside XLA.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

_MAGIC = b"MIESEXP1"


def export_pipeline(
    cfg,
    path: str | Path,
    shape: tuple[int, ...] = (512, 512),
    batch_size: int | None = None,
    quantize: bool = True,
    volume: bool = False,
    input_dtype: str = "float32",
) -> Path:
    """Serialize the compiled chain for ``shape`` (and optional leading
    batch axis) into a ``.mies`` artifact; returns the path.

    volume=True exports the [Z, H, W] volumetric program
    (compile_volume_pipeline — clahe3d/morphology3d/resample3d chains);
    ``shape`` is then the full 3-D grid and batch_size must be None.

    input_dtype picks the traced input spec: the chain's on-device
    ingest handles raw integers (uint8/uint16 normalize on chip; int16
    HU passes through to window_hu), so 'uint8' is the right spec for
    PNG/X-ray serving and 'int16' for CT chains — 'float32' callers
    must pre-normalize on the host.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from mies_tpu.pipeline.compiler import (
        build_batched_chain,
        build_chain,
        compile_volume_pipeline,
        _ingest,
        _quantize_u8,
    )

    if volume:
        if batch_size is not None:
            raise ValueError("volume exports take no batch axis")
        if len(shape) != 3:
            raise ValueError("volume exports need a (Z, H, W) shape")
        fn = compile_volume_pipeline(cfg, quantize=quantize)
        in_shape = shape
    elif batch_size is not None:
        fn = build_batched_chain(cfg, quantize=quantize)
        in_shape = (batch_size, *shape)
    else:
        # mirror compile_pipeline: on-device ingest of raw integers,
        # then the chain, then quantization (build_chain alone has
        # neither — a uint8-spec export without _ingest would feed the
        # chain 0..255 floats)
        chain = build_chain(cfg)

        def fn(img):
            x = chain(_ingest(img))
            return _quantize_u8(x) if quantize else x
        in_shape = shape
    dtypes = {"float32": jnp.float32, "uint8": jnp.uint8,
              "uint16": jnp.uint16, "int16": jnp.int16}
    if input_dtype not in dtypes:
        raise ValueError(
            f"input_dtype must be one of {sorted(dtypes)}, got "
            f"{input_dtype!r}")
    spec = jax.ShapeDtypeStruct(in_shape, dtypes[input_dtype])
    exp = jexport.export(jax.jit(fn))(spec)
    header = {
        "config": cfg.to_dict(),
        "input_shape": list(in_shape),
        "input_dtype": input_dtype,
        "quantize": quantize,
        "volume": volume,
        "platforms": list(exp.platforms),
    }
    hj = json.dumps(header).encode()
    blob = exp.serialize()
    out = Path(path)
    out.write_bytes(_MAGIC + struct.pack("<I", len(hj)) + hj + blob)
    return out


def _read_header(path: str | Path) -> tuple[dict, int]:
    """Parse the magic + JSON header with bounded reads; returns
    (header, blob_offset). One parser — the format lives here."""
    p = Path(path)
    with open(p, "rb") as f:
        head = f.read(12)
        if len(head) < 12 or head[:8] != _MAGIC:
            raise ValueError(f"{p}: not a mies export (bad magic)")
        n = struct.unpack("<I", head[8:12])[0]
        hj = f.read(n)
    if len(hj) < n:
        raise ValueError(f"{p}: corrupt artifact (truncated header)")
    try:
        return json.loads(hj), 12 + n
    except ValueError as e:
        raise ValueError(f"{p}: corrupt artifact (bad header JSON)") from e


def read_export_header(path: str | Path) -> dict:
    """The artifact's JSON header (config, shapes, platform) — readable
    without jax (12 bytes + the header; the blob is never touched)."""
    return _read_header(path)[0]


def load_exported(path: str | Path):
    """Deserialize a ``.mies`` artifact -> (callable, header).

    The callable takes one array of the exported shape/dtype and
    returns the chain's output; no config system or retrace involved.
    """
    import jax
    from jax import export as jexport

    header, off = _read_header(path)
    exp = jexport.deserialize(Path(path).read_bytes()[off:])
    backend = jax.default_backend()
    plats = [p.lower() for p in header.get("platforms", [])]
    if plats and backend.lower() not in plats and not (
        backend.lower() == "axon" and "tpu" in plats
    ):
        raise ValueError(
            f"{path}: exported for platform(s) {plats}, but the current "
            f"backend is {backend!r} — re-export on this platform "
            f"(the chain specializes its kernels at trace time)"
        )
    return exp.call, header

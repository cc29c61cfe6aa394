"""2-D image ingest/save (PNG/JPEG/TIFF via Pillow — host C codecs).

Mirrors the reference's pillow role (reference pyproject.toml:11;
SURVEY.md section 2b D8): X-ray / mammogram ingest to arrays, uint8
save of enhanced outputs.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def load_image(
    path: str | Path, as_gray: bool = True, dtype: str = "float32"
) -> np.ndarray:
    """Load an image file to a NumPy array.

    as_gray=True, dtype="float32": float32 [H, W] in [0, 1] (16-bit
    sources keep their precision: /65535). dtype="raw" returns the
    integer pixels (uint8/uint16) — callers ship those to the device and
    normalize ON CHIP, quartering host->device traffic (the pipeline
    compiler's ingest cast makes the two paths bit-identical).
    as_gray=False returns the raw PIL array.
    """
    img = Image.open(path)
    if not as_gray:
        return np.asarray(img)
    if img.mode in ("I", "I;16", "I;16B", "I;16L"):
        arr = np.asarray(img.convert("I"))
        if dtype == "raw":
            return arr.astype(np.uint16)
        return arr.astype(np.float32) / 65535.0
    if img.mode != "L":
        img = img.convert("L")
    arr = np.asarray(img)
    if dtype == "raw":
        return arr
    return arr.astype(np.float32) / 255.0


def save_image(path: str | Path, arr: np.ndarray) -> None:
    """Save uint8 [H, W] (or float [0,1], quantized) as PNG/JPEG/TIFF."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        arr = from_float(arr)
    Image.fromarray(arr).save(path)


def to_float(arr: np.ndarray) -> np.ndarray:
    """uint8/uint16 -> float32 [0, 1]; float passes through as float32."""
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32)


def from_float(arr: np.ndarray) -> np.ndarray:
    """float [0,1] -> uint8 with round-half-even (matches on-device path)."""
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)

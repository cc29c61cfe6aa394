"""A/B the CLAHE apply layouts across tile widths on the real chip.

The tile33 apply rides P tiles per program (P in {2, 4, 8} — see
kernels/clahe.py::_tile33_group); shapes whose tile width is not a
multiple of 64 used to fall to the cell-list layout. This harness times
the production dispatcher against the cells twin for every tile-width
class so the grouping gate stays measurement-backed (the same policy as
docs/KERNELS.md's other recorded A/Bs).

Usage:  python benchmarks/apply_shapes.py [--batch 32] [--iters 16]
Prints one JSON line per (shape, grid) with both timings and the chosen
P; appends nothing (purely diagnostic).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import json

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mies_tpu.kernels.clahe import (
        _apply_lut_cells,
        _tile33_group,
        clahe_apply_lut,
    )
    from mies_tpu.utils.profiling import enable_compilation_cache, time_fn

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    B = args.batch
    # one case per tile-width class the grouping gate distinguishes
    cases = [
        ((512, 512), (8, 8)),    # tw=64  -> P=2 (the headline shape)
        ((512, 512), (8, 16)),   # tw=32  -> P=4
        ((512, 768), (8, 8)),    # tw=96  -> P=4
        ((512, 384), (8, 8)),    # tw=48  -> P=8
        ((512, 640), (8, 8)),    # tw=80  -> P=8
        ((512, 128), (8, 8)),    # tw=16  -> P=8
        ((512, 1024), (8, 8)),   # tw=128 -> P=2 wide regression
    ]
    for shape, grid in cases:
        gy, gx = grid
        tw = shape[1] // gx
        u8 = jnp.asarray(rng.integers(0, 256, (B, *shape)).astype(np.int32))
        luts = jnp.asarray(
            rng.integers(0, 256, (B, gy, gx, 256)).astype(np.float32)
        )
        prod = jax.jit(
            lambda v, l, g=grid: clahe_apply_lut(v, l, g, integer_luts=True)
        )
        cells = jax.jit(
            lambda v, l, g=grid: _apply_lut_cells(v, l, g, True, False)
        )
        a = np.asarray(prod(u8, luts))
        b = np.asarray(cells(u8, luts))
        t_prod = time_fn(prod, u8, luts, iters=args.iters)["ms_per_call"]
        t_cells = time_fn(cells, u8, luts, iters=args.iters)["ms_per_call"]
        print(json.dumps({
            "shape": list(shape), "grid": list(grid), "tw": tw,
            "P": _tile33_group(tw, gx, max_p=8),
            "tile33_ms": round(t_prod, 3),
            "cells_ms": round(t_cells, 3),
            "max_abs_diff": float(np.abs(a - b).max()),
            "batch": B, "backend": jax.default_backend(),
        }), flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

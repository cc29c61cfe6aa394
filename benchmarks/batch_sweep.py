"""Batch-size sweep of the headline chain — the diagnostic for the
"batch 64+ drops" ledger entry (VERDICT r2 weak #2).

Times the w5 chain (clahe + bilateral + unsharp, 512^2) at several batch
sizes and prints per-batch ms, per-slice throughput, and the per-stage
split (CLAHE hist+LUT / apply / bilateral / unsharp tail timed as
standalone programs at each batch), so the resource that breaks at large
batches is visible rather than guessed.

Run on the real chip:  python benchmarks/batch_sweep.py [--batches 32,48,64,96]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="32,48,64,96")
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mies_tpu.kernels.bilateral import bilateral_batched
    from mies_tpu.kernels.clahe import clahe_apply_lut, tile_hists_rows_pallas
    from mies_tpu.kernels.unsharp_gauss import unsharp_quant_tpu
    from mies_tpu.ops import histogram as H
    from mies_tpu.pipeline.presets import flagship_config
    from mies_tpu.pipeline.runner import time_pipeline
    from mies_tpu.utils.profiling import time_fn

    cfg = flagship_config(name="w5-sweep")

    rng = np.random.default_rng(0)
    for b in [int(x) for x in args.batches.split(",")]:
        row: dict = {"batch": b}
        r = time_pipeline(cfg, shape=(512, 512), batch_size=b,
                          iters=args.iters)
        row["chain_ms"] = round(r["ms_per_batch"], 3)
        row["slices_per_sec"] = round(r["slices_per_sec"], 1)

        x = jnp.asarray(rng.random((b, 512, 512), dtype=np.float32))
        u8 = jnp.asarray(
            rng.integers(0, 256, (b, 512, 512)).astype(np.int32)
        )
        luts = jnp.asarray(
            rng.integers(0, 256, (b, 8, 8, 256)).astype(np.float32)
        )

        def histlut(v):
            h = tile_hists_rows_pallas(v, 8, 8).reshape(b * 64, 256)
            # the w5 chain's clip: clip_limit * tile_px / nbins =
            # 2.0 * 64*64 / 256 = 32
            h = H._clip_redistribute_opencv(h, jnp.float32(2.0 * 4096 / 256))
            cdf = jnp.cumsum(h, axis=1)
            return jnp.clip(jnp.rint(cdf * (255.0 / 4096)), 0, 255)

        row["clahe_histlut_ms"] = round(
            time_fn(jax.jit(histlut), u8, iters=args.iters)["ms_per_call"], 3
        )
        row["clahe_apply_ms"] = round(
            time_fn(
                jax.jit(lambda v, l: clahe_apply_lut(v, l, (8, 8), True)),
                u8, luts, iters=args.iters,
            )["ms_per_call"], 3,
        )
        row["bilateral_ms"] = round(
            time_fn(
                jax.jit(lambda a: bilateral_batched(a, 5, 0.1, 1.5)),
                x, iters=args.iters,
            )["ms_per_call"], 3,
        )
        row["unsharp_quant_ms"] = round(
            time_fn(
                jax.jit(lambda a: unsharp_quant_tpu(a, radius=1.5, amount=1.0)),
                x, iters=args.iters,
            )["ms_per_call"], 3,
        )
        parts = (row["clahe_histlut_ms"] + row["clahe_apply_ms"]
                 + row["bilateral_ms"] + row["unsharp_quant_ms"])
        row["parts_sum_ms"] = round(parts, 3)
        row["ms_per_slice_chain"] = round(row["chain_ms"] / b, 4)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

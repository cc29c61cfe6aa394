"""Prefix-timing diagnostic for the headline chain (w5, 512^2 b32).

The per-stage STANDALONE timings (batch_sweep.py) sum to ~2.9 ms while
the chain measures ~3.4 ms; this script attributes the gap by timing the
chain cut after each stage IN CONTEXT: jit(stages[:1]), jit(stages[:2]),
... jit(full). Successive differences include every glue pass the
standalone timings miss (level quantization, pads before Pallas calls,
LUT builds), so the delta column is the honest in-chain cost per stage.

Run on the real chip:  python benchmarks/chain_prefix.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.presets import flagship_config
    from mies_tpu.pipeline.runner import time_pipeline

    full = flagship_config(name="w5-prefix")
    rows = []
    prev = 0.0
    for n in range(1, len(full.stages) + 1):
        cfg = PipelineConfig.make(
            [(s.op, s.kwargs()) for s in full.stages[:n]],
            name=f"w5-prefix-{n}",
        )
        r = time_pipeline(cfg, shape=(512, 512), batch_size=args.batch,
                          iters=args.iters)
        ms = r["ms_per_batch"]
        rows.append({
            "stages": [s.op for s in cfg.stages],
            "chain_ms": round(ms, 3),
            "delta_ms": round(ms - prev, 3),
        })
        prev = ms
    print(json.dumps({"batch": args.batch, "prefix": rows}, indent=2))

    # the empty chain = ingest + quantize alone (the fixed floor every
    # stage shares); compile_pipeline supports an empty pipeline
    empty = PipelineConfig.make([], name="w5-prefix-0")
    r = time_pipeline(empty, shape=(512, 512), batch_size=args.batch,
                      iters=args.iters)
    print(json.dumps({"passthrough_ms": round(r["ms_per_batch"], 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

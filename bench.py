"""Headline benchmark: full CLAHE+denoise+sharpen chain, 512x512 slices.

Prints ONE JSON line:
  {"metric": "slices_per_sec_512_clahe_denoise_sharpen", "value": N,
   "unit": "slices/sec/chip", "vs_baseline": N / 5000.0}

Baseline: BASELINE.md north-star target of 5,000 512^2 slices/sec/chip on
TPU v5e (the reference publishes no numbers — SURVEY.md section 6).

Timing uses a two-point slope (long run minus short run over the
iteration delta) with a scalar-fetch completion barrier, because
block_until_ready does not actually block on tunneled TPU runtimes.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # Pallas kernels compile slowly; cache them

    from mies_tpu.pipeline.presets import flagship_config
    from mies_tpu.pipeline.runner import time_pipeline

    cfg = flagship_config()
    res = time_pipeline(cfg, shape=(512, 512), batch_size=32, iters=16, repeats=9)
    value = res["slices_per_sec"]
    line = {
        "metric": "slices_per_sec_512_clahe_denoise_sharpen",
        "value": round(value, 2),
        "unit": "slices/sec/chip",
        "vs_baseline": round(value / 5000.0, 4),
    }
    # record the headline next to the workload history so every cited
    # number is reproducible from the repo
    try:
        import os
        import time

        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "bench_history.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps({"ts": time.time(), "bench_headline": line})
                    + "\n")
    except OSError:
        pass  # read-only checkout: still print the metric
    print(json.dumps(line))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""The five BASELINE.json benchmark workloads (SURVEY.md section 6).

Run: python benchmarks/workloads.py [--quick]
Prints one JSON line per workload with slices/sec and p50 latency.
"""

from __future__ import annotations

import argparse
import json


def workload_configs():
    from mies_tpu.pipeline.config import PipelineConfig

    return {
        # 1. global hist-eq + gamma, single 512^2 X-ray
        "w1_histeq_gamma": dict(
            cfg=PipelineConfig.make(
                [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})],
                name="w1",
            ),
            shape=(512, 512), batch=1, dtype="float32",
        ),
        # 2. CLAHE 8x8 clip 2.0, batch 32
        "w2_clahe_b32": dict(
            cfg=PipelineConfig.make(
                [("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                            "convention": "opencv"})],
                name="w2",
            ),
            shape=(512, 512), batch=32, dtype="float32",
        ),
        # 3. unsharp + gaussian sigma 1.5, 1024^2 mammograms
        "w3_unsharp_gauss_1024": dict(
            cfg=PipelineConfig.make(
                [("unsharp_mask", {"radius": 1.5, "amount": 1.0}),
                 ("gaussian_blur", {"sigma": 1.5})],
                name="w3",
            ),
            shape=(1024, 1024), batch=8, dtype="float32",
        ),
        # 4. median + bilateral on int16 CT with HU windowing, batch 64
        "w4_median_bilateral_ct": dict(
            cfg=PipelineConfig.make(
                [("window_hu", {"center": 40.0, "width": 400.0}),
                 ("median_blur", {"kernel_size": 3}),
                 ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1,
                                     "sigma_space": 1.5})],
                name="w4",
            ),
            shape=(512, 512), batch=64, dtype="int16",
        ),
        # 5. full chain (the bench.py headline): clahe+denoise+sharpen
        "w5_full_chain": dict(
            cfg=PipelineConfig.make(
                [("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                            "convention": "opencv"}),
                 ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1,
                                     "sigma_space": 1.5}),
                 ("unsharp_mask", {"radius": 1.5, "amount": 1.0})],
                name="w5",
            ),
            shape=(512, 512), batch=32, dtype="float32",
        ),
    }


def run_volume_stream(quick: bool = False) -> dict:
    """BASELINE workload 5 as specified: a 512^3 int16 CT volume
    streamed slice-by-slice through the full config-driven chain —
    end-to-end wall time including host slab feed + uint8 fetch.

    NOTE on this environment: the TPU sits behind the axon network
    tunnel, so the 384 MB of host<->device traffic is tunnel-bandwidth
    bound (~35 MB/s observed -> ~46 slices/s end-to-end) while the
    device compute alone sustains >5,000 slices/s. On directly-attached
    TPUs (PCIe/DMA at GB/s) the stream is compute-bound; the reported
    number here measures the tunnel, not the framework."""
    import time

    import numpy as np

    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.runner import enhance_volume

    z = 128 if quick else 512
    cfg = PipelineConfig.make(
        [("window_hu", {"center": 40.0, "width": 400.0}),
         ("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                    "convention": "opencv"}),
         ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1,
                             "sigma_space": 1.5}),
         ("unsharp_mask", {"radius": 1.5, "amount": 1.0})],
        name="w5-volume",
    )
    rng = np.random.default_rng(0)
    vol = rng.integers(-1000, 2000, (z, 512, 512), dtype=np.int16)
    # warm the compile outside the timed region
    enhance_volume(vol[:32], cfg, slab_size=16)
    t0 = time.perf_counter()
    out = enhance_volume(vol, cfg, slab_size=16)
    dt = time.perf_counter() - t0
    assert out.shape == vol.shape and out.dtype == np.uint8
    return {
        "workload": "w5_volume_stream_512cubed" if z == 512 else f"w5_volume_stream_z{z}",
        "slices_per_sec": z / dt,
        "volume_seconds": dt,
        "shape": [z, 512, 512],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer iterations")
    ap.add_argument("--only", help="run a single workload by name")
    ap.add_argument("--volume", action="store_true",
                    help="also run the streamed 512^3 volume workload")
    args = ap.parse_args()

    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from mies_tpu.pipeline.runner import time_pipeline

    iters = 4 if args.quick else 16
    for name, w in workload_configs().items():
        if args.only and name != args.only:
            continue
        res = time_pipeline(
            w["cfg"],
            shape=w["shape"],
            batch_size=w["batch"],
            iters=iters,
            dtype=np.dtype(w["dtype"]).type,
        )
        res["workload"] = name
        print(json.dumps(res))
    if args.volume:
        print(json.dumps(run_volume_stream(quick=args.quick)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

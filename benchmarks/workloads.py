"""The five BASELINE.json benchmark workloads (SURVEY.md section 6).

Run: python benchmarks/workloads.py [--quick]
Prints one JSON line per workload with slices/sec and p50 latency.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# Script execution puts benchmarks/ (not the repo root) on sys.path;
# PYTHONPATH must stay untouched (it carries the TPU plugin's site dir).
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def workload_configs():
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.presets import flagship_config

    return {
        # 1. global hist-eq + gamma, single 512^2 X-ray. batch 1 per the
        # BASELINE definition; iters is raised so the slope signal
        # (~iters x 0.05 ms) dwarfs tunnel-RTT jitter — at the default
        # 16 iters this workload measured 2.3k-7.9k slices/s run to run
        # (VERDICT r2 weak #1).
        "w1_histeq_gamma": dict(
            cfg=PipelineConfig.make(
                [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})],
                name="w1",
            ),
            shape=(512, 512), batch=1, dtype="float32", iters=1024,
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
        # 5. full chain (the bench.py headline): clahe+denoise+sharpen —
        # the ONE flagship definition (pipeline/presets.py)
        "w5_full_chain": dict(
            cfg=flagship_config(name="w5"),
            shape=(512, 512), batch=32, dtype="float32",
        ),
        # 8. MUSICA multiscale DR chain (diffusion pre-pass + 5-level
        # pyramid power law) — the classic digital-radiography
        # processing pipeline, shifted-add VPU dataflow throughout
        "w8_musica_xray": dict(
            cfg=PipelineConfig.make(
                [("anisotropic_diffusion",
                  {"niter": 6, "kappa": 0.05, "gamma": 0.2}),
                 ("musica", {"levels": 5, "p": 0.6, "gain": 1.5})],
                name="w8",
            ),
            shape=(512, 512), batch=32, dtype="float32",
        ),
        # 9. ultrasound despeckle: SRAD (ICOV diffusion, VMEM-resident
        # kernel) + CLAHE — the speckle-imaging counterpart of w8
        "w9_srad_ultrasound": dict(
            cfg=PipelineConfig.make(
                [("srad", {"niter": 15, "dt": 0.15}),
                 ("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                            "convention": "opencv"})],
                name="w9",
            ),
            shape=(512, 512), batch=32, dtype="float32",
        ),
        # 10. low-dose CT NL-means (the ct_lowdose_nlm.yaml hot pair):
        # windowed int16 -> the production jnp symmetric-pair loop
        # (ops/restoration.py). A VMEM-resident Pallas kernel was built,
        # bit-exact, and measured 1.5x SLOWER — see docs/KERNELS.md
        # round 6 — so the pair loop IS the shipped form; this workload
        # keeps a chip number on it.
        "w10_nlm_lowdose_ct": dict(
            cfg=PipelineConfig.make(
                [("window_hu", {"center": 40.0, "width": 400.0}),
                 ("denoise_nl_means",
                  {"patch_size": 5, "patch_distance": 6,
                   "h": 0.06, "sigma": 0.04})],
                name="w10",
            ),
            shape=(512, 512), batch=32, dtype="int16", device=False,
            # device=False: at ~180 ms/batch the per-call slope already
            # dwarfs dispatch jitter (0.04-0.10 ms/call) — the fori_loop
            # figure would cost minutes for no extra honesty
        ),
        # 7. morphology: the mammo top-hat chain (ops/morphology.py —
        # XLA min/max trees; recorded so the family has a chip number
        # and a floor once measured)
        "w7_morphology_tophat": dict(
            cfg=PipelineConfig.make(
                [("median_blur", {"kernel_size": 3}),
                 ("top_hat", {"kernel_size": 7, "shape": "ellipse"}),
                 ("rescale_intensity", {"out_range": (0.0, 1.0)})],
                name="w7",
            ),
            shape=(512, 512), batch=32, dtype="float32",
        ),
    }


def run_clahe3d(quick: bool = False) -> dict:
    """Volumetric CLAHE throughput (the tile33-z fused path,
    docs/KERNELS.md round 5): opencv clahe3d on a 32x512x512 float
    volume, whole-volume jit. Reported as z-slices/s so the floors
    machinery gates it like the 2-D workloads."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mies_tpu.pipeline.compiler import compile_volume_pipeline
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.utils.profiling import time_fn

    cfg = PipelineConfig.make(
        [("clahe3d", {"clip_limit": 2.0, "grid_size": (4, 8, 8),
                      "convention": "opencv"})],
        name="w6",
    )
    z = 32
    vol = jnp.asarray(
        np.random.default_rng(0).random((z, 512, 512), dtype=np.float32)
    )
    fn = compile_volume_pipeline(cfg, quantize=False)
    t = time_fn(fn, vol, iters=8 if quick else 24)["ms_per_call"]
    return {
        "workload": "w6_clahe3d_volume",
        "ms_per_volume": t,
        "slices_per_sec": z / t * 1000.0,
        "shape": [z, 512, 512],
        "backend": jax.default_backend(),
    }


def volume_chain():
    from mies_tpu.pipeline.presets import flagship_volume_config

    return flagship_volume_config(name="w5-volume")


def run_volume_stream(quick: bool = False) -> dict:
    """BASELINE workload 5 as specified: a 512^3 int16 CT volume
    streamed DISK-to-DISK (classic .nc in, streaming .nc out, O(slab)
    host memory) through the full config-driven chain.

    Reports TWO figures (VERDICT round 1, weak #6):
      * device_slices_per_sec — the framework-attributable number: pure
        device throughput of the same chain/batch, slope-timed (no host
        I/O in the measurement);
      * end_to_end_slices_per_sec — wall time including disk decode +
        host<->device traffic. On this environment the TPU sits behind
        the axon network tunnel (~35 MB/s observed), so the end-to-end
        number measures the tunnel, not the framework; on
        directly-attached TPUs the stream is compute-bound."""
    import tempfile
    import time
    from pathlib import Path

    import numpy as np

    from mies_tpu.io.volume import save_volume
    from mies_tpu.pipeline.runner import enhance_volume_stream, time_pipeline

    import shutil

    cfg = volume_chain()
    z = 128 if quick else 512
    rng = np.random.default_rng(0)
    tmp = Path(tempfile.mkdtemp(prefix="mies_vol_"))
    try:
        src = tmp / "ct.nc"
        save_volume(
            src, rng.integers(-1000, 2000, (z, 512, 512), dtype=np.int16),
            var_name="hu",
        )

        # device-only figure first (also warms the compile cache)
        dev = time_pipeline(cfg, shape=(512, 512), batch_size=16,
                            iters=8 if quick else 16, dtype=np.int16)

        t0 = time.perf_counter()
        enhance_volume_stream(src, cfg, tmp / "enhanced.nc", slab_size=16)
        dt = time.perf_counter() - t0
    finally:
        # ~384 MB of scratch per run must not accumulate in /tmp
        shutil.rmtree(tmp, ignore_errors=True)
    return {
        "workload": "w5_volume_stream_512cubed" if z == 512 else f"w5_volume_stream_z{z}",
        "device_slices_per_sec": dev["slices_per_sec"],
        "end_to_end_slices_per_sec": z / dt,
        "volume_seconds": dt,
        "shape": [z, 512, 512],
        "io": "nc -> nc, O(slab) host memory",
    }


def run_latency(quick: bool = False) -> dict:
    """BASELINE.json metric 2: p50 per-slice latency of the 512^2
    CLAHE+denoise pipeline — a dedicated batch-1 program (no vmap),
    slope-timed per call (VERDICT round 1, missing #5)."""
    from mies_tpu.pipeline.presets import latency_config
    from mies_tpu.pipeline.runner import time_latency

    cfg = latency_config()
    res = time_latency(cfg, shape=(512, 512),
                       iters=16 if quick else 32,
                       repeats=8 if quick else 32)
    res["workload"] = "latency_b1_clahe_denoise_512"
    # device-side counterpart: same chain inside one fori_loop program —
    # its p50/p95 exclude per-call dispatch + tunnel RTT, attributing
    # any per-call p95 tail to the host path (VERDICT r2 weak #4)
    from mies_tpu.pipeline.runner import time_latency_device

    dev = time_latency_device(cfg, shape=(512, 512),
                              inner=32 if quick else 64,
                              repeats=8 if quick else 32)
    res["device_p50_ms"] = dev["p50_ms"]
    res["device_p95_ms"] = dev["p95_ms"]
    return res


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

    configs = workload_configs()
    if args.only == "w6_clahe3d_volume":
        print(json.dumps(run_clahe3d(quick=args.quick)))
        return 0
    if args.only and args.only not in configs:
        print(
            f"error: unknown workload {args.only!r}; available: "
            f"{sorted(configs) + ['w6_clahe3d_volume']}",
            file=sys.stderr,
        )
        return 2
    for name, w in configs.items():
        if args.only and name != args.only:
            continue
        w_iters = w.get("iters", 16)
        # --quick: quarter the slope length but keep n_long > n_short
        # (time_pipeline's slope divides by n_long - n_long//4)
        run_iters = max(w_iters // 4, 4) if args.quick else w_iters
        res = time_pipeline(
            w["cfg"],
            shape=w["shape"],
            batch_size=w["batch"],
            iters=run_iters,
            dtype=np.dtype(w["dtype"]).type,
        )
        if name == "w1_histeq_gamma":
            # per-call batch-1 throughput over the tunnel varies 5.0-7.9k
            # run to run (dispatch-rate jitter); also report the stable
            # DEVICE-side number (fori_loop program, no per-call
            # dispatch) — that one is floors-gated
            from mies_tpu.pipeline.runner import time_latency_device

            dev = time_latency_device(
                w["cfg"], shape=w["shape"],
                inner=32 if args.quick else 64,
                repeats=8 if args.quick else 16,
            )
            res["device_p50_ms_per_slice"] = dev["p50_ms"]
            res["device_slices_per_sec"] = 1000.0 / dev["p50_ms"]
        elif w.get("device", True):
            # batched chains get the same treatment: the per-call slope
            # is dispatch-polluted under host load (w3 recorded 7.2k-34k
            # slices/s run to run), the fori_loop figure is stable and
            # device-attributable. int16 chains re-quantize the carry
            # in-loop so the windowing ingest is measured (w4).
            from mies_tpu.pipeline.runner import time_pipeline_device

            dev = time_pipeline_device(
                w["cfg"], shape=w["shape"], batch_size=w["batch"],
                inner=4 if args.quick else 8,
                repeats=8 if args.quick else 16,
                dtype=np.dtype(w["dtype"]).type,
            )
            res["device_p50_ms_per_slice"] = dev["p50_ms_per_slice"]
            res["device_slices_per_sec"] = dev["slices_per_sec"]
        res["workload"] = name
        import jax

        res["backend"] = jax.default_backend()
        print(json.dumps(res))
    if not args.only:
        print(json.dumps(run_latency(quick=args.quick)))
        print(json.dumps(run_clahe3d(quick=args.quick)))
    if args.volume:
        print(json.dumps(run_volume_stream(quick=args.quick)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

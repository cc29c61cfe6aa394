"""Per-op chip perf census over the ENTIRE registry (VERDICT r3 item 1c).

Motivation: only the ops inside the w1-w10 workload chains had chip
numbers; this repo's own history says unmeasured ops hide 100x losses
(3-D CLAHE at 493 ms, band CLAHE at 911 ms, the 100 ms gather apply —
each found only when first measured). This harness times EVERY
config-reachable op as a one-stage pipeline at a standard shape:

* 2-D ops:  batch 32 x 512 x 512 float32 (the workload convention)
* 3-D ops:  one 32 x 256 x 256 float32 volume, whole-volume jit

and prints one JSON line per op. `--write` additionally renders
docs/OP_CENSUS.md and appends the run to benchmarks/bench_history.jsonl
(key "op_census"); the slowest ops are floor-gated in
benchmarks/floors.json as ``census_<op>`` (slices/s or volumes/s),
enforced on-chip by tests/test_perf.py::test_op_census_floor.

Timing is adaptive: each op gets a single probed call first; slow ops
(>150 ms/call) drop to a short slope (1 vs 3 calls) so the full census
stays bounded, fast ops get the standard tunnel-RTT-cancelling slope.

Run: python benchmarks/op_census.py [--write] [--only op1,op2] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SHAPE_2D = (512, 512)
BATCH_2D = 32
SHAPE_3D = (32, 256, 256)

# Canonical values for the 8 ops with required params (everything else
# runs on its registry defaults). Values chosen to exercise the real
# compute path (non-trivial warp matrices, a genuine resample ratio).
REQUIRED_PARAMS = {
    "resize": {"height": 256, "width": 256},
    "center_crop": {"height": 448, "width": 448},
    "rotate": {"angle": 15.0},
    "affine_warp": {
        "matrix": [[0.97, 0.05], [-0.03, 1.01]],
        "offset": [3.0, -2.0],
    },
    "perspective_warp": {
        "matrix": [[1.0, 0.02, 1.0], [0.01, 0.99, -2.0], [1e-5, -2e-5, 1.0]],
    },
    "resample3d": {"depth": 48, "height": 256, "width": 256},
    "window_hu": {"center": 40.0, "width": 400.0},
    # histogram_match / learned_denoise need host artifacts — built in
    # _op_params() below.
}


def _op_params(name: str, scratch: Path) -> dict:
    if name in REQUIRED_PARAMS:
        return dict(REQUIRED_PARAMS[name])
    if name == "histogram_match":
        import numpy as np
        from PIL import Image

        ref = scratch / "census_ref.png"
        if not ref.exists():
            rng = np.random.default_rng(7)
            Image.fromarray(
                rng.integers(0, 256, SHAPE_2D, dtype=np.uint8)
            ).save(ref)
        return {"reference": str(ref)}
    if name == "learned_denoise":
        ckpt = scratch / "census_dncnn"
        if not ckpt.exists():
            import jax

            from mies_tpu.models.denoiser import init_params, save_denoiser

            params = init_params(jax.random.PRNGKey(0), features=32, depth=6)
            save_denoiser(ckpt, params, features=32, depth=6, arch="dncnn")
        return {"checkpoint": str(ckpt)}
    return {}


def _time_adaptive(fn, x, quick: bool) -> float:
    """ms per call: probe once, then slope-time with a budget matched to
    the op's own cost (the 99-op sweep must not take hours on NLM-class
    ops, and fast ops need the long slope to cancel tunnel RTT)."""
    from mies_tpu.utils.profiling import device_sync, time_fn

    device_sync(fn(x))  # compile + warm
    t0 = time.perf_counter()
    device_sync(fn(x))
    probe = time.perf_counter() - t0
    if probe > 0.15:
        iters, repeats = 3, 2
    elif probe > 0.02:
        iters, repeats = 8, 3
    else:
        iters, repeats = (8, 3) if quick else (16, 5)
    ms = time_fn(fn, x, iters=iters, repeats=repeats)["ms_per_call"]
    # sub-0.1 ms ops sit below the tunnel-RTT slope's resolution and can
    # come out slightly negative — clamp and mark them, never report a
    # negative throughput
    return max(ms, 0.005)


def run_census(only: set[str] | None = None, quick: bool = False) -> list[dict]:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mies_tpu.pipeline.compiler import (
        OP_REGISTRY,
        VOLUME_ONLY_OPS,
        compile_pipeline,
        compile_volume_pipeline,
    )
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    backend = jax.default_backend()
    rng = np.random.default_rng(0)
    batch2d = jnp.asarray(
        rng.random((BATCH_2D, *SHAPE_2D), dtype=np.float32)
    )
    vol3d = jnp.asarray(rng.random(SHAPE_3D, dtype=np.float32))

    rows = []
    names = sorted(OP_REGISTRY)
    with tempfile.TemporaryDirectory(prefix="mies_census_") as td:
        scratch = Path(td)
        for name in names:
            if only is not None and name not in only:
                continue
            try:
                cfg = PipelineConfig.make(
                    [(name, _op_params(name, scratch))], name=f"census-{name}"
                )
                if name in VOLUME_ONLY_OPS:
                    fn = compile_volume_pipeline(cfg, quantize=False)
                    ms = _time_adaptive(fn, vol3d, quick)
                    row = {
                        "op": name,
                        "ms_per_call": ms,
                        "slices_per_sec": SHAPE_3D[0] / ms * 1000.0,
                        "shape": list(SHAPE_3D),
                        "kind": "3d",
                    }
                else:
                    fn = compile_pipeline(
                        cfg, batched=True, quantize=True, donate=False
                    )
                    ms = _time_adaptive(fn, batch2d, quick)
                    row = {
                        "op": name,
                        "ms_per_call": ms,
                        "slices_per_sec": BATCH_2D / ms * 1000.0,
                        "shape": [BATCH_2D, *SHAPE_2D],
                        "kind": "2d",
                    }
            except Exception as e:  # keep sweeping; the table shows the hole
                row = {"op": name, "error": f"{type(e).__name__}: {e}"}
            row["backend"] = backend
            print(json.dumps(row), flush=True)
            rows.append(row)
    return rows


def render_doc(rows: list[dict]) -> str:
    ok = [r for r in rows if "error" not in r]
    bad = [r for r in rows if "error" in r]
    for r in ok:  # clamp historical sub-resolution rows too
        if r["ms_per_call"] < 0.005:
            r["ms_per_call"] = 0.005
            r["slices_per_sec"] = (
                (r["shape"][0] if r["kind"] == "3d" else r["shape"][0])
                / 0.005 * 1000.0
            )
    ok.sort(key=lambda r: -r["ms_per_call"])
    lines = [
        "# Op perf census (generated — `python benchmarks/op_census.py --write`)",
        "",
        f"Every registry op as a one-stage chain on the chip, slowest first.",
        f"2-D ops: batch {BATCH_2D} x {SHAPE_2D[0]}^2 float32 incl. uint8",
        f"quantize tail; 3-D ops: one {'x'.join(map(str, SHAPE_3D))} volume,",
        "no quantize. Adaptive slope timing (benchmarks/op_census.py);",
        "entries at 0.005 ms are below the tunnel-RTT slope's resolution",
        "(clamped — read as 'free').",
        "The slowest ops are floor-gated as `census_<op>` in",
        "benchmarks/floors.json.",
        "",
        "| op | kind | ms/call | slices/s | backend |",
        "|---|---|---|---|---|",
    ]
    for r in ok:
        lines.append(
            f"| `{r['op']}` | {r['kind']} | {r['ms_per_call']:.2f} "
            f"| {r['slices_per_sec']:.0f} | {r['backend']} |"
        )
    if bad:
        lines += ["", "## Unmeasured", ""]
        for r in bad:
            lines.append(f"- `{r['op']}`: {r['error']}")
    return "\n".join(lines) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", help="comma-separated op subset")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--write", action="store_true",
        help="render docs/OP_CENSUS.md + append to bench_history.jsonl",
    )
    ap.add_argument(
        "--merge", action="store_true",
        help="with --only + --write: merge the re-measured rows over the "
             "last recorded census instead of rendering a partial doc "
             "(for re-timing just the ops a change touched)",
    )
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    rows = run_census(only=only, quick=args.quick)
    if args.merge:
        last = None
        with open(ROOT / "benchmarks" / "bench_history.jsonl") as f:
            for line in f:
                rec = json.loads(line)
                if "op_census" in rec:
                    last = rec["op_census"]
        if last is None:
            print("--merge: no recorded census in bench_history.jsonl",
                  file=sys.stderr)
            return 1
        merged = {r["op"]: r for r in last}
        merged.update({r["op"]: r for r in rows})
        rows = list(merged.values())
    if args.write:
        (ROOT / "docs" / "OP_CENSUS.md").write_text(render_doc(rows))
        with open(ROOT / "benchmarks" / "bench_history.jsonl", "a") as f:
            f.write(json.dumps({"ts": time.time(), "op_census": rows}) + "\n")
        print(f"wrote docs/OP_CENSUS.md ({len(rows)} ops)", file=sys.stderr)
    errs = [r["op"] for r in rows if "error" in r]
    if errs:
        print(f"unmeasured ops: {errs}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

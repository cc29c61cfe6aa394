#!/usr/bin/env python
"""One-command verification of the metric suite against real sewar.

mies_tpu/eval/metrics.py reimplements sewar 0.4.6's 12 full-reference
metrics from their documented formulas; sewar is not installable in the
build environment, so the in-repo goldens (tests/goldens/
golden_metrics.py) are transcriptions. Run this wherever
`pip install sewar==0.4.6` works:

    python tools/verify_sewar_golden.py

It evaluates every metric on deterministic image pairs with BOTH
implementations, prints a per-metric report, and writes
``tests/goldens/sewar_pin.npz`` with the real library's outputs. Once
committed, ``tests/test_metrics.py::test_sewar_pin_replay`` asserts the
suite against the pinned values in every future environment.

As of round 4, ``scc`` is the sewar-exact windowed form (the old
global-Pearson variant ships as ``scc_global``, which sewar has no
counterpart for), so every one of the 12 metrics is gated.

Exit codes: 0 = all metrics match, 2 = mismatch beyond tolerance,
3 = sewar not importable here.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

ATOL = {  # |ours - sewar| tolerances (f32 vs f64 pipelines)
    "mse": 1e-3, "rmse": 1e-4, "psnr": 1e-3, "uqi": 1e-4, "ssim": 1e-4,
    "msssim": 1e-3, "ergas": 1e-2, "rase": 1e-1, "sam": 1e-4,
    "vifp": 1e-3, "psnrb": 1e-3,
    # f32 windowed-(co)variance cancellation vs sewar's f64 on
    # 255-scale high-passed values (same bound the golden test pins)
    "scc": 5e-3,
}

METRICS = ("mse", "rmse", "psnr", "uqi", "ssim", "msssim", "ergas",
           "scc", "rase", "sam", "vifp", "psnrb")


def make_pairs() -> list[dict]:
    """Deterministic uint8 pairs (PCG64 streams are stable). Append
    only — never reorder. All pairs are >= 176 px per side (msssim's
    5-scale minimum)."""
    rng = np.random.default_rng(20260817)
    pairs = []

    base = (rng.random((192, 192)) * 255).astype(np.uint8)
    noisy = np.clip(
        base.astype(np.float64) + rng.normal(0, 12, base.shape), 0, 255
    ).astype(np.uint8)
    pairs.append(dict(name="noise12", gt=base, p=noisy))

    yy, xx = np.mgrid[0:224, 0:192]
    grad = ((yy * 255) // 224).astype(np.uint8)
    shifted = np.clip(grad.astype(np.int64) + 18, 0, 255).astype(np.uint8)
    pairs.append(dict(name="gradient_bias", gt=grad, p=shifted))

    blur_src = (rng.random((192, 192)) * 255).astype(np.uint8)
    k = np.ones((3, 3)) / 9.0
    from scipy.ndimage import convolve

    blurred = np.clip(
        convolve(blur_src.astype(np.float64), k, mode="nearest"), 0, 255
    ).astype(np.uint8)
    pairs.append(dict(name="boxblur", gt=blur_src, p=blurred))
    return pairs


def ours(name: str, gt: np.ndarray, p: np.ndarray) -> float:
    from mies_tpu.eval.metrics import evaluate

    return evaluate(gt, p, names=(name,), max_val=255.0)[name]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=str(ROOT / "tests" / "goldens" / "sewar_pin.npz")
    )
    args = ap.parse_args()
    try:
        import sewar.full_ref as sw
    except ImportError:
        print(
            "sewar is not importable here. Run this script wherever "
            "`pip install sewar==0.4.6` works; it writes the pin file "
            "the replay test verifies against forever."
        )
        return 3

    pin: dict[str, float] = {}
    failures = []
    for pair in make_pairs():
        gt, p = pair["gt"], pair["p"]
        for m in METRICS:
            fn = getattr(sw, m)
            theirs = fn(gt, p)
            if isinstance(theirs, tuple):  # ssim returns (ssim, cs)
                theirs = theirs[0]
            theirs = float(np.real(theirs))
            mine = ours(m, gt, p)
            pin[f"{pair['name']}:{m}"] = theirs
            d = abs(mine - theirs)
            ok = d <= ATOL[m] or (np.isinf(mine) and np.isinf(theirs))
            tag = "OK" if ok else "MISMATCH"
            print(f"  {pair['name']:14s} {m:7s} ours={mine:.6g} "
                  f"sewar={theirs:.6g} |d|={d:.3g}  {tag}")
            if not ok:
                failures.append(f"{pair['name']}:{m}")

    np.savez(args.out, **pin)
    print(f"pinned sewar outputs -> {args.out} (commit it; "
          f"test_sewar_pin_replay replays it)")
    if failures:
        print(f"FAIL: {failures}")
        return 2
    print("PASS: all 12 metrics match sewar within tolerance")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

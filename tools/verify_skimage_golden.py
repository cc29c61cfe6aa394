#!/usr/bin/env python
"""One-command verification of the skimage transcription goldens.

The repo's skimage CLAHE golden (tests/goldens/golden_ops.py::
equalize_adapthist_skimage, ...3d) is a faithful transcription of
scikit-image 0.26's algorithm, written in an environment where skimage
is NOT installable. Every contract except one has an independent
cross-check (cv2, PIL, scipy); the single documented assumption is the
bilinear orientation on NON-SQUARE kernels (VERDICT r2 missing #4).

Run this in ANY environment that has scikit-image (ideally 0.26):

    python tools/verify_skimage_golden.py

It compares the transcription against the real library on square and
non-square kernels, 2-D and 3-D, prints a pass/fail parity report, and
writes ``tests/goldens/skimage_pin.npz`` with the real library's
outputs. Once that file exists (commit it), the replay test
``tests/test_histogram.py::test_skimage_pin_replay`` asserts the
transcription against the pinned outputs in every future environment —
no skimage needed again.

Exit codes: 0 = all cases match, 2 = mismatch (report printed),
3 = scikit-image not importable here.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tests.goldens.golden_ops import (  # noqa: E402
    equalize_adapthist3d_skimage,
    equalize_adapthist_skimage,
)

# Deterministic across environments: PCG64 streams are versioned and
# stable, and every case derives from one seeded generator in a fixed
# order. DO NOT reorder or insert cases — append only.
ATOL = 1e-12


def make_cases() -> list[dict]:
    rng = np.random.default_rng(20260817)
    cases = []

    def img2d(shape):
        base = rng.random(shape)
        yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
        grad = (yy + xx) / (shape[0] + shape[1])
        return ((base * 0.5 + grad * 0.5)).astype(np.float64)

    cases.append(
        dict(name="2d_square_k16", img=img2d((128, 128)),
             kernel_size=(16, 16), clip_limit=0.01)
    )
    cases.append(  # THE untested assumption: non-square kernel
        dict(name="2d_nonsquare_k16x24", img=img2d((128, 192)),
             kernel_size=(16, 24), clip_limit=0.02)
    )
    cases.append(  # odd non-square kernel, non-multiple shape
        dict(name="2d_odd_k17x23", img=img2d((130, 170)),
             kernel_size=(17, 23), clip_limit=0.01)
    )
    cases.append(
        dict(name="2d_default_kernel", img=img2d((96, 144)),
             kernel_size=None, clip_limit=0.01)
    )
    vol = rng.random((48, 64, 80))
    zz = np.linspace(0, 1, 48)[:, None, None]
    cases.append(  # non-cubic 3-D kernel
        dict(name="3d_noncubic_k12x16x20", img=(vol * 0.6 + zz * 0.4),
             kernel_size=(12, 16, 20), clip_limit=0.01)
    )
    cases.append(
        dict(name="3d_cubic_k16", img=rng.random((48, 48, 48)),
             kernel_size=(16, 16, 16), clip_limit=0.02)
    )
    return cases


def transcription(case: dict) -> np.ndarray:
    fn = (
        equalize_adapthist3d_skimage
        if case["img"].ndim == 3
        else equalize_adapthist_skimage
    )
    return np.asarray(
        fn(case["img"], kernel_size=case["kernel_size"],
           clip_limit=case["clip_limit"])
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=str(ROOT / "tests" / "goldens" / "skimage_pin.npz"),
        help="where to write the pinned real-library outputs",
    )
    args = ap.parse_args()

    try:
        import skimage
        from skimage import exposure
    except ImportError:
        print(
            "scikit-image is not importable in this environment.\n"
            "Run this script wherever `pip install scikit-image==0.26.0` "
            "works; it will write the pin file to verify against forever."
        )
        return 3

    print(f"scikit-image {skimage.__version__} "
          f"(transcription targets 0.26.x)")
    cases = make_cases()
    pin: dict[str, np.ndarray] = {}
    failures = []
    for case in cases:
        ours = transcription(case)
        theirs = np.asarray(
            exposure.equalize_adapthist(
                case["img"],
                kernel_size=case["kernel_size"],
                clip_limit=case["clip_limit"],
            )
        )
        pin[case["name"]] = theirs
        d = float(np.abs(ours - theirs).max())
        ok = d <= ATOL
        print(f"  {case['name']:28s} max|diff| = {d:.3e}  "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(case["name"])

    np.savez_compressed(args.out, **pin)
    print(f"pinned real-library outputs -> {args.out} "
          f"(commit it; test_skimage_pin_replay replays it)")
    if failures:
        print(f"FAIL: {failures} — the transcription (or its documented "
              f"orientation assumption) does not match skimage")
        return 2
    print("PASS: transcription matches scikit-image on every case")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

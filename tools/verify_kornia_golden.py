#!/usr/bin/env python
"""One-command verification of the kornia transcription goldens.

The repo's kornia CLAHE golden (tests/goldens/golden_ops.py::
equalize_clahe_kornia) is a transcription of kornia 0.8.2's
``kornia.enhance.equalize_clahe`` (the reference pyproject's pinned
dep), written in an environment where kornia is NOT installable.

Run this in ANY environment that has kornia (ideally 0.8.x) + torch:

    python tools/verify_kornia_golden.py

It compares the transcription against the real library across grids,
clip limits, padded/non-divisible shapes and border tiles, prints a
pass/fail parity report, and writes ``tests/goldens/kornia_pin.npz``
with the real library's outputs. Once that file exists (commit it), the
replay test ``tests/test_clahe.py::test_kornia_pin_replay`` asserts the
transcription against the pinned outputs in every future environment —
no kornia needed again.

Exit codes: 0 = all cases match, 2 = mismatch (report printed),
3 = kornia not importable here.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tests.goldens.golden_ops import equalize_clahe_kornia  # noqa: E402

# float32 blend of <=255-scale values: a few ULPs
ATOL = 1e-4

# Deterministic across environments (PCG64 stream, fixed order).
# DO NOT reorder or insert cases — append only.


def make_cases() -> list[dict]:
    rng = np.random.default_rng(20260819)
    cases = []

    def img(shape):
        base = rng.random(shape)
        yy, xx = np.mgrid[0: shape[0], 0: shape[1]]
        grad = (yy + xx) / (shape[0] + shape[1])
        out = (base * 0.5 + grad * 0.5).astype(np.float32)
        out.flat[::17] = 1.0  # exercise the x == max histc bin
        out.flat[::23] = 0.0
        return out

    cases.append(dict(name="defaults_512", img=img((128, 128)),
                      clip_limit=40.0, grid_size=(8, 8)))
    cases.append(dict(name="nondivisible_67x53", img=img((67, 53)),
                      clip_limit=40.0, grid_size=(4, 4)))
    cases.append(dict(name="low_clip", img=img((96, 128)),
                      clip_limit=2.0, grid_size=(8, 8)))
    cases.append(dict(name="no_clip", img=img((64, 64)),
                      clip_limit=0.0, grid_size=(4, 4)))
    cases.append(dict(name="grid_1x1", img=img((40, 40)),
                      clip_limit=40.0, grid_size=(1, 1)))
    cases.append(dict(name="odd_grid_3x5", img=img((66, 100)),
                      clip_limit=10.0, grid_size=(3, 5)))
    cases.append(dict(name="odd_tiles_33x35", img=img((33, 35)),
                      clip_limit=40.0, grid_size=(3, 5)))
    return cases


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--out", default=str(ROOT / "tests" / "goldens" / "kornia_pin.npz"),
        help="where to write the pinned real-library outputs",
    )
    args = ap.parse_args()

    try:
        import torch
        import kornia
    except ImportError:
        print(
            "kornia is not importable in this environment.\n"
            "Run this script wherever `pip install kornia==0.8.2` works; "
            "it will write the pin file to verify against forever."
        )
        return 3

    print(f"kornia {kornia.__version__} (transcription targets 0.8.2)")
    cases = make_cases()
    pin: dict[str, np.ndarray] = {}
    failures = []
    for case in cases:
        ours = equalize_clahe_kornia(
            case["img"], clip_limit=case["clip_limit"],
            grid_size=case["grid_size"],
        )
        theirs = (
            kornia.enhance.equalize_clahe(
                torch.from_numpy(case["img"])[None, None],
                clip_limit=float(case["clip_limit"]),
                grid_size=tuple(case["grid_size"]),
            )[0, 0]
            .numpy()
        )
        pin[case["name"]] = theirs
        d = float(np.abs(ours - theirs).max())
        ok = d <= case.get("atol", ATOL)
        print(f"  {case['name']:24s} max|diff| = {d:.3e}  "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok:
            failures.append(case["name"])

    np.savez_compressed(args.out, **pin)
    print(f"pinned real-library outputs -> {args.out} "
          f"(commit it; test_kornia_pin_replay replays it)")
    if failures:
        print(f"FAIL: {failures} — the transcription does not match kornia")
        return 2
    print("PASS: transcription matches kornia on every case")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

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
    denoise_nl_means,
    denoise_tv_chambolle,
    denoise_wavelet,
    equalize_adapthist3d_skimage,
    equalize_adapthist_skimage,
    estimate_sigma,
    frangi_vesselness,
    hessian_ridge,
    meijering_neuriteness,
    richardson_lucy,
    rolling_ball,
    sato_tubeness,
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

    # --- restoration transcriptions (appended round 5) ------------------
    # NL-means weight cutoff (distance <= 5.0) is a knife edge: f64
    # summation-order differences between the transcription's direct
    # patch sums and skimage's integral images are ~1e-12, so a distance
    # within ~1e-9 of 5.0 could flip one exp(-5) weight. The authoring
    # run measured min |distance - 5.0| >= 1.5e-6 across these exact
    # cases (see _nlm_cutoff_margin) — decision-stable by ~6 orders of
    # magnitude.
    noisy = np.clip(
        img2d((56, 64)) * 0.6 + rng.normal(0, 0.05, (56, 64)) + 0.2, 0, 1
    )
    cases.append(
        dict(name="nlm_2d_s5_d4", op="nl_means", img=noisy,
             patch_size=5, patch_distance=4, h=0.08, sigma=0.02,
             atol=1e-9)
    )
    cases.append(
        dict(name="nlm_2d_even_s4", op="nl_means", img=noisy,
             patch_size=4, patch_distance=3, h=0.1, sigma=0.0,
             atol=1e-9)
    )
    noisy3 = np.clip(
        rng.random((12, 24, 26)) * 0.5 + 0.25
        + rng.normal(0, 0.04, (12, 24, 26)), 0, 1
    )
    cases.append(
        dict(name="nlm_3d_s3_d2", op="nl_means", img=noisy3,
             patch_size=3, patch_distance=2, h=0.1, sigma=0.0,
             atol=1e-9)
    )
    # TV: eps=0 pins the iteration count (the convergence test is a
    # global-energy knife edge); one converged case with a loose atol.
    cases.append(
        dict(name="tv_2d_fixed40", op="tv", img=noisy, weight=0.12,
             eps=0.0, max_num_iter=40, atol=1e-10)
    )
    cases.append(
        dict(name="tv_2d_converged", op="tv", img=noisy, weight=0.1,
             eps=2e-4, max_num_iter=200, atol=1e-6)
    )
    cases.append(
        dict(name="tv_3d_fixed25", op="tv", img=noisy3, weight=0.1,
             eps=0.0, max_num_iter=25, atol=1e-10)
    )
    # Richardson-Lucy: Gaussian PSF, no filter_epsilon (its conv < eps
    # compare is another knife edge; the branch is a one-line np.where).
    g = np.exp(-0.5 * (np.arange(-3, 4) / 1.5) ** 2)
    g /= g.sum()
    psf = np.outer(g, g)
    cases.append(
        dict(name="rl_2d_iter15", op="rl", img=noisy, psf=psf,
             num_iter=15, atol=1e-9)
    )
    # --- wavelet shrinkage transcriptions (appended round 5) ------------
    # denoise_wavelet has no knife edges for soft/Bayes (thresholds are
    # smooth in the coefficients); 'hard' thresholding compares |c| > t,
    # so one pinned-sigma hard case keeps the decision deterministic.
    cases.append(
        dict(name="wavelet_2d_bayes_default", op="wavelet", img=noisy,
             sigma=None, wavelet="db1", mode="soft",
             wavelet_levels=None, method="BayesShrink", atol=1e-10)
    )
    cases.append(
        dict(name="wavelet_2d_visu_db2", op="wavelet", img=noisy,
             sigma=None, wavelet="db2", mode="soft",
             wavelet_levels=3, method="VisuShrink", atol=1e-10)
    )
    cases.append(
        dict(name="wavelet_2d_hard_sigma", op="wavelet", img=noisy,
             sigma=0.05, wavelet="sym4", mode="hard",
             wavelet_levels=2, method="VisuShrink", atol=1e-10)
    )
    cases.append(
        dict(name="wavelet_3d_bayes", op="wavelet", img=noisy3,
             sigma=None, wavelet="db1", mode="soft",
             wavelet_levels=1, method="BayesShrink", atol=1e-10)
    )
    cases.append(
        dict(name="estimate_sigma_2d", op="sigma", img=noisy,
             wavelet="db2", atol=1e-12)
    )
    # --- ridge family + rolling-ball (appended round 7; VERDICT r3
    # item 5). These transcriptions are PAPER-faithful by design — the
    # op docstrings explicitly do NOT claim skimage parity (skimage's
    # internal Hessian discretization/eigen handling differs), so the
    # cases are gate=False: the run PINS skimage's outputs and reports
    # the divergence magnitude instead of failing on it. A future
    # tightening starts from these recorded numbers.
    ridge_img = np.clip(
        img2d((72, 88)) * 0.3
        + np.exp(-((np.mgrid[0:72, 0:88][0] - 36) ** 2) / 18.0) * 0.7,
        0, 1,
    )
    cases.append(dict(name="frangi_2d", op="frangi", img=ridge_img,
                      sigmas=(1.0, 2.0, 4.0), gate=False))
    cases.append(dict(name="sato_2d", op="sato", img=ridge_img,
                      sigmas=(1.0, 2.0, 4.0), gate=False))
    cases.append(dict(name="meijering_2d", op="meijering", img=ridge_img,
                      sigmas=(1.0, 2.0), gate=False))
    cases.append(dict(name="hessian_2d", op="hessian", img=ridge_img,
                      sigmas=(1.0, 3.0, 5.0), gate=False))
    cases.append(dict(name="rolling_ball_r10", op="rolling_ball",
                      img=img2d((64, 72)).astype(np.float32), radius=10.0,
                      gate=False))
    return cases


def _nlm_cutoff_margin(case: dict) -> float:
    """Smallest |distance - 5.0| over every pixel and shift of an
    nl_means case — decision stability proof for the pin comparison."""
    import itertools

    u = np.asarray(case["img"], np.float64)
    nd = u.ndim
    s = case["patch_size"] + (1 - case["patch_size"] % 2)
    offset, d = s // 2, case["patch_distance"]
    up = np.pad(u, offset + d, mode="reflect")
    sn = float(s) ** nd
    ext = tuple(n + 2 * offset for n in u.shape)
    base = up[tuple(slice(d, d + e) for e in ext)]
    from tests.goldens.golden_ops import _nlm_patch_sum

    margin = np.inf
    for t in itertools.product(range(-d, d + 1), repeat=nd):
        shifted = up[
            tuple(slice(d + ti, d + ti + e) for ti, e in zip(t, ext))
        ]
        ssd = _nlm_patch_sum((base - shifted) ** 2, s, nd)
        dist = np.maximum(
            ssd - 2.0 * case["sigma"] ** 2 * sn, 0.0
        ) / (case["h"] ** 2 * sn)
        margin = min(margin, float(np.abs(dist - 5.0).min()))
    return margin


def transcription(case: dict) -> np.ndarray:
    op = case.get("op", "adapthist")
    if op == "nl_means":
        return np.asarray(
            denoise_nl_means(
                case["img"], patch_size=case["patch_size"],
                patch_distance=case["patch_distance"], h=case["h"],
                sigma=case["sigma"],
            )
        )
    if op == "tv":
        return np.asarray(
            denoise_tv_chambolle(
                case["img"], weight=case["weight"], eps=case["eps"],
                max_num_iter=case["max_num_iter"],
            )
        )
    if op == "rl":
        return np.asarray(
            richardson_lucy(
                case["img"], case["psf"], num_iter=case["num_iter"]
            )
        )
    if op == "wavelet":
        return np.asarray(
            denoise_wavelet(
                case["img"], sigma=case["sigma"], wavelet=case["wavelet"],
                mode=case["mode"], wavelet_levels=case["wavelet_levels"],
                method=case["method"],
            )
        )
    if op == "sigma":
        return np.asarray(
            estimate_sigma(case["img"], wavelet=case["wavelet"])
        )
    if op == "frangi":
        return np.asarray(
            frangi_vesselness(case["img"], sigmas=case["sigmas"])
        )
    if op == "sato":
        return np.asarray(
            sato_tubeness(case["img"], sigmas=case["sigmas"])
        )
    if op == "meijering":
        return np.asarray(
            meijering_neuriteness(case["img"], sigmas=case["sigmas"])
        )
    if op == "hessian":
        return np.asarray(
            hessian_ridge(case["img"], sigmas=case["sigmas"])
        )
    if op == "rolling_ball":
        return np.asarray(rolling_ball(case["img"], radius=case["radius"]))
    fn = (
        equalize_adapthist3d_skimage
        if case["img"].ndim == 3
        else equalize_adapthist_skimage
    )
    return np.asarray(
        fn(case["img"], kernel_size=case["kernel_size"],
           clip_limit=case["clip_limit"])
    )


def _library_output(case: dict):
    """The real scikit-image call for a case (import deferred)."""
    from skimage import exposure, restoration

    op = case.get("op", "adapthist")
    if op == "nl_means":
        return restoration.denoise_nl_means(
            case["img"], patch_size=case["patch_size"],
            patch_distance=case["patch_distance"], h=case["h"],
            sigma=case["sigma"], fast_mode=True,
        )
    if op == "tv":
        return restoration.denoise_tv_chambolle(
            case["img"], weight=case["weight"], eps=case["eps"],
            max_num_iter=case["max_num_iter"],
        )
    if op == "rl":
        return restoration.richardson_lucy(
            case["img"], case["psf"], num_iter=case["num_iter"]
        )
    if op == "wavelet":
        return restoration.denoise_wavelet(
            case["img"], sigma=case["sigma"], wavelet=case["wavelet"],
            mode=case["mode"], wavelet_levels=case["wavelet_levels"],
            method=case["method"], rescale_sigma=True,
        )
    if op == "sigma":
        return np.asarray(
            restoration.estimate_sigma(case["img"])
        )
    if op in ("frangi", "sato", "meijering", "hessian"):
        from skimage import filters

        fn = getattr(filters, op)
        return fn(case["img"], sigmas=case["sigmas"], black_ridges=True)
    if op == "rolling_ball":
        return restoration.rolling_ball(case["img"], radius=case["radius"])
    return exposure.equalize_adapthist(
        case["img"], kernel_size=case["kernel_size"],
        clip_limit=case["clip_limit"],
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
        from skimage import exposure, restoration  # noqa: F401
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
        theirs = np.asarray(_library_output(case))
        pin[case["name"]] = theirs
        d = float(np.abs(ours - theirs).max())
        if not case.get("gate", True):
            print(f"  {case['name']:28s} max|diff| = {d:.3e}  RECORDED "
                  f"(parity not claimed — pinned for future tightening)")
            continue
        ok = d <= case.get("atol", ATOL)
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

"""Render the op registry into docs/OPS.md (one table per category).

The committed doc is generated — run this after adding an op;
tests/test_aux.py::test_ops_doc_in_sync fails CI when it drifts.
Usage: python tools/gen_ops_doc.py [--check]
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

_CATEGORIES = (
    ("Intensity", (
        "adjust_gamma", "adjust_log", "adjust_sigmoid", "invert",
        "normalize", "rescale_intensity", "window_hu",
        "adjust_brightness", "adjust_contrast", "solarize", "posterize",
        "sharpness", "normalize_meanstd", "denormalize_meanstd",
    )),
    ("Histogram", (
        "equalize_hist", "equalize", "clahe", "histogram_match",
    )),
    ("Filters", (
        "gaussian_blur", "box_blur", "unsharp_mask", "median_blur",
        "bilateral_blur", "denoise_bilateral", "guided_blur",
        "sobel_edges", "laplacian_sharpen",
        "difference_of_gaussians", "gabor", "gabor_bank", "motion_blur",
        "retinex", "lee_filter", "kuwahara",
    )),
    ("Feature / edges", (
        "canny", "laplace", "prewitt_edges", "roberts_edges",
        "scharr_edges", "farid_edges",
    )),
    ("Restoration", (
        "denoise_nl_means", "denoise_tv", "richardson_lucy", "wiener",
        "denoise_wavelet", "cycle_spin", "anisotropic_diffusion", "srad",
    )),
    ("Multiscale (Laplacian pyramid)", (
        "musica",
    )),
    ("Frequency domain (FFT)", (
        "butterworth", "homomorphic",
    )),
    ("Ridge / vesselness", (
        "frangi", "vessel_enhance", "sato", "meijering", "hessian",
    )),
    ("Morphology", (
        "erode", "dilate", "morph_open", "morph_close", "morph_gradient",
        "top_hat", "black_hat",
        "subtract_background",
    )),
    ("Geometry", (
        "resize", "center_crop", "flip", "rot90", "rotate", "affine_warp",
        "perspective_warp",
    )),
    ("Learned", ("learned_denoise",)),
    ("Volumetric (3-D, [Z,H,W] chains)", (
        "clahe3d", "gaussian_blur3d", "guided_blur3d", "median_blur3d",
        "unsharp_mask3d", "erode3d", "dilate3d", "morph_open3d",
        "morph_close3d", "morph_gradient3d", "top_hat3d", "black_hat3d",
        "resample3d", "denoise_nl_means3d", "denoise_tv3d", "frangi3d",
        "denoise_wavelet3d", "anisotropic_diffusion3d", "srad3d",
        "vessel_enhance3d", "sato3d", "meijering3d", "hessian3d",
        "difference_of_gaussians3d", "butterworth3d", "homomorphic3d",
        "wiener3d",
    )),
)


def render() -> str:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mies_tpu.cli import _ops_listing

    ops = _ops_listing()
    lines = [
        "# Op reference (generated — `python tools/gen_ops_doc.py`)",
        "",
        "Every op a `pipeline:` stage can name, with parameters, defaults,",
        "and load-time constraints. Machine-readable form:",
        "`python -m mies_tpu.cli ops`. Semantics sources (cv2 / skimage /",
        "PIL / kornia / scipy conventions) are documented in each op's",
        "docstring and pinned by the golden tests.",
        "",
    ]
    listed = set()
    for title, names in _CATEGORIES:
        lines += [f"## {title}", "", "| op | param | default | expects |",
                  "|---|---|---|---|"]
        for name in names:
            if name not in ops:
                raise SystemExit(f"category table lists unknown op {name!r}")
            listed.add(name)
            params = ops[name]
            if not params:
                lines.append(f"| `{name}` | — | — | — |")
                continue
            first = True
            for p, info in params.items():
                cell = f"`{name}`" if first else ""
                first = False
                d = info.get("default", "required")
                lines.append(
                    f"| {cell} | `{p}` | `{d}` | {info.get('expects', '')} |"
                )
        lines.append("")
    missing = set(ops) - listed
    if missing:
        raise SystemExit(
            f"ops missing from the category tables: {sorted(missing)} — "
            f"add them to _CATEGORIES in tools/gen_ops_doc.py"
        )
    return "\n".join(lines) + "\n"


def main() -> int:
    out = ROOT / "docs" / "OPS.md"
    text = render()
    if "--check" in sys.argv:
        if not out.exists() or out.read_text() != text:
            print("docs/OPS.md is stale — run python tools/gen_ops_doc.py")
            return 1
        print("docs/OPS.md in sync")
        return 0
    out.write_text(text)
    print(f"wrote {out} ({len(text.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Visual + structured reports (SURVEY.md section 5.5).

Covers the reference's matplotlib role (section 2b D10): before/after
panels with histograms, plus a machine-readable JSON run report
{config hash, per-stage timings, quality metrics}.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def save_comparison_report(
    original: np.ndarray,
    enhanced: np.ndarray,
    path: str | Path,
    title: str = "enhancement report",
    metrics: dict | None = None,
) -> None:
    """Side-by-side panels + intensity histograms -> one PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def display_form(img):
        """uint8 -> (img, 0..255); float -> (img, 0..1); signed ints
        (raw HU) -> percentile-windowed [0, 1] so the panel shows
        anatomy instead of clipping everything to white."""
        img = np.asarray(img)
        if img.dtype == np.uint8:
            return img, (0, 255)
        if np.issubdtype(img.dtype, np.signedinteger):
            lo, hi = np.percentile(img, (1.0, 99.0))
            img = np.clip(
                (img.astype(np.float32) - lo) / max(hi - lo, 1e-6), 0.0, 1.0
            )
        return img, (0.0, 1.0)

    fig, axes = plt.subplots(2, 2, figsize=(10, 9))
    for ax, img, name in (
        (axes[0, 0], original, "original"),
        (axes[0, 1], enhanced, "enhanced"),
    ):
        disp, rng = display_form(img)
        ax.imshow(disp, cmap="gray", vmin=rng[0], vmax=rng[1])
        ax.set_title(name)
        ax.axis("off")
    for ax, img, name in (
        (axes[1, 0], original, "original histogram"),
        (axes[1, 1], enhanced, "enhanced histogram"),
    ):
        disp, rng = display_form(img)
        ax.hist(disp.ravel(), bins=64, range=rng, color="#444")
        ax.set_title(name)
    sup = title
    if metrics:
        sup += "  |  " + "  ".join(f"{k}={v:.4g}" for k, v in metrics.items())
    fig.suptitle(sup)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def write_run_report(
    path: str | Path,
    cfg,
    metrics: dict | None = None,
    timings: dict | None = None,
    extra: dict | None = None,
) -> dict:
    """Structured JSON run report; returns the dict it wrote."""
    def finite(v):
        """inf/nan values anywhere in the record (psnr on identical
        images is inf by design; XLA cost analysis reports nan for some
        stages) serialize as strings — bare Infinity/NaN is not valid
        RFC-8259 JSON and strict parsers reject the report."""
        if isinstance(v, dict):
            return {k: finite(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [finite(x) for x in v]
        if isinstance(v, float) and not np.isfinite(v):
            return str(v)
        return v

    rec = finite({
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "config_name": cfg.name,
        "config_hash": cfg.cache_key(),
        "config": cfg.to_dict(),
        "metrics": metrics or {},
        "timings": timings or {},
        **(extra or {}),
    })
    Path(path).write_text(json.dumps(rec, indent=2, allow_nan=False) + "\n")
    return rec

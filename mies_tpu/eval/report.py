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

    fig, axes = plt.subplots(2, 2, figsize=(10, 9))
    for ax, img, name in (
        (axes[0, 0], original, "original"),
        (axes[0, 1], enhanced, "enhanced"),
    ):
        ax.imshow(img, cmap="gray", vmin=0, vmax=255 if img.dtype == np.uint8 else 1.0)
        ax.set_title(name)
        ax.axis("off")
    for ax, img, name in (
        (axes[1, 0], original, "original histogram"),
        (axes[1, 1], enhanced, "enhanced histogram"),
    ):
        flat = img.ravel()
        rng = (0, 255) if img.dtype == np.uint8 else (0.0, 1.0)
        ax.hist(flat, bins=64, range=rng, color="#444")
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
    rec = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "config_name": cfg.name,
        "config_hash": cfg.cache_key(),
        "config": cfg.to_dict(),
        "metrics": metrics or {},
        "timings": timings or {},
        **(extra or {}),
    }
    Path(path).write_text(json.dumps(rec, indent=2) + "\n")
    return rec

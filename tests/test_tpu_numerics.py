"""TPU <-> CPU cross-backend numerics gate (real chip; skips without one).

The correctness suite runs on fake CPU devices (conftest pins the cpu
backend) and can NEVER see TPU-only numeric bugs — round 3 found the
fraction convention off by half a uint8 level on hardware while every
CPU test was green (XLA:TPU's bf16-propagation pass zeroed an XLA-side
hi/lo split). This test subprocesses tests/tpu_consistency_driver.py,
which evaluates every documented numeric contract on the chip AND on
the in-process CPU backend, and asserts the recorded tolerances.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("MIES_TPU_PERF", "1") == "0",
    reason="chip-only tests disabled via MIES_TPU_PERF=0",
)


@pytest.fixture(scope="module")
def consistency():
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    try:
        out = subprocess.run(
            [sys.executable, str(ROOT / "tests" / "tpu_consistency_driver.py")],
            capture_output=True, text=True, timeout=2400, env=env, cwd=ROOT,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU consistency run timed out (cold compile or no chip)")
    rows = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    if not rows or "error" in rows[-1]:
        pytest.skip(f"TPU unavailable: {out.stderr.strip()[-300:]}")
    return rows[-1]


def _case(consistency, name):
    case = consistency["cases"].get(name)
    if case is None or "skipped" in case:
        pytest.skip(f"case {name} not reported")
    assert case["ok"], f"{name} violated its numeric contract: {case}"


def test_clahe_opencv_bit_exact_vs_cv2(consistency):
    _case(consistency, "clahe_opencv_vs_cv2")


def test_clahe_opencv_tw96_rows_gate(consistency):
    """Regression gate for the rows-layout kernel gates: tw=96 must take
    the 128-aligned layout and stay bit-exact vs cv2 (ADVICE r2 high)."""
    _case(consistency, "clahe_opencv_tw96_vs_cv2")


def test_equalize_hist_batched_backend_consistency(consistency):
    """The nibble-selection batched equalize paths (round 4) match the
    per-image CPU reference — the selection exactness claim asserted on
    real hardware, not just fake devices."""
    _case(consistency, "equalize_hist_batched_vs_cpu")


def test_equalize_batched_bit_exact(consistency):
    _case(consistency, "equalize_batched_vs_cpu")


def test_clahe_fraction_lo_half_alive(consistency):
    """Regression gate for the bf16-propagation lo-half bug."""
    _case(consistency, "clahe_fraction_vs_cpu")


def test_clahe_skimage_fast_path(consistency):
    _case(consistency, "clahe_skimage_vs_cpu")


def test_bilateral_pair_reorder_ulps(consistency):
    _case(consistency, "bilateral_vs_cpu")


def test_unsharp_quant_tail(consistency):
    _case(consistency, "unsharp_quant_vs_cpu")


def test_chain_uint8(consistency):
    _case(consistency, "chain_uint8_vs_cpu")


def test_clahe3d_opencv(consistency):
    _case(consistency, "clahe3d_opencv_vs_cpu")


def test_sharded_clahe_levels(consistency):
    _case(consistency, "sharded_clahe_vs_unsharded")


def test_clahe3d_skimage(consistency):
    _case(consistency, "clahe3d_skimage_vs_cpu")


def test_zsharded_clahe3d_levels(consistency):
    _case(consistency, "zsharded_clahe3d_vs_unsharded")


def test_clahe3d_tile33z_fast_path(consistency):
    _case(consistency, "clahe3d_opencv_t33z_vs_cpu")


def test_morphology_bit_exact_vs_cv2(consistency):
    _case(consistency, "morphology_vs_cv2")


def test_nl_means_backend_consistency(consistency):
    """First hardware check for the outage-written NL-means core."""
    _case(consistency, "nl_means_vs_cpu")


def test_nlm_dot_kernel_dispatch_consistency(consistency):
    """Round-5 dot-box kernel at the registry defaults (d=11) — the
    DISPATCHED path vs the CPU jnp twin, atol 1e-4 (MXU reduction
    order; the TV-kernel stance)."""
    _case(consistency, "nlm_dot_kernel_dispatch_vs_cpu")


def test_denoise_tv_backend_consistency(consistency):
    _case(consistency, "denoise_tv_vs_cpu")


def test_richardson_lucy_backend_consistency(consistency):
    _case(consistency, "richardson_lucy_vs_cpu")


def test_frangi_backend_consistency(consistency):
    _case(consistency, "frangi_vs_cpu")


def test_morphology_vanherk_bit_exact_vs_cv2(consistency):
    """Van Herk doubling (rect k=21) and row-span (ellipse k=15) large-
    kernel paths must stay bit-exact vs cv2 on the chip."""
    _case(consistency, "morphology_vanherk_vs_cv2")


def test_butterworth_fft_backend_consistency(consistency):
    """XLA:TPU's matmul-backed f32 FFT vs the CPU backend's — drift
    gated at FFT-roundoff scale (5e-5)."""
    _case(consistency, "butterworth_vs_cpu")


def test_canny_backend_consistency(consistency):
    """Canny's discrete NMS compares + hysteresis flood fill: numeric
    drift flips whole pixels, so the gate is a mismatch-rate bound."""
    _case(consistency, "canny_vs_cpu")


def test_anisotropic_diffusion_backend_consistency(consistency):
    """Perona-Malik is pure fused elementwise f32 — TPU drift vs CPU
    stays at accumulation-roundoff scale over 12 iterations."""
    _case(consistency, "anisotropic_diffusion_vs_cpu")


def test_musica_backend_consistency(consistency):
    """The Laplacian pyramid (shifted-add Burt filters) + power law
    match CPU within f32 roundoff on the chip — no bf16 demotion in
    the pow/sign path."""
    _case(consistency, "musica_vs_cpu")


def test_rolling_ball_backend_consistency(consistency):
    """Non-flat ball morphology is a min/max tree — bit-exact across
    backends like the flat morphology contracts."""
    _case(consistency, "rolling_ball_vs_cpu")


def test_lee_filter_backend_consistency(consistency):
    _case(consistency, "lee_filter_vs_cpu")


def test_kuwahara_backend_consistency(consistency):
    """Quadrant-select ties can flip on FMA ULPs — gated as a
    mismatch-rate + bounded-jump contract (the canny pattern)."""
    _case(consistency, "kuwahara_vs_cpu")


def test_retinex_backend_consistency(consistency):
    _case(consistency, "retinex_vs_cpu")


def test_srad_backend_consistency(consistency):
    _case(consistency, "srad_vs_cpu")


def test_pm_kernel_dispatch_consistency(consistency):
    """The batched entry w8 runs — the Pallas kernel on TPU — vs the
    CPU jnp fallback (review finding: the op-level case never compiles
    the kernel)."""
    _case(consistency, "pm_kernel_dispatch_vs_cpu")


def test_srad_kernel_dispatch_consistency(consistency):
    _case(consistency, "srad_kernel_dispatch_vs_cpu")


def test_tv_kernel_dispatch_consistency(consistency):
    """denoise_tv's batched entry — the VMEM-resident while_loop
    kernel on TPU (kernels/tv.py, 11.3x) — vs the CPU jnp fallback.
    Looser bound than PM/SRAD: the in-kernel energy sums ULP-drift vs
    XLA's reduction tree, which can shift the early stop."""
    _case(consistency, "tv_kernel_dispatch_vs_cpu")

"""JAX metric suite vs independent NumPy/scipy goldens (SURVEY.md section 3.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mies_tpu.eval import metrics as M
from tests.goldens import golden_metrics as G


@pytest.fixture(scope="module")
def pair(request):
    rng = np.random.default_rng(3)
    # 192 >= 176 so msssim's coarsest scale still fits its 11x11 window
    gt = (rng.random((192, 192)) * 255).astype(np.float32)
    # correlated distortion: blur + noise (realistic enhance/degrade pair)
    from scipy import ndimage

    p = ndimage.gaussian_filter(gt, 1.2) + rng.normal(0, 6, gt.shape)
    return gt, np.clip(p, 0, 255).astype(np.float32)


PAIRS = [
    ("mse", {}, 1e-3),
    ("rmse", {}, 1e-4),
    ("psnr", {}, 1e-4),
    ("uqi", {}, 1e-4),
    ("ssim", {}, 1e-4),
    ("msssim", {}, 1e-3),
    ("ergas", {}, 1e-2),
    # scc: f32 windowed (co)variance cancellation vs the f64 golden
    # on 255-scale high-passed values bounds at ~2e-3
    ("scc", {}, 5e-3),
    ("scc_global", {}, 1e-4),
    ("rase", {}, 1e-2),
    ("sam", {}, 1e-4),
    ("vifp", {}, 1e-3),
    ("psnrb", {}, 1e-4),
]


@pytest.mark.parametrize("name,kw,tol", PAIRS)
def test_metric_matches_golden(pair, name, kw, tol):
    gt, p = pair
    ours = float(getattr(M, name)(jnp.asarray(gt), jnp.asarray(p), **kw))
    ref = getattr(G, name)(gt, p, **kw)
    assert ours == pytest.approx(ref, rel=tol, abs=tol), (name, ours, ref)


def test_identity_extremes(pair):
    gt, _ = pair
    g = jnp.asarray(gt)
    assert float(M.mse(g, g)) == 0.0
    assert np.isinf(float(M.psnr(g, g)))
    assert float(M.ssim(g, g)) == pytest.approx(1.0, abs=1e-6)
    assert float(M.uqi(g, g)) == pytest.approx(1.0, abs=1e-6)
    assert float(M.sam(g, g)) == pytest.approx(0.0, abs=1e-3)
    assert float(M.scc(g, g)) == pytest.approx(1.0, abs=1e-6)


def test_multiband_sam_ergas():
    rng = np.random.default_rng(5)
    gt = rng.random((3, 64, 64)).astype(np.float32) * 255
    p = gt + rng.normal(0, 5, gt.shape).astype(np.float32)
    assert float(M.sam(jnp.asarray(gt), jnp.asarray(p))) == pytest.approx(
        G.sam(gt, p), abs=1e-4
    )
    assert float(M.ergas(jnp.asarray(gt), jnp.asarray(p))) == pytest.approx(
        G.ergas(gt, p), rel=1e-3
    )


def test_evaluate_entry_point(pair):
    gt, p = pair
    out = M.evaluate(gt, p, names=("psnr", "ssim", "uqi", "rmse"))
    assert set(out) == {"psnr", "ssim", "uqi", "rmse"}
    assert all(isinstance(v, float) for v in out.values())
    assert out["psnr"] == pytest.approx(G.psnr(gt, p), rel=1e-4)


def test_psnrb_penalizes_blocking(pair):
    gt, _ = pair
    # synthesize blocky image: quantize 8x8 blocks to their mean
    n = gt.shape[0] // 8
    b = gt.reshape(n, 8, n, 8).mean(axis=(1, 3), keepdims=True)
    blocky = np.broadcast_to(b, (n, 8, n, 8)).reshape(gt.shape).astype(np.float32)
    p_b = float(M.psnrb(jnp.asarray(gt), jnp.asarray(blocky)))
    p_plain = float(M.psnr(jnp.asarray(gt), jnp.asarray(blocky)))
    assert p_b < p_plain  # BEF must subtract from PSNR for blocky output


def test_evaluate_all_twelve_metrics(pair):
    """The full sewar surface (12 names) + the scc_global extra through
    the single-program entry point."""
    gt, p = pair
    names = tuple(M.METRIC_REGISTRY)
    out = M.evaluate(gt, p, names=names)
    assert set(out) == set(names) and len(names) == 13  # 12 sewar + scc_global
    for k, v in out.items():
        assert np.isfinite(v), (k, v)


def test_evaluate_volume_per_slice(pair):
    gt, p = pair
    vol_gt = np.stack([gt, p]).astype(np.float32)  # slice 0 identical, 1 not
    vol_p = np.stack([gt, gt]).astype(np.float32)
    out = M.evaluate_volume(vol_gt, vol_p, names=("psnr", "rmse"))
    assert np.isinf(out["per_slice"]["psnr"][0])  # identical slice
    assert out["per_slice"]["rmse"][1] > 0
    assert set(out["mean"]) == {"psnr", "rmse"}


def test_sewar_pin_replay():
    """Replay real sewar outputs pinned by tools/verify_sewar_golden.py
    (run in an environment WITH sewar) against this suite — closes the
    metric-lineage loop operationally. Skips until a pin exists."""
    from pathlib import Path

    import pytest

    pin_path = Path(__file__).parent / "goldens" / "sewar_pin.npz"
    if not pin_path.exists():
        pytest.skip(
            "no sewar_pin.npz — run tools/verify_sewar_golden.py in an "
            "environment with sewar 0.4.6 to create it"
        )
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from tools.verify_sewar_golden import ATOL, make_pairs, ours

    pin = np.load(pin_path)
    for pair in make_pairs():
        for key in pin.files:
            name, m = key.split(":")
            if name != pair["name"]:
                continue
            mine = ours(m, pair["gt"], pair["p"])
            theirs = float(pin[key])
            if np.isinf(theirs):
                assert np.isinf(mine)
            else:
                assert abs(mine - theirs) <= ATOL[m], (m, mine, theirs)


def test_verify_sewar_golden_selfcheck():
    """The tool's plumbing runs HERE: deterministic pairs build and the
    local implementation evaluates every metric on them (the sewar side
    only runs where sewar is installed)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from tools.verify_sewar_golden import METRICS, make_pairs, ours

    pair = make_pairs()[0]
    for m in METRICS:
        v = ours(m, pair["gt"], pair["p"])
        assert np.isfinite(v), m

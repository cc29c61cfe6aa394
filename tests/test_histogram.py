"""Golden tests: global histogram equalization + fraction-convention CLAHE."""

import numpy as np
import jax.numpy as jnp
import pytest

from mies_tpu.ops import histogram as H
from tests.goldens import golden_ops as G


def test_equalize_hist_matches_golden(xray):
    out = np.asarray(H.equalize_hist(jnp.asarray(xray)))
    ref = G.equalize_hist(xray)
    # float path: CDF interpolation matches to float32 precision
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_equalize_hist_uint8_exact(xray):
    out = np.asarray(H.equalize_hist(jnp.asarray(xray)))
    ref = G.equalize_hist(xray)
    u_out = np.clip(np.rint(out * 255), 0, 255).astype(np.uint8)
    u_ref = np.clip(np.rint(ref * 255), 0, 255).astype(np.uint8)
    # ">= 1 ULP-equivalent on uint8": allow off-by-one on <0.1% of pixels
    diff = np.abs(u_out.astype(int) - u_ref.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 1e-3


def test_equalize_hist_flattens(xray):
    """Equalized histogram must be much flatter than the input's."""
    out = np.asarray(H.equalize_hist(jnp.asarray(xray)))
    h_in, _ = np.histogram(xray, bins=64, range=(0, 1))
    h_out, _ = np.histogram(out, bins=64, range=(0, 1))
    assert h_out.std() < h_in.std() * 0.6


@pytest.mark.parametrize("grid", [(8, 8), (4, 4), (7, 5)])
@pytest.mark.parametrize("clip", [0.01, 0.05])
def test_clahe_fraction_matches_golden(xray, grid, clip):
    out = np.asarray(
        H.clahe(jnp.asarray(xray), clip_limit=clip, grid_size=grid, convention="fraction")
    )
    ref = G.clahe_fraction(xray, clip_limit=clip, grid_size=grid)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_clahe_fraction_nondivisible_shape(rng):
    img = rng.random((250, 333)).astype(np.float32)
    out = np.asarray(
        H.clahe(jnp.asarray(img), clip_limit=0.02, grid_size=(8, 8), convention="fraction")
    )
    ref = G.clahe_fraction(img, clip_limit=0.02, grid_size=(8, 8))
    assert out.shape == img.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_clahe_improves_local_contrast(xray):
    out = np.asarray(H.clahe(jnp.asarray(xray), clip_limit=2.0, grid_size=(8, 8)))
    # local std (proxy for local contrast) must rise
    def local_std(a):
        from scipy import ndimage
        m = ndimage.uniform_filter(a, 16)
        m2 = ndimage.uniform_filter(a * a, 16)
        return np.sqrt(np.maximum(m2 - m * m, 0)).mean()
    assert local_std(out) > local_std(xray) * 1.2


def test_equalize_hist_constant_image():
    """Degenerate input: constant image -> cdf == 1 everywhere (skimage
    gives all-ones); must not NaN/crash on the zero span."""
    img = jnp.full((64, 64), 0.5, jnp.float32)
    out = np.asarray(H.equalize_hist(img))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 1.0, atol=1e-5)


def test_chain_nonsquare_through_full_pipeline(rng):
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.compiler import compile_pipeline

    cfg = PipelineConfig.make(
        [("clahe", {"clip_limit": 2.0, "grid_size": (8, 8)}),
         ("bilateral_blur", {"kernel_size": 5}),
         ("unsharp_mask", {"radius": 1.5})]
    )
    img = rng.random((384, 640)).astype(np.float32)
    out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
    assert out.shape == (384, 640) and out.dtype == np.uint8


def test_uint8_input_matches_float_input(rng):
    """Shipping u8 + on-device ingest == shipping f32 (bit-identical)."""
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.compiler import compile_pipeline

    cfg = PipelineConfig.make(
        [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})]
    )
    u8 = (rng.random((128, 128)) * 255).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0
    fn = compile_pipeline(cfg, donate=False)
    np.testing.assert_array_equal(
        np.asarray(fn(jnp.asarray(u8))), np.asarray(fn(jnp.asarray(f32)))
    )

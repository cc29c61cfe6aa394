"""Golden tests: spatial filters vs scipy/NumPy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from mies_tpu.ops import filters as F
from tests.goldens import golden_ops as G


def _check(jax_out, np_out, atol=1e-5):
    np.testing.assert_allclose(np.asarray(jax_out), np_out, atol=atol, rtol=1e-4)


@pytest.mark.parametrize("sigma", [0.8, 1.5, 3.0])
@pytest.mark.parametrize("mode", ["nearest", "reflect", "mirror"])
def test_gaussian_blur(xray, sigma, mode):
    _check(
        F.gaussian_blur(jnp.asarray(xray), sigma=sigma, mode=mode),
        G.gaussian_blur(xray, sigma=sigma, mode=mode),
        atol=2e-5,
    )


def test_gaussian_sigma_zero_identity(xray):
    out = np.asarray(F.gaussian_blur(jnp.asarray(xray), sigma=0.0))
    np.testing.assert_array_equal(out, xray)


@pytest.mark.parametrize("radius,amount", [(1.0, 1.0), (1.5, 0.7), (3.0, 2.0)])
def test_unsharp_mask(xray, radius, amount):
    _check(
        F.unsharp_mask(jnp.asarray(xray), radius=radius, amount=amount),
        G.unsharp_mask(xray, radius=radius, amount=amount),
        atol=2e-5,
    )


@pytest.mark.parametrize("k", [3, 5, 7])
def test_median_blur(impulse_image, k):
    _check(
        F.median_blur(jnp.asarray(impulse_image), kernel_size=k),
        G.median_blur(impulse_image, kernel_size=k),
    )


def test_median_removes_impulse_noise(impulse_image):
    out = np.asarray(F.median_blur(jnp.asarray(impulse_image), kernel_size=3))
    clean = np.linspace(0, 1, impulse_image.shape[1], dtype=np.float32)[None, :].repeat(
        impulse_image.shape[0], axis=0
    )
    # 3x3 median should remove most of the 6% salt&pepper
    before = np.abs(impulse_image - clean).mean()
    after = np.abs(out - clean).mean()
    assert after < before * 0.2


@pytest.mark.parametrize("k,sc,ss", [(5, 0.1, 1.5), (7, 0.25, 2.0), (3, 0.05, 1.0)])
def test_bilateral_blur(impulse_image, k, sc, ss):
    _check(
        F.bilateral_blur(jnp.asarray(impulse_image), kernel_size=k, sigma_color=sc, sigma_space=ss),
        G.bilateral_blur(impulse_image, kernel_size=k, sigma_color=sc, sigma_space=ss),
    )


def test_bilateral_preserves_edges(xray):
    """Bilateral must blur less across edges than a Gaussian of same scale."""
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 1.0
    b = np.asarray(F.bilateral_blur(jnp.asarray(img), kernel_size=7, sigma_color=0.1, sigma_space=2.0))
    g = np.asarray(F.gaussian_blur(jnp.asarray(img), sigma=2.0))
    edge_col = img[:, 31:33]
    assert np.abs(b[:, 31:33] - edge_col).mean() < np.abs(g[:, 31:33] - edge_col).mean() * 0.2


@pytest.mark.parametrize("k", [3, 5])
def test_box_blur(xray, k):
    _check(F.box_blur(jnp.asarray(xray), kernel_size=k), G.box_blur(xray, kernel_size=k))


def test_sobel_edges(xray):
    _check(F.sobel_edges(jnp.asarray(xray)), G.sobel_edges(xray), atol=3e-5)


def test_laplacian_sharpen(xray):
    _check(F.laplacian_sharpen(jnp.asarray(xray), alpha=0.3), G.laplacian_sharpen(xray, alpha=0.3))


def test_denoise_bilateral_sigma_derived_window(impulse_image):
    """skimage-style entry point: window = max(5, 2*ceil(3*sigma)+1)."""
    from mies_tpu.ops.filters import denoise_bilateral

    out = np.asarray(
        denoise_bilateral(jnp.asarray(impulse_image), sigma_color=0.2, sigma_spatial=1.0)
    )
    # must equal bilateral_blur with the derived 7x7 window, edge mode
    ref = G.bilateral_blur(
        impulse_image, kernel_size=7, sigma_color=0.2, sigma_space=1.0, mode="edge"
    )
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("mode", ["nearest", "reflect"])
def test_median_modes(impulse_image, mode):
    out = np.asarray(F.median_blur(jnp.asarray(impulse_image), 3, mode=mode))
    ref = G.median_blur(impulse_image, 3, mode=mode)
    np.testing.assert_allclose(out, ref, atol=1e-6)

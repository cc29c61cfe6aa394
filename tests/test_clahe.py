"""OpenCV-convention CLAHE: BIT-EXACT cross-check against cv2.createCLAHE.

This is the strongest parity claim in the suite: the reference stack's
CLAHE (kornia/OpenCV convention, SURVEY.md section 4 item 1) is
reproduced exactly, integer for integer, by the pure-JAX implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from mies_tpu.ops import histogram as H


def _cv2_clahe(u8, clip, grid):
    c = cv2.createCLAHE(clipLimit=clip, tileGridSize=(grid[1], grid[0]))  # (w,h)
    return c.apply(u8)


def _ours(u8, clip, grid):
    img = jnp.asarray(u8.astype(np.float32) / 255.0)
    out = H.clahe(img, clip_limit=clip, grid_size=grid, convention="opencv")
    return np.clip(np.rint(np.asarray(out) * 255.0), 0, 255).astype(np.uint8)


def _assert_matches_cv2(ref, out):
    """Bit-exact on TPU. On XLA:CPU, LLVM contracts the bilinear blend's
    mul+add chains into FMAs, which flips pixels whose un-fused f32 value
    lands exactly on a .5 rounding tie — allow <=1 level on <0.1% of
    pixels there (still well inside the BASELINE.md uint8 ULP contract).
    The eager (un-jitted) path matches cv2 exactly on every backend.
    """
    import jax

    diff = np.abs(ref.astype(int) - out.astype(int))
    if jax.default_backend() == "cpu":
        assert diff.max() <= 1, f"max diff {diff.max()}"
        assert (diff > 0).mean() < 1e-3, f"mismatch frac {(diff > 0).mean()}"
    else:
        assert diff.max() == 0, f"max diff {diff.max()}"


@pytest.mark.parametrize("clip", [2.0, 4.0, 40.0])
@pytest.mark.parametrize("grid", [(8, 8), (4, 4), (2, 16)])
def test_bit_exact_vs_cv2_512(xray, clip, grid):
    u8 = np.clip(np.rint(xray * 255), 0, 255).astype(np.uint8)
    ref = _cv2_clahe(u8, clip, grid)
    out = _ours(u8, clip, grid)
    _assert_matches_cv2(ref, out)


def test_bit_exact_nondivisible(rng):
    """Image size not divisible by grid: exercises OpenCV's reflect-101 pad."""
    u8 = (rng.random((251, 333)) * 255).astype(np.uint8)
    ref = _cv2_clahe(u8, 2.0, (8, 8))
    out = _ours(u8, 2.0, (8, 8))
    _assert_matches_cv2(ref, out)


def test_bit_exact_uniform_image():
    """Degenerate: constant image (all mass in one bin, maximal clipping)."""
    u8 = np.full((128, 128), 100, np.uint8)
    ref = _cv2_clahe(u8, 2.0, (8, 8))
    out = _ours(u8, 2.0, (8, 8))
    _assert_matches_cv2(ref, out)


def test_bit_exact_extreme_clip(rng):
    """Very large clip -> effectively plain tiled hist-eq."""
    u8 = (rng.random((256, 256)) * 255).astype(np.uint8)
    ref = _cv2_clahe(u8, 1000.0, (8, 8))
    out = _ours(u8, 1000.0, (8, 8))
    _assert_matches_cv2(ref, out)


def test_batch_vmap_consistency(rng):
    """vmapped CLAHE == per-image CLAHE."""
    import jax

    batch = (rng.random((4, 128, 128)) * 255).astype(np.uint8)
    imgs = jnp.asarray(batch.astype(np.float32) / 255.0)
    fn = lambda x: H.clahe(x, clip_limit=2.0, grid_size=(8, 8), convention="opencv")
    batched = jax.vmap(fn)(imgs)
    for i in range(4):
        single = fn(imgs[i])
        np.testing.assert_array_equal(np.asarray(batched[i]), np.asarray(single))

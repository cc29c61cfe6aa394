"""Device-side training augmentation (models/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mies_tpu.models.augment import AugmentConfig, augment_batch, augment_pair


@pytest.fixture()
def batch(rng):
    return jnp.asarray(rng.random((8, 16, 16)).astype(np.float32))


def test_same_key_is_deterministic(batch):
    cfg = AugmentConfig(brightness=0.1, contrast=0.1, gamma=0.2,
                        noise_sigma=0.02)
    k = jax.random.PRNGKey(3)
    a = np.asarray(augment_batch(k, batch, cfg))
    b = np.asarray(augment_batch(k, batch, cfg))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(augment_batch(jax.random.PRNGKey(4), batch, cfg))
    assert not np.array_equal(a, c)


def test_forced_flips_are_exact(batch):
    x = np.asarray(batch)
    out_h = np.asarray(augment_batch(
        jax.random.PRNGKey(0), batch,
        AugmentConfig(hflip=1.0, vflip=0.0, rot90=False)))
    np.testing.assert_array_equal(out_h, x[:, :, ::-1])
    out_v = np.asarray(augment_batch(
        jax.random.PRNGKey(0), batch,
        AugmentConfig(hflip=0.0, vflip=1.0, rot90=False)))
    np.testing.assert_array_equal(out_v, x[:, ::-1, :])


def test_geometric_preserves_pixel_multiset(batch):
    out = np.asarray(augment_batch(
        jax.random.PRNGKey(7), batch, AugmentConfig()))
    for i in range(out.shape[0]):
        np.testing.assert_array_equal(
            np.sort(out[i].ravel()), np.sort(np.asarray(batch)[i].ravel()))


def test_all_rotations_occur(batch):
    """Across keys, every D4 rotation class appears (square patches)."""
    seen = set()
    x = np.asarray(batch)
    for s in range(12):
        out = np.asarray(augment_batch(
            jax.random.PRNGKey(s), batch,
            AugmentConfig(hflip=0.0, vflip=0.0, rot90=True)))
        for i in range(x.shape[0]):
            for k in range(4):
                if np.array_equal(out[i], np.rot90(x[i], k)):
                    seen.add(k)
    assert seen == {0, 1, 2, 3}


def test_pair_gets_same_geometry(rng):
    noisy = jnp.asarray(rng.random((6, 16, 16)).astype(np.float32))
    # clean == noisy -> with photometric off, both outputs must be equal
    n, c = augment_pair(jax.random.PRNGKey(1), noisy, noisy,
                        AugmentConfig())
    np.testing.assert_array_equal(np.asarray(n), np.asarray(c))


def test_photometric_on_input_only(rng):
    noisy = jnp.asarray(rng.random((6, 16, 16)).astype(np.float32))
    cfg = AugmentConfig(hflip=0.0, vflip=0.0, rot90=False,
                        noise_sigma=0.05)
    n, c = augment_pair(jax.random.PRNGKey(1), noisy, noisy, cfg)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(noisy))
    assert not np.array_equal(np.asarray(n), np.asarray(noisy))


def test_nonsquare_patches_flip_only(rng):
    x = jnp.asarray(rng.random((4, 8, 16)).astype(np.float32))
    out = np.asarray(augment_batch(
        jax.random.PRNGKey(5), x,
        AugmentConfig(hflip=0.5, vflip=0.5, rot90=True)))
    assert out.shape == x.shape
    ref = np.asarray(x)
    allowed = [ref, ref[:, :, ::-1], ref[:, ::-1, :], ref[:, ::-1, ::-1]]
    for i in range(4):
        assert any(np.array_equal(out[i], a[i]) for a in allowed)


def test_photometric_clips_and_jits(batch):
    cfg = AugmentConfig(brightness=0.5, contrast=0.5, gamma=0.5,
                        noise_sigma=0.1)
    fn = jax.jit(lambda k, x: augment_batch(k, x, cfg))
    out = np.asarray(fn(jax.random.PRNGKey(2), batch))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.isfinite(out).all()


def test_nhwc_batches(rng):
    """Training batches are NHWC ([B, H, W, 1]): geometry acts on axes
    1/2, photometric factors broadcast per image."""
    x = jnp.asarray(rng.random((4, 16, 16, 1)).astype(np.float32))
    cfg = AugmentConfig(brightness=0.1, contrast=0.1, gamma=0.1)
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), x, cfg))
    assert out.shape == x.shape and np.isfinite(out).all()
    n, c = augment_pair(jax.random.PRNGKey(1), x, x, AugmentConfig())
    np.testing.assert_array_equal(np.asarray(n), np.asarray(c))


def test_elastic_deformation(rng):
    x = jnp.asarray(rng.random((4, 32, 32)).astype(np.float32))
    cfg = AugmentConfig(hflip=0.0, vflip=0.0, rot90=False, elastic=3.0)
    k = jax.random.PRNGKey(9)
    out = np.asarray(augment_batch(k, x, cfg))
    assert out.shape == x.shape and np.isfinite(out).all()
    assert not np.array_equal(out, np.asarray(x))      # it warped
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_array_equal(
        out, np.asarray(augment_batch(k, x, cfg)))     # deterministic
    # pair: identical inputs stay identical under the SAME warp
    n, c = augment_pair(k, x, x, cfg)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(c))
    # a smooth small warp perturbs a SMOOTH image only slightly (iid
    # noise shows large diffs by construction — uncorrelated pixels)
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    sm = jnp.asarray(np.tile(
        (0.5 + 0.4 * np.sin(6 * yy) * np.cos(5 * xx)).astype(np.float32),
        (4, 1, 1)))
    outs = np.asarray(augment_batch(k, sm, cfg))
    assert float(np.abs(outs - np.asarray(sm)).mean()) < 0.08

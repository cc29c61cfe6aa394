"""Wavelet shrinkage (skimage.restoration.denoise_wavelet surface) vs
the NumPy goldens.

The device op (mies_tpu/ops/wavelet.py, shifted-add FIR + stride-2
slicing) and the golden (tests/goldens/golden_ops.py, np.convolve) are
independent transcriptions of PyWavelets' mode='symmetric' DWT and
skimage 0.26's ``_wavelet_threshold`` — agreement is implementation
cross-validation, and ``tools/verify_skimage_golden.py`` closes the
loop against the real libraries where they exist.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mies_tpu.ops import wavelet as W
from mies_tpu.pipeline.config import PipelineConfig, validate
from mies_tpu.pipeline.compiler import (
    compile_pipeline,
    compile_volume_pipeline,
)
import tests.goldens.golden_ops as G


def _noisy(rng, shape, scale=0.08):
    base = np.linspace(0.2, 0.8, shape[-1], dtype=np.float32)
    img = np.broadcast_to(base, shape).copy()
    img += rng.normal(0.0, scale, shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


class TestDWT:
    @pytest.mark.parametrize("name", ["db1", "db2", "db3", "db4", "sym4"])
    def test_perfect_reconstruction(self, rng, name):
        x = rng.random((33, 47)).astype(np.float32)
        flen = len(W.wavelet_filters(name)[0])
        lv = min(W.dwt_max_level(n, flen) for n in x.shape)
        if lv < 1:
            pytest.skip("image too small for this wavelet")
        a, d = W.wavedec_nd(jnp.asarray(x), name, lv)
        r = np.asarray(W.waverec_nd(a, d, name, x.shape))
        np.testing.assert_allclose(r, x, atol=2e-6)

    def test_coefficients_match_golden(self, rng):
        x = rng.random((40, 56))
        a, d = W.wavedec_nd(jnp.asarray(x, jnp.float32), "db2", 2)
        ag, dg = G._wavedecn_np(x, "db2", 2)
        np.testing.assert_allclose(np.asarray(a), ag, atol=2e-5)
        for lv, lvg in zip(d, dg):
            assert set(lv) == set(lvg)
            for k in lv:
                np.testing.assert_allclose(
                    np.asarray(lv[k]), lvg[k], atol=2e-5
                )

    def test_unknown_wavelet_rejected(self):
        with pytest.raises(ValueError, match="unknown wavelet"):
            W.wavelet_filters("bior2.2")

    def test_max_level_formula(self):
        # PyWavelets reference values: dwt_max_level(512, 2) == 9,
        # (512, 4) == 7, (100, 8) == 3
        assert W.dwt_max_level(512, 2) == 9
        assert W.dwt_max_level(512, 4) == 7
        assert W.dwt_max_level(100, 8) == 3


class TestDenoiseWavelet:
    @pytest.mark.parametrize(
        "kw",
        [
            {},
            {"method": "VisuShrink"},
            {"wavelet": "db2"},
            {"mode": "hard", "method": "VisuShrink"},
            {"sigma": 0.08},
            {"wavelet_levels": 2},
            {"wavelet": "sym4", "sigma": 0.05},
        ],
    )
    def test_matches_golden(self, rng, kw):
        img = _noisy(rng, (96, 96))
        out = np.asarray(
            jax.jit(lambda x: W.denoise_wavelet(x, **kw))(jnp.asarray(img))
        )
        gold = G.denoise_wavelet(img, **kw)
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_matches_golden_nonsquare_odd(self, rng):
        img = _noisy(rng, (67, 45))
        out = np.asarray(
            jax.jit(lambda x: W.denoise_wavelet(x, wavelet="db2"))(
                jnp.asarray(img)
            )
        )
        gold = G.denoise_wavelet(img, wavelet="db2")
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_denoises(self, rng):
        clean = np.broadcast_to(
            np.linspace(0.2, 0.8, 96, dtype=np.float32), (96, 96)
        ).copy()
        noisy = np.clip(
            clean + rng.normal(0, 0.08, clean.shape).astype(np.float32), 0, 1
        )
        out = np.asarray(
            jax.jit(lambda x: W.denoise_wavelet(x))(jnp.asarray(noisy))
        )
        assert np.square(out - clean).mean() < 0.15 * np.square(
            noisy - clean
        ).mean()

    def test_matches_golden_3d(self, rng):
        vol = _noisy(rng, (16, 32, 32), scale=0.06)
        out = np.asarray(
            jax.jit(lambda x: W.denoise_wavelet3d(x))(jnp.asarray(vol))
        )
        gold = G.denoise_wavelet(vol)
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_bad_args_rejected(self, rng):
        img = jnp.zeros((32, 32), jnp.float32)
        with pytest.raises(ValueError, match="method"):
            W.denoise_wavelet(img, method="SUREShrink")
        with pytest.raises(ValueError, match="mode"):
            W.denoise_wavelet(img, mode="firm")
        with pytest.raises(ValueError, match="exceeds the maximum"):
            W.denoise_wavelet(img, wavelet_levels=9)

    def test_zero_image_stable(self):
        # all-zero detail: sigma estimate is 0, BayesShrink eps guard
        # keeps thresholds finite, output is exactly reconstructible
        img = jnp.full((32, 32), 0.5, jnp.float32)
        out = np.asarray(jax.jit(W.denoise_wavelet)(img))
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(out, 0.5, atol=1e-6)


class TestEstimateSigma:
    def test_matches_golden_and_truth(self, rng):
        img = _noisy(rng, (128, 128), scale=0.07)
        s = float(jax.jit(W.estimate_sigma)(jnp.asarray(img)))
        sg = G.estimate_sigma(img)
        assert abs(s - sg) < 1e-6
        assert abs(s - 0.07) < 0.02  # MAD is a consistent estimator

    def test_zero_input(self):
        s = float(jax.jit(W.estimate_sigma)(jnp.zeros((32, 32))))
        assert s == 0.0


class TestPipelineIntegration:
    def test_2d_chain(self, rng):
        cfg = PipelineConfig.make(
            [
                ("denoise_wavelet", {"wavelet_levels": 3}),
                ("adjust_gamma", {"gamma": 0.9}),
            ],
            name="wavelet-chain",
        )
        validate(cfg)
        fn = compile_pipeline(cfg, (96, 96))
        out = np.asarray(fn(jnp.asarray(_noisy(rng, (96, 96)))))
        assert out.shape == (96, 96)
        assert np.all(np.isfinite(out))

    def test_volume_chain(self, rng):
        cfg = PipelineConfig.make(
            [("denoise_wavelet3d", {"wavelet_levels": 1})], name="wv3d"
        )
        validate(cfg)
        fn = compile_volume_pipeline(cfg, (8, 32, 32))
        out = np.asarray(fn(jnp.asarray(_noisy(rng, (8, 32, 32)))))
        assert out.shape == (8, 32, 32)

    def test_validation_rules(self):
        with pytest.raises(ValueError, match="method"):
            validate(
                PipelineConfig.make(
                    [("denoise_wavelet", {"method": "Nope"})], name="bad"
                )
            )
        with pytest.raises(ValueError, match="mode"):
            validate(
                PipelineConfig.make(
                    [("denoise_wavelet", {"mode": "firm"})], name="bad"
                )
            )

    def test_not_spatially_shardable(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="global/tile extent"):
            stage_receptive_field("denoise_wavelet", {})

    def test_not_z_shardable(self):
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        with pytest.raises(ValueError, match="not z-shardable"):
            volume_stage_z_field("denoise_wavelet3d", {})


class TestCycleSpin:
    """Shift-invariant cycle-spun wavelet denoising (one batched DWT
    over the shift grid) vs the sequential golden composition."""

    @pytest.mark.parametrize(
        "kw",
        [
            {"max_shifts": 2},
            {"max_shifts": 3, "shift_steps": 2, "wavelet": "db2"},
            {"max_shifts": 1, "sigma": 0.08, "mode": "hard"},
        ],
    )
    def test_matches_golden(self, rng, kw):
        img = _noisy(rng, (64, 64))
        out = np.asarray(
            jax.jit(lambda x: W.cycle_spin(x, **kw))(jnp.asarray(img))
        )
        gold = G.cycle_spin(img, **kw)
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_max_shifts_zero_is_plain_denoise(self, rng):
        img = _noisy(rng, (48, 48))
        a = np.asarray(jax.jit(lambda v: W.cycle_spin(v, 0))(jnp.asarray(img)))
        b = np.asarray(jax.jit(W.denoise_wavelet)(jnp.asarray(img)))
        np.testing.assert_allclose(a, b, atol=1e-7)

    def test_more_shift_invariant_than_plain(self, rng):
        # the defining property: output varies less under an input
        # roll than the decimated single-pass denoiser
        img = _noisy(rng, (64, 64))
        x = jnp.asarray(img)
        xr = jnp.roll(x, (1, 1), axis=(0, 1))

        def invariance(fn):
            a = np.asarray(fn(x))
            b = np.roll(np.asarray(fn(xr)), (-1, -1), axis=(0, 1))
            return np.abs(a - b).mean()

        plain = invariance(jax.jit(W.denoise_wavelet))
        spun = invariance(jax.jit(lambda v: W.cycle_spin(v, 3)))
        assert spun < plain * 0.7

    def test_validation(self):
        with pytest.raises(ValueError, match="max_shifts"):
            W.cycle_spin(jnp.zeros((8, 8)), max_shifts=-1)
        with pytest.raises(ValueError, match="shift_steps"):
            W.cycle_spin(jnp.zeros((8, 8)), shift_steps=0)
        with pytest.raises(ValueError, match="max_shifts"):
            W.cycle_spin_batched(jnp.zeros((1, 8, 8)), max_shifts=-1)
        with pytest.raises(ValueError, match="shift_steps"):
            W.cycle_spin_batched(jnp.zeros((1, 8, 8)), shift_steps=0)

    @pytest.mark.parametrize(
        "kw",
        [
            {"max_shifts": 2},
            {"max_shifts": 3, "shift_steps": 2, "wavelet": "db2"},
            {"max_shifts": 1, "sigma": 0.08, "mode": "hard"},
        ],
    )
    def test_batched_matches_vmapped(self, rng, kw):
        # the pipeline's batched fast path (shift grid flattened into
        # the leading batch) must reproduce vmap(cycle_spin) — same
        # per-slice math, only the layout differs
        imgs = np.stack([_noisy(rng, (48, 64)) for _ in range(3)])
        want = np.asarray(
            jax.jit(jax.vmap(lambda v: W.cycle_spin(v, **kw)))(
                jnp.asarray(imgs)
            )
        )
        got = np.asarray(
            jax.jit(lambda v: W.cycle_spin_batched(v, **kw))(
                jnp.asarray(imgs)
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_in_pipeline(self, rng):
        cfg = PipelineConfig.make(
            [("cycle_spin", {"max_shifts": 1, "sigma": 0.05})],
            name="cs",
        )
        validate(cfg)
        fn = compile_pipeline(cfg, quantize=False)
        img = _noisy(rng, (64, 128))
        out = np.asarray(fn(jnp.asarray(img)))
        assert out.shape == img.shape and np.isfinite(out).all()

"""Frequency-domain filters (butterworth, homomorphic), DoG, and Gabor
vs their float64 NumPy/scipy goldens (tests/goldens/golden_ops.py).

The butterworth/homomorphic goldens run numpy pocketfft in float64 —
an independent arithmetic route from XLA's float32 FFT, so tolerances
are FFT-roundoff-scale (~1e-5), not bit-exact. DoG and the Gabor
convolutions are REAL scipy calls (only the Gabor kernel itself is a
transcription).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from goldens import golden_ops as G
from mies_tpu.ops.filters import (
    difference_of_gaussians,
    gabor,
    gabor_bank,
    gabor_kernel,
    gabor_response,
)
from mies_tpu.ops.frequency import (
    butterworth,
    butterworth3d,
    butterworth_transfer,
    homomorphic,
    homomorphic3d,
)
from mies_tpu.ops.volume3d import difference_of_gaussians3d
from mies_tpu.pipeline.config import PipelineConfig, validate
from mies_tpu.pipeline.compiler import compile_pipeline


class TestButterworth:
    @pytest.mark.parametrize("high_pass", [True, False])
    @pytest.mark.parametrize("squared", [True, False])
    def test_matches_golden(self, rng, high_pass, squared):
        img = rng.random((96, 128)).astype(np.float32)
        out = np.asarray(
            butterworth(jnp.asarray(img), 0.02, high_pass, 2.0, squared)
        )
        ref = G.butterworth_filter(img, 0.02, high_pass, 2.0, squared)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_odd_shape_and_npad(self, rng):
        img = rng.random((63, 65)).astype(np.float32)
        out = np.asarray(butterworth(jnp.asarray(img), 0.05, True, 3.0,
                                     npad=7))
        ref = G.butterworth_filter(img, 0.05, True, 3.0, npad=7)
        assert out.shape == img.shape
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_lowpass_preserves_mean(self, rng):
        """DC gain of the low-pass is exactly 1: means match."""
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(butterworth(jnp.asarray(img), 0.1,
                                     high_pass=False))
        assert abs(out.mean() - img.mean()) < 1e-5

    def test_highpass_zero_mean(self, rng):
        """DC gain of the high-pass is exactly 0."""
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(butterworth(jnp.asarray(img), 0.1,
                                     high_pass=True))
        assert abs(out.mean()) < 1e-5

    def test_3d_matches_golden(self, rng):
        vol = rng.random((12, 48, 64)).astype(np.float32)
        out = np.asarray(butterworth3d(jnp.asarray(vol), 0.08, True, 2.0))
        ref = G.butterworth_filter(vol, 0.08, True, 2.0)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_transfer_halfspectrum_shape(self):
        w = butterworth_transfer((32, 48), 0.1, 2.0, True)
        assert w.shape == (32, 48 // 2 + 1)

    def test_bad_cutoff_raises(self, rng):
        img = jnp.zeros((16, 16), jnp.float32)
        with pytest.raises(ValueError, match="cutoff_frequency_ratio"):
            butterworth(img, 0.7)
        with pytest.raises(ValueError, match="cutoff_frequency_ratio"):
            butterworth(img, 0.0)
        with pytest.raises(ValueError, match="npad"):
            butterworth(img, 0.1, npad=-1)


class TestHomomorphic:
    def test_matches_golden(self, rng):
        img = rng.random((96, 96)).astype(np.float32)
        out = np.asarray(homomorphic(jnp.asarray(img)))
        ref = G.homomorphic_filter(img)
        np.testing.assert_allclose(out, ref, atol=3e-5)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_3d_matches_golden(self, rng):
        vol = rng.random((8, 48, 48)).astype(np.float32)
        out = np.asarray(homomorphic3d(jnp.asarray(vol)))
        ref = G.homomorphic_filter(vol, npad=8)
        np.testing.assert_allclose(out, ref, atol=3e-5)

    def test_flattens_illumination_gradient(self, rng):
        """The op's purpose: a slow multiplicative ramp shrinks while
        local detail survives."""
        detail = 0.5 + 0.2 * rng.standard_normal((128, 128)).astype(
            np.float32
        )
        detail = np.clip(detail, 0.05, 1.0)
        ramp = np.linspace(0.3, 1.0, 128, dtype=np.float32)[None, :]
        img = np.clip(detail * ramp, 0.0, 1.0)
        out = np.asarray(
            homomorphic(jnp.asarray(img), cutoff_frequency_ratio=0.01,
                        low_gain=0.3, high_gain=1.0)
        )
        # column means of the input span ~3.3x; output must span less
        in_span = img.mean(axis=0)
        out_span = out.mean(axis=0)
        assert (out_span.max() / out_span.min()) < 0.7 * (
            in_span.max() / in_span.min()
        )

    def test_bad_eps_raises(self):
        with pytest.raises(ValueError, match="eps"):
            homomorphic(jnp.zeros((16, 16), jnp.float32), eps=0.0)


class TestDifferenceOfGaussians:
    def test_matches_scipy_default_high(self, rng):
        img = rng.random((80, 96)).astype(np.float32)
        out = np.asarray(difference_of_gaussians(jnp.asarray(img), 1.5))
        ref = G.difference_of_gaussians(img, 1.5)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    @pytest.mark.parametrize("mode", ["nearest", "reflect", "mirror"])
    def test_matches_scipy_modes(self, rng, mode):
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(
            difference_of_gaussians(jnp.asarray(img), 1.0, 4.0, mode=mode)
        )
        ref = G.difference_of_gaussians(img, 1.0, 4.0, mode=mode)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_3d_matches_scipy(self, rng):
        vol = rng.random((10, 40, 40)).astype(np.float32)
        out = np.asarray(
            difference_of_gaussians3d(jnp.asarray(vol), 1.0, 2.5)
        )
        ref = G.difference_of_gaussians(vol, 1.0, 2.5)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_high_below_low_raises(self, rng):
        with pytest.raises(ValueError, match="high_sigma"):
            difference_of_gaussians(jnp.zeros((16, 16), jnp.float32),
                                    2.0, 1.0)
        with pytest.raises(ValueError, match="high_sigma"):
            difference_of_gaussians3d(
                jnp.zeros((4, 16, 16), jnp.float32), 2.0, 1.0
            )


class TestGabor:
    @pytest.mark.parametrize("theta", [0.0, 0.7853981633974483, 1.2])
    def test_response_matches_scipy(self, rng, theta):
        img = rng.random((64, 64)).astype(np.float32)
        re, im = gabor_response(jnp.asarray(img), 0.2, theta=theta)
        ref_re, ref_im = G.gabor_response(img, 0.2, theta=theta)
        np.testing.assert_allclose(np.asarray(re), ref_re, atol=1e-5)
        np.testing.assert_allclose(np.asarray(im), ref_im, atol=1e-5)

    def test_explicit_sigmas_and_offset(self, rng):
        img = rng.random((48, 48)).astype(np.float32)
        kw = dict(frequency=0.15, theta=0.3, sigma_x=3.0, sigma_y=5.0,
                  offset=0.5, n_stds=2)
        re, im = gabor_response(jnp.asarray(img), **kw)
        ref_re, ref_im = G.gabor_response(img, **kw)
        np.testing.assert_allclose(np.asarray(re), ref_re, atol=1e-5)
        np.testing.assert_allclose(np.asarray(im), ref_im, atol=1e-5)

    def test_kernel_matches_transcription(self):
        ours = gabor_kernel(0.25, 0.4)
        ref = G._gabor_kernel_np(0.25, 0.4)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_magnitude_output(self, rng):
        img = rng.random((32, 32)).astype(np.float32)
        m = np.asarray(gabor(jnp.asarray(img), 0.2, output="magnitude"))
        re, im = gabor_response(jnp.asarray(img), 0.2)
        np.testing.assert_allclose(
            m, np.sqrt(np.asarray(re) ** 2 + np.asarray(im) ** 2),
            atol=1e-6,
        )

    def test_bad_output_raises(self, rng):
        with pytest.raises(ValueError, match="output"):
            gabor(jnp.zeros((16, 16), jnp.float32), 0.2, output="phase")

    @pytest.mark.parametrize("output", ["max", "mean"])
    def test_bank_matches_per_orientation_golden(self, rng, output):
        img = rng.random((48, 48)).astype(np.float32)
        out = np.asarray(
            gabor_bank(jnp.asarray(img), 0.15, n_orientations=4,
                       output=output)
        )
        mags = []
        for k in range(4):
            re, im = G.gabor_response(img, 0.15, theta=k * np.pi / 4)
            mags.append(np.sqrt(re ** 2 + im ** 2))
        ref = (np.max(mags, axis=0) if output == "max"
               else np.mean(mags, axis=0))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_bank_mixed_supports_match_per_orientation(self, rng):
        # rotated kernels have different supports; the bank zero-pads
        # them to a common box — must still equal each standalone conv
        img = rng.random((40, 56)).astype(np.float32)
        kw = dict(frequency=0.2, sigma_x=2.5, sigma_y=4.0, n_stds=2)
        out = np.asarray(
            gabor_bank(jnp.asarray(img), n_orientations=3,
                       output="mean", **kw)
        )
        mags = []
        for k in range(3):
            re, im = G.gabor_response(img, theta=k * np.pi / 3, **kw)
            mags.append(np.sqrt(re ** 2 + im ** 2))
        np.testing.assert_allclose(out, np.mean(mags, axis=0), atol=1e-5)

    def test_bank_bad_args_raise(self):
        with pytest.raises(ValueError, match="n_orientations"):
            gabor_bank(jnp.zeros((16, 16), jnp.float32), 0.2,
                       n_orientations=0)
        with pytest.raises(ValueError, match="output"):
            gabor_bank(jnp.zeros((16, 16), jnp.float32), 0.2,
                       output="median")


class TestPipelineIntegration:
    def test_2d_chain_compiles(self, rng):
        cfg = PipelineConfig.make(
            [
                ("butterworth", {"cutoff_frequency_ratio": 0.05,
                                 "high_pass": False}),
                ("difference_of_gaussians", {"low_sigma": 1.0}),
                ("gabor", {"frequency": 0.2}),
                ("homomorphic", {}),
            ],
            name="freq-chain",
        )
        validate(cfg)
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(compile_pipeline(cfg, donate=False)(
            jnp.asarray(img)
        ))
        assert out.dtype == np.uint8 and out.shape == img.shape

    def test_volume_chain_compiles(self, rng):
        from mies_tpu.pipeline.compiler import compile_volume_pipeline

        cfg = PipelineConfig.make(
            [
                ("butterworth3d", {"cutoff_frequency_ratio": 0.1,
                                   "high_pass": False}),
                ("difference_of_gaussians3d", {"low_sigma": 1.0}),
                ("homomorphic3d", {"npad": 4}),
            ],
            name="freq-vol",
        )
        validate(cfg)
        vol = rng.random((8, 32, 32)).astype(np.float32)
        out = np.asarray(
            compile_volume_pipeline(cfg)(jnp.asarray(vol))
        )
        assert out.dtype == np.uint8 and out.shape == vol.shape

    def test_value_rules_reject(self):
        with pytest.raises(ValueError, match="cutoff_frequency_ratio"):
            validate(PipelineConfig.make(
                [("butterworth", {"cutoff_frequency_ratio": 0.9})]
            ))
        with pytest.raises(ValueError, match="output"):
            validate(PipelineConfig.make(
                [("gabor", {"frequency": 0.2, "output": "phase"})]
            ))
        with pytest.raises(ValueError, match="low_gain"):
            validate(PipelineConfig.make(
                [("homomorphic", {"low_gain": -1.0})]
            ))
        with pytest.raises(ValueError, match="npad"):
            validate(PipelineConfig.make(
                [("butterworth3d", {"npad": -3})]
            ))


class TestSharding:
    def test_dog_band_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh

        cfg = PipelineConfig.make(
            [("difference_of_gaussians",
              {"low_sigma": 1.0, "high_sigma": 3.0})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_gabor_band_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh

        cfg = PipelineConfig.make(
            [("gabor", {"frequency": 0.2, "theta": 0.5})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_gabor_bank_band_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh

        cfg = PipelineConfig.make(
            [("gabor_bank", {"frequency": 0.2, "n_orientations": 4})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_fft_ops_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        for op in ("butterworth", "homomorphic"):
            with pytest.raises(ValueError, match="spatially sharded"):
                stage_receptive_field(op, {})
        for op in ("butterworth3d", "homomorphic3d"):
            with pytest.raises(ValueError, match="z-shardable"):
                volume_stage_z_field(op, {})

    def test_dog3d_zband_field(self):
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        assert volume_stage_z_field(
            "difference_of_gaussians3d", {"low_sigma": 1.0}
        ) == int(4.0 * 1.6 + 0.5)

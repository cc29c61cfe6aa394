"""Pyramid ops vs the REAL cv2 (pyrDown/pyrUp) and the MUSICA golden."""

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from mies_tpu.ops.pyramid import (
    laplacian_pyramid,
    musica,
    pyr_down,
    pyr_up,
)
from mies_tpu.pipeline.config import PipelineConfig, validate
from mies_tpu.pipeline.compiler import compile_pipeline
import tests.goldens.golden_ops as G

_SHAPES = [(64, 64), (65, 63), (32, 48), (17, 33)]


class TestPyrOps:
    @pytest.mark.parametrize("shape", _SHAPES)
    def test_pyr_down_matches_cv2(self, rng, shape):
        img = rng.random(shape).astype(np.float32)
        ref = cv2.pyrDown(img)
        out = np.asarray(pyr_down(jnp.asarray(img)))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-6)

    @pytest.mark.parametrize("shape", _SHAPES)
    def test_pyr_up_matches_cv2(self, rng, shape):
        # includes ODD dstsize — cv2 filters the full 2n grid, then crops
        small = cv2.pyrDown(rng.random(shape).astype(np.float32))
        ref = cv2.pyrUp(small, dstsize=(shape[1], shape[0]))
        out = np.asarray(pyr_up(jnp.asarray(small), shape))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_pyr_up_default_shape(self, rng):
        img = rng.random((24, 20)).astype(np.float32)
        ref = cv2.pyrUp(img)
        out = np.asarray(pyr_up(jnp.asarray(img)))
        assert out.shape == ref.shape == (48, 40)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_pyr_up_bad_shape_raises(self, rng):
        with pytest.raises(ValueError, match="out_shape"):
            pyr_up(jnp.zeros((16, 16)), (34, 32))

    @pytest.mark.parametrize("shape", [(64, 64), (65, 63)])
    def test_laplacian_reconstructs(self, rng, shape):
        img = rng.random(shape).astype(np.float32)
        bands = laplacian_pyramid(jnp.asarray(img), 3)
        out = bands[3]
        for k in reversed(range(3)):
            out = pyr_up(out, bands[k].shape) + bands[k]
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


class TestMusica:
    @pytest.mark.parametrize("shape", [(128, 128), (96, 72)])
    def test_matches_golden(self, rng, shape):
        img = rng.random(shape).astype(np.float32)
        out = np.asarray(musica(jnp.asarray(img), levels=3, p=0.6,
                                gain=1.5))
        gold = G.musica(img, levels=3, p=0.6, gain=1.5)
        np.testing.assert_allclose(out, gold, atol=2e-5)

    def test_per_level_gains(self, rng):
        img = rng.random((64, 64)).astype(np.float32)
        gains = (2.0, 1.5, 1.0)
        out = np.asarray(musica(jnp.asarray(img), levels=3, p=0.5,
                                gain=gains))
        gold = G.musica(img, levels=3, p=0.5, gain=gains)
        np.testing.assert_allclose(out, gold, atol=2e-5)

    def test_identity_at_p1_gain1(self, rng):
        # p=1, gain=1: every band passes through -> exact reconstruction
        img = rng.random((64, 64)).astype(np.float32) * 0.8 + 0.1
        out = np.asarray(musica(jnp.asarray(img), levels=4, p=1.0,
                                gain=1.0))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_amplifies_low_contrast_detail(self, rng):
        # a faint fine grating must gain MORE contrast than a strong one
        y, x = np.mgrid[0:128, 0:128]
        grating = np.sin(x * (2 * np.pi / 8)).astype(np.float32)
        faint = 0.5 + 0.02 * grating
        strong = 0.5 + 0.30 * grating
        ef = np.asarray(musica(jnp.asarray(faint), levels=3, p=0.5))
        es = np.asarray(musica(jnp.asarray(strong), levels=3, p=0.5))
        c = slice(16, 112)
        gain_faint = ef[c, c].std() / faint[c, c].std()
        gain_strong = es[c, c].std() / strong[c, c].std()
        assert gain_faint > 2.0            # subtle detail boosted hard
        assert gain_faint > 1.5 * gain_strong  # compressive: faint >> strong

    def test_bad_params_raise(self):
        z = jnp.zeros((32, 32))
        with pytest.raises(ValueError, match="p must"):
            musica(z, p=0.0)
        with pytest.raises(ValueError, match="levels"):
            musica(z, levels=0)
        with pytest.raises(ValueError, match="too small"):
            musica(jnp.zeros((8, 8)), levels=4)
        with pytest.raises(ValueError, match="gain"):
            musica(z, levels=3, gain=(1.0, 2.0))
        with pytest.raises(ValueError, match="p="):
            validate(PipelineConfig.make([("musica", {"p": 1.5})]))

    def test_pipeline_and_batched_consistency(self, rng):
        cfg = PipelineConfig.make(
            [("musica", {"levels": 3, "p": 0.7, "gain": 1.3})],
            name="musica-chain",
        )
        validate(cfg)
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        assert out.dtype == np.uint8
        outb = np.asarray(
            compile_pipeline(cfg, batched=True, donate=False)(
                jnp.asarray(np.stack([img] * 2))
            )
        )
        assert outb.shape == (2,) + out.shape
        # batched lowering may differ by 1 uint8 level on rounding ties
        assert np.abs(outb[0].astype(int) - out.astype(int)).max() <= 1

    def test_spatial_sharding_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="spatially sharded"):
            stage_receptive_field("musica", {})

    def test_shipped_config_loads(self):
        from mies_tpu.pipeline.config import load_config

        cfg = load_config("configs/xray_musica.yaml")
        assert [s.op for s in cfg.stages] == [
            "anisotropic_diffusion", "musica"
        ]

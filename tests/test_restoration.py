"""Restoration ops (skimage.restoration surface) vs the NumPy goldens.

Tolerance note for NL-means: the weight cutoff (distance <= 5.0) is a
knife edge — a distance that lands within float32 noise of 5.0 can flip
a single weight of exp(-5) ~= 0.0067 between the f32 device op and the
f64 golden, bounding any flipped pixel's error by ~3e-3. Assertions
therefore pair a tight MEAN bound (the whole image must agree) with a
cutoff-aware max bound. The fixed per-test rng makes actual flips
deterministic; observed max deviations are ~2e-7.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mies_tpu.ops import restoration as R
from mies_tpu.pipeline.config import PipelineConfig, validate
from mies_tpu.pipeline.compiler import (
    compile_pipeline,
    compile_volume_pipeline,
)
import tests.goldens.golden_ops as G


def _noisy(rng, shape):
    base = np.linspace(0.2, 0.8, shape[-1], dtype=np.float32)
    img = np.broadcast_to(base, shape).copy()
    img += rng.normal(0.0, 0.08, shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _assert_close_nlm(out, gold):
    diff = np.abs(out - np.asarray(gold, np.float32))
    assert diff.mean() < 1e-6, f"mean {diff.mean()}"
    assert diff.max() < 5e-3, f"max {diff.max()} (beyond a cutoff flip)"


class TestNlMeans:
    def test_matches_golden_2d(self, rng):
        img = _noisy(rng, (48, 52))
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_nl_means(
                    x, patch_size=5, patch_distance=4, h=0.08, sigma=0.02
                )
            )(jnp.asarray(img))
        )
        gold = G.denoise_nl_means(
            img, patch_size=5, patch_distance=4, h=0.08, sigma=0.02
        )
        _assert_close_nlm(out, gold)

    def test_matches_golden_defaults_small(self, rng):
        # default h, sigma=0 (no bias subtraction) on a small slice
        img = _noisy(rng, (40, 40))
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_nl_means(x, patch_size=5, patch_distance=3)
            )(jnp.asarray(img))
        )
        gold = G.denoise_nl_means(img, patch_size=5, patch_distance=3)
        _assert_close_nlm(out, gold)

    def test_even_patch_size_promoted(self, rng):
        # skimage promotes even s to s+1; both forms must agree exactly
        img = _noisy(rng, (32, 32))
        f_even = jax.jit(
            lambda x: R.denoise_nl_means(x, patch_size=4, patch_distance=2)
        )
        f_odd = jax.jit(
            lambda x: R.denoise_nl_means(x, patch_size=5, patch_distance=2)
        )
        np.testing.assert_array_equal(
            np.asarray(f_even(jnp.asarray(img))),
            np.asarray(f_odd(jnp.asarray(img))),
        )

    def test_matches_golden_3d(self, rng):
        vol = _noisy(rng, (10, 24, 26))
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_nl_means3d(
                    x, patch_size=3, patch_distance=2, h=0.1
                )
            )(jnp.asarray(vol))
        )
        gold = G.denoise_nl_means(vol, patch_size=3, patch_distance=2, h=0.1)
        _assert_close_nlm(out, gold)

    def test_denoises(self, rng):
        clean = np.broadcast_to(
            np.linspace(0.2, 0.8, 64, dtype=np.float32), (64, 64)
        ).copy()
        noisy = np.clip(
            clean + rng.normal(0, 0.06, clean.shape).astype(np.float32), 0, 1
        )
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_nl_means(
                    x, patch_size=5, patch_distance=5, h=0.08, sigma=0.06
                )
            )(jnp.asarray(noisy))
        )
        assert np.square(out - clean).mean() < 0.3 * np.square(
            noisy - clean
        ).mean()

    def test_small_image_allocation_pad(self, rng):
        # regression: the paired core's allocation pad (offset + 2d) used
        # to exceed jnp.pad's reflect limit on images where the SEMANTIC
        # pad (offset + d) still fit — 12x12 with s=7, d=5
        img = rng.random((12, 12)).astype(np.float32)
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_nl_means(x, patch_size=7, patch_distance=5)
            )(jnp.asarray(img))
        )
        gold = G.denoise_nl_means(img, patch_size=7, patch_distance=5)
        _assert_close_nlm(out, gold)

    def test_rejects_oversized_window(self, rng):
        with pytest.raises(ValueError, match="patch_distance"):
            R.denoise_nl_means(
                jnp.zeros((16, 16)), patch_size=7, patch_distance=13
            )

    def test_band_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, spatial_shard_apply

        cfg = PipelineConfig.make(
            [("denoise_nl_means",
              {"patch_size": 5, "patch_distance": 4, "h": 0.08})]
        )
        img = _noisy(rng, (128, 64))
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_zband_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, volume_shard_apply

        cfg = PipelineConfig.make(
            [("denoise_nl_means3d",
              {"patch_size": 3, "patch_distance": 2, "h": 0.1})]
        )
        vol = _noisy(rng, (24, 24, 24))
        mesh = make_mesh(space=4)
        out = np.asarray(
            volume_shard_apply(cfg, mesh, quantize=False)(jnp.asarray(vol))
        )
        ref = np.asarray(
            compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol))
        )
        np.testing.assert_array_equal(out, ref)


class TestTvChambolle:
    def test_matches_golden_fixed_iters(self, rng):
        # eps=0 disables early stopping -> deterministic iteration count
        img = _noisy(rng, (48, 40))
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_tv(x, weight=0.12, eps=0.0, max_num_iter=40)
            )(jnp.asarray(img))
        )
        gold = G.denoise_tv_chambolle(img, weight=0.12, eps=0.0, max_num_iter=40)
        np.testing.assert_allclose(out, gold, atol=5e-6)

    def test_matches_golden_with_convergence(self, rng):
        # default eps: both implementations stop on |dE| < eps * E_init;
        # f32-vs-f64 energies can differ by one stopping iteration, but
        # near convergence one extra step moves pixels by < 1e-4
        img = _noisy(rng, (48, 48))
        out = np.asarray(
            jax.jit(lambda x: R.denoise_tv(x, weight=0.1))(jnp.asarray(img))
        )
        gold = G.denoise_tv_chambolle(img, weight=0.1)
        np.testing.assert_allclose(out, gold, atol=2e-4)

    def test_matches_golden_3d(self, rng):
        vol = _noisy(rng, (8, 20, 20))
        out = np.asarray(
            jax.jit(
                lambda x: R.denoise_tv3d(x, weight=0.1, eps=0.0, max_num_iter=25)
            )(jnp.asarray(vol))
        )
        gold = G.denoise_tv_chambolle(vol, weight=0.1, eps=0.0, max_num_iter=25)
        np.testing.assert_allclose(out, gold, atol=5e-6)

    def test_reduces_total_variation(self, rng):
        img = _noisy(rng, (64, 64))
        out = np.asarray(
            jax.jit(lambda x: R.denoise_tv(x, weight=0.15))(jnp.asarray(img))
        )

        def tv(a):
            return np.abs(np.diff(a, axis=0)).sum() + np.abs(
                np.diff(a, axis=1)
            ).sum()

        assert tv(out) < 0.5 * tv(img)

    def test_spatial_sharding_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="global"):
            stage_receptive_field("denoise_tv", {})

    def test_z_sharding_rejected(self):
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        with pytest.raises(ValueError, match="z-shardable"):
            volume_stage_z_field("denoise_tv3d", {})


class TestRichardsonLucy:
    def _blurred(self, rng, shape=(48, 48), sigma=1.5, size=7):
        img = np.zeros(shape, np.float32)
        img[12:36, 10:20] = 0.9
        img[20:28, 30:44] = 0.6
        img += rng.normal(0, 0.01, shape).astype(np.float32)
        img = np.clip(img, 0, 1)
        taps = R.gaussian_kernel1d(sigma, size // 2)
        blurred = np.asarray(
            jax.jit(lambda x: R._gauss_same(x, taps))(jnp.asarray(img))
        )
        return img, blurred

    def test_matches_golden(self, rng):
        _, blurred = self._blurred(rng)
        out = np.asarray(
            jax.jit(
                lambda x: R.richardson_lucy(
                    x, psf_sigma=1.5, psf_size=7, num_iter=15
                )
            )(jnp.asarray(blurred))
        )
        gold = G.richardson_lucy(blurred, R._rl_psf(1.5, 7), num_iter=15)
        np.testing.assert_allclose(out, gold, atol=2e-5)

    def test_matches_golden_filter_epsilon(self, rng):
        _, blurred = self._blurred(rng)
        out = np.asarray(
            jax.jit(
                lambda x: R.richardson_lucy(
                    x, psf_sigma=1.5, psf_size=7, num_iter=10,
                    filter_epsilon=1e-3,
                )
            )(jnp.asarray(blurred))
        )
        gold = G.richardson_lucy(
            blurred, R._rl_psf(1.5, 7), num_iter=10, filter_epsilon=1e-3
        )
        np.testing.assert_allclose(out, gold, atol=2e-5)

    def test_deblurs(self, rng):
        sharp, blurred = self._blurred(rng)
        out = np.asarray(
            jax.jit(
                lambda x: R.richardson_lucy(
                    x, psf_sigma=1.5, psf_size=7, num_iter=25
                )
            )(jnp.asarray(blurred))
        )
        assert np.square(out - sharp).mean() < 0.5 * np.square(
            blurred - sharp
        ).mean()

    def test_rejects_even_psf(self):
        with pytest.raises(ValueError, match="odd"):
            R.richardson_lucy(jnp.zeros((8, 8)), psf_size=4)

    def test_spatial_sharding_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="global"):
            stage_receptive_field("richardson_lucy", {})


class TestPipelineIntegration:
    def test_chain_with_restoration_ops(self, rng):
        cfg = PipelineConfig.make(
            [
                ("denoise_nl_means", {"patch_size": 5, "patch_distance": 3}),
                ("denoise_tv", {"weight": 0.05, "max_num_iter": 20}),
                ("adjust_gamma", {"gamma": 0.9}),
            ],
            name="restoration-chain",
        )
        validate(cfg)
        img = _noisy(rng, (64, 64))
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        assert out.dtype == np.uint8
        # batched (vmapped) path agrees with the single-image path
        outb = np.asarray(
            compile_pipeline(cfg, batched=True, donate=False)(
                jnp.asarray(np.stack([img, img]))
            )
        )
        np.testing.assert_array_equal(outb[0], out)
        np.testing.assert_array_equal(outb[1], out)

    def test_volume_chain(self, rng):
        cfg = PipelineConfig.make(
            [
                ("denoise_nl_means3d", {"patch_size": 3, "patch_distance": 2}),
                ("denoise_tv3d", {"weight": 0.08, "max_num_iter": 10}),
            ],
            name="restoration-3d",
        )
        validate(cfg)
        vol = _noisy(rng, (8, 24, 24))
        out = np.asarray(
            compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol))
        )
        assert np.isfinite(out).all()

    def test_validation_rejects_bad_params(self):
        for stage, bad in [
            (("denoise_nl_means", {"h": 0.0}), "h"),
            (("denoise_nl_means", {"patch_size": 0}), "patch_size"),
            (("denoise_tv", {"max_num_iter": 0}), "max_num_iter"),
            (("richardson_lucy", {"psf_size": 4}), "psf_size"),
            (("richardson_lucy", {"filter_epsilon": -1.0}), "filter_epsilon"),
        ]:
            cfg = PipelineConfig.make([stage])
            with pytest.raises(ValueError, match=bad):
                validate(cfg)

    def test_2d_tv_rejected_in_volume_only_guard(self):
        # denoise_tv3d is volume-only: the 2-D builder must name it
        cfg = PipelineConfig.make([("denoise_tv3d", {})])
        with pytest.raises(ValueError, match="volume-only"):
            compile_pipeline(cfg, donate=False)


class TestWiener:
    def test_matches_golden_2d(self, rng):
        import jax.numpy as jnp
        from goldens import golden_ops as G
        from mies_tpu.ops.restoration import wiener

        img = rng.random((64, 96)).astype(np.float32)
        for kw in ({}, {"psf_sigma": 2.0, "psf_size": 9},
                   {"balance": 0.5}, {"clip": False}):
            ref = G.wiener_deconv(img, **kw)
            got = np.asarray(wiener(jnp.asarray(img), **kw))
            np.testing.assert_allclose(got, ref, atol=3e-5)

    def test_matches_golden_3d(self, rng):
        import jax.numpy as jnp
        from goldens import golden_ops as G
        from mies_tpu.ops.restoration import wiener3d

        vol = rng.random((8, 32, 48)).astype(np.float32)
        ref = G.wiener_deconv(vol, psf_sigma=1.0, psf_size=5)
        got = np.asarray(wiener3d(jnp.asarray(vol), psf_sigma=1.0,
                                  psf_size=5))
        np.testing.assert_allclose(got, ref, atol=3e-5)

    def test_deblurs(self, rng):
        """Wiener of a Gaussian-blurred image recovers detail: closer
        to the original than the blurred input is."""
        import jax.numpy as jnp
        from mies_tpu.ops.filters import gaussian_blur
        from mies_tpu.ops.restoration import wiener

        clean = np.clip(
            0.5 + 0.3 * rng.standard_normal((64, 64)), 0, 1
        ).astype(np.float32)
        from scipy import ndimage
        clean = ndimage.gaussian_filter(clean, 1.5).astype(np.float32)
        blurred = np.asarray(
            gaussian_blur(jnp.asarray(clean), 1.5, mode="wrap")
        )
        restored = np.asarray(
            wiener(jnp.asarray(blurred), psf_sigma=1.5, psf_size=13,
                   balance=0.001)
        )
        err_blur = float(np.mean((blurred - clean) ** 2))
        err_rest = float(np.mean((restored - clean) ** 2))
        assert err_rest < 0.5 * err_blur, (err_rest, err_blur)

    def test_bad_params(self, rng):
        import jax.numpy as jnp
        from mies_tpu.ops.restoration import wiener
        from mies_tpu.pipeline.config import PipelineConfig, validate

        with pytest.raises(ValueError, match="odd"):
            wiener(jnp.zeros((8, 8), jnp.float32), psf_size=4)
        with pytest.raises(ValueError, match="balance"):
            wiener(jnp.zeros((8, 8), jnp.float32), balance=0.0)
        with pytest.raises(ValueError, match="balance"):
            validate(PipelineConfig.make([("wiener", {"balance": -1.0})]))

    def test_sharding_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        with pytest.raises(ValueError, match="spatially sharded"):
            stage_receptive_field("wiener", {})
        with pytest.raises(ValueError, match="z-shardable"):
            volume_stage_z_field("wiener3d", {})


class TestAnisotropicDiffusion:
    @pytest.mark.parametrize("option", [1, 2])
    def test_matches_golden_2d(self, rng, option):
        img = _noisy(rng, (40, 56))
        out = np.asarray(R.anisotropic_diffusion(
            jnp.asarray(img), niter=12, kappa=0.1, gamma=0.2, option=option
        ))
        gold = G.anisotropic_diffusion(
            img, niter=12, kappa=0.1, gamma=0.2, option=option
        )
        np.testing.assert_allclose(out, gold, atol=1e-5)

    def test_matches_golden_3d_voxelspacing(self, rng):
        vol = _noisy(rng, (10, 24, 24))
        sp = (2.5, 0.7, 0.7)
        out = np.asarray(R.anisotropic_diffusion3d(
            jnp.asarray(vol), niter=6, kappa=0.15, gamma=0.1,
            voxelspacing=sp,
        ))
        gold = G.anisotropic_diffusion(
            vol, niter=6, kappa=0.15, gamma=0.1, voxelspacing=sp
        )
        np.testing.assert_allclose(out, gold, atol=1e-5)

    def test_smooths_flat_keeps_edge(self, rng):
        # the defining property: a step edge survives, noise dies
        img = np.full((32, 64), 0.2, np.float32)
        img[:, 32:] = 0.8
        noisy = np.clip(
            img + rng.normal(0, 0.02, img.shape).astype(np.float32), 0, 1
        )
        out = np.asarray(R.anisotropic_diffusion(
            jnp.asarray(noisy), niter=20, kappa=0.05, gamma=0.2
        ))
        # flat-region noise reduced
        assert out[:, 4:28].std() < 0.5 * noisy[:, 4:28].std()
        # edge contrast preserved within 10%
        jump = out[:, 36:60].mean() - out[:, 4:28].mean()
        assert jump > 0.9 * 0.6

    def test_band_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, spatial_shard_apply

        cfg = PipelineConfig.make(
            [("anisotropic_diffusion",
              {"niter": 9, "kappa": 0.1, "gamma": 0.2})]
        )
        img = _noisy(rng, (128, 64))
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_zband_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, volume_shard_apply

        cfg = PipelineConfig.make(
            [("anisotropic_diffusion3d",
              {"niter": 5, "kappa": 0.1, "voxelspacing": (2.0, 1.0, 1.0)})]
        )
        vol = _noisy(rng, (24, 24, 24))
        mesh = make_mesh(space=4)
        out = np.asarray(
            volume_shard_apply(cfg, mesh, quantize=False)(jnp.asarray(vol))
        )
        ref = np.asarray(
            compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol))
        )
        np.testing.assert_array_equal(out, ref)

    def test_bad_params_raise(self):
        with pytest.raises(ValueError, match="niter"):
            R.anisotropic_diffusion(jnp.zeros((8, 8)), niter=0)
        with pytest.raises(ValueError, match="option"):
            R.anisotropic_diffusion(jnp.zeros((8, 8)), option=3)
        with pytest.raises(ValueError, match="voxelspacing"):
            R.anisotropic_diffusion3d(
                jnp.zeros((4, 8, 8)), voxelspacing=(1.0, 2.0)
            )
        with pytest.raises(ValueError, match="option"):
            validate(PipelineConfig.make(
                [("anisotropic_diffusion", {"option": 3})]
            ))


class TestSrad:
    def _speckled(self, rng, shape=(48, 64)):
        base = np.full(shape, 0.4, np.float32)
        base[:, shape[1] // 2:] = 0.7
        # multiplicative speckle (the ultrasound model)
        return np.clip(
            base * (1.0 + 0.15 * rng.standard_normal(shape)), 0.01, 1.0
        ).astype(np.float32)

    def test_matches_golden(self, rng):
        img = self._speckled(rng)
        out = np.asarray(R.srad(jnp.asarray(img), niter=10))
        np.testing.assert_allclose(
            out, G.srad(img, niter=10), atol=1e-5, rtol=0
        )

    def test_despeckles_keeps_edge(self, rng):
        img = self._speckled(rng, (64, 64))
        out = np.asarray(R.srad(jnp.asarray(img), niter=20))
        # speckle in the flat halves reduced
        assert out[:, 4:28].std() < 0.5 * img[:, 4:28].std()
        # edge contrast preserved
        jump = out[:, 40:60].mean() - out[:, 4:24].mean()
        assert jump > 0.8 * 0.3

    def test_band_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, spatial_shard_apply

        cfg = PipelineConfig.make([("srad", {"niter": 7})])
        img = self._speckled(rng, (128, 64))
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_bad_params_raise(self):
        with pytest.raises(ValueError, match="niter"):
            R.srad(jnp.zeros((8, 8)), niter=0)
        with pytest.raises(ValueError, match="dt"):
            R.srad(jnp.zeros((8, 8)), dt=0.5)
        with pytest.raises(ValueError, match="q0"):
            R.srad(jnp.zeros((8, 8)), q0=0.0)
        with pytest.raises(ValueError, match="dt"):
            validate(PipelineConfig.make([("srad", {"dt": 0.3})]))


class TestSrad3d:
    def test_matches_golden(self, rng):
        v = (0.4 + 0.1 * rng.standard_normal((10, 24, 24))).clip(
            0.01, 1.0
        ).astype(np.float32)
        out = np.asarray(R.srad3d(jnp.asarray(v), niter=6))
        np.testing.assert_allclose(
            out, G.srad3d(v, niter=6), atol=1e-5, rtol=0
        )

    def test_zband_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, volume_shard_apply

        cfg = PipelineConfig.make([("srad3d", {"niter": 5})])
        v = (0.4 + 0.1 * rng.standard_normal((24, 24, 24))).clip(
            0.01, 1.0
        ).astype(np.float32)
        mesh = make_mesh(space=4)
        out = np.asarray(
            volume_shard_apply(cfg, mesh, quantize=False)(jnp.asarray(v))
        )
        ref = np.asarray(
            compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(v))
        )
        np.testing.assert_array_equal(out, ref)

    def test_bad_params_raise(self):
        with pytest.raises(ValueError, match="dt"):
            R.srad3d(jnp.zeros((4, 8, 8)), dt=0.3)
        with pytest.raises(ValueError, match="dt"):
            validate(PipelineConfig.make([("srad3d", {"dt": 0.3})]))


def test_nlm_unroll_variant_matches(rng, monkeypatch):
    """MIES_TPU_NLM=unroll replays the SAME pair table in the same
    accumulation order with static slices (benchmarks/nlm_ab.py A/Bs
    them on chip). The math is identical but XLA contracts/fuses the
    static-slice form differently (measured 1.8e-7 max on CPU — the
    bilateral-pairs ULP class), so the pin is a tight tolerance, not
    bit equality. Eager calls so each variant traces fresh (the knob
    is trace-time)."""
    img = _noisy(rng, (40, 44))
    x = jnp.asarray(img)

    def run():
        return np.asarray(
            R.denoise_nl_means(x, patch_size=5, patch_distance=3,
                               h=0.07, sigma=0.03)
        )

    monkeypatch.setenv("MIES_TPU_NLM", "fori")
    a = run()
    monkeypatch.setenv("MIES_TPU_NLM", "unroll")
    b = run()
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=0)
    monkeypatch.setenv("MIES_TPU_NLM", "bogus")
    with pytest.raises(ValueError, match="MIES_TPU_NLM"):
        run()

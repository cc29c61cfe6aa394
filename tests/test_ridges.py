"""Frangi vesselness: scipy-exact derivatives + paper-faithful formula."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage

from mies_tpu.ops import ridges as RG
from mies_tpu.pipeline.config import PipelineConfig, validate
from mies_tpu.pipeline.compiler import compile_pipeline
import tests.goldens.golden_ops as G


class TestGaussianDerivative:
    @pytest.mark.parametrize(
        "order", [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2)]
    )
    def test_matches_scipy(self, rng, order):
        img = rng.random((48, 56)).astype(np.float32)
        ours = np.asarray(
            jax.jit(lambda x: RG.gaussian_derivative(x, 1.7, order))(
                jnp.asarray(img)
            )
        )
        ref = ndimage.gaussian_filter(
            img.astype(np.float64), 1.7, order=order, mode="reflect"
        )
        np.testing.assert_allclose(ours, ref, atol=5e-7)

    @pytest.mark.parametrize("mode", ["reflect", "nearest", "mirror",
                                      "constant", "wrap"])
    def test_border_modes(self, rng, mode):
        img = rng.random((40, 40)).astype(np.float32)
        ours = np.asarray(
            jax.jit(
                lambda x: RG.gaussian_derivative(x, 1.2, (1, 0), mode=mode)
            )(jnp.asarray(img))
        )
        ref = ndimage.gaussian_filter(
            img.astype(np.float64), 1.2, order=(1, 0), mode=mode
        )
        np.testing.assert_allclose(ours, ref, atol=5e-7)


class TestFrangi:
    def test_matches_golden(self, rng):
        img = rng.random((64, 72)).astype(np.float32)
        out = np.asarray(
            jax.jit(lambda x: RG.frangi(x, sigmas=(1.0, 2.0, 3.0)))(
                jnp.asarray(img)
            )
        )
        gold = G.frangi_vesselness(img, sigmas=(1.0, 2.0, 3.0))
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_matches_golden_explicit_gamma_white_ridges(self, rng):
        img = rng.random((48, 48)).astype(np.float32)
        kw = dict(sigmas=(1.5,), beta=0.4, gamma=0.08, black_ridges=False)
        out = np.asarray(
            jax.jit(lambda x: RG.frangi(x, **kw))(jnp.asarray(img))
        )
        gold = G.frangi_vesselness(img, **kw)
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_selects_vessels(self):
        # dark 3px line on a bright background (black_ridges default)
        img = np.full((64, 64), 0.8, np.float32)
        img[:, 30:33] = 0.2
        v = np.asarray(
            jax.jit(lambda x: RG.frangi(x, sigmas=(1.0, 2.0)))(
                jnp.asarray(img)
            )
        )
        assert v[10:54, 31].mean() > 0.5
        assert v[10:54, 10].mean() < 0.05

    def test_vessel_enhance_brightens_in_place(self):
        img = np.full((64, 64), 0.5, np.float32)
        img[:, 20:22] = 0.1
        out = np.asarray(
            jax.jit(
                lambda x: RG.vessel_enhance(x, sigmas=(1.0,), amount=0.5)
            )(jnp.asarray(img))
        )
        assert out[32, 21] > img[32, 21]  # vessel lifted
        assert abs(out[32, 50] - img[32, 50]) < 1e-4  # background untouched

    def test_pipeline_and_validation(self, rng):
        cfg = PipelineConfig.make(
            [("vessel_enhance", {"sigmas": (1.0, 2.0), "gamma": 0.1})],
            name="vessels",
        )
        validate(cfg)
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        assert out.dtype == np.uint8
        bad = PipelineConfig.make([("frangi", {"sigmas": ()})])
        with pytest.raises(ValueError, match="sigmas"):
            validate(bad)

    def test_band_sharded_bit_exact_explicit_gamma(self, rng):
        from mies_tpu.parallel import make_mesh, spatial_shard_apply

        cfg = PipelineConfig.make(
            [("vessel_enhance",
              {"sigmas": (1.0, 2.0), "gamma": 0.1, "amount": 1.0})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_sharding_rejects_global_gamma(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="gamma"):
            stage_receptive_field("frangi", {"sigmas": (1.0,)})
        assert stage_receptive_field(
            "frangi", {"sigmas": (1.0, 2.5), "gamma": 0.1}
        ) == 10


class TestFrangi3d:
    def test_eigensolver_matches_lapack(self, rng):
        a = rng.normal(size=(6, 24, 24)).astype(np.float32)
        l1, l2, l3 = jax.jit(RG._eigvalsh3_by_magnitude)(
            *[jnp.asarray(c) for c in a]
        )
        H = np.zeros((24, 24, 3, 3))
        H[..., 0, 0], H[..., 0, 1], H[..., 0, 2] = a[0], a[1], a[2]
        H[..., 1, 0], H[..., 1, 1], H[..., 1, 2] = a[1], a[3], a[4]
        H[..., 2, 0], H[..., 2, 1], H[..., 2, 2] = a[2], a[4], a[5]
        eig = np.linalg.eigvalsh(H.astype(np.float64))
        eig = np.take_along_axis(
            eig, np.argsort(np.abs(eig), axis=-1), -1
        )
        for i, l in enumerate([l1, l2, l3]):
            np.testing.assert_allclose(
                np.asarray(l), eig[..., i], atol=5e-6
            )

    def test_eigensolver_isotropic_point(self):
        # p ~ 0 fallback: a scaled identity has a triple eigenvalue
        z = jnp.full((4, 4), 0.7)
        o = jnp.zeros((4, 4))
        l1, l2, l3 = RG._eigvalsh3_by_magnitude(z, o, o, z, o, z)
        for l in (l1, l2, l3):
            np.testing.assert_allclose(np.asarray(l), 0.7, atol=1e-6)

    def test_matches_golden(self, rng):
        vol = rng.random((12, 28, 30)).astype(np.float32)
        out = np.asarray(
            jax.jit(lambda x: RG.frangi3d(x, sigmas=(1.0, 2.0)))(
                jnp.asarray(vol)
            )
        )
        gold = G.frangi3d_vesselness(vol, sigmas=(1.0, 2.0))
        d = np.abs(out - gold)
        assert d.max() < 5e-5 and d.mean() < 1e-6

    def test_selects_tubes(self):
        tube = np.full((24, 32, 32), 0.8, np.float32)
        zz, yy, xx = np.mgrid[0:24, 0:32, 0:32]
        tube[(yy - 16) ** 2 + (xx - 16) ** 2 <= 4] = 0.2
        v = np.asarray(
            jax.jit(lambda x: RG.frangi3d(x, sigmas=(1.0, 2.0)))(
                jnp.asarray(tube)
            )
        )
        assert v[12, 16, 16] > 0.5
        assert v[12, 4, 4] < 0.05

    def test_zband_sharded_bit_exact_explicit_gamma(self, rng):
        from mies_tpu.parallel import make_mesh, volume_shard_apply
        from mies_tpu.pipeline.compiler import compile_volume_pipeline

        cfg = PipelineConfig.make(
            [("vessel_enhance3d",
              {"sigmas": (1.0,), "gamma": 0.1, "amount": 1.0})]
        )
        vol = rng.random((32, 24, 24)).astype(np.float32)
        mesh = make_mesh(space=4)
        out = np.asarray(
            volume_shard_apply(cfg, mesh, quantize=False)(jnp.asarray(vol))
        )
        ref = np.asarray(
            compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol))
        )
        np.testing.assert_array_equal(out, ref)

    def test_z_sharding_rejects_global_gamma(self):
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        with pytest.raises(ValueError, match="gamma"):
            volume_stage_z_field("frangi3d", {"sigmas": (1.0,)})
        assert volume_stage_z_field(
            "frangi3d", {"sigmas": (2.0,), "gamma": 0.1}
        ) == 8


class TestSato:
    def test_matches_golden_2d(self, rng):
        img = rng.random((64, 72)).astype(np.float32)
        out = np.asarray(
            jax.jit(lambda x: RG.sato(x, sigmas=(1.0, 2.0, 3.0)))(
                jnp.asarray(img)
            )
        )
        gold = G.sato_tubeness(img, sigmas=(1.0, 2.0, 3.0))
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_matches_golden_2d_white_ridges(self, rng):
        img = rng.random((48, 48)).astype(np.float32)
        kw = dict(sigmas=(1.5, 2.5), black_ridges=False, mode="nearest")
        out = np.asarray(jax.jit(lambda x: RG.sato(x, **kw))(jnp.asarray(img)))
        gold = G.sato_tubeness(img, **kw)
        np.testing.assert_allclose(out, gold, atol=2e-6)

    def test_matches_golden_3d(self, rng):
        vol = rng.random((12, 28, 30)).astype(np.float32)
        out = np.asarray(
            jax.jit(lambda x: RG.sato3d(x, sigmas=(1.0, 2.0)))(
                jnp.asarray(vol)
            )
        )
        gold = G.sato3d_tubeness(vol, sigmas=(1.0, 2.0))
        d = np.abs(out - gold)
        assert d.max() < 5e-5 and d.mean() < 1e-6

    def test_selects_vessels(self):
        img = np.full((64, 64), 0.8, np.float32)
        img[:, 30:33] = 0.2
        v = np.asarray(
            jax.jit(lambda x: RG.sato(x, sigmas=(1.0, 2.0)))(jnp.asarray(img))
        )
        assert v[10:54, 31].mean() > 5 * v[10:54, 10].mean()

    def test_band_sharded_bit_exact_no_gamma_needed(self, rng):
        # sato has NO global statistic: shards with a plain stencil halo
        from mies_tpu.parallel import make_mesh, spatial_shard_apply

        cfg = PipelineConfig.make([("sato", {"sigmas": (1.0, 2.0)})])
        validate(cfg)
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        np.testing.assert_array_equal(out, ref)

    def test_zband_sharded_bit_exact(self, rng):
        from mies_tpu.parallel import make_mesh, volume_shard_apply
        from mies_tpu.pipeline.compiler import compile_volume_pipeline

        cfg = PipelineConfig.make([("sato3d", {"sigmas": (1.0,)})])
        vol = rng.random((32, 24, 24)).astype(np.float32)
        mesh = make_mesh(space=4)
        out = np.asarray(
            volume_shard_apply(cfg, mesh, quantize=False)(jnp.asarray(vol))
        )
        ref = np.asarray(
            compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol))
        )
        np.testing.assert_array_equal(out, ref)


class TestMeijering:
    def test_matches_golden_2d(self, rng):
        img = rng.random((64, 72)).astype(np.float32)
        out = np.asarray(
            jax.jit(lambda x: RG.meijering(x, sigmas=(1.0, 2.0, 3.0)))(
                jnp.asarray(img)
            )
        )
        gold = G.meijering_neuriteness(img, sigmas=(1.0, 2.0, 3.0))
        np.testing.assert_allclose(out, gold, atol=5e-6)

    def test_matches_golden_2d_explicit_alpha_white(self, rng):
        img = rng.random((48, 48)).astype(np.float32)
        kw = dict(sigmas=(1.5,), alpha=0.25, black_ridges=False)
        out = np.asarray(
            jax.jit(lambda x: RG.meijering(x, **kw))(jnp.asarray(img))
        )
        gold = G.meijering_neuriteness(img, **kw)
        np.testing.assert_allclose(out, gold, atol=5e-6)

    def test_matches_golden_3d(self, rng):
        vol = rng.random((12, 28, 30)).astype(np.float32)
        out = np.asarray(
            jax.jit(lambda x: RG.meijering3d(x, sigmas=(1.0, 2.0)))(
                jnp.asarray(vol)
            )
        )
        gold = G.meijering3d_neuriteness(vol, sigmas=(1.0, 2.0))
        d = np.abs(out - gold)
        assert d.max() < 5e-5 and d.mean() < 1e-6

    def test_selects_neurites(self):
        img = np.full((64, 64), 0.8, np.float32)
        img[:, 30:32] = 0.2
        v = np.asarray(
            jax.jit(lambda x: RG.meijering(x, sigmas=(1.0, 2.0)))(
                jnp.asarray(img)
            )
        )
        assert v[10:54, 30].mean() > 5 * v[10:54, 10].mean()
        assert float(v.max()) <= 1.0 + 1e-6  # per-scale max-normalized

    def test_pipeline_and_validation(self, rng):
        cfg = PipelineConfig.make(
            [("sato", {"sigmas": (1.0,)}), ("meijering", {"sigmas": (1.0,)})]
        )
        validate(cfg)
        img = rng.random((64, 64)).astype(np.float32)
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
        assert out.dtype == np.uint8
        bad = PipelineConfig.make([("meijering", {"alpha": -1.0})])
        with pytest.raises(ValueError, match="alpha"):
            validate(bad)

    def test_sharding_rejected_global_normalization(self):
        from mies_tpu.parallel.halo import stage_receptive_field
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        with pytest.raises(ValueError, match="global"):
            stage_receptive_field("meijering", {"sigmas": (1.0,)})
        with pytest.raises(ValueError, match="VOLUME-WIDE"):
            volume_stage_z_field("meijering3d", {"sigmas": (1.0,)})
        # sato needs no gamma — plain stencil radii
        assert stage_receptive_field("sato", {"sigmas": (1.0, 2.5)}) == 10
        assert volume_stage_z_field("sato3d", {"sigmas": (2.0,)}) == 8


class TestHessianRidge:
    """skimage.filters.hessian: frangi then <= 0 -> 1. The <= 0 branch
    is a KNIFE EDGE — frangi ULPs near zero flip whole pixels between
    ~0 and 1.0 — so golden comparisons exclude the knife zone and
    assert the flipped pixels land on one of the two legal values."""

    def test_matches_golden_off_knife(self, rng):
        from mies_tpu.ops.ridges import hessian

        img = rng.random((48, 64)).astype(np.float32)
        out = np.asarray(hessian(jnp.asarray(img), sigmas=(1.0, 3.0)))
        gold = G.hessian_ridge(img, sigmas=(1.0, 3.0))
        fr = G.frangi_vesselness(img, sigmas=(1.0, 3.0), gamma=15.0)
        knife = np.abs(fr) <= 1e-6
        np.testing.assert_allclose(
            out[~knife], gold[~knife], atol=1e-5, rtol=0
        )
        # knife pixels: either the tiny frangi value or the 1.0 map
        ok = (np.abs(out[knife] - 1.0) <= 1e-6) | (
            np.abs(out[knife]) <= 2e-6
        )
        assert ok.all()

    def test_3d_matches_golden_off_knife(self, rng):
        from mies_tpu.ops.ridges import hessian3d

        vol = rng.random((8, 24, 24)).astype(np.float32)
        out = np.asarray(hessian3d(jnp.asarray(vol), sigmas=(1.0,)))
        gold = G.hessian3d_ridge(vol, sigmas=(1.0,))
        fr = G.frangi3d_vesselness(vol, sigmas=(1.0,), gamma=15.0)
        knife = np.abs(fr) <= 1e-6
        np.testing.assert_allclose(
            out[~knife], gold[~knife], atol=1e-5, rtol=0
        )

    def test_default_is_shardable_none_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field
        from mies_tpu.parallel.volume_shard import volume_stage_z_field

        # skimage's fixed gamma=15 default: NOT a global statistic
        assert stage_receptive_field("hessian", {"sigmas": (1.0,)}) == 4
        with pytest.raises(ValueError, match="gamma"):
            stage_receptive_field("hessian", {"gamma": None})
        assert volume_stage_z_field("hessian3d", {"sigmas": (1.0,)}) == 4
        from mies_tpu.ops.ridges import hessian

        with pytest.raises(ValueError, match="gamma"):
            hessian(jnp.zeros((16, 16)), gamma=None)

    def test_band_sharded_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh
        from mies_tpu.pipeline.compiler import compile_pipeline

        cfg = PipelineConfig.make([("hessian", {"sigmas": (1.0, 2.0)})])
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

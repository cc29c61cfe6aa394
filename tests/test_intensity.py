"""Golden tests: point-wise intensity ops vs NumPy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from mies_tpu.ops import intensity as I
from tests.goldens import golden_ops as G


def _check(jax_out, np_out, atol=1e-6):
    np.testing.assert_allclose(np.asarray(jax_out), np_out, atol=atol, rtol=1e-5)


# XLA's f32 transcendentals (log2/exp2/pow/exp) differ from libm by a few e-4
# absolute; well inside the 1/255 uint8 quantum the pipeline contract is
# defined over (BASELINE.md fidelity target is on uint8 outputs).
_TRANS_ATOL = 5e-4


@pytest.mark.parametrize("gamma,gain", [(0.5, 1.0), (2.2, 1.0), (1.0, 0.9)])
def test_adjust_gamma(xray, gamma, gain):
    _check(I.adjust_gamma(jnp.asarray(xray), gamma, gain), G.adjust_gamma(xray, gamma, gain), atol=_TRANS_ATOL)


@pytest.mark.parametrize("inv", [False, True])
def test_adjust_log(xray, inv):
    _check(I.adjust_log(jnp.asarray(xray), 1.0, inv), G.adjust_log(xray, 1.0, inv), atol=_TRANS_ATOL)


@pytest.mark.parametrize("cutoff,gain,inv", [(0.5, 10.0, False), (0.3, 5.0, True)])
def test_adjust_sigmoid(xray, cutoff, gain, inv):
    _check(
        I.adjust_sigmoid(jnp.asarray(xray), cutoff, gain, inv),
        G.adjust_sigmoid(xray, cutoff, gain, inv),
        atol=_TRANS_ATOL,
    )


def test_invert(xray):
    _check(I.invert(jnp.asarray(xray)), 1.0 - xray)


def test_rescale_intensity_auto(xray):
    _check(I.rescale_intensity(jnp.asarray(xray)), G.rescale_intensity(xray))


def test_rescale_intensity_explicit(xray):
    _check(
        I.rescale_intensity(jnp.asarray(xray), in_range=(0.1, 0.8), out_range=(0.0, 1.0)),
        G.rescale_intensity(xray, in_range=(0.1, 0.8)),
    )


@pytest.mark.parametrize("center,width", [(40.0, 400.0), (-600.0, 1500.0), (300.0, 1400.0)])
def test_window_hu(ct_slice_hu, center, width):
    out = I.window_hu(jnp.asarray(ct_slice_hu), center, width)
    _check(out, G.window_hu(ct_slice_hu, center, width))
    arr = np.asarray(out)
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert arr.dtype == np.float32


def test_normalize_minmax(xray):
    out = np.asarray(I.normalize_minmax(jnp.asarray(xray)))
    assert abs(out.min()) < 1e-6 and abs(out.max() - 1.0) < 1e-6


class TestGeometry:
    def test_resize_shapes(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import resize

        out = np.asarray(resize(jnp.asarray(xray), 256, 128))
        assert out.shape == (256, 128)
        # downscale then upscale roughly preserves content
        back = np.asarray(resize(jnp.asarray(out), 512, 512))
        assert abs(back.mean() - xray.mean()) < 0.01

    def test_center_crop(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import center_crop

        out = np.asarray(center_crop(jnp.asarray(xray), 100, 60))
        np.testing.assert_array_equal(out, xray[206:306, 226:286])
        # padding path
        big = np.asarray(center_crop(jnp.asarray(xray[:10, :10]), 20, 20))
        assert big.shape == (20, 20)
        np.testing.assert_array_equal(big[5:15, 5:15], xray[:10, :10])

    def test_flip_rot(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import flip, rot90

        np.testing.assert_array_equal(
            np.asarray(flip(jnp.asarray(xray))), xray[:, ::-1]
        )
        np.testing.assert_array_equal(
            np.asarray(rot90(jnp.asarray(xray), 2)), xray[::-1, ::-1]
        )

    def test_rotate_matches_scipy(self, xray):
        import jax.numpy as jnp
        import scipy.ndimage as ndi

        from mies_tpu.ops import rotate

        for angle in (17.3, -42.0, 90.0, 5.0):
            for mode in ("constant", "nearest"):
                ref = ndi.rotate(
                    xray, angle, reshape=False, order=1, mode=mode, cval=0.3
                )
                got = np.asarray(
                    rotate(jnp.asarray(xray), angle, mode=mode, cval=0.3)
                )
                np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_rotate_90_nonsquare_matches_scipy(self, rng):
        """Non-square exact-90 rotations: even h-w takes the integer
        permutation path (the sampled form knife-edges the integer
        boundary coordinates); odd h-w has half-integer coordinates and
        samples safely (review finding, round 4)."""
        import jax.numpy as jnp
        import scipy.ndimage as ndi

        from mies_tpu.ops import rotate

        for shape in ((64, 96), (96, 64), (33, 47)):
            img = rng.random(shape).astype(np.float32)
            for angle in (90.0, 270.0):
                for mode in ("constant", "nearest"):
                    ref = ndi.rotate(img, angle, reshape=False, order=1,
                                     mode=mode, cval=0.25)
                    got = np.asarray(
                        rotate(jnp.asarray(img), angle, mode=mode, cval=0.25)
                    )
                    np.testing.assert_allclose(
                        got, ref, atol=1e-5,
                        err_msg=f"{shape} {angle} {mode}",
                    )

    def test_affine_warp_matches_scipy(self, rng):
        import jax.numpy as jnp
        import scipy.ndimage as ndi

        from mies_tpu.ops import affine_warp

        img = rng.random((64, 80)).astype(np.float32)
        # generic params (exact-boundary coordinate hits differ between
        # scipy's f64 arithmetic and ours by design — see affine_warp)
        m = np.array([[0.53, 0.31], [0.11, 0.73]])
        off = np.array([-3.2, 4.1])
        for mode in ("constant", "nearest"):
            ref = ndi.affine_transform(img, m, offset=off, order=1, mode=mode)
            got = np.asarray(affine_warp(jnp.asarray(img), m, off, mode=mode))
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_rotate_in_pipeline_and_validation(self, xray):
        import jax.numpy as jnp

        from mies_tpu.pipeline.compiler import compile_pipeline
        from mies_tpu.pipeline.config import PipelineConfig, validate

        cfg = PipelineConfig.make(
            [("rotate", {"angle": 12.5, "mode": "nearest"}),
             ("adjust_gamma", {"gamma": 0.9})]
        )
        validate(cfg)
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(xray)))
        assert out.shape == xray.shape and out.dtype == np.uint8

        import pytest

        bad = PipelineConfig.make([("rotate", {"angle": 10.0, "mode": "wrap"})])
        with pytest.raises(ValueError, match="constant"):
            validate(bad)

    def test_rotate_rejected_for_spatial_sharding(self):
        import pytest

        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="sharded"):
            stage_receptive_field("rotate", {"angle": 10.0})

    def test_normalize_meanstd_roundtrip(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import denormalize_meanstd, normalize_meanstd

        n = normalize_meanstd(jnp.asarray(xray), 0.3, 0.2)
        back = np.asarray(denormalize_meanstd(n, 0.3, 0.2))
        np.testing.assert_allclose(back, xray, atol=1e-6)

    def test_resize_in_pipeline(self, xray):
        import jax.numpy as jnp
        from mies_tpu.pipeline.config import PipelineConfig
        from mies_tpu.pipeline.compiler import compile_pipeline

        cfg = PipelineConfig.make(
            [("resize", {"height": 256, "width": 256}),
             ("adjust_gamma", {"gamma": 0.9})]
        )
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(xray)))
        assert out.shape == (256, 256) and out.dtype == np.uint8


class TestEnhanceExtras:
    def test_brightness_contrast(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import adjust_brightness, adjust_contrast

        b = np.asarray(adjust_brightness(jnp.asarray(xray), 0.1))
        np.testing.assert_allclose(b, np.clip(xray + 0.1, 0, 1), atol=1e-7)
        c = np.asarray(adjust_contrast(jnp.asarray(xray), 1.5))
        np.testing.assert_allclose(c, np.clip(xray * 1.5, 0, 1), atol=1e-6)

    def test_solarize(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import solarize

        s = np.asarray(solarize(jnp.asarray(xray), 0.5))
        ref = np.where(xray >= 0.5, 1.0 - xray, xray)
        np.testing.assert_allclose(s, ref, atol=1e-7)

    @pytest.mark.parametrize("bits", [1, 4, 7, 8])
    def test_posterize_matches_pil_lattice(self, xray, bits):
        import jax.numpy as jnp
        from mies_tpu.ops import posterize

        out = np.asarray(posterize(jnp.asarray(xray), bits))
        u = np.clip(np.round(xray * 255.0), 0, 255).astype(np.int64)
        ref = (u & (256 - (1 << (8 - bits)))).astype(np.float32) / 255.0
        np.testing.assert_allclose(out, ref, atol=1e-7)

    def test_sharpness_identity_at_factor_one(self, xray):
        import jax.numpy as jnp
        from mies_tpu.ops import sharpness

        out = np.asarray(sharpness(jnp.asarray(xray), 1.0))
        np.testing.assert_allclose(out, np.clip(xray, 0, 1), atol=1e-6)
        # factor 0 smooths: variance must drop
        sm = np.asarray(sharpness(jnp.asarray(xray), 0.0))
        assert sm.std() < xray.std()

    def test_is_low_contrast(self):
        import jax.numpy as jnp
        from mies_tpu.ops import is_low_contrast

        flat = jnp.full((64, 64), 0.5) + 0.001 * jnp.ones((64, 64))
        assert bool(is_low_contrast(flat))
        contrasty = jnp.linspace(0, 1, 64 * 64).reshape(64, 64)
        assert not bool(is_low_contrast(contrasty))

    def test_new_ops_in_pipeline(self, xray):
        import jax.numpy as jnp
        from mies_tpu.pipeline.config import PipelineConfig
        from mies_tpu.pipeline.compiler import compile_pipeline

        cfg = PipelineConfig.make(
            [("adjust_brightness", {"factor": 0.05}),
             ("adjust_contrast", {"factor": 1.2}),
             ("posterize", {"bits": 6}),
             ("sharpness", {"factor": 1.5})]
        )
        out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(xray)))
        assert out.dtype == np.uint8 and out.shape == xray.shape


def test_window_hu_presets(ct_slice_hu):
    import jax.numpy as jnp

    from mies_tpu.ops.intensity import HU_PRESETS, window_hu

    x = jnp.asarray(ct_slice_hu)
    for name, (c, w) in HU_PRESETS.items():
        np.testing.assert_array_equal(
            np.asarray(window_hu(x, preset=name)),
            np.asarray(window_hu(x, center=c, width=w)),
        )
    # explicit params override the preset's
    np.testing.assert_array_equal(
        np.asarray(window_hu(x, center=0.0, preset="lung")),
        np.asarray(window_hu(x, center=0.0, width=1500.0)),
    )
    import pytest

    with pytest.raises(ValueError, match="preset"):
        window_hu(x, preset="femur")
    with pytest.raises(ValueError, match="center"):
        window_hu(x)


def test_window_hu_preset_in_config(ct_slice_hu):
    import jax.numpy as jnp
    import pytest

    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.pipeline.config import PipelineConfig, validate

    cfg = PipelineConfig.make(
        [("window_hu", {"preset": "soft_tissue"}),
         ("adjust_gamma", {"gamma": 0.9})]
    )
    validate(cfg)
    out = np.asarray(
        compile_pipeline(cfg, donate=False)(jnp.asarray(ct_slice_hu))
    )
    ref_cfg = PipelineConfig.make(
        [("window_hu", {"center": 40.0, "width": 400.0}),
         ("adjust_gamma", {"gamma": 0.9})]
    )
    ref = np.asarray(
        compile_pipeline(ref_cfg, donate=False)(jnp.asarray(ct_slice_hu))
    )
    np.testing.assert_array_equal(out, ref)

    bad = PipelineConfig.make([("window_hu", {"preset": "femur"})])
    with pytest.raises(ValueError, match="preset"):
        validate(bad)


def test_cli_ops_listing(capsys):
    import json as _json

    from mies_tpu import cli

    rc = cli.main(["ops"])
    assert rc == 0
    listing = _json.loads(capsys.readouterr().out)
    assert "clahe" in listing and "guided_blur" in listing
    assert listing["clahe"]["clip_limit"]["expects"] == "a number > 0"
    # builder ops take ONLY config params — none may be skipped
    assert "checkpoint" in listing["learned_denoise"]


class TestPerspectiveMotion:
    """perspective_warp vs REAL scipy geometric_transform; motion_blur
    vs the independently-transcribed rotated-PSF + real scipy
    correlate."""

    def test_perspective_matches_scipy(self, rng):
        import jax.numpy as jnp
        from goldens import golden_ops as G
        from mies_tpu.ops.geometry import perspective_warp

        img = rng.random((64, 80)).astype(np.float32)
        M = ((0.95, 0.08, 2.3), (-0.05, 1.02, -1.6),
             (0.0004, -0.0003, 1.0))
        for mode in ("constant", "nearest"):
            ref = G.perspective_warp(img, M, mode=mode, cval=0.25)
            got = np.asarray(
                perspective_warp(jnp.asarray(img), M, mode=mode,
                                 cval=0.25)
            )
            np.testing.assert_allclose(got, ref, atol=2e-5)

    def test_perspective_identity_and_affine_embed(self, rng):
        """Identity homography is exact; an affine embedded in the top
        rows (with NON-integer translation — integer translations
        knife-edge the f32 'constant' inside-test exactly like exact-90
        rotate) matches affine_warp."""
        import jax.numpy as jnp
        from mies_tpu.ops.geometry import affine_warp, perspective_warp

        img = rng.random((48, 48)).astype(np.float32)
        eye = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
        np.testing.assert_array_equal(
            np.asarray(perspective_warp(jnp.asarray(img), eye)), img
        )
        M = ((0.9, 0.1, 2.7), (-0.1, 0.9, 1.3), (0.0, 0.0, 1.0))
        a = np.asarray(
            affine_warp(jnp.asarray(img), ((0.9, 0.1), (-0.1, 0.9)),
                        (2.7, 1.3))
        )
        p = np.asarray(perspective_warp(jnp.asarray(img), M))
        np.testing.assert_allclose(p, a, atol=1e-6)

    def test_perspective_bad_matrix(self, rng):
        import jax.numpy as jnp
        from mies_tpu.ops.geometry import perspective_warp

        img = jnp.zeros((8, 8), jnp.float32)
        with pytest.raises(ValueError, match="3x3"):
            perspective_warp(img, ((1.0, 0.0), (0.0, 1.0)))
        with pytest.raises(ValueError, match="nonzero"):
            perspective_warp(
                img,
                ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 0.0)),
            )

    @pytest.mark.parametrize("angle,direction", [
        (30.0, 0.5), (-17.0, 0.0), (200.0, -0.8), (90.0, 0.3),
        (0.0, 1.0),
    ])
    def test_motion_blur_matches_golden(self, rng, angle, direction):
        import jax.numpy as jnp
        from goldens import golden_ops as G
        from mies_tpu.ops.filters import motion_blur

        img = rng.random((64, 64)).astype(np.float32)
        ref = G.motion_blur(img, 9, angle, direction)
        got = np.asarray(
            motion_blur(jnp.asarray(img), 9, angle, direction)
        )
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_motion_blur_kernel_properties(self):
        from mies_tpu.ops.filters import motion_blur_kernel

        k = motion_blur_kernel(11, 37.0, 0.4)
        assert k.shape == (11, 11)
        assert abs(k.sum() - 1.0) < 1e-12
        assert (k >= 0).all()
        with pytest.raises(ValueError, match="odd"):
            motion_blur_kernel(4, 0.0)

    def test_motion_blur_band_exact(self, rng):
        """motion_blur spatially shards under (extend, run, crop)."""
        import jax.numpy as jnp
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh
        from mies_tpu.pipeline.compiler import compile_pipeline
        from mies_tpu.pipeline.config import PipelineConfig

        cfg = PipelineConfig.make(
            [("motion_blur", {"kernel_size": 7, "angle": 25.0})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

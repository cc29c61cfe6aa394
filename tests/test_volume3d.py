"""3-D volumetric ops: CLAHE-3D vs golden, z-consistency, 3-D gaussian."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy import ndimage

from mies_tpu.ops.volume3d import clahe3d, gaussian_blur3d
from tests.goldens import golden_ops as G


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(11)
    z, h, w = 32, 64, 64
    zz, yy, xx = np.mgrid[0:z, 0:h, 0:w].astype(np.float32)
    base = 0.4 * np.exp(-(((yy - 32) ** 2 + (xx - 32) ** 2) / 500))
    drift = 0.2 * zz / z  # slow z-drift: where slicewise CLAHE flickers
    noise = 0.05 * rng.standard_normal((z, h, w)).astype(np.float32)
    return np.clip(base + drift + noise + 0.1, 0, 1).astype(np.float32)


def test_clahe3d_fraction_matches_golden(vol):
    out = np.asarray(
        clahe3d(jnp.asarray(vol), clip_limit=0.02, grid_size=(2, 4, 4),
                convention="fraction")
    )
    ref = G.clahe3d_fraction(vol, clip_limit=0.02, grid_size=(2, 4, 4))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_clahe3d_opencv_range_and_contrast(vol):
    out = np.asarray(
        clahe3d(jnp.asarray(vol), clip_limit=2.0, grid_size=(2, 4, 4))
    )
    assert out.shape == vol.shape
    assert out.min() >= 0 and out.max() <= 1
    assert out.std() > vol.std() * 1.2  # contrast increased


def test_clahe3d_z_consistency_vs_slicewise(vol):
    """3-D CLAHE must vary less slice-to-slice than per-slice CLAHE
    (the inter-slice flicker motivation, arXiv:1906.11355)."""
    import jax

    from mies_tpu.ops.histogram import clahe

    out3d = np.asarray(
        clahe3d(jnp.asarray(vol), clip_limit=2.0, grid_size=(2, 4, 4))
    )
    out2d = np.asarray(
        jax.vmap(lambda s: clahe.__wrapped__(s, 2.0, (4, 4), "opencv"))(
            jnp.asarray(vol)
        )
    )
    def flicker(v):  # mean abs difference between adjacent slice means
        m = v.mean(axis=(1, 2))
        return np.abs(np.diff(m)).mean()
    assert flicker(out3d) < flicker(out2d)


def test_clahe3d_rejects_bad_grid(vol):
    with pytest.raises(ValueError, match="not divisible"):
        clahe3d(jnp.asarray(vol), grid_size=(3, 4, 4))


def test_gaussian_blur3d_matches_scipy(vol):
    out = np.asarray(gaussian_blur3d(jnp.asarray(vol), sigma=1.2))
    ref = ndimage.gaussian_filter(
        vol.astype(np.float64), sigma=1.2, truncate=4.0, mode="nearest"
    ).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_volume_pipeline_3d(vol, tmp_path):
    import json

    from mies_tpu.pipeline.config import load_config
    from mies_tpu.pipeline.compiler import compile_volume_pipeline

    cfgf = tmp_path / "v3.json"
    cfgf.write_text(json.dumps({
        "name": "v3",
        "pipeline": [
            {"op": "adjust_gamma", "gamma": 0.9},
            {"op": "clahe3d", "clip_limit": 2.0, "grid_size": [2, 4, 4]},
            {"op": "gaussian_blur3d", "sigma": 0.8},
        ],
    }))
    cfg = load_config(cfgf)
    out = np.asarray(compile_volume_pipeline(cfg)(jnp.asarray(vol)))
    assert out.shape == vol.shape and out.dtype == np.uint8


def test_volume_pipeline_rejects_2d_only_op(vol):
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.compiler import compile_volume_pipeline

    cfg = PipelineConfig.make([("median_blur", {"kernel_size": 3})])
    with pytest.raises(ValueError, match="not volume-capable"):
        compile_volume_pipeline(cfg)


def test_clahe3d_opencv_matches_golden():
    """3-D opencv-convention CLAHE pinned against the transcribed NumPy
    golden (VERDICT round 2, weak #2). Local fixed rng: must not depend
    on suite order."""
    from mies_tpu.ops.volume3d import clahe3d
    from tests.goldens.golden_ops import clahe3d_opencv

    vol = np.random.default_rng(77).random((16, 64, 64)).astype(np.float32)
    out = np.asarray(clahe3d(jnp.asarray(vol), clip_limit=2.0, grid_size=(2, 4, 4)))
    ref = clahe3d_opencv(vol, clip_limit=2.0, grid_size=(2, 4, 4))
    u_out = np.rint(out * 255).astype(np.int64)
    u_ref = np.rint(ref * 255).astype(np.int64)
    diff = np.abs(u_out - u_ref)
    # platform-aware: XLA:CPU FMA contraction can flip exact .5 rint ties
    assert diff.max() <= 1
    assert (diff > 0).mean() < 3e-3


def test_clahe3d_opencv_golden_various_grids():
    from mies_tpu.ops.volume3d import clahe3d
    from tests.goldens.golden_ops import clahe3d_opencv

    vol = np.random.default_rng(78).random((8, 32, 48)).astype(np.float32)
    for grid, clip in [((2, 2, 2), 4.0), ((1, 4, 4), 2.0), ((4, 2, 3), 3.0)]:
        out = np.asarray(clahe3d(jnp.asarray(vol), clip_limit=clip, grid_size=grid))
        ref = clahe3d_opencv(vol, clip_limit=clip, grid_size=grid)
        diff = np.abs(np.rint(out * 255) - np.rint(ref * 255))
        assert diff.max() <= 1, f"grid={grid} max={diff.max()}"
        assert (diff > 0).mean() < 3e-3


def test_clahe3d_skimage_matches_golden():
    """True N-D skimage equalize_adapthist on a volume vs the 3-D
    transcribed golden (same outlier contract as the 2-D tests)."""
    from mies_tpu.ops.volume3d import clahe3d
    from tests.goldens.golden_ops import equalize_adapthist3d_skimage

    vol = np.random.default_rng(11).random((16, 48, 48)).astype(np.float32)
    out = np.asarray(
        clahe3d(jnp.asarray(vol), clip_limit=0.01, grid_size=(2, 4, 4),
                convention="skimage")
    )
    ref = equalize_adapthist3d_skimage(vol, kernel_size=(8, 12, 12),
                                       clip_limit=0.01)
    d = np.abs(out - ref)
    assert (d > 1.0 / 255.0).mean() <= 5e-5
    assert d.max() <= max(2.0 / 255.0, 0.01 + 1.0 / 255.0)


def test_clahe3d_skimage_nondivisible_shape():
    from mies_tpu.ops.volume3d import clahe3d
    from tests.goldens.golden_ops import equalize_adapthist3d_skimage

    vol = np.random.default_rng(12).random((10, 33, 47)).astype(np.float32)
    out = np.asarray(
        clahe3d(jnp.asarray(vol), convention="skimage",
                kernel_size=(4, 8, 8), clip_limit=0.02)
    )
    ref = equalize_adapthist3d_skimage(vol, kernel_size=(4, 8, 8),
                                       clip_limit=0.02)
    assert out.shape == vol.shape
    d = np.abs(out - ref)
    assert (d > 1.0 / 255.0).mean() <= 5e-5
    assert d.max() <= max(2.0 / 255.0, 0.02 + 1.0 / 255.0)


def test_guided_blur3d_matches_golden(rng):
    from mies_tpu.ops.volume3d import guided_blur3d

    vol = rng.random((16, 32, 32)).astype(np.float32)
    out = np.asarray(guided_blur3d(jnp.asarray(vol), 3, 1e-2))
    ref = G.guided_blur3d(vol, 3, 1e-2)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_guided_blur3d_in_volume_pipeline(rng):
    from mies_tpu.pipeline.compiler import compile_volume_pipeline
    from mies_tpu.pipeline.config import PipelineConfig, validate

    cfg = PipelineConfig.make(
        [("window_hu", {"center": 40.0, "width": 400.0}),
         ("guided_blur3d", {"kernel_size": 3, "eps": 0.001}),
         ("clahe3d", {"clip_limit": 2.0, "grid_size": (4, 4, 4),
                      "convention": "opencv"})]
    )
    validate(cfg)
    vol = rng.integers(-500, 1500, (16, 64, 64)).astype(np.int16)
    out = np.asarray(compile_volume_pipeline(cfg)(jnp.asarray(vol)))
    assert out.shape == vol.shape and out.dtype == np.uint8


def test_guided_blur3d_z_consistency(rng):
    """The cubic window mixes information across z: two identical noisy
    slices with a noisy slice between them must end up closer to each
    other than slice-independent filtering leaves them."""
    from mies_tpu.ops.filters import guided_blur
    from mies_tpu.ops.volume3d import guided_blur3d

    base = rng.random((32, 32)).astype(np.float32)
    vol = np.stack([base + 0.05 * rng.standard_normal((32, 32)).astype(np.float32)
                    for _ in range(5)])
    out3 = np.asarray(guided_blur3d(jnp.asarray(vol), 3, 1e-2))
    out2 = np.stack([
        np.asarray(guided_blur(jnp.asarray(vol[z]), 3, 1e-2))
        for z in range(5)
    ])
    d3 = np.abs(out3[1] - out3[3]).mean()
    d2 = np.abs(out2[1] - out2[3]).mean()
    assert d3 < d2


def test_median_blur3d_matches_scipy(vol):
    from mies_tpu.ops.volume3d import median_blur3d

    small = vol[:8, :32, :32]
    out = np.asarray(median_blur3d(jnp.asarray(small), kernel_size=3))
    ref = ndimage.median_filter(small, size=3, mode="nearest").astype(
        np.float32
    )
    np.testing.assert_array_equal(out, ref)


def test_median_blur3d_rejects_even_kernel(vol):
    from mies_tpu.ops.volume3d import median_blur3d

    with pytest.raises(ValueError, match="odd"):
        median_blur3d(jnp.asarray(vol), kernel_size=4)


def test_unsharp_mask3d_matches_composed_scipy(vol):
    from mies_tpu.ops.volume3d import unsharp_mask3d

    small = vol[:8, :32, :32]
    out = np.asarray(
        unsharp_mask3d(jnp.asarray(small), radius=1.2, amount=0.8)
    )
    g = ndimage.gaussian_filter(
        small.astype(np.float64), sigma=1.2, truncate=4.0, mode="nearest"
    )
    ref = np.clip(small + 0.8 * (small - g), 0.0, 1.0).astype(np.float32)
    np.testing.assert_allclose(out, ref, atol=3e-5)


def test_median3d_z_consistency_vs_slicewise(vol):
    """Cubic-footprint median varies less slice-to-slice on z-noise than
    per-slice 2-D median (same motivation as clahe3d)."""
    import jax

    from mies_tpu.ops.filters import median_blur
    from mies_tpu.ops.volume3d import median_blur3d

    out3d = np.asarray(median_blur3d(jnp.asarray(vol), kernel_size=3))
    out2d = np.asarray(
        jax.vmap(lambda s: median_blur(s, kernel_size=3))(jnp.asarray(vol))
    )

    def flicker(v):
        m = v.mean(axis=(1, 2))
        return np.abs(np.diff(m)).mean()

    assert flicker(out3d) < flicker(out2d)


def test_volume_pipeline_with_new_3d_ops(vol):
    from mies_tpu.pipeline.compiler import compile_volume_pipeline
    from mies_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig.make(
        [("median_blur3d", {"kernel_size": 3}),
         ("unsharp_mask3d", {"radius": 1.0, "amount": 0.5})],
        name="vol3d-new",
    )
    out = np.asarray(compile_volume_pipeline(cfg)(jnp.asarray(vol)))
    assert out.shape == vol.shape and out.dtype == np.uint8


def test_trilinear_2d2_bit_equals_gather(rng):
    """The two-2D-applies + z-lerp decomposition (the TPU opencv fast
    path) is bit-identical to the 8-corner gather form: same weight
    formula, same x->y->z blend order, selection exact for integer
    LUTs. Interpret mode exercises the real Pallas kernel bodies."""
    from mies_tpu.ops.volume3d import (
        _apply_luts_trilinear_2d2,
        _apply_luts_trilinear_gather,
    )

    for grid, shape in [((4, 4, 4), (16, 64, 64)),
                        ((2, 4, 2), (8, 32, 64))]:
        u8 = jnp.asarray(
            rng.integers(0, 256, shape).astype(np.int32))
        luts = jnp.asarray(
            rng.integers(0, 256, (*grid, 256)).astype(np.float32))
        ref = np.asarray(_apply_luts_trilinear_gather(u8, luts, grid))
        got = np.asarray(_apply_luts_trilinear_2d2(
            u8, luts, grid, integer_luts=True, interpret=True))
        np.testing.assert_array_equal(got, ref)


def test_tile33z_bit_equals_gather(rng):
    """The fused tile33-z kernel (the TPU fast path for tw % 64 == 0)
    == the 8-corner gather twin, BIT-equal in interpret mode — the
    repo's kernel-twin invariant (CLAUDE.md): fake-device CI must pin
    the kernel body, not just the chip driver's level contract."""
    from mies_tpu.kernels.clahe import (
        clahe3d_apply_tile33z,
        tile33z_supported,
    )
    from mies_tpu.ops.volume3d import _apply_luts_trilinear_gather

    for grid, shape in [((4, 4, 4), (16, 64, 256)),
                        ((2, 2, 2), (8, 32, 128)),
                        ((4, 4, 8), (16, 64, 256))]:  # tw=32: P=4 group
        assert tile33z_supported(shape, grid)
        u8 = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
        luts = jnp.asarray(
            rng.integers(0, 256, (*grid, 256)).astype(np.float32))
        ref = np.asarray(_apply_luts_trilinear_gather(u8, luts, grid))
        got = np.asarray(clahe3d_apply_tile33z(
            u8, luts, grid, interpret=True))
        np.testing.assert_array_equal(got, ref)

        # the fused production form: f32 in (in-kernel quantize) +
        # folded u8norm epilogue — levels bit-exact, values within the
        # /255 reciprocal-vs-division ULP (same contract as the 2-D
        # fused test in tests/test_kernels.py)
        imgs = jnp.asarray(rng.random(shape).astype(np.float32))
        u8b = jnp.clip(jnp.round(imgs * 255.0), 0, 255).astype(jnp.int32)
        res = _apply_luts_trilinear_gather(u8b, luts, grid)
        want = np.asarray(jnp.clip(jnp.rint(res), 0, 255) / 255.0)
        got2 = np.asarray(clahe3d_apply_tile33z(
            imgs, luts, grid, interpret=True,
            quantize_input=True, finalize="u8norm"))
        np.testing.assert_array_equal(
            np.rint(got2 * 255.0), np.rint(want * 255.0))
        np.testing.assert_allclose(got2, want, atol=1.3e-7, rtol=0)


# -- 3-D morphology (goldens vs the REAL scipy.ndimage) -----------------------


@pytest.mark.parametrize("k", [3, 5])
@pytest.mark.parametrize("mode", ["ignore", "nearest"])
def test_erode3d_dilate3d_vs_scipy(vol, k, mode):
    """Cubic flat morphology is exact arithmetic: bit-equal vs
    scipy.ndimage grey_erosion/grey_dilation ('ignore' == constant
    +/-inf border, the outside-never-wins convention)."""
    from mies_tpu.ops.volume3d import dilate3d, erode3d

    if mode == "ignore":
        kw_e = dict(mode="constant", cval=np.inf)
        kw_d = dict(mode="constant", cval=-np.inf)
    else:
        kw_e = kw_d = dict(mode="nearest")
    np.testing.assert_array_equal(
        np.asarray(erode3d(jnp.asarray(vol), k, mode)),
        ndimage.grey_erosion(vol, size=(k, k, k), **kw_e))
    np.testing.assert_array_equal(
        np.asarray(dilate3d(jnp.asarray(vol), k, mode)),
        ndimage.grey_dilation(vol, size=(k, k, k), **kw_d))


def test_morph3d_composites_vs_scipy(vol):
    from mies_tpu.ops import volume3d as V3

    x = jnp.asarray(vol)
    er = ndimage.grey_erosion(vol, size=(3, 3, 3), mode="constant", cval=np.inf)
    dl = ndimage.grey_dilation(vol, size=(3, 3, 3), mode="constant", cval=-np.inf)
    op = ndimage.grey_dilation(er, size=(3, 3, 3), mode="constant", cval=-np.inf)
    cl = ndimage.grey_erosion(dl, size=(3, 3, 3), mode="constant", cval=np.inf)
    np.testing.assert_array_equal(np.asarray(V3.morph_open3d(x)), op)
    np.testing.assert_array_equal(np.asarray(V3.morph_close3d(x)), cl)
    np.testing.assert_array_equal(np.asarray(V3.morph_gradient3d(x)), dl - er)
    np.testing.assert_array_equal(np.asarray(V3.top_hat3d(x)), vol - op)
    np.testing.assert_array_equal(np.asarray(V3.black_hat3d(x)), cl - vol)


def test_morph3d_in_volume_pipeline(vol):
    from mies_tpu.pipeline.compiler import compile_volume_pipeline
    from mies_tpu.pipeline.config import PipelineConfig, validate

    cfg = PipelineConfig.make(
        [("top_hat3d", {"kernel_size": 5}),
         ("rescale_intensity", {"out_range": (0.0, 1.0)})],
        name="vessel-tophat-3d",
    )
    validate(cfg)
    out = np.asarray(
        compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol)))
    assert out.shape == vol.shape and np.isfinite(out).all()

    bad = PipelineConfig.make(
        [("erode3d", {"kernel_size": 2})], name="bad-even-3d")
    with pytest.raises(ValueError, match="erode3d"):
        validate(bad)


# -- resample3d (isotropic-spacing preprocessing) ------------------------------


def test_resample3d_matches_scipy_map_coordinates(vol):
    """The separable banded-matmul trilinear resample matches
    scipy.ndimage.map_coordinates(order=1) on the same align-corners
    coordinate grid within f32 tolerance (up- and down-sampling)."""
    from mies_tpu.ops.volume3d import resample3d

    for out_shape in [(48, 96, 80), (16, 32, 32), (32, 64, 64)]:
        got = np.asarray(resample3d(jnp.asarray(vol), *out_shape))
        grids = [
            np.linspace(0, s_in - 1, s_out, dtype=np.float64)
            if s_out > 1 else np.array([0.5 * (s_in - 1)])
            for s_in, s_out in zip(vol.shape, out_shape)
        ]
        zz, yy, xx = np.meshgrid(*grids, indexing="ij")
        ref = ndimage.map_coordinates(
            vol.astype(np.float64), [zz, yy, xx], order=1, mode="nearest")
        np.testing.assert_allclose(got, ref, atol=2e-6, rtol=0)
        assert got.shape == out_shape


def test_resample3d_identity_and_int16(vol):
    from mies_tpu.ops.volume3d import resample3d

    same = np.asarray(resample3d(jnp.asarray(vol), *vol.shape))
    np.testing.assert_array_equal(same, vol)
    hu = (vol * 2000 - 1000).astype(np.int16)
    up = np.asarray(resample3d(jnp.asarray(hu), 64, 64, 64))
    assert up.dtype == np.float32
    assert hu.min() <= up.min() and up.max() <= hu.max() + 1


def test_resample3d_in_volume_pipeline(vol):
    """resample3d as the FIRST stage (the --isotropic order: resample
    raw HU, then window) through compile_volume_pipeline."""
    from mies_tpu.pipeline.compiler import compile_volume_pipeline
    from mies_tpu.pipeline.config import PipelineConfig, validate

    cfg = PipelineConfig.make(
        [("resample3d", {"depth": 16, "height": 32, "width": 32}),
         ("gaussian_blur3d", {"sigma": 1.0})],
        name="iso-then-blur",
    )
    validate(cfg)
    out = np.asarray(
        compile_volume_pipeline(cfg, quantize=False)(jnp.asarray(vol)))
    assert out.shape == (16, 32, 32) and np.isfinite(out).all()

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


@pytest.mark.parametrize(
    "op,mode",
    [("scharr_edges", "reflect"), ("prewitt_edges", "nearest"),
     ("farid_edges", "reflect"), ("roberts_edges", "reflect"),
     ("laplace", "reflect"), ("scharr_edges", "mirror")],
)
def test_edge_family_vs_scipy_golden(xray, op, mode):
    # jnp shifted-add vs REAL scipy correlate1d/convolve over the
    # documented skimage kernel constants
    got = getattr(F, op)(jnp.asarray(xray), mode=mode)
    _check(got, getattr(G, op)(xray, mode=mode), atol=3e-5)


def test_roberts_alignment_knife_edge():
    # a single bright pixel pins the even-kernel alignment: the pos
    # diagonal response must sit at the pixel and its NW neighbor
    img = np.zeros((8, 8), np.float32)
    img[4, 4] = 1.0
    got = np.asarray(F.roberts_edges(jnp.asarray(img)))
    gold = G.roberts_edges(img)
    np.testing.assert_allclose(got, gold, atol=1e-6)
    assert got[4, 4] > 0 and got[3, 3] > 0


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


@pytest.mark.parametrize("k,eps", [(3, 1e-2), (5, 1e-3), (7, 1e-1)])
def test_guided_blur_matches_golden(xray, k, eps):
    out = np.asarray(F.guided_blur(jnp.asarray(xray), k, eps))
    ref = G.guided_blur(xray, k, eps)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_guided_blur_external_guide(rng):
    img = rng.random((64, 64), dtype=np.float32)
    guide = rng.random((64, 64), dtype=np.float32)
    out = np.asarray(F.guided_blur(jnp.asarray(img), 5, 1e-2, guide=jnp.asarray(guide)))
    ref = G.guided_blur(img, 5, 1e-2, guide=guide)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_guided_blur_preserves_edges(xray):
    """Edge-preserving: a hard step survives guided filtering far better
    than a box blur of the same window."""
    step = np.zeros((64, 64), np.float32)
    step[:, 32:] = 1.0
    gf = np.asarray(F.guided_blur(jnp.asarray(step), 5, 1e-4))
    bx = np.asarray(F.box_blur(jnp.asarray(step), 5))
    # compare the transition sharpness at the step
    assert abs(gf[32, 32] - step[32, 32]) < abs(bx[32, 32] - step[32, 32])


def test_joint_bilateral_self_guide_is_bilateral(xray):
    x = jnp.asarray(xray[:64, :64])
    joint = np.asarray(F.joint_bilateral_blur(x, x, 5, 0.1, 1.5))
    plain = np.asarray(F.bilateral_blur(x, 5, 0.1, 1.5))
    np.testing.assert_array_equal(joint, plain)


def test_joint_bilateral_uses_guide_edges(rng):
    """Range weights must come from the GUIDE: a flat guide makes the
    joint bilateral equal a plain gaussian-weighted mean, regardless of
    edges in the input."""
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 1.0
    flat_guide = jnp.full((32, 32), 0.5, jnp.float32)
    out = np.asarray(
        F.joint_bilateral_blur(jnp.asarray(img), flat_guide, 5, 0.1, 1.5)
    )
    # with constant guide, weights reduce to the spatial kernel only
    r = 2
    dy, dx = np.mgrid[-r:r + 1, -r:r + 1]
    sp = np.exp(-(dy**2 + dx**2) / (2 * 1.5**2)).ravel()
    p = np.pad(img, r, mode="symmetric")
    ref = np.zeros_like(img)
    h, w = img.shape
    views = [p[dy0:dy0 + h, dx0:dx0 + w]
             for dy0 in range(5) for dx0 in range(5)]
    ref = sum(s * v for s, v in zip(sp, views)) / sp.sum()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_guided_blur_in_pipeline(xray):
    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.pipeline.config import PipelineConfig, validate

    cfg = PipelineConfig.make(
        [("guided_blur", {"kernel_size": 5, "eps": 0.01}),
         ("adjust_gamma", {"gamma": 0.9})]
    )
    validate(cfg)
    out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(xray)))
    assert out.shape == xray.shape and out.dtype == np.uint8


def test_guided_blur_spatial_shard_exact(xray):
    """guided_blur has a fixed 2*(k//2) receptive field, so halo
    sharding must reproduce the unsharded result exactly."""
    from mies_tpu.parallel.halo import stage_receptive_field

    assert stage_receptive_field("guided_blur", {"kernel_size": 5}) == 4


# -- morphology (cv2-compatible; goldens vs the REAL cv2) ---------------------


_CV2_SHAPE = {"rect": 0, "ellipse": 2, "cross": 1}  # cv2.MORPH_* values


def test_structuring_element_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from mies_tpu.ops.morphology import structuring_element

    for k in (1, 3, 5, 7, 9, 11, 13, 15):
        for name, flag in _CV2_SHAPE.items():
            ref = cv2.getStructuringElement(flag, (k, k)).astype(bool)
            got = np.asarray(structuring_element(k, name), dtype=bool)
            np.testing.assert_array_equal(got, ref, err_msg=f"{name} k={k}")


@pytest.mark.parametrize("shape", ["rect", "ellipse", "cross"])
@pytest.mark.parametrize("k", [3, 5, 7])
def test_erode_dilate_vs_cv2(xray, shape, k):
    """Flat min/max morphology is exact arithmetic: bit-equal vs cv2,
    both under cv2's default border (ours: mode='ignore') and
    BORDER_REPLICATE (mode='nearest')."""
    cv2 = pytest.importorskip("cv2")
    from mies_tpu.ops import morphology as M

    se = cv2.getStructuringElement(_CV2_SHAPE[shape], (k, k))
    x = jnp.asarray(xray)
    np.testing.assert_array_equal(
        np.asarray(M.erode(x, k, shape)), cv2.erode(xray, se))
    np.testing.assert_array_equal(
        np.asarray(M.dilate(x, k, shape)), cv2.dilate(xray, se))
    np.testing.assert_array_equal(
        np.asarray(M.erode(x, k, shape, mode="nearest")),
        cv2.erode(xray, se, borderType=cv2.BORDER_REPLICATE))
    np.testing.assert_array_equal(
        np.asarray(M.dilate(x, k, shape, mode="nearest")),
        cv2.dilate(xray, se, borderType=cv2.BORDER_REPLICATE))


@pytest.mark.parametrize("opname,cvflag", [
    ("morph_open", 2), ("morph_close", 3), ("morph_gradient", 4),
    ("top_hat", 5), ("black_hat", 6),
])
def test_morph_composites_vs_cv2(xray, opname, cvflag):
    cv2 = pytest.importorskip("cv2")
    from mies_tpu.ops import morphology as M

    se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    got = np.asarray(getattr(M, opname)(jnp.asarray(xray), 5, "ellipse"))
    ref = cv2.morphologyEx(xray, cvflag, se)
    np.testing.assert_array_equal(got, ref)


def test_morphology_in_pipeline(xray):
    """top_hat + gradient chain compiles/validates through the full
    pipeline path (single and batched) and rejects bad params at load."""
    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.pipeline.config import PipelineConfig, validate

    cfg = PipelineConfig.make(
        [("top_hat", {"kernel_size": 5, "shape": "ellipse"}),
         ("adjust_gamma", {"gamma": 0.8})],
        name="vessel-tophat",
    )
    validate(cfg)
    out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(xray)))
    assert out.dtype == np.uint8 and out.shape == xray.shape
    outb = np.asarray(
        compile_pipeline(cfg, batched=True, donate=False)(
            jnp.asarray(np.stack([xray] * 2))))
    np.testing.assert_array_equal(outb[0], outb[1])

    bad = PipelineConfig.make(
        [("erode", {"kernel_size": 4})], name="bad-even-kernel")
    with pytest.raises(ValueError, match="erode"):
        validate(bad)
    bad2 = PipelineConfig.make(
        [("dilate", {"shape": "diamond"})], name="bad-shape")
    with pytest.raises(ValueError, match="dilate"):
        validate(bad2)


@pytest.mark.parametrize("k", [11, 15, 21, 31])
def test_large_kernel_morphology_doubling_exact(xray, k):
    """The van Herk doubling chain (k > 9) is bit-equal vs cv2 — large
    background-estimation footprints are where the log2(k) form pays."""
    cv2 = pytest.importorskip("cv2")
    from mies_tpu.ops import morphology as M

    se = cv2.getStructuringElement(cv2.MORPH_RECT, (k, k))
    np.testing.assert_array_equal(
        np.asarray(M.erode(jnp.asarray(xray), k, "rect")),
        cv2.erode(xray, se))
    np.testing.assert_array_equal(
        np.asarray(M.top_hat(jnp.asarray(xray), k, "rect",
                             mode="nearest")),
        cv2.morphologyEx(xray, 5, se, borderType=cv2.BORDER_REPLICATE))


@pytest.mark.parametrize("shape", ["ellipse", "cross"])
@pytest.mark.parametrize("k", [11, 21])
def test_large_kernel_rowspan_morphology_exact(xray, shape, k):
    """Large ellipse/cross elements decompose into per-row sliding
    extrema (centered contiguous spans) — bit-equal vs cv2."""
    cv2 = pytest.importorskip("cv2")
    from mies_tpu.ops import morphology as M

    flag = {"ellipse": cv2.MORPH_ELLIPSE, "cross": cv2.MORPH_CROSS}[shape]
    se = cv2.getStructuringElement(flag, (k, k))
    np.testing.assert_array_equal(
        np.asarray(M.erode(jnp.asarray(xray), k, shape)),
        cv2.erode(xray, se))
    np.testing.assert_array_equal(
        np.asarray(M.black_hat(jnp.asarray(xray), k, shape)),
        cv2.morphologyEx(xray, 6, se))


class TestRollingBall:
    def test_background_matches_golden(self, xray):
        from mies_tpu.ops.morphology import rolling_ball

        bg = np.asarray(rolling_ball(jnp.asarray(xray), 6.0))
        gold = G.rolling_ball(xray, 6.0)
        np.testing.assert_array_equal(bg, gold)  # min/max: bit-exact
        assert (bg <= np.asarray(xray) + 1e-6).all()  # opening <= img

    def test_fractional_radius(self, xray):
        from mies_tpu.ops.morphology import rolling_ball

        bg = np.asarray(rolling_ball(jnp.asarray(xray), 4.5))
        np.testing.assert_array_equal(bg, G.rolling_ball(xray, 4.5))

    def test_ellipsoid_intensity_matches_golden(self, xray):
        # skimage ellipsoid_kernel generalization: independent height
        from mies_tpu.ops.morphology import rolling_ball

        bg = np.asarray(rolling_ball(jnp.asarray(xray), 8.0,
                                     intensity=0.05))
        np.testing.assert_array_equal(
            bg, G.rolling_ball(xray, 8.0, intensity=0.05)
        )

    @pytest.mark.parametrize("light", [False, True])
    def test_subtract_matches_golden(self, xray, light):
        from mies_tpu.ops.morphology import subtract_background

        out = np.asarray(subtract_background(
            jnp.asarray(xray), 5.0, light_background=light
        ))
        np.testing.assert_array_equal(
            out, G.subtract_background(xray, 5.0, light_background=light)
        )

    def test_flattens_gradient_keeps_detail(self):
        # a bright small blob on a strong shading ramp: subtraction
        # must kill the ramp and keep the blob
        y, x = np.mgrid[0:96, 0:96].astype(np.float32)
        ramp = 0.3 + 0.4 * (x / 95.0)
        img = ramp.copy()
        img[44:52, 44:52] += 0.3
        from mies_tpu.ops.morphology import subtract_background

        out = np.asarray(subtract_background(jnp.asarray(img), 12.0))
        # ramp regions go to ~0
        assert out[10:30, 10:30].max() < 0.02
        assert out[70:90, 70:90].max() < 0.02
        # blob survives near full contrast
        assert out[46:50, 46:50].min() > 0.2

    def test_band_sharded_bit_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh
        from mies_tpu.pipeline.compiler import compile_pipeline
        from mies_tpu.pipeline.config import PipelineConfig

        cfg = PipelineConfig.make(
            [("subtract_background", {"radius": 5.0})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_downscale_matches_golden(self, xray):
        # ImageJ large-radius shrink: pyr_down -> ball -> pyr_up, all
        # cv2-pinned pieces
        from mies_tpu.ops.morphology import rolling_ball, subtract_background

        bg = np.asarray(rolling_ball(jnp.asarray(xray), 16.0,
                                     intensity=0.06, downscale=4))
        gold = G.rolling_ball(xray, 16.0, intensity=0.06, downscale=4)
        np.testing.assert_allclose(bg, gold, atol=1e-6)
        out = np.asarray(subtract_background(jnp.asarray(xray), 16.0,
                                             downscale=2))
        np.testing.assert_allclose(
            out, G.subtract_background(xray, 16.0, downscale=2), atol=1e-6
        )

    def test_downscale_approximates_full(self):
        # the shrink is an approximation FOR SMOOTH BACKGROUNDS (its
        # use case — on pure noise the minima wash out and it biases
        # high, like ImageJ's own shrink): a shading ramp + small blob
        from mies_tpu.ops.morphology import rolling_ball

        y, x = np.mgrid[0:96, 0:96].astype(np.float32)
        img = 0.3 + 0.4 * (x / 95.0) + 0.1 * np.sin(y / 30.0)
        img[40:46, 40:46] += 0.3
        img = img.astype(np.float32)
        full = np.asarray(rolling_ball(jnp.asarray(img), 12.0,
                                       intensity=0.05))
        ds = np.asarray(rolling_ball(jnp.asarray(img), 12.0,
                                     intensity=0.05, downscale=2))
        assert np.abs(full - ds).mean() < 0.01

    def test_downscale_band_sharding_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="downscale"):
            stage_receptive_field(
                "subtract_background", {"radius": 8.0, "downscale": 2}
            )
        # 'auto' (the default) shrinks at radius > 10, so the band
        # form must reject the defaulted large radius too...
        with pytest.raises(ValueError, match="downscale"):
            stage_receptive_field("subtract_background", {"radius": 25.0})
        # ...while small radii (exact) and pinned downscale=1 shard
        assert stage_receptive_field(
            "subtract_background", {"radius": 8.0}) == 16
        assert stage_receptive_field(
            "subtract_background", {"radius": 25.0, "downscale": 1}) == 50

    def test_auto_downscale_schedule(self, xray):
        # ImageJ's RollingBall shrink schedule: <=10 exact, <=30 half,
        # <=100 quarter, else eighth — 'auto' (the default for
        # subtract_background) must equal the explicit pin at every
        # band, and the golden applies the same schedule
        from mies_tpu.ops.morphology import (_imagej_shrink,
                                             subtract_background)

        assert [_imagej_shrink(r) for r in (1, 10, 10.5, 30, 31, 100,
                                            101, 400)] == \
            [1, 1, 2, 2, 4, 4, 8, 8]
        for radius, pin in ((9.0, 1), (25.0, 2), (60.0, 4)):
            auto = np.asarray(subtract_background(jnp.asarray(xray),
                                                  radius))
            explicit = np.asarray(subtract_background(
                jnp.asarray(xray), radius, downscale=pin))
            np.testing.assert_array_equal(auto, explicit)
            np.testing.assert_allclose(
                auto, G.subtract_background(xray, radius), atol=1e-6)

    def test_bad_radius_raises(self):
        from mies_tpu.ops.morphology import rolling_ball
        from mies_tpu.pipeline.config import PipelineConfig, validate

        with pytest.raises(ValueError, match="radius"):
            rolling_ball(jnp.zeros((16, 16)), 0.0)
        with pytest.raises(ValueError, match="radius"):
            validate(PipelineConfig.make(
                [("subtract_background", {"radius": -1})]
            ))
        with pytest.raises(ValueError, match="downscale"):
            validate(PipelineConfig.make(
                [("subtract_background", {"downscale": 3})]
            ))
        from mies_tpu.ops.morphology import rolling_ball
        with pytest.raises(ValueError, match="downscale"):
            rolling_ball(jnp.zeros((16, 16)), 8.0, downscale=3)


class TestRetinex:
    # tolerance note: the log's slope at dark pixels is 1/eps (=255),
    # so f32 gaussian ULPs (~2e-6) amplify to ~5e-4 in the log ratio
    def test_matches_golden_default(self, xray):
        from mies_tpu.ops.filters import retinex

        out = np.asarray(retinex(jnp.asarray(xray)))
        np.testing.assert_allclose(out, G.retinex(xray), atol=5e-4)

    def test_matches_golden_weighted_minmax(self, xray):
        from mies_tpu.ops.filters import retinex

        kw = dict(sigmas=(1.5, 5.0), weights=(0.7, 0.3),
                  rescale="minmax", mode="reflect")
        out = np.asarray(retinex(jnp.asarray(xray), **kw))
        np.testing.assert_allclose(out, G.retinex(xray, **kw), atol=5e-4)

    def test_flattens_illumination(self):
        # a shading ramp times a texture: retinex removes the ramp
        rng = np.random.default_rng(0)
        y, x = np.mgrid[0:96, 0:96].astype(np.float32)
        illum = 0.25 + 0.6 * (x / 95.0)
        texture = 0.8 + 0.2 * rng.random((96, 96)).astype(np.float32)
        img = (illum * texture).astype(np.float32)
        from mies_tpu.ops.filters import retinex

        out = np.asarray(retinex(jnp.asarray(img), sigmas=(4.0, 16.0)))
        c = slice(16, 80)
        # column means flat after retinex, strongly sloped before
        slope_in = img[c, 70:80].mean() - img[c, 16:26].mean()
        slope_out = out[c, 70:80].mean() - out[c, 16:26].mean()
        assert abs(slope_out) < 0.2 * abs(slope_in)

    def test_band_sharded_clip_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh
        from mies_tpu.pipeline.compiler import compile_pipeline
        from mies_tpu.pipeline.config import PipelineConfig

        cfg = PipelineConfig.make(
            [("retinex", {"sigmas": (1.5, 4.0)})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_minmax_sharding_rejected_and_bad_params(self):
        from mies_tpu.parallel.halo import stage_receptive_field
        from mies_tpu.ops.filters import retinex
        from mies_tpu.pipeline.config import PipelineConfig, validate

        with pytest.raises(ValueError, match="minmax"):
            stage_receptive_field("retinex", {"rescale": "minmax"})
        with pytest.raises(ValueError, match="sigmas"):
            retinex(jnp.zeros((16, 16)), sigmas=())
        with pytest.raises(ValueError, match="weights"):
            retinex(jnp.zeros((16, 16)), sigmas=(1.0, 2.0), weights=(1.0,))
        with pytest.raises(ValueError, match="rescale"):
            retinex(jnp.zeros((16, 16)), rescale="stretch")
        with pytest.raises(ValueError, match="rescale"):
            validate(PipelineConfig.make([("retinex", {"rescale": "x"})]))


class TestDespeckle:
    def test_lee_matches_golden(self, xray):
        from mies_tpu.ops.filters import lee_filter

        # explicit sigma: box dataflow ULPs, amplified by the k-gain
        # division (XLA FMA-contracts m*m vs the numpy golden)
        out = np.asarray(lee_filter(jnp.asarray(xray), 7, sigma=0.05))
        np.testing.assert_allclose(
            out, G.lee_filter(xray, 7, sigma=0.05), atol=1e-5, rtol=0
        )
        # sigma=None: the image-wide mean-variance reduction tree
        # differs between XLA and numpy (f32 sum over all pixels), and
        # the k-gain amplifies it — gate at the propagated scale
        out = np.asarray(lee_filter(jnp.asarray(xray)))
        np.testing.assert_allclose(out, G.lee_filter(xray), atol=2e-4,
                                   rtol=0)

    def test_lee_despeckles_keeps_edge(self):
        rng = np.random.default_rng(0)
        img = np.full((64, 64), 0.3, np.float32)
        img[:, 32:] = 0.7
        noisy = np.clip(
            img + rng.normal(0, 0.05, img.shape).astype(np.float32), 0, 1
        )
        from mies_tpu.ops.filters import lee_filter

        out = np.asarray(lee_filter(jnp.asarray(noisy), 7, sigma=0.08))
        assert out[:, 4:28].std() < 0.5 * noisy[:, 4:28].std()
        jump = out[:, 40:60].mean() - out[:, 4:24].mean()
        assert jump > 0.9 * 0.4

    def test_kuwahara_matches_golden(self, xray):
        from mies_tpu.ops.filters import kuwahara

        for kw in (dict(), dict(kernel_size=7), dict(mode="nearest")):
            out = np.asarray(kuwahara(jnp.asarray(xray), **kw))
            np.testing.assert_array_equal(out, G.kuwahara(xray, **kw))

    def test_kuwahara_never_crosses_edge(self):
        # a clean step edge must survive EXACTLY: the winning quadrant
        # never straddles it
        img = np.full((32, 64), 0.2, np.float32)
        img[:, 32:] = 0.8
        from mies_tpu.ops.filters import kuwahara

        out = np.asarray(kuwahara(jnp.asarray(img), 5))
        np.testing.assert_array_equal(out, img)

    def test_band_sharded_exact(self, rng):
        from mies_tpu.parallel.halo import spatial_shard_apply
        from mies_tpu.parallel.mesh import make_mesh
        from mies_tpu.pipeline.compiler import compile_pipeline
        from mies_tpu.pipeline.config import PipelineConfig

        cfg = PipelineConfig.make(
            [("lee_filter", {"kernel_size": 5, "sigma": 0.05}),
             ("kuwahara", {"kernel_size": 5})]
        )
        img = rng.random((128, 64)).astype(np.float32)
        mesh = make_mesh(data=1, space=4)
        out = np.asarray(spatial_shard_apply(cfg, mesh)(jnp.asarray(img)))
        ref = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_bad_params_and_sharding_rules(self):
        from mies_tpu.ops.filters import kuwahara, lee_filter
        from mies_tpu.parallel.halo import stage_receptive_field
        from mies_tpu.pipeline.config import PipelineConfig, validate

        with pytest.raises(ValueError, match="kernel_size"):
            lee_filter(jnp.zeros((16, 16)), 4)
        with pytest.raises(ValueError, match="sigma"):
            lee_filter(jnp.zeros((16, 16)), 5, sigma=0.0)
        with pytest.raises(ValueError, match="kernel_size"):
            kuwahara(jnp.zeros((16, 16)), 1)
        with pytest.raises(ValueError, match="sigma"):
            stage_receptive_field("lee_filter", {"kernel_size": 5})
        assert stage_receptive_field(
            "lee_filter", {"kernel_size": 7, "sigma": 0.05}
        ) == 3
        with pytest.raises(ValueError, match="kernel_size"):
            validate(PipelineConfig.make([("kuwahara", {"kernel_size": 4})]))


class TestCorrelate1dMatmul:
    """The banded-operator matmul form of a long 1-D correlation
    (filters._correlate1d_op_matrix) vs the shifted-add chain — the TPU
    dispatch for retinex's/hessian's large-sigma blurs. Every border
    mode, both axes, tight atol (matmul reduction-order ULPs only)."""

    @pytest.mark.parametrize(
        "mode", ["nearest", "reflect", "mirror", "wrap", "constant"]
    )
    def test_operator_matches_shifted_add(self, rng, mode):
        from mies_tpu.ops.filters import (
            _conv1d_shifted,
            _correlate1d_op_matrix,
            gaussian_kernel1d,
        )

        x = rng.random((48, 56)).astype(np.float32)
        taps = gaussian_kernel1d(5.0, 20)  # 41 taps >= _MATMUL_TAP_MIN
        for axis in (0, 1):
            ref = np.asarray(
                _conv1d_shifted(jnp.asarray(x), taps, axis, mode)
            )
            n = x.shape[axis]
            a = _correlate1d_op_matrix(n, taps.tobytes(), len(taps), mode)
            got = a @ x if axis == 0 else x @ a.T
            np.testing.assert_allclose(got, ref, atol=2e-6)

    def test_dispatch_is_cpu_invariant(self, rng):
        # on CPU the auto dispatcher must be EXACTLY the shifted-add
        # path (the sharding suite's bit-exactness depends on it)
        from mies_tpu.ops.filters import (
            _conv1d_shifted,
            _correlate1d_auto,
            gaussian_kernel1d,
        )

        x = jnp.asarray(rng.random((40, 48)).astype(np.float32))
        taps = gaussian_kernel1d(8.0, 32)  # 65 taps, over the threshold
        for axis in (0, 1):
            np.testing.assert_array_equal(
                np.asarray(_correlate1d_auto(x, taps, axis, "nearest")),
                np.asarray(_conv1d_shifted(x, taps, axis, "nearest")),
            )

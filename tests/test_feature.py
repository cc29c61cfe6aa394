"""Canny edge detection vs the octant-form golden
(tests/goldens/golden_ops.py::canny_edges — real scipy smoothing /
gradients / labeling, transcribed NMS sectors). The op expresses the
SAME NMS math as one dense bilinear sample, so agreement here is a
cross-check of two independent formulations."""

import numpy as np
import jax.numpy as jnp
import pytest

from goldens import golden_ops as G
from mies_tpu.ops.feature import canny
from mies_tpu.pipeline.compiler import compile_pipeline
from mies_tpu.pipeline.config import PipelineConfig, validate


@pytest.fixture()
def scene(rng):
    """Smooth waves + a disc + mild noise: curved and straight edges
    through every NMS sector."""
    yy, xx = np.mgrid[0:96, 0:96]
    img = 0.5 + 0.4 * np.sin(yy / 9.0) * np.cos(xx / 7.0)
    img += ((yy - 48) ** 2 + (xx - 48) ** 2 < 30**2) * 0.2
    return np.clip(
        img + 0.02 * rng.standard_normal((96, 96)), 0, 1
    ).astype(np.float32)


class TestCanny:
    @pytest.mark.parametrize("kw", [
        {},
        {"sigma": 2.0},
        {"low_threshold": 0.05, "high_threshold": 0.3},
        {"use_quantiles": True, "low_threshold": 0.7,
         "high_threshold": 0.9},
        {"mode": "reflect"},
    ])
    def test_matches_golden(self, scene, kw):
        ref = G.canny_edges(scene, **kw)
        got = np.asarray(canny(jnp.asarray(scene), **kw))
        assert ref.sum() > 100, "degenerate scene"
        np.testing.assert_array_equal(got, ref)

    def test_edges_are_thin(self, scene):
        """NMS makes edges ~1px: no 3x3 block is fully edge."""
        from scipy import ndimage

        e = np.asarray(canny(jnp.asarray(scene), sigma=1.5))
        assert ndimage.minimum_filter(e, size=3).max() == 0.0

    def test_hysteresis_drops_isolated_weak(self, rng):
        """A weak-only blob (never touching a strong edge) must vanish;
        the same blob turned strong must survive."""
        img = np.zeros((64, 64), np.float32)
        img[20:22, 10:30] = 0.15  # weak ridge, gradient ~ low range
        weak = np.asarray(canny(jnp.asarray(img), sigma=1.0,
                                low_threshold=0.01,
                                high_threshold=10.0))
        assert weak.sum() == 0  # nothing reaches the (huge) high bar
        strong = np.asarray(canny(jnp.asarray(img), sigma=1.0,
                                  low_threshold=0.01,
                                  high_threshold=0.02))
        assert strong.sum() > 0

    def test_border_never_edges(self, scene):
        e = np.asarray(canny(jnp.asarray(scene)))
        assert e[0, :].sum() == 0 and e[-1, :].sum() == 0
        assert e[:, 0].sum() == 0 and e[:, -1].sum() == 0

    def test_bad_thresholds_raise(self):
        img = jnp.zeros((16, 16), jnp.float32)
        with pytest.raises(ValueError, match="low_threshold"):
            canny(img, low_threshold=0.5, high_threshold=0.1)
        with pytest.raises(ValueError, match="quantile"):
            canny(img, use_quantiles=True, low_threshold=1.5,
                  high_threshold=2.0)

    def test_pipeline_integration(self, scene):
        cfg = PipelineConfig.make(
            [("gaussian_blur", {"sigma": 1.0}), ("canny", {})],
            name="edges",
        )
        validate(cfg)
        out = np.asarray(
            compile_pipeline(cfg, donate=False)(jnp.asarray(scene))
        )
        assert out.dtype == np.uint8
        assert set(np.unique(out)) <= {0, 255}

    def test_value_rules(self):
        with pytest.raises(ValueError, match="sigma"):
            validate(PipelineConfig.make([("canny", {"sigma": -1.0})]))
        with pytest.raises(ValueError, match="use_quantiles"):
            validate(PipelineConfig.make(
                [("canny", {"use_quantiles": "yes"})]
            ))

    def test_spatial_sharding_rejected(self):
        from mies_tpu.parallel.halo import stage_receptive_field

        with pytest.raises(ValueError, match="spatially sharded"):
            stage_receptive_field("canny", {})

"""Pallas kernel correctness (interpret mode on CPU).

The real-TPU bit-exactness vs cv2 is exercised at verification time on
the chip; here the kernels run through the Pallas interpreter so CI
covers them without TPU hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mies_tpu.kernels.clahe import (
    _cell_luts,
    _tile_hists_onehot,
    clahe_apply_lut,
    clahe_batched,
    clahe_supported,
)
from mies_tpu.ops import histogram as H


def _jnp_clahe_batch(imgs, clip, grid, convention):
    fn = lambda x: H.clahe.__wrapped__(
        x, clip_limit=clip, grid_size=grid, convention=convention
    )
    return np.asarray(jax.vmap(fn)(imgs))


def test_tile_hists_onehot_matches_scatter(rng):
    u8 = jnp.asarray(rng.integers(0, 256, (2, 64, 64)).astype(np.int32))
    got = np.asarray(_tile_hists_onehot(u8, 4, 4))
    for b in range(2):
        for i in range(4):
            for j in range(4):
                tile = np.asarray(u8)[b, i * 16 : (i + 1) * 16, j * 16 : (j + 1) * 16]
                want = np.bincount(tile.ravel(), minlength=256)
                np.testing.assert_array_equal(got[b, i, j], want)


def test_cell_luts_clamping():
    luts = jnp.asarray(np.random.default_rng(0).random((1, 2, 2, 256), np.float32))
    cl = np.asarray(_cell_luts(luts, 2, 2))  # [1, 3, 3, 4, 256]
    L = np.asarray(luts)[0]
    # corner cell (0,0): all four -> tile (0,0)
    for k in range(4):
        np.testing.assert_array_equal(cl[0, 0, 0, k], L[0, 0])
    # center cell (1,1): four distinct tiles
    np.testing.assert_array_equal(cl[0, 1, 1, 0], L[0, 0])
    np.testing.assert_array_equal(cl[0, 1, 1, 1], L[0, 1])
    np.testing.assert_array_equal(cl[0, 1, 1, 2], L[1, 0])
    np.testing.assert_array_equal(cl[0, 1, 1, 3], L[1, 1])


def test_clahe_supported():
    assert clahe_supported((512, 512), (8, 8))
    assert clahe_supported((1024, 1024), (8, 8))
    assert not clahe_supported((250, 333), (8, 8))  # not divisible
    assert not clahe_supported((40, 40), (5, 5))  # 8x8 tiles: 64 px % 128 != 0


@pytest.mark.parametrize("convention", ["opencv", "fraction"])
def test_apply_lut_interpret_matches_jnp(rng, convention):
    """Pallas apply (interpreter) == the validated jnp bilinear apply."""
    imgs = rng.random((2, 128, 128)).astype(np.float32)
    clip = 2.0 if convention == "opencv" else 0.02
    grid = (4, 4)
    ref = _jnp_clahe_batch(jnp.asarray(imgs), clip, grid, convention)

    # run the kernel-based composition with the Pallas interpreter
    from mies_tpu.ops.histogram import (
        _clip_redistribute_fraction,
        _clip_redistribute_opencv,
    )

    u8 = jnp.clip(jnp.round(jnp.asarray(imgs) * 255.0), 0, 255).astype(jnp.int32)
    hists = _tile_hists_onehot(u8, *grid).reshape(-1, 256)
    th, tw = 128 // grid[0], 128 // grid[1]
    area = th * tw
    if convention == "opencv":
        hists = _clip_redistribute_opencv(hists, jnp.float32(max(int(clip * area / 256), 1)))
        cdf = jnp.cumsum(hists, axis=1)
        luts = jnp.clip(jnp.rint(cdf * (jnp.float32(255) / area)), 0, 255)
        res = clahe_apply_lut(
            u8, luts.reshape(2, *grid, 256), grid, integer_luts=True, interpret=True
        )
        out = np.asarray(jnp.clip(jnp.rint(res), 0, 255) / 255.0)
    else:
        hists = _clip_redistribute_fraction(hists, jnp.float32(max(clip * area, 1.0)))
        cdf = jnp.cumsum(hists, axis=1)
        luts = (cdf / area).reshape(2, *grid, 256)
        res = clahe_apply_lut(u8, luts, grid, integer_luts=False, interpret=True)
        out = np.asarray(jnp.clip(res, 0.0, 1.0))

    np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("convention", ["opencv", "fraction"])
def test_apply_lut_fused_quantize_finalize_matches_unfused(rng, convention):
    """quantize_input=True (f32 in, level quantize in-kernel) +
    finalize ('u8norm'/'clip01' epilogue in-kernel) == the unfused
    int32-in / XLA-epilogue form. clip01 is BIT-equal (same ops, only
    moved inside the kernel). u8norm is levels-exact with values within
    1 ULP: the kernel's clip(rint(res)) integer is identical, but the
    final /255 may be compiled as reciprocal-multiply on one side and
    true division on the other — a 1-ULP wobble the contract tolerates
    (cv2 parity is asserted on uint8 LEVELS; see tests/test_clahe.py).
    Uses a tw%64==0 shape so the tile33 in-kernel path (not the
    XLA-side fallback) is what's exercised."""
    from mies_tpu.kernels.clahe import _tile_hists_onehot
    from mies_tpu.ops.histogram import (
        _clip_redistribute_fraction,
        _clip_redistribute_opencv,
    )

    imgs = jnp.asarray(rng.random((2, 128, 128)).astype(np.float32))
    grid = (2, 2)  # tw = 64: tile33 path
    u8 = jnp.clip(jnp.round(imgs * 255.0), 0, 255).astype(jnp.int32)
    hists = _tile_hists_onehot(u8, *grid).reshape(-1, 256)
    area = 64 * 64
    if convention == "opencv":
        hists = _clip_redistribute_opencv(
            hists, jnp.float32(max(int(2.0 * area / 256), 1))
        )
        cdf = jnp.cumsum(hists, axis=1)
        luts = jnp.clip(jnp.rint(cdf * (jnp.float32(255) / area)), 0, 255)
        luts = luts.reshape(2, *grid, 256)
        res = clahe_apply_lut(u8, luts, grid, integer_luts=True,
                              interpret=True)
        want = np.asarray(jnp.clip(jnp.rint(res), 0, 255) / 255.0)
        got = np.asarray(clahe_apply_lut(
            imgs, luts, grid, integer_luts=True, interpret=True,
            quantize_input=True, finalize="u8norm",
        ))
    else:
        hists = _clip_redistribute_fraction(
            hists, jnp.float32(max(0.02 * area, 1.0))
        )
        cdf = jnp.cumsum(hists, axis=1)
        luts = (cdf / area).reshape(2, *grid, 256)
        res = clahe_apply_lut(u8, luts, grid, integer_luts=False,
                              interpret=True)
        want = np.asarray(jnp.clip(res, 0.0, 1.0))
        got = np.asarray(clahe_apply_lut(
            imgs, luts, grid, integer_luts=False, interpret=True,
            quantize_input=True, finalize="clip01",
        ))
    if convention == "opencv":
        # levels bit-exact; value within 1 ULP of 1.0 (the /255 wobble)
        np.testing.assert_array_equal(
            np.rint(got * 255.0), np.rint(want * 255.0)
        )
        np.testing.assert_allclose(got, want, atol=1.3e-7, rtol=0)
    else:
        np.testing.assert_array_equal(got, want)


def test_hists_rows_quantize_input_matches_int(rng):
    """tile_hists_rows_pallas(quantize_input=True) on f32 [0,1] ==
    the int32-levels form — the in-kernel clip(round(v*255)) is the
    same op sequence as the XLA-side quantize."""
    from mies_tpu.kernels.clahe import tile_hists_rows_pallas

    imgs = jnp.asarray(rng.random((2, 128, 128)).astype(np.float32))
    u8 = jnp.clip(jnp.round(imgs * 255.0), 0, 255).astype(jnp.int32)
    want = np.asarray(tile_hists_rows_pallas(u8, 2, 2, interpret=True))
    got = np.asarray(tile_hists_rows_pallas(imgs, 2, 2, interpret=True,
                                            quantize_input=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("k,sc,ss", [(5, 0.1, 1.5), (3, 0.25, 1.0)])
def test_bilateral_kernel_interpret_matches_jnp(rng, k, sc, ss):
    from mies_tpu.kernels.bilateral import bilateral_tpu
    from mies_tpu.ops.filters import bilateral_blur

    imgs = rng.random((2, 128, 128)).astype(np.float32)
    out = np.asarray(
        bilateral_tpu(jnp.asarray(imgs), k, sc, ss, "reflect", interpret=True)
    )
    ref = np.asarray(
        jax.vmap(lambda x: bilateral_blur(x, k, sc, ss))(jnp.asarray(imgs))
    )
    # the symmetric-pair kernel reorders the k^2 window sum vs the
    # twin's row-major scan: f32 summation-order ULPs only (measured
    # max ~8e-7 at 512^2 on chip)
    np.testing.assert_allclose(out, ref, atol=2e-6)


@pytest.mark.parametrize("k", [3, 5, 9])
@pytest.mark.parametrize("mode", ["reflect", "mirror", "nearest"])
def test_bilateral_scratch_matches_padded(rng, k, mode):
    """The pad-free scratch-border bilateral (border built in VMEM at
    strip 0, static row indices shifted by _PADT - 2r) is BIT-identical
    to the padded-input path — same taps, same accumulation order, only
    the border transport differs. Bit-equal on chip too."""
    from mies_tpu.kernels.bilateral import bilateral_tpu

    imgs = jnp.asarray(rng.random((2, 128, 192)).astype(np.float32))
    pad = np.asarray(bilateral_tpu(imgs, k, 0.1, 1.5, mode, interpret=True,
                                   scratch_borders=False))
    scr = np.asarray(bilateral_tpu(imgs, k, 0.1, 1.5, mode, interpret=True,
                                   scratch_borders=True))
    np.testing.assert_array_equal(scr, pad)


def test_bilateral_supported_bounds():
    from mies_tpu.kernels.bilateral import bilateral_supported

    assert bilateral_supported((512, 512), 5)
    assert bilateral_supported((1024, 1024), 5)
    assert not bilateral_supported((2048, 2048), 5)  # VMEM block too large
    assert not bilateral_supported((64, 64), 5)  # lanes too narrow


def test_bilateral_batched_dispatches_to_jnp_on_cpu(rng):
    from mies_tpu.kernels.bilateral import bilateral_batched
    from mies_tpu.ops.filters import bilateral_blur

    imgs = jnp.asarray(rng.random((2, 128, 128)).astype(np.float32))
    out = np.asarray(bilateral_batched(imgs, 5, 0.1, 1.5))
    ref = np.asarray(jax.vmap(lambda x: bilateral_blur(x, 5, 0.1, 1.5))(imgs))
    np.testing.assert_array_equal(out, ref)


def test_clahe_batched_dispatches_to_jnp_on_cpu(rng):
    """On the CPU backend clahe_batched must fall back to the jnp path."""
    imgs = jnp.asarray(rng.random((2, 64, 64)).astype(np.float32))
    out = np.asarray(clahe_batched(imgs, 2.0, (4, 4), "opencv"))
    ref = _jnp_clahe_batch(imgs, 2.0, (4, 4), "opencv")
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("shape,grid", [((128, 128), (2, 2)), ((128, 128), (4, 4))])
def test_apply_paths_agree(rng, shape, grid):
    """Slab path (tw>=64) and cell-list path produce identical results."""
    from mies_tpu.kernels.clahe import (
        _apply_lut_cells,
        _apply_lut_slab,
        clahe_apply_lut,
    )

    u8 = jnp.asarray(rng.integers(0, 256, (2, *shape)).astype(np.int32))
    luts = jnp.asarray(
        np.rint(rng.random((2, *grid, 256)).astype(np.float32) * 255)
    )
    th, tw = shape[0] // grid[0], shape[1] // grid[1]
    if tw % 64 == 0:
        a = np.asarray(
            _apply_lut_slab(u8, luts, grid, integer_luts=True, interpret=True)
        )
        b = np.asarray(
            _apply_lut_cells(u8, luts, grid, integer_luts=True, interpret=True)
        )
        np.testing.assert_array_equal(a, b)
    else:
        out = np.asarray(
            clahe_apply_lut(u8, luts, grid, integer_luts=True, interpret=True)
        )
        assert out.shape == (2, *shape)


@pytest.mark.parametrize("quantize", [False, True])
def test_fused_tail_kernel_interpret(rng, quantize):
    """The (opt-in) fused bilateral->unsharp->quantize kernel matches the
    unfused composition (kept correct even while disabled by default)."""
    from mies_tpu.kernels.fused import bilateral_unsharp_tpu
    from mies_tpu.ops.filters import bilateral_blur, unsharp_mask

    imgs = rng.random((2, 128, 128)).astype(np.float32)

    def unfused(x):
        return unsharp_mask(bilateral_blur(x, 5, 0.1, 1.5), radius=1.5, amount=1.0)

    ref = np.asarray(jax.vmap(unfused)(jnp.asarray(imgs)))
    out = np.asarray(
        bilateral_unsharp_tpu(
            jnp.asarray(imgs), 5, 0.1, 1.5, "reflect", 1.5, 1.0,
            quantize=quantize, interpret=True,
        )
    )
    if quantize:
        refq = np.clip(np.rint(ref * 255), 0, 255).astype(np.uint8)
        d = np.abs(out.astype(int) - refq.astype(int))
        assert d.max() <= 1 and (d > 0).mean() < 1e-3  # rounding ties only
    else:
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_fuse_tail_env_gate(rng, monkeypatch):
    """MIES_TPU_FUSE_TAIL gates the peephole; off by default."""
    from mies_tpu.pipeline.compiler import _try_fuse_tail
    from mies_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig.make(
        [("bilateral_blur", {"kernel_size": 5}),
         ("unsharp_mask", {"radius": 1.5})]
    )
    stages, fused = _try_fuse_tail(cfg, True)
    assert fused is None and len(stages) == 2  # disabled by default


def test_tile_hists_pallas_matches_jnp_interpret(rng):
    """Nibble outer-product hist kernel == the jnp twin, exactly
    (interpret mode on CPU; real Mosaic covered by TPU bench runs)."""
    from mies_tpu.kernels.clahe import _tile_hists_onehot, tile_hists_pallas

    u8 = (rng.random((3, 128, 128)) * 255.999).astype(np.int32)
    got = np.asarray(tile_hists_pallas(jnp.asarray(u8), 4, 4, interpret=True))
    want = np.asarray(_tile_hists_onehot(jnp.asarray(u8), 4, 4))
    np.testing.assert_array_equal(got, want)
    # counts must sum to the tile pixel count
    assert (got.sum(-1) == 32 * 32).all()


def test_tile_hists_rows_pallas_matches_onehot(rng):
    """Rows-layout hist kernel (no XLA transpose) == the jnp twin,
    exactly, across tile shapes."""
    from mies_tpu.kernels.clahe import _tile_hists_onehot, tile_hists_rows_pallas

    for shape, grid in [((128, 128), (2, 2)), ((128, 256), (2, 4)),
                        ((256, 256), (4, 4))]:
        u8 = jnp.asarray(
            (rng.random((2, *shape)) * 255.999).astype(np.int32))
        got = np.asarray(tile_hists_rows_pallas(u8, *grid, interpret=True))
        want = np.asarray(_tile_hists_onehot(u8, *grid))
        np.testing.assert_array_equal(got, want)


def test_tile_hists_pallas_odd_tile_count(rng):
    """Tile counts not divisible by the per-program blocking pad cleanly."""
    from mies_tpu.kernels.clahe import _tile_hists_onehot, tile_hists_pallas

    u8 = (rng.random((1, 96, 128)) * 255.999).astype(np.int32)
    got = np.asarray(tile_hists_pallas(jnp.asarray(u8), 3, 1, interpret=True))
    want = np.asarray(_tile_hists_onehot(jnp.asarray(u8), 3, 1))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("integer_luts", [True, False])
def test_apply_tile33_matches_slab_interpret(rng, integer_luts):
    """The 3x3-stack tile-aligned apply == the slab apply, exactly
    (both interpret mode; the TPU bit-exactness vs cv2 covers Mosaic)."""
    from mies_tpu.kernels.clahe import _apply_lut_slab, _apply_lut_tile33

    u8 = jnp.asarray((rng.random((2, 256, 256)) * 255.999).astype(np.int32))
    luts = jnp.asarray(
        np.clip(np.cumsum(rng.random((2, 4, 4, 256)), -1), 0, 255).astype(np.float32)
    )
    if not integer_luts:
        luts = luts / 255.0
    a = np.asarray(_apply_lut_tile33(u8, luts, (4, 4), integer_luts, True))
    b = np.asarray(_apply_lut_slab(u8, luts, (4, 4), integer_luts, True))
    if integer_luts:
        np.testing.assert_array_equal(a, b)
    else:
        # fractional LUTs: the per-row kernel's split dot-sums
        # FMA-contract differently from the slab kernel's under XLA:CPU
        # emulation (CLAUDE.md quirk) — last-ULP f32 noise only
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_bilateral_strip32_fallback_interpret(rng):
    """Heights divisible by 32 but not 64 take the strip-32 path."""
    from mies_tpu.kernels.bilateral import _strip_rows, bilateral_tpu
    from mies_tpu.ops.filters import bilateral_blur

    assert _strip_rows(96) == 32 and _strip_rows(128) == 64
    imgs = rng.random((1, 96, 128)).astype(np.float32)
    out = np.asarray(
        bilateral_tpu(jnp.asarray(imgs), 5, 0.1, 1.5, "reflect", interpret=True)
    )
    ref = np.asarray(
        jax.vmap(lambda x: bilateral_blur(x, 5, 0.1, 1.5))(jnp.asarray(imgs))
    )
    np.testing.assert_allclose(out, ref, atol=2e-6)


def test_bilateral_supported_rejects_large_kernels():
    """Everything bilateral_tpu raises on must be excluded by the
    dispatch predicate, or TPU users crash where the XLA fallback
    works (r2 review)."""
    from mies_tpu.kernels.bilateral import bilateral_supported

    assert bilateral_supported((512, 512), 9)
    assert not bilateral_supported((512, 512), 11)


def test_tile_hists_pallas_fewer_tiles_than_block(rng):
    """total tiles < per-program blocking: padding must still produce a
    block-divisible array (r2 review: tiles[:pad] was short)."""
    from mies_tpu.kernels.clahe import _tile_hists_onehot, tile_hists_pallas

    u8 = (rng.random((1, 96, 128)) * 255.999).astype(np.int32)
    got = np.asarray(tile_hists_pallas(jnp.asarray(u8), 3, 1, interpret=True))
    want = np.asarray(_tile_hists_onehot(jnp.asarray(u8), 3, 1))
    np.testing.assert_array_equal(got, want)


def test_unsharp_gauss_fused_matches_twin_interpret(rng):
    """Fused unsharp->gaussian kernel == the unfused pair. Bit-exact on
    TPU (verified on chip); on XLA:CPU the two programs FMA-contract
    differently, leaving last-ULP f32 noise (~2e-7) — the CLAUDE.md
    platform quirk."""
    from mies_tpu.kernels.unsharp_gauss import unsharp_gauss_tpu
    from mies_tpu.ops.filters import gaussian_blur, unsharp_mask

    imgs = rng.random((2, 128, 192)).astype(np.float32)
    for radius, amount, sigma in [(1.5, 1.0, 1.5), (1.0, 0.5, 2.0)]:
        out = np.asarray(unsharp_gauss_tpu(
            jnp.asarray(imgs), radius=radius, amount=amount, sigma=sigma,
            interpret=True,
        ))
        ref = np.asarray(jax.vmap(
            lambda x: gaussian_blur(unsharp_mask(x, radius, amount), sigma)
        )(jnp.asarray(imgs)))
        np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("quantize", [False, True])
def test_unsharp_quant_kernel_interpret(rng, quantize):
    """Pallas unsharp(+quantize) tail == unsharp_mask (+ uint8 quantize).
    Bit-exact on TPU; on XLA:CPU FMA contraction differs between the two
    programs (CLAUDE.md quirk) — f32 last-ULP noise, and for quantize
    isolated .5-tie flips of at most 1 level."""
    from mies_tpu.kernels.unsharp_gauss import unsharp_quant_tpu
    from mies_tpu.ops.filters import unsharp_mask

    imgs = rng.random((2, 128, 192)).astype(np.float32)
    for radius, amount in [(1.5, 1.0), (1.0, 0.5)]:
        ref = np.asarray(jax.vmap(
            lambda x: unsharp_mask(x, radius=radius, amount=amount)
        )(jnp.asarray(imgs)))
        out = np.asarray(unsharp_quant_tpu(
            jnp.asarray(imgs), radius=radius, amount=amount,
            quantize=quantize, interpret=True,
        ))
        if quantize:
            refq = np.clip(np.rint(ref * 255), 0, 255).astype(np.uint8)
            d = np.abs(out.astype(int) - refq.astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-3
        else:
            np.testing.assert_allclose(out, ref, atol=1e-6)


@pytest.mark.parametrize("quantize", [False, True])
def test_unsharp_quant_scratch_matches_padded(rng, quantize):
    """The pad-free scratch-border variant (edge replication built in a
    VMEM scratch, no XLA pad pass) is BIT-equal to the padded-input
    path — same tap order, same arithmetic, only the border transport
    differs. Verified bit-equal on chip (0.493 -> 0.393 ms/b32); on
    XLA:CPU interpret the two lowerings FMA-contract differently
    (CLAUDE.md quirk) — last-ULP f32 noise on <0.1% of pixels."""
    from mies_tpu.kernels.unsharp_gauss import unsharp_quant_tpu

    imgs = jnp.asarray(rng.random((2, 128, 192)).astype(np.float32))
    for radius in (1.0, 1.5):
        pad = np.asarray(unsharp_quant_tpu(
            imgs, radius=radius, quantize=quantize, interpret=True,
            scratch_borders=False,
        ))
        scr = np.asarray(unsharp_quant_tpu(
            imgs, radius=radius, quantize=quantize, interpret=True,
            scratch_borders=True,
        ))
        if quantize:
            d = np.abs(scr.astype(int) - pad.astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 1e-3
        else:
            np.testing.assert_allclose(scr, pad, atol=1e-7)
            assert (scr != pad).mean() < 1e-3


def test_unsharp_quant_chain_peephole(rng):
    """build_batched_chain fuses a trailing unsharp_mask when quantize
    is requested; result matches the unfused chain (CPU: peephole falls
    back at trace time, so this checks the fallback correctness path and
    the prefix/tail split logic)."""
    from mies_tpu.pipeline.compiler import (
        _try_fuse_unsharp_quant,
        build_batched_chain,
    )
    from mies_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig.make(
        [("adjust_gamma", {"gamma": 0.8}),
         ("unsharp_mask", {"radius": 1.5, "amount": 1.0})]
    )
    stages, fused = _try_fuse_unsharp_quant(cfg, True)
    assert fused is not None and len(stages) == 1
    # non-nearest mode must not fuse
    cfg2 = PipelineConfig.make(
        [("unsharp_mask", {"radius": 1.5, "mode": "reflect"})]
    )
    _, fused2 = _try_fuse_unsharp_quant(cfg2, True)
    assert fused2 is None

    imgs = jnp.asarray(rng.random((2, 128, 128)).astype(np.float32))
    got = np.asarray(build_batched_chain(cfg, quantize=True)(imgs))
    from mies_tpu.ops.filters import unsharp_mask
    from mies_tpu.ops.intensity import adjust_gamma

    want = np.asarray(jax.vmap(
        lambda x: unsharp_mask(adjust_gamma(x, 0.8), radius=1.5, amount=1.0)
    )(imgs))
    wantq = np.clip(np.rint(want * 255), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, wantq)


def test_clahe_skimage_tpu_interpret_matches_jnp(rng):
    """Batched skimage fast path (Pallas hist + apply, interpreter) vs
    the vmapped jnp transcription: selection and counts are exact, so
    only FMA-contraction ties in the coefficient blend may flip a
    floored 14-bit level (tiny, isolated)."""
    from mies_tpu.kernels.clahe import clahe_skimage_tpu

    imgs = rng.random((2, 128, 128)).astype(np.float32)
    ref = _jnp_clahe_batch(jnp.asarray(imgs), 0.02, (2, 2), "skimage")
    out = np.asarray(clahe_skimage_tpu(
        jnp.asarray(imgs), (64, 64), 0.02, interpret=True
    ))
    d = np.abs(out - ref)
    assert (d > 1.0 / 255.0).mean() <= 5e-5, d.max()
    assert d.max() <= 2.0 / 255.0 + 0.02, d.max()


def test_clahe_skimage_tpu_interpret_matches_golden(rng):
    """Batched skimage fast path vs the transcribed skimage 0.26 golden
    (same outlier contract as the jnp path's golden tests)."""
    import sys as _sys
    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from goldens import golden_ops as G
    from mies_tpu.kernels.clahe import clahe_skimage_tpu

    img = rng.random((96, 160)).astype(np.float32)
    out = np.asarray(clahe_skimage_tpu(
        jnp.asarray(img[None]), (24, 40), 0.02, interpret=True
    ))[0]
    ref = G.equalize_adapthist_skimage(img, kernel_size=(24, 40),
                                       clip_limit=0.02)
    d = np.abs(out - ref)
    assert (d > 1.0 / 255.0).mean() <= 5e-5, d.max()
    assert d.max() <= 2.0 / 255.0 + 0.02, d.max()


def test_clahe_skimage_tpu_kc_not_64_multiple(rng):
    """kc = 80 (e.g. a 640^2 image at the default grid) must take the
    flat-blocks kernel — the rows layout's [1, kr, 2kc] blocks index at
    lane offsets Mosaic needs 128-aligned (review-caught gate hole)."""
    from mies_tpu.kernels.clahe import clahe_skimage_supported, clahe_skimage_tpu

    assert clahe_skimage_supported((640, 640), (80, 80))  # npx 6400 % 128
    imgs = rng.random((1, 320, 320)).astype(np.float32)
    ref = _jnp_clahe_batch(jnp.asarray(imgs), 0.02, (4, 4), "skimage")
    out = np.asarray(clahe_skimage_tpu(
        jnp.asarray(imgs), (80, 80), 0.02, interpret=True
    ))
    d = np.abs(out - ref)
    assert (d > 1.0 / 255.0).mean() <= 5e-5 and d.max() <= 2.0 / 255.0 + 0.02


def test_clahe_skimage_supported_gate():
    from mies_tpu.kernels.clahe import clahe_skimage_supported

    assert clahe_skimage_supported((512, 512), (64, 64))
    assert clahe_skimage_supported((96, 160), (32, 32))
    assert not clahe_skimage_supported((512, 512), (64, 64), nbins=128)
    assert not clahe_skimage_supported((96, 160), (24, 40))  # 960 % 128
    assert not clahe_skimage_supported((1024, 1024), (128, 128))  # npx cap


def test_blocks8_kernel_skimage_interpret(rng):
    """8-corner blocks kernel (skimage mode) == the jnp selection core
    with the same coefficients (selection exact; floor ties are the only
    FMA exposure — tolerate isolated single-level flips)."""
    from mies_tpu.kernels.clahe import blocks8_apply, blocks8_supported

    kz, ky, kx = 4, 8, 8
    npx = kz * ky * kx
    assert blocks8_supported(npx)
    nb = 8
    blocks = jnp.asarray(rng.integers(0, 256, (nb, npx)).astype(np.int32))
    maps = jnp.asarray(
        np.rint(rng.random((nb, 8, 256)) * 16383).astype(np.float32)
    )
    wz = np.arange(kz, dtype=np.float32) / kz
    wy = np.arange(ky, dtype=np.float32) / ky
    wx = np.arange(kx, dtype=np.float32) / kx
    coeffs = []
    for ez in range(2):
        cz = wz if ez else 1.0 - wz
        for ey in range(2):
            cy = wy if ey else 1.0 - wy
            for ex in range(2):
                cx = wx if ex else 1.0 - wx
                coeffs.append(jnp.asarray(
                    (cz[:, None, None] * cy[None, :, None]
                     * cx[None, None, :]).reshape(npx)
                ))
    ref = np.asarray(
        H._apply_maps_selection_blocks(blocks, maps, coeffs, 256)
    )
    got = np.asarray(blocks8_apply(
        blocks, maps, dims=(kz, ky, kx), grids=(2, 2, 2),
        mode="skimage", split=True, interpret=True,
    ))
    d = np.abs(got - ref)
    assert d.max() <= 1.0 and (d > 0).mean() < 1e-3, (d.max(), (d > 0).mean())


def test_blocks8_kernel_opencv_interpret(rng):
    """8-corner blocks kernel (opencv mode): in-kernel cell fracs + the
    nested x->y->z lerp reproduce the jnp selection path."""
    from mies_tpu.kernels.clahe import blocks8_apply

    kz, ky, kx = 4, 8, 8
    npx = kz * ky * kx
    nz, ny, nx = 3, 2, 2
    nb = nz * ny * nx
    blocks = jnp.asarray(rng.integers(0, 256, (nb, npx)).astype(np.int32))
    maps = jnp.asarray(
        np.rint(rng.random((nb, 8, 256)) * 255).astype(np.float32)
    )
    got = np.asarray(blocks8_apply(
        blocks, maps, dims=(kz, ky, kx), grids=(nz, ny, nx),
        mode="opencv", split=False, interpret=True,
    ))

    sels = np.asarray(H._select_blocks(blocks, maps, 256))  # [NB, P, 8]

    def frac(i, local, t):
        n = (i * t - t // 2 + local).astype(np.float32)
        f = n * np.float32(1.0 / t) - np.float32(0.5)
        return f - np.floor(f)

    p = np.arange(npx)
    rz, rem = p // (ky * kx), p % (ky * kx)
    ry, rx = rem // kx, rem % kx
    ref = np.zeros((nb, npx), np.float32)
    for b in range(nb):
        iz, r2 = b // (ny * nx), b % (ny * nx)
        iy, ix = r2 // nx, r2 % nx
        az = frac(np.full(npx, iz), rz, kz)
        ay = frac(np.full(npx, iy), ry, ky)
        ax = frac(np.full(npx, ix), rx, kx)
        s = sels[b]
        c00 = s[:, 0] * (1 - ax) + s[:, 1] * ax
        c01 = s[:, 2] * (1 - ax) + s[:, 3] * ax
        c10 = s[:, 4] * (1 - ax) + s[:, 5] * ax
        c11 = s[:, 6] * (1 - ax) + s[:, 7] * ax
        c0 = c00 * (1 - ay) + c01 * ay
        c1 = c10 * (1 - ay) + c11 * ay
        ref[b] = c0 * (1 - az) + c1 * az
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("integer_luts", [True, False])
def test_blocks4_fracs_kernel_interpret(rng, integer_luts):
    """4-corner blocks kernel with frac inputs (the band/fallback apply)
    == the jnp selection + x-then-y lerp."""
    from mies_tpu.kernels.clahe import blocks4_fracs_apply

    nb, npx = 8, 256
    blocks = jnp.asarray(rng.integers(0, 256, (nb, npx)).astype(np.int32))
    vals = rng.random((nb, 4, 256)).astype(np.float32)
    m4 = jnp.asarray(np.rint(vals * 255) if integer_luts else vals)
    yab = jnp.asarray(rng.random((nb, npx)).astype(np.float32))
    xab = jnp.asarray(rng.random((nb, npx)).astype(np.float32))
    got = np.asarray(blocks4_fracs_apply(
        blocks, m4, yab, xab, integer_luts=integer_luts, interpret=True,
    ))
    sels = np.asarray(H._select_blocks(blocks, m4, 256))
    ya, xa = np.asarray(yab), np.asarray(xab)
    top = sels[:, :, 0] * (1 - xa) + sels[:, :, 1] * xa
    bot = sels[:, :, 2] * (1 - xa) + sels[:, :, 3] * xa
    ref = top * (1 - ya) + bot * ya
    np.testing.assert_allclose(got, ref, atol=2e-4 if not integer_luts else 1e-3)


def test_unsharp_gauss_supported_bounds():
    from mies_tpu.kernels.unsharp_gauss import unsharp_gauss_supported

    assert unsharp_gauss_supported((1024, 1024), 1.5, 1.5)
    assert unsharp_gauss_supported((512, 512), 1.5, 1.5)
    assert not unsharp_gauss_supported((100, 512), 1.5, 1.5)  # H % 64
    assert not unsharp_gauss_supported((2048, 2048), 1.5, 1.5)  # VMEM
    assert not unsharp_gauss_supported((512, 512), 0.05, 1.5)  # radius 0


def test_unsharp_gauss_rejects_oversized_sigma():
    """sigma radii beyond the strip height break the top-edge
    replication (r2 review round 3): supported() must exclude them and
    the kernel must refuse."""
    from mies_tpu.kernels.unsharp_gauss import (
        unsharp_gauss_supported,
        unsharp_gauss_tpu,
    )

    assert not unsharp_gauss_supported((512, 512), 1.5, 17.0)  # r2 = 68
    with pytest.raises(ValueError, match="strip height"):
        unsharp_gauss_tpu(jnp.zeros((1, 128, 128), jnp.float32),
                          sigma=17.0, interpret=True)


def test_apply33_variants_bit_equal_interpret(rng):
    """The measurement-only apply variants (v2 half-stack dot, v3
    two-rows-per-dot — both measured SLOWER on chip, docs/KERNELS.md
    round 4; kernels/clahe_variants.py) must stay BIT-identical to the
    production kernel so the recorded A/B numbers stay reproducible."""
    import mies_tpu.kernels.clahe as K

    u8 = jnp.asarray(rng.integers(0, 256, (2, 128, 128)).astype(np.int32))
    luts = jnp.asarray(
        rng.integers(0, 256, (2, 4, 2, 256)).astype(np.float32)
    )
    flut = jnp.asarray(rng.random((2, 4, 2, 256)).astype(np.float32))

    outs = {}
    for v in ("v1", "v2", "v3"):
        outs[v] = (
            np.asarray(K._apply_lut_tile33(u8, luts, (4, 2), True, True, v)),
            np.asarray(K._apply_lut_tile33(u8, flut, (4, 2), False, True, v)),
        )
    for v in ("v2", "v3"):
        np.testing.assert_array_equal(outs["v1"][0], outs[v][0])
        np.testing.assert_array_equal(outs["v1"][1], outs[v][1])


def test_apply33_env_variant_keys_jit_cache(rng, monkeypatch):
    """Flipping MIES_TPU_APPLY33 mid-process must take effect: the env
    var is resolved BEFORE jit dispatch, not at trace time (review
    finding, round 4)."""
    import mies_tpu.kernels.clahe as K

    u8 = jnp.asarray(rng.integers(0, 256, (1, 128, 128)).astype(np.int32))
    luts = jnp.asarray(
        rng.integers(0, 256, (1, 2, 2, 256)).astype(np.float32)
    )
    monkeypatch.setenv("MIES_TPU_APPLY33", "v1")
    a = np.asarray(K.clahe_apply_lut(u8, luts, (2, 2), interpret=True))
    monkeypatch.setenv("MIES_TPU_APPLY33", "v2")
    b = np.asarray(K.clahe_apply_lut(u8, luts, (2, 2), interpret=True))
    np.testing.assert_array_equal(a, b)  # bit-equal variants
    # the two calls must have compiled DISTINCT programs (cache keyed
    # on the variant)
    assert K._clahe_apply_lut_jit._cache_size() >= 2


def test_apply_tile33_groups_match_cells(rng):
    """P=4/P=8 tile groups (tw = 32/96/16/48 — the shapes that used to
    fall to the cells path) match the cells twin: BIT-equal for dyadic
    tile widths; 1-ULP (XLA:CPU FMA-contraction of the non-dyadic xa
    blend) for tw=96/48 — the same platform class the other apply tests
    tolerate. On chip the tw=96 case is pinned bit-exact vs cv2
    (tpu_consistency_driver clahe_opencv_tw96_vs_cv2)."""
    from mies_tpu.kernels.clahe import (
        _apply_lut_cells,
        _tile33_group,
        clahe_apply_lut,
    )

    expected_p = {32: 4, 96: 4, 64: 2, 16: 8, 48: 8}
    for shape, grid, exact in [
        ((2, 128, 256), (4, 8), True),    # tw=32 -> P=4, dyadic
        ((2, 128, 384), (4, 4), False),   # tw=96 -> P=4, non-dyadic
        ((2, 128, 256), (4, 4), True),    # tw=64 -> P=2 regression
        ((2, 128, 128), (4, 8), True),    # tw=16 -> P=8, dyadic
        ((2, 128, 384), (4, 8), False),   # tw=48 -> P=8, non-dyadic
    ]:
        gy, gx = grid
        assert _tile33_group(shape[2] // gx, gx, max_p=8) == (
            expected_p[shape[2] // gx]
        )
        u8 = jnp.asarray(
            rng.integers(0, 256, shape).astype(np.int32))
        luts = jnp.asarray(
            rng.integers(0, 256, (shape[0], gy, gx, 256)).astype(
                np.float32))
        got = np.asarray(clahe_apply_lut(
            u8, luts, grid, integer_luts=True, interpret=True))
        ref = np.asarray(_apply_lut_cells(u8, luts, grid, True, True))
        if exact:
            np.testing.assert_array_equal(got, ref)
        else:
            np.testing.assert_allclose(got, ref, atol=1e-4, rtol=0)


class TestDiffusionKernel:
    """VMEM-resident Perona-Malik (kernels/diffusion.py) vs the jnp
    twin. NOT bit-exact off-chip: XLA FMA-contracts the twin's mul+add
    chains (the documented CLAUDE.md class) — ~1 ULP/iteration; the
    chip contract covers the dispatched path at 2e-5."""

    @pytest.mark.parametrize("option", [1, 2])
    def test_interpret_matches_twin(self, rng, option):
        from mies_tpu.kernels.diffusion import anisotropic_diffusion_tpu
        from mies_tpu.ops.restoration import anisotropic_diffusion

        x = rng.random((3, 64, 128)).astype(np.float32)
        k = np.asarray(anisotropic_diffusion_tpu(
            jnp.asarray(x), 9, 0.1, 0.2, option, interpret=True
        ))
        t = np.asarray(jax.vmap(
            lambda v: anisotropic_diffusion(v, 9, 0.1, 0.2, option)
        )(jnp.asarray(x)))
        np.testing.assert_allclose(k, t, atol=1e-6)

    def test_batched_dispatch_fallback_shapes(self, rng):
        # unsupported shape (w % 128 != 0) must take the jnp path and
        # agree with the per-image op exactly
        from mies_tpu.kernels.diffusion import (
            anisotropic_diffusion_batched, pm_supported,
        )
        from mies_tpu.ops.restoration import anisotropic_diffusion

        assert not pm_supported((64, 96))
        assert pm_supported((512, 512))
        assert not pm_supported((1024, 1024))  # over the VMEM budget
        x = rng.random((2, 64, 96)).astype(np.float32)
        got = np.asarray(anisotropic_diffusion_batched(
            jnp.asarray(x), 5, 0.1, 0.2
        ))
        ref = np.asarray(jax.vmap(
            lambda v: anisotropic_diffusion(v, 5, 0.1, 0.2)
        )(jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)

    def test_bad_params_raise(self):
        from mies_tpu.kernels.diffusion import anisotropic_diffusion_batched

        with pytest.raises(ValueError, match="niter"):
            anisotropic_diffusion_batched(jnp.zeros((1, 8, 128)), niter=0)
        with pytest.raises(ValueError, match="option"):
            anisotropic_diffusion_batched(jnp.zeros((1, 8, 128)), option=5)


class TestSradKernel:
    """VMEM-resident SRAD (kernels/diffusion.py::srad_tpu) vs the jnp
    twin — same residency design as the Perona-Malik kernel; the
    divergence's virtual c-ring is three masked conduction evals."""

    def test_interpret_matches_twin(self, rng):
        from mies_tpu.kernels.diffusion import srad_tpu
        from mies_tpu.ops.restoration import srad

        x = (0.4 + 0.1 * rng.standard_normal((2, 64, 128))).clip(
            0.01, 1.0
        ).astype(np.float32)
        k = np.asarray(srad_tpu(jnp.asarray(x), 8, interpret=True))
        t = np.asarray(jax.vmap(lambda v: srad(v, 8))(jnp.asarray(x)))
        np.testing.assert_allclose(k, t, atol=1e-6)

    def test_batched_dispatch_fallback(self, rng):
        from mies_tpu.kernels.diffusion import srad_batched
        from mies_tpu.ops.restoration import srad

        x = (0.4 + 0.1 * rng.standard_normal((2, 64, 96))).clip(
            0.01, 1.0
        ).astype(np.float32)
        got = np.asarray(srad_batched(jnp.asarray(x), 5))
        ref = np.asarray(jax.vmap(lambda v: srad(v, 5))(jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)
        with pytest.raises(ValueError, match="dt"):
            srad_batched(jnp.zeros((1, 8, 128)), dt=0.3)


class TestNlMeansKernel:
    """Static-pair-table VMEM-resident NL-means (kernels/nlmeans.py) vs
    the jnp pair loop — every shift a static Mosaic slice (the dynamic-
    rotate kernel was the round-6 dead end). box=shift interpret mode
    pins BIT equality (same table, same order, same shifted-add box
    sums); box=dot (the default — MXU band-operator box sums, what
    makes d=11 compile) is atol-level, the TV-kernel stance."""

    def test_interpret_matches_twin_w10_config(self, rng, monkeypatch):
        from mies_tpu.kernels.nlmeans import nl_means_tpu
        from mies_tpu.ops.restoration import denoise_nl_means

        monkeypatch.setenv("MIES_TPU_NLM_BOX", "shift")
        x = rng.random((2, 32, 128)).astype(np.float32)
        k = np.asarray(nl_means_tpu(
            jnp.asarray(x), patch_size=5, patch_distance=6, h=0.06,
            sigma=0.04, interpret=True))
        t = np.asarray(jax.vmap(lambda v: denoise_nl_means(
            v, patch_size=5, patch_distance=6, h=0.06, sigma=0.04
        ))(jnp.asarray(x)))
        np.testing.assert_array_equal(k, t)

    def test_interpret_even_patch_and_sigma0(self, rng, monkeypatch):
        from mies_tpu.kernels.nlmeans import nl_means_tpu
        from mies_tpu.ops.restoration import denoise_nl_means

        monkeypatch.setenv("MIES_TPU_NLM_BOX", "shift")
        x = rng.random((1, 16, 128)).astype(np.float32)
        k = np.asarray(nl_means_tpu(
            jnp.asarray(x), patch_size=4, patch_distance=3, h=0.1,
            interpret=True))
        t = np.asarray(jax.vmap(lambda v: denoise_nl_means(
            v, patch_size=4, patch_distance=3, h=0.1))(jnp.asarray(x)))
        np.testing.assert_array_equal(k, t)

    def test_dot_box_matches_twin(self, rng):
        # the default box=dot form: MXU band-operator box sums differ
        # from the sequential shifted adds only in reduction order —
        # atol-level vs the twin (incl. skimage's own default d=11,
        # the whole point of the dot form)
        from mies_tpu.kernels.nlmeans import nl_means_tpu
        from mies_tpu.ops.restoration import denoise_nl_means

        for s, d in ((5, 6), (7, 11), (4, 3)):
            x = rng.random((1, 16, 128)).astype(np.float32)
            k = np.asarray(nl_means_tpu(
                jnp.asarray(x), patch_size=s, patch_distance=d, h=0.06,
                sigma=0.04, interpret=True))
            t = np.asarray(jax.vmap(lambda v: denoise_nl_means(
                v, patch_size=s, patch_distance=d, h=0.06, sigma=0.04
            ))(jnp.asarray(x)))
            np.testing.assert_allclose(k, t, atol=2e-6)

    def test_admission(self, monkeypatch):
        from mies_tpu.kernels.nlmeans import nl_means_supported

        assert nl_means_supported((512, 512), 5, 6)
        assert nl_means_supported((512, 512), 7, 8)
        assert nl_means_supported((512, 512), 7, 11)       # dot default
        assert not nl_means_supported((512, 512), 7, 12)   # d cap
        assert not nl_means_supported((500, 512), 5, 6)    # h % 8
        assert not nl_means_supported((512, 500), 5, 6)    # w % 128
        assert not nl_means_supported((8, 128), 7, 6)      # pad > dim-1
        monkeypatch.setenv("MIES_TPU_NLM_BOX", "shift")
        assert not nl_means_supported((512, 512), 7, 11)   # shift cap 8
        assert nl_means_supported((512, 512), 7, 8)

    def test_batched_dispatch_fallback(self, rng):
        from mies_tpu.kernels.nlmeans import nl_means_batched
        from mies_tpu.ops.restoration import denoise_nl_means

        x = rng.random((2, 24, 32)).astype(np.float32)
        got = np.asarray(nl_means_batched(
            jnp.asarray(x), patch_size=5, patch_distance=3, h=0.08))
        ref = np.asarray(jax.vmap(lambda v: denoise_nl_means(
            v, patch_size=5, patch_distance=3, h=0.08))(jnp.asarray(x)))
        np.testing.assert_array_equal(got, ref)

    def test_batched_defaults_match_op(self):
        # the compiler's batched registry resolves omitted config params
        # from nl_means_batched's SIGNATURE — drift from the op's own
        # defaults would silently change semantics
        import inspect

        from mies_tpu.kernels.nlmeans import nl_means_batched
        from mies_tpu.ops.restoration import denoise_nl_means

        sk = inspect.signature(nl_means_batched).parameters
        so = inspect.signature(denoise_nl_means).parameters
        for name in ("patch_size", "patch_distance", "h", "sigma"):
            assert sk[name].default == so[name].default, name

    def test_chunk_layout_invariance(self, rng):
        # 1-pair chunks maximize HBM carry boundaries; the f32 round
        # trips are exact, so chunk layout may only differ by XLA
        # FMA-contraction ULPs in the accumulate (the documented
        # CLAUDE.md class — XLA contracts the mul+add differently when
        # the accumulation spans separate computations)
        import os

        from mies_tpu.kernels.nlmeans import nl_means_tpu

        x = jnp.asarray(rng.random((1, 16, 128)).astype(np.float32))
        os.environ["MIES_TPU_NLM_CHUNK"] = "1"
        try:
            a = np.asarray(nl_means_tpu(
                x, patch_size=3, patch_distance=2, h=0.1, interpret=True))
        finally:
            os.environ["MIES_TPU_NLM_CHUNK"] = "999"
        try:
            b = np.asarray(nl_means_tpu(
                x, patch_size=3, patch_distance=2, h=0.1, interpret=True))
        finally:
            del os.environ["MIES_TPU_NLM_CHUNK"]
        np.testing.assert_allclose(a, b, atol=2e-7)


class TestTvKernel:
    """VMEM-resident Chambolle TV (kernels/tv.py): interpret-mode
    agreement with the jnp twin, early-stop semantics, admission and
    CPU-fallback dispatch."""

    def test_interpret_matches_twin(self, rng):
        from mies_tpu.kernels.tv import denoise_tv_tpu
        from mies_tpu.ops.restoration import denoise_tv

        x = jnp.asarray(rng.random((2, 64, 128)).astype(np.float32))
        k = np.asarray(
            denoise_tv_tpu(x, 0.1, 2e-4, 60, interpret=True))
        t = np.asarray(jax.vmap(
            lambda s: denoise_tv(s, weight=0.1, eps=2e-4,
                                 max_num_iter=60))(x))
        # energy-sum reduction order differs from XLA's tree -> the
        # early stop can ULP-drift; fixed inputs pin a tight atol
        np.testing.assert_allclose(k, t, atol=2e-6)

    def test_interpret_early_stop_path(self, rng):
        """A smooth input converges well before max_num_iter — the
        kernel's per-slice while_loop must stop where the twin stops
        (vmap-of-while masks converged lanes the same way)."""
        from mies_tpu.kernels.tv import denoise_tv_tpu
        from mies_tpu.ops.restoration import denoise_tv

        base = np.tile(
            np.linspace(0, 1, 128, dtype=np.float32), (2, 64, 1))
        x = jnp.asarray(
            base + rng.normal(0, 0.02, base.shape).astype(np.float32))
        k = np.asarray(
            denoise_tv_tpu(x, 0.2, 2e-4, 200, interpret=True))
        t = np.asarray(jax.vmap(
            lambda s: denoise_tv(s, weight=0.2, eps=2e-4,
                                 max_num_iter=200))(x))
        np.testing.assert_allclose(k, t, atol=2e-6)

    def test_supported_bounds(self):
        from mies_tpu.kernels.tv import tv_supported

        assert tv_supported((512, 512))
        assert tv_supported((8, 128))
        assert not tv_supported((512, 640))   # > 1 MB slice
        assert not tv_supported((100, 128))   # h % 8
        assert not tv_supported((64, 100))    # w % 128

    def test_batched_cpu_fallback_matches_op(self, rng):
        from mies_tpu.kernels.tv import denoise_tv_batched
        from mies_tpu.ops.restoration import denoise_tv

        x = jnp.asarray(rng.random((2, 40, 56)).astype(np.float32))
        got = np.asarray(denoise_tv_batched(x, 0.1, 2e-4, 30))
        want = np.asarray(jax.vmap(
            lambda s: denoise_tv(s, weight=0.1, eps=2e-4,
                                 max_num_iter=30))(x))
        np.testing.assert_array_equal(got, want)

    def test_batched_rejects_bad_iters(self, rng):
        from mies_tpu.kernels.tv import denoise_tv_batched

        with pytest.raises(ValueError, match="max_num_iter"):
            denoise_tv_batched(
                jnp.zeros((1, 8, 128)), max_num_iter=0)

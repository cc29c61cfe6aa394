"""TPU <-> CPU cross-backend numerics driver (run OUTSIDE the pinned
test process — tests/test_tpu_numerics.py subprocesses this).

Why this exists: fake-device CI can NEVER catch TPU-only numeric bugs.
Round 3 found two the suite was blind to — XLA:TPU's bf16-propagation
pass silently zeroing the fraction convention's lo half (every output
off by up to 2^-9, on hardware only), and scatter/gather lowerings
hundreds of times slower than CPU. This driver computes each contract
on the REAL chip and on the in-process CPU backend and prints one JSON
line of per-case results; the test asserts the documented tolerances.

Contracts (each mirrors a docs/KERNELS.md or CLAUDE.md claim):
  clahe_opencv_vs_cv2        bit-exact (the flagship claim)
  clahe_fraction_vs_cpu      <= 3e-5   (would have caught the lo-half bug)
  clahe_skimage_vs_cpu       <= 1 u8 ULP beyond tiny outlier fraction
  bilateral_vs_cpu           <= 2e-6   (pair-reorder ULPs)
  unsharp_quant_vs_cpu       <= 1 level, < 1e-3 of pixels (FMA ties)
  chain_uint8_vs_cpu         <= 1 level, < 1e-3 of pixels
  clahe3d_opencv_vs_cpu      <= 1 level (u8 grid)
  clahe3d_skimage_vs_cpu     <= 1 u8 ULP beyond tiny outlier fraction
  sharded_clahe_vs_unsharded <= 0 levels (space=1 program)
"""
import json
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import numpy as np

from mies_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp


def main() -> int:
    if jax.default_backend() == "cpu":
        print(json.dumps({"error": "no TPU backend"}))
        return 1
    cpu = jax.devices("cpu")[0]
    rng = np.random.default_rng(7)
    out: dict = {"backend": jax.default_backend(), "cases": {}}

    def both(fn, *args):
        """fn jitted on the default (TPU) backend and on CPU."""
        t = np.asarray(jax.jit(fn)(*args))
        c = np.asarray(jax.jit(fn)(*[jax.device_put(a, cpu) for a in args]))
        return t, c

    imgs8 = rng.integers(0, 256, size=(8, 512, 512)).astype(np.uint8)
    imgs = jnp.asarray(imgs8.astype(np.float32) / 255.0)

    # 1. opencv CLAHE (Pallas path) vs cv2 — bit-exact
    from mies_tpu.kernels.clahe import clahe_batched, clahe_skimage_tpu

    got = np.asarray(
        jax.jit(lambda a: clahe_batched(a, 2.0, (8, 8), "opencv"))(imgs)
    )
    gotq = np.clip(np.rint(got * 255.0), 0, 255).astype(np.uint8)
    try:
        import cv2

        c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        lvl = max(
            int(np.abs(c.apply(imgs8[b]).astype(int) - gotq[b].astype(int)).max())
            for b in range(imgs8.shape[0])
        )
        out["cases"]["clahe_opencv_vs_cv2"] = {"max_level": lvl, "ok": lvl == 0}
    except ImportError:
        out["cases"]["clahe_opencv_vs_cv2"] = {"skipped": "no cv2"}

    # 1b. opencv CLAHE with tw % 64 != 0 (512x768, grid (8,8) -> tw=96):
    # the rows-layout hist kernel needs lane offsets 128-aligned, so this
    # shape must take tile_hists_pallas — a wrong gate fails ONLY on the
    # real chip (ADVICE r2 high finding).
    imgs8w = rng.integers(0, 256, size=(4, 512, 768)).astype(np.uint8)
    got = np.asarray(
        jax.jit(lambda a: clahe_batched(a, 2.0, (8, 8), "opencv"))(
            jnp.asarray(imgs8w.astype(np.float32) / 255.0)
        )
    )
    gotq = np.clip(np.rint(got * 255.0), 0, 255).astype(np.uint8)
    try:
        import cv2

        c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        lvl = max(
            int(np.abs(c.apply(imgs8w[b]).astype(int) - gotq[b].astype(int)).max())
            for b in range(imgs8w.shape[0])
        )
        out["cases"]["clahe_opencv_tw96_vs_cv2"] = {
            "max_level": lvl, "ok": lvl == 0,
        }
    except ImportError:
        out["cases"]["clahe_opencv_tw96_vs_cv2"] = {"skipped": "no cv2"}

    # 1c. batched equalize_hist / equalize (nibble-selection fast paths,
    # round 4): selection exactness and the bf16 nibble hist are TPU-
    # sensitive (same class as the bf16-propagation bug) — compare the
    # batched TPU path against the per-image CPU reference.
    from mies_tpu.ops.histogram import (
        equalize as _eq,
        equalize_batched,
        equalize_hist,
        equalize_hist_batched,
    )

    t = np.asarray(jax.jit(equalize_hist_batched)(imgs[:4]))
    cpu_ref = np.asarray(
        jax.jit(jax.vmap(equalize_hist))(jax.device_put(imgs[:4], cpu))
    )
    d = float(np.abs(t - cpu_ref).max())
    out["cases"]["equalize_hist_batched_vs_cpu"] = {
        "max_abs": d, "ok": d <= 2e-6,
    }
    t = np.asarray(jax.jit(equalize_batched)(imgs[:4]))
    c = np.asarray(
        jax.jit(jax.vmap(_eq))(jax.device_put(imgs[:4], cpu))
    )
    d = float(np.abs(t - c).max())
    # exact integer LUTs + exact selection: bit-identical across backends
    out["cases"]["equalize_batched_vs_cpu"] = {"max_abs": d, "ok": d == 0.0}

    # 2. fraction convention TPU vs CPU (the lo-half regression gate)
    from mies_tpu.ops import histogram as H

    from unittest import mock

    t = np.asarray(jax.jit(lambda a: jax.vmap(
        lambda x: H.clahe.__wrapped__(
            x, clip_limit=0.01, grid_size=(8, 8), convention="fraction"
        ))(a))(imgs[:4]))
    # fresh fn + patched backend: the jnp path's apply dispatch reaches
    # Pallas when it sees the TPU default backend (jaxpr cache is keyed
    # on the function object — see case 7)
    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        c = np.asarray(jax.jit(lambda a: jax.vmap(
            lambda x: H.clahe.__wrapped__(
                x, clip_limit=0.01, grid_size=(8, 8), convention="fraction"
            ))(a))(jax.device_put(imgs[:4], cpu)))
    d = float(np.abs(t - c).max())
    out["cases"]["clahe_fraction_vs_cpu"] = {"max_abs": d, "ok": d <= 3e-5}

    # 3. skimage fast path vs CPU jnp transcription
    t = np.asarray(
        jax.jit(lambda a: clahe_skimage_tpu(a, (64, 64), 0.01))(imgs[:4])
    )
    c = np.asarray(
        jax.jit(
            lambda a: jax.vmap(
                lambda x: H.clahe.__wrapped__(
                    x, clip_limit=0.01, grid_size=(8, 8), convention="skimage"
                )
            )(a)
        )(jax.device_put(imgs[:4], cpu))
    )
    d = np.abs(t - c)
    frac = float((d > 1.0 / 255.0).mean())
    out["cases"]["clahe_skimage_vs_cpu"] = {
        "outlier_frac": frac,
        "max_abs": float(d.max()),
        "ok": frac <= 5e-5 and float(d.max()) <= 2.0 / 255.0 + 0.01,
    }

    # 4. bilateral Pallas vs CPU jnp twin (dispatching entry points pick
    # Pallas from the DEFAULT backend even when jitted for CPU — use the
    # twin directly for the reference)
    from mies_tpu.kernels.bilateral import bilateral_batched
    from mies_tpu.ops.filters import bilateral_blur

    t = np.asarray(
        jax.jit(lambda a: bilateral_batched(a, 5, 0.1, 1.5))(imgs[:4])
    )
    c = np.asarray(
        jax.jit(lambda a: jax.vmap(lambda x: bilateral_blur(x, 5, 0.1, 1.5))(a))(
            jax.device_put(imgs[:4], cpu)
        )
    )
    d = float(np.abs(t - c).max())
    out["cases"]["bilateral_vs_cpu"] = {"max_abs": d, "ok": d <= 2e-6}

    # 5. unsharp+quantize tail vs CPU unfused
    from mies_tpu.kernels.unsharp_gauss import unsharp_quant_tpu
    from mies_tpu.ops.filters import unsharp_mask

    t = np.asarray(unsharp_quant_tpu(imgs[:4], radius=1.5, amount=1.0))
    cref = np.asarray(
        jax.jit(
            lambda a: jax.vmap(lambda x: unsharp_mask(x, 1.5, 1.0))(a)
        )(jax.device_put(imgs[:4], cpu))
    )
    cq = np.clip(np.rint(cref * 255.0), 0, 255).astype(np.uint8)
    dl = np.abs(t.astype(int) - cq.astype(int))
    out["cases"]["unsharp_quant_vs_cpu"] = {
        "max_level": int(dl.max()),
        "flip_frac": float((dl > 0).mean()),
        "ok": int(dl.max()) <= 1 and float((dl > 0).mean()) < 1e-3,
    }

    # 6. the flagship chain, uint8 end to end
    from mies_tpu.pipeline.compiler import build_batched_chain
    from mies_tpu.pipeline.config import PipelineConfig

    cfg = PipelineConfig.make(
        [
            ("clahe", {"clip_limit": 2.0, "grid_size": (8, 8),
                       "convention": "opencv"}),
            ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1,
                                "sigma_space": 1.5}),
            ("unsharp_mask", {"radius": 1.5, "amount": 1.0}),
        ],
        name="consistency",
    )
    t = np.asarray(jax.jit(build_batched_chain(cfg, quantize=True))(imgs[:4]))

    # CPU reference from the jnp semantic twins (the dispatching chain
    # picks Pallas from the DEFAULT backend even when jitted for CPU)
    from mies_tpu.ops.filters import bilateral_blur

    def cpu_chain(a):
        x = jax.vmap(
            lambda i: H.clahe.__wrapped__(
                i, clip_limit=2.0, grid_size=(8, 8), convention="opencv"
            )
        )(a)
        x = jax.vmap(lambda i: bilateral_blur(i, 5, 0.1, 1.5))(x)
        x = jax.vmap(lambda i: unsharp_mask(i, 1.5, 1.0))(x)
        return jnp.clip(jnp.rint(x * 255.0), 0, 255).astype(jnp.uint8)

    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        c = np.asarray(jax.jit(cpu_chain)(jax.device_put(imgs[:4], cpu)))
    dl = np.abs(t.astype(int) - c.astype(int))
    out["cases"]["chain_uint8_vs_cpu"] = {
        "max_level": int(dl.max()),
        "flip_frac": float((dl > 0).mean()),
        "ok": int(dl.max()) <= 1 and float((dl > 0).mean()) < 1e-3,
    }

    # 7. 3-D opencv CLAHE TPU vs CPU
    from mies_tpu.ops.volume3d import clahe3d

    from unittest import mock

    vol = jnp.asarray(rng.random((32, 128, 128)).astype(np.float32))
    f3 = lambda v: clahe3d.__wrapped__(
        v, clip_limit=2.0, grid_size=(4, 4, 4), convention="opencv"
    )
    t = np.asarray(jax.jit(f3)(vol))
    # the internal dispatch keys on the DEFAULT backend; patch it so the
    # CPU-jitted reference takes the jnp path (no Pallas on CPU). A FRESH
    # fn object is required — the jaxpr cache would otherwise reuse the
    # TPU trace (with the pallas_call) for the CPU lowering.
    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        c = np.asarray(jax.jit(
            lambda v: clahe3d.__wrapped__(
                v, clip_limit=2.0, grid_size=(4, 4, 4), convention="opencv"
            )
        )(jax.device_put(vol, cpu)))
    dl = np.abs(np.rint(t * 255.0) - np.rint(c * 255.0))
    # 7b. the fused tile33-z fast path (tw % 64 == 0 shapes): rows-hist
    # + in-kernel quantize + z-lerp apply + folded u8norm epilogue —
    # the 32x128x128 case above has tw=32 and exercises the 2d2 path
    vol2 = jnp.asarray(rng.random((16, 256, 256)).astype(np.float32))
    f3b = lambda v: clahe3d.__wrapped__(
        v, clip_limit=2.0, grid_size=(4, 4, 4), convention="opencv"
    )
    t2 = np.asarray(jax.jit(f3b)(vol2))
    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        c2 = np.asarray(jax.jit(
            lambda v: clahe3d.__wrapped__(
                v, clip_limit=2.0, grid_size=(4, 4, 4), convention="opencv"
            )
        )(jax.device_put(vol2, cpu)))
    dl2 = float(np.abs(np.rint(t2 * 255.0) - np.rint(c2 * 255.0)).max())
    out["cases"]["clahe3d_opencv_t33z_vs_cpu"] = {
        "max_level": dl2, "ok": dl2 <= 1.0,
    }
    out["cases"]["clahe3d_opencv_vs_cpu"] = {
        "max_level": float(dl.max()),
        "ok": float(dl.max()) <= 1.0,
    }

    # 7b. 3-D skimage CLAHE TPU (blocks8 kernel) vs CPU jnp
    f3s = lambda v: clahe3d.__wrapped__(
        v, clip_limit=0.01, grid_size=(4, 4, 4), convention="skimage"
    )
    t = np.asarray(jax.jit(f3s)(vol))
    with mock.patch.object(jax, "default_backend", lambda: "cpu"):
        c = np.asarray(jax.jit(
            lambda v: clahe3d.__wrapped__(
                v, clip_limit=0.01, grid_size=(4, 4, 4), convention="skimage"
            )
        )(jax.device_put(vol, cpu)))
    d = np.abs(t - c)
    out["cases"]["clahe3d_skimage_vs_cpu"] = {
        "max_abs": float(d.max()),
        "outlier_frac": float((d > 1.0 / 255.0).mean()),
        "ok": float((d > 1.0 / 255.0).mean()) <= 5e-5
        and float(d.max()) <= 2.0 / 255.0 + 0.01,
    }

    # 8. sharded CLAHE program (space=1) vs unsharded Pallas — levels
    from mies_tpu.parallel.clahe_shard import clahe_spatial_shard
    from mies_tpu.parallel.mesh import make_mesh

    img1 = jnp.asarray(rng.random((1024, 1024)).astype(np.float32))
    fn = clahe_spatial_shard(
        make_mesh(space=1), clip_limit=2.0, grid_size=(8, 8),
        convention="opencv", quantize=False,
    )
    sh = np.rint(np.asarray(fn(img1)) * 255.0)
    un = np.rint(
        np.asarray(
            jax.jit(lambda a: clahe_batched(a, 2.0, (8, 8), "opencv"))(
                img1[None]
            )
        )[0]
        * 255.0
    )
    dl = float(np.abs(sh - un).max())
    out["cases"]["sharded_clahe_vs_unsharded"] = {
        "max_level": dl, "ok": dl == 0.0,
    }

    # 9. z-sharded clahe3d (space=1) vs unsharded — exercises the
    # TPU selection form of the z-band trilinear apply ON CHIP (CPU CI
    # runs the gather branch; the selection branch is TPU-only)
    from mies_tpu.ops.volume3d import clahe3d
    from mies_tpu.parallel import volume_shard_apply
    from mies_tpu.pipeline.config import PipelineConfig

    vol = jnp.asarray(rng.random((32, 128, 128)).astype(np.float32))
    zcfg = PipelineConfig.make(
        [("clahe3d", {"clip_limit": 2.0, "grid_size": (4, 4, 4)})],
        name="zvol",
    )
    zsh = np.rint(
        np.asarray(
            volume_shard_apply(zcfg, make_mesh(space=1), quantize=False)(vol)
        ) * 255.0
    )
    zun = np.rint(
        np.asarray(jax.jit(
            lambda v: clahe3d(v, 2.0, (4, 4, 4), "opencv")
        )(vol)) * 255.0
    )
    dz = float(np.abs(zsh - zun).max())
    out["cases"]["zsharded_clahe3d_vs_unsharded"] = {
        "max_level": dz, "ok": dz == 0.0,
    }

    # 10. morphology vs cv2 ON CHIP — min/max trees are reassociation-
    # insensitive, so top_hat (two levels + subtraction) must be
    # BIT-exact vs cv2 on the TPU, both borders
    from mies_tpu.ops.morphology import morph_gradient, top_hat

    try:
        import cv2

        img = np.asarray(imgs[0], np.float32)
        se = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        got_th = np.asarray(jax.jit(
            lambda x: top_hat(x, 5, "ellipse"))(jnp.asarray(img)))
        ref_th = cv2.morphologyEx(img, cv2.MORPH_TOPHAT, se)
        got_gr = np.asarray(jax.jit(
            lambda x: morph_gradient(x, 3, "rect", mode="nearest")
        )(jnp.asarray(img)))
        ref_gr = cv2.morphologyEx(
            img, cv2.MORPH_GRADIENT,
            cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3)),
            borderType=cv2.BORDER_REPLICATE,
        )
        dm = max(float(np.abs(got_th - ref_th).max()),
                 float(np.abs(got_gr - ref_gr).max()))
        out["cases"]["morphology_vs_cv2"] = {"max_abs": dm, "ok": dm == 0.0}
    except ImportError:
        out["cases"]["morphology_vs_cv2"] = {"skipped": "no cv2"}

    # 11. restoration ops TPU vs CPU — all pure-jnp (fori/while loops of
    # shifted adds, exp, divisions); written during the tunnel outage,
    # so this is their FIRST hardware check. Iteration counts are pinned
    # (tv: eps=0 forces max_num_iter on both backends) so a convergence-
    # test ULP flip can't desynchronize the comparison.
    from mies_tpu.ops.restoration import (
        denoise_nl_means,
        denoise_tv,
        richardson_lucy,
    )

    img128 = jnp.asarray(rng.random((128, 128), dtype=np.float64).astype(np.float32))
    f_nlm = lambda x: denoise_nl_means(
        x, patch_size=5, patch_distance=3, h=0.08, sigma=0.04
    )
    t, c = both(f_nlm, img128)
    d = float(np.abs(t - c).max())
    out["cases"]["nl_means_vs_cpu"] = {"max_abs": d, "ok": d <= 2e-5}

    f_tv = lambda x: denoise_tv(x, weight=0.1, eps=0.0, max_num_iter=50)
    t, c = both(f_tv, img128)
    d = float(np.abs(t - c).max())
    out["cases"]["denoise_tv_vs_cpu"] = {"max_abs": d, "ok": d <= 5e-5}

    f_rl = lambda x: richardson_lucy(x, psf_sigma=1.5, psf_size=7, num_iter=30)
    t, c = both(f_rl, img128)
    d = float(np.abs(t - c).max())
    out["cases"]["richardson_lucy_vs_cpu"] = {"max_abs": d, "ok": d <= 1e-4}

    # 12. Frangi vesselness TPU vs CPU — Hessian eigen arithmetic
    # (sqrt/exp/div chains) with the global gamma statistic; the rb_sq
    # division is guarded by 1e-30, a bf16-demotion-sensitive shape.
    from mies_tpu.ops.ridges import frangi

    img256 = jnp.asarray(rng.random((256, 256), dtype=np.float64).astype(np.float32))
    f_fr = lambda x: frangi(x, sigmas=(1.0, 2.0, 4.0))
    t, c = both(f_fr, img256)
    d = float(np.abs(t - c).max())
    out["cases"]["frangi_vs_cpu"] = {"max_abs": d, "ok": d <= 5e-5}

    # 13. large-kernel morphology ON CHIP — the van Herk doubling chain
    # (rect k=21) and the row-span decomposition (ellipse k=15) are
    # reassociation-insensitive min/max trees: BIT-exact vs cv2.
    from mies_tpu.ops.morphology import morph_open

    try:
        import cv2

        img = np.asarray(imgs[0], np.float32)
        got21 = np.asarray(jax.jit(
            lambda x: morph_open(x, 21, "rect"))(jnp.asarray(img)))
        ref21 = cv2.morphologyEx(
            img, cv2.MORPH_OPEN,
            cv2.getStructuringElement(cv2.MORPH_RECT, (21, 21)),
        )
        got15 = np.asarray(jax.jit(
            lambda x: morph_open(x, 15, "ellipse"))(jnp.asarray(img)))
        ref15 = cv2.morphologyEx(
            img, cv2.MORPH_OPEN,
            cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (15, 15)),
        )
        dm = max(float(np.abs(got21 - ref21).max()),
                 float(np.abs(got15 - ref15).max()))
        out["cases"]["morphology_vanherk_vs_cv2"] = {
            "max_abs": dm, "ok": dm == 0.0,
        }
    except ImportError:
        out["cases"]["morphology_vanherk_vs_cv2"] = {"skipped": "no cv2"}

    # 14. FFT path (butterworth) TPU vs CPU: XLA's TPU FFT is a
    # matmul-backed f32 implementation — different roundoff family from
    # the CPU backend (ducc). Gate the drift at FFT-roundoff scale.
    from mies_tpu.ops.frequency import butterworth

    t, c = both(lambda a: butterworth(a, 0.02, True, 2.0), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["butterworth_vs_cpu"] = {"max_abs": d, "ok": d <= 5e-5}

    # 15. canny ON CHIP: NMS compares + the while_loop flood fill are
    # discrete — any numeric drift flips whole pixels, so the gate is
    # a tight mismatch-rate bound rather than an abs tolerance.
    from mies_tpu.ops.feature import canny as _canny

    t, c = both(lambda a: _canny(a, sigma=1.5), imgs[0])
    mm = float((t != c).mean())
    out["cases"]["canny_vs_cpu"] = {"mismatch_frac": mm, "ok": mm <= 1e-4}

    # 16. round-5 additions ON CHIP: diffusion (pure elementwise
    # fori_loop), musica (shifted-add pyramids + power law), rolling
    # ball (min/max trees — reassociation-insensitive, so TPU vs CPU
    # must be BIT-exact like the flat morphology cases).
    from mies_tpu.ops.restoration import anisotropic_diffusion
    from mies_tpu.ops.pyramid import musica
    from mies_tpu.ops.morphology import subtract_background

    t, c = both(
        lambda a: anisotropic_diffusion(a, 12, 0.1, 0.2), imgs[0]
    )
    d = float(np.abs(t - c).max())
    out["cases"]["anisotropic_diffusion_vs_cpu"] = {
        "max_abs": d, "ok": d <= 2e-5,
    }

    t, c = both(lambda a: musica(a, levels=4, p=0.6, gain=1.5), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["musica_vs_cpu"] = {"max_abs": d, "ok": d <= 2e-5}

    t, c = both(lambda a: subtract_background(a, 9.0), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["rolling_ball_vs_cpu"] = {"max_abs": d, "ok": d == 0.0}

    # 17. despeckle/illumination family TPU vs CPU. kuwahara's
    # quadrant select compares variances — an FMA-contraction ULP at a
    # near-tie flips WHICH quadrant wins (a whole-pixel jump), so its
    # gate is a mismatch-rate bound (the canny pattern) plus a value
    # bound on the flips; lee and retinex are smooth and gate on abs.
    from mies_tpu.ops.filters import kuwahara, lee_filter, retinex

    t, c = both(lambda a: lee_filter(a, 7, 0.05), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["lee_filter_vs_cpu"] = {"max_abs": d, "ok": d <= 1e-5}

    t, c = both(lambda a: kuwahara(a, 5), imgs[0])
    mm = float((t != c).mean())
    d = float(np.abs(t - c).max())
    out["cases"]["kuwahara_vs_cpu"] = {
        "mismatch_frac": mm, "max_abs": d,
        "ok": mm <= 1e-3 and d <= 0.2,
    }

    from mies_tpu.ops.restoration import srad as _srad

    t, c = both(lambda a: _srad(a, niter=10), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["srad_vs_cpu"] = {"max_abs": d, "ok": d <= 1e-4}

    # 17b. the DISPATCHED batched paths: on TPU these compile the
    # VMEM-resident Pallas kernels (kernels/diffusion.py) — the code
    # w8/w9 actually run — against the CPU jnp fallback. Without this,
    # a Mosaic-only numeric bug in the kernels would pass every gate
    # (review finding, round 5).
    from mies_tpu.kernels.diffusion import (
        anisotropic_diffusion_batched, srad_batched,
    )

    # the *_batched entries dispatch on the DEFAULT backend, so the
    # CPU leg must call the jnp fallback explicitly (dispatching the
    # same fn on a CPU-placed array would still pick the Pallas path
    # and refuse to lower)
    stack = imgs[:4]
    t = np.asarray(jax.jit(
        lambda a: anisotropic_diffusion_batched(a, 6, 0.05, 0.2)
    )(stack))
    c = np.asarray(jax.jit(jax.vmap(
        lambda v: anisotropic_diffusion(v, 6, 0.05, 0.2)
    ))(jax.device_put(stack, cpu)))
    d = float(np.abs(t - c).max())
    out["cases"]["pm_kernel_dispatch_vs_cpu"] = {
        "max_abs": d, "ok": d <= 2e-5,
    }
    t = np.asarray(jax.jit(lambda a: srad_batched(a, niter=10))(stack))
    c = np.asarray(jax.jit(jax.vmap(
        lambda v: _srad(v, niter=10)
    ))(jax.device_put(stack, cpu)))
    d = float(np.abs(t - c).max())
    out["cases"]["srad_kernel_dispatch_vs_cpu"] = {
        "max_abs": d, "ok": d <= 2e-5,
    }

    # Chambolle TV's dispatched path compiles the VMEM-resident
    # while_loop kernel (kernels/tv.py, 11.3x) on TPU; the early stop
    # compares in-kernel energy sums whose reduction order ULP-drifts
    # vs XLA's tree, hence the looser bound than PM/SRAD.
    from mies_tpu.kernels.tv import denoise_tv_batched
    from mies_tpu.ops.restoration import denoise_tv as _tv

    t = np.asarray(jax.jit(
        lambda a: denoise_tv_batched(a, 0.1, 2e-4, 200)
    )(stack))
    c = np.asarray(jax.jit(jax.vmap(
        lambda v: _tv(v, weight=0.1, eps=2e-4, max_num_iter=200)
    ))(jax.device_put(stack, cpu)))
    d = float(np.abs(t - c).max())
    out["cases"]["tv_kernel_dispatch_vs_cpu"] = {
        "max_abs": d, "ok": d <= 1e-4,
    }

    # NL-means pair loop: TPU evaluation of the jnp form vs CPU.
    from mies_tpu.ops.restoration import denoise_nl_means as _nlm

    t, c = both(lambda a: _nlm(a, 7, 5, 0.1, 0.05), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["nl_means_vs_cpu"] = {"max_abs": d, "ok": d <= 2e-5}

    # Round 5: the dot-box kernel (MIES_TPU_NLM_BOX=dot, d <= 11) now
    # dispatches at the registry defaults too — pin the DISPATCHED
    # b32 512² output (the shape whose 22 chunk programs the compile
    # cache already holds from the A/B run) against the CPU jnp twin.
    # Tolerance 2e-3 (was 1e-4, the shift-mode calibration): the MXU
    # evaluates the band-operator dots in bf16 multiply passes, a
    # hardware truncation of the squared-diff operands (~2^-9
    # relative) that measures ~6e-4 max-abs on the output.  Every
    # exact route was tried on-chip and recorded in docs/KERNELS.md
    # round 13 (precision=HIGHEST: compiler crash; hi/lo split dots:
    # scoped-vmem stack OOM unless chunk=1 = 264 launches); 6e-4 on a
    # denoiser with h = O(0.1) is <= 0.15 uint8 level after the
    # quantize tail.  MIES_TPU_NLM_BOX=shift stays bit-exact (d<=8).
    from mies_tpu.kernels.nlmeans import nl_means_batched

    big = jnp.asarray(
        np.random.default_rng(7).random((32, 512, 512), np.float32))
    t = np.asarray(jax.jit(
        lambda a: nl_means_batched(a, 7, 11, 0.1, 0.0)
    )(big))
    c = np.asarray(jax.jit(jax.vmap(
        lambda v: _nlm(v, 7, 11, 0.1, 0.0)
    ))(jax.device_put(big, cpu)))
    d = float(np.abs(t - c).max())
    out["cases"]["nlm_dot_kernel_dispatch_vs_cpu"] = {
        "max_abs": d, "ok": d <= 2e-3,
    }

    t, c = both(lambda a: retinex(a, sigmas=(2.0, 8.0)), imgs[0])
    d = float(np.abs(t - c).max())
    out["cases"]["retinex_vs_cpu"] = {"max_abs": d, "ok": d <= 1e-3}

    # 18. the dense-kernel FFT conv path (round 8: 598.9 -> 9.6 ms for
    # gabor; TPU-ONLY — CPU keeps the XLA conv, so the CPU suite never
    # exercises this lowering). Contract: the TPU FFT values vs the
    # f64 scipy GOLDENS at the unit tests' own atol, on asymmetric
    # kernels (offset != 0 breaks the even/odd symmetry that would
    # mask flip-bookkeeping bugs — exactly the bug the first A/B hid).
    import sys as _sys
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).parent))
    from goldens import golden_ops as G

    from mies_tpu.ops.filters import gabor_bank, gabor_response, motion_blur

    img_np = np.asarray(imgs[0][:128, :128])
    kwg = dict(frequency=0.15, theta=0.7, offset=0.5)
    t_re, t_im = jax.jit(
        lambda a: gabor_response(a, **kwg)
    )(imgs[0][:128, :128])
    g_re, g_im = G.gabor_response(img_np, **kwg)
    d = max(float(np.abs(np.asarray(t_re) - g_re).max()),
            float(np.abs(np.asarray(t_im) - g_im).max()))
    out["cases"]["gabor_fft_vs_golden"] = {"max_abs": d, "ok": d <= 1e-5}

    tb = np.asarray(jax.jit(
        lambda a: gabor_bank(a, 0.15, n_orientations=3, offset=0.3,
                             output="mean")
    )(imgs[0][:128, :128]))
    mags = []
    for k in range(3):
        re, im = G.gabor_response(img_np, 0.15, theta=k * np.pi / 3,
                                  offset=0.3)
        mags.append(np.sqrt(re ** 2 + im ** 2))
    d = float(np.abs(tb - np.mean(mags, axis=0)).max())
    out["cases"]["gabor_bank_fft_vs_golden"] = {"max_abs": d, "ok": d <= 1e-5}

    tm = np.asarray(jax.jit(
        lambda a: motion_blur(a, kernel_size=9, angle=25.0, direction=0.4)
    )(imgs[0][:128, :128]))
    gm = G.motion_blur(img_np, kernel_size=9, angle=25.0, direction=0.4)
    d = float(np.abs(tm - gm).max())
    out["cases"]["motion_blur_fft_vs_golden"] = {"max_abs": d, "ok": d <= 1e-5}

    out["ok"] = all(
        case.get("ok", True) for case in out["cases"].values()
    )
    print(json.dumps(out))
    return 0 if out["ok"] else 2


if __name__ == "__main__":
    raise SystemExit(main())

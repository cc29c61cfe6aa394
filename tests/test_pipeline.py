"""Pipeline integration: config -> chain vs composed NumPy goldens;
runners, manifest resume, volume streaming (SURVEY.md section 4 item 2)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from mies_tpu.io.image import from_float, save_image
from mies_tpu.pipeline.config import PipelineConfig, from_dict, load_config
from mies_tpu.pipeline.compiler import compile_pipeline
from mies_tpu.pipeline import runner
from mies_tpu.pipeline.manifest import RunManifest
from tests.goldens import golden_ops as G


WORKLOAD1 = PipelineConfig.make(
    [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})], name="w1"
)
WORKLOAD3 = PipelineConfig.make(
    [("unsharp_mask", {"radius": 1.5, "amount": 1.0}),
     ("gaussian_blur", {"sigma": 1.5})],
    name="w3",
)
CT_CHAIN = PipelineConfig.make(
    [("window_hu", {"center": 40.0, "width": 400.0}),
     ("median_blur", {"kernel_size": 3}),
     ("bilateral_blur", {"kernel_size": 5, "sigma_color": 0.1, "sigma_space": 1.5})],
    name="ct",
)


def test_workload1_matches_composed_golden(xray):
    """BASELINE workload 1: hist-eq + gamma, vs composed NumPy goldens."""
    fn = compile_pipeline(WORKLOAD1, quantize=True, donate=False)
    out = np.asarray(fn(jnp.asarray(xray)))
    ref = G.adjust_gamma(G.equalize_hist(xray), 0.8)
    ref_u8 = np.clip(np.rint(ref * 255), 0, 255).astype(np.uint8)
    diff = np.abs(out.astype(int) - ref_u8.astype(int))
    assert diff.max() <= 1  # >=1 ULP-equivalent on uint8 (BASELINE.md)
    assert (diff > 0).mean() < 2e-3


def test_workload3_matches_composed_golden(xray):
    fn = compile_pipeline(WORKLOAD3, quantize=True, donate=False)
    out = np.asarray(fn(jnp.asarray(xray)))
    ref = G.gaussian_blur(G.unsharp_mask(xray, 1.5, 1.0), 1.5)
    ref_u8 = np.clip(np.rint(ref * 255), 0, 255).astype(np.uint8)
    diff = np.abs(out.astype(int) - ref_u8.astype(int))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 2e-3


def test_ct_chain_int16_input(ct_slice_hu):
    fn = compile_pipeline(CT_CHAIN, quantize=True, donate=False)
    out = np.asarray(fn(jnp.asarray(ct_slice_hu)))
    win = G.window_hu(ct_slice_hu, 40.0, 400.0)
    ref = G.bilateral_blur(
        G.median_blur(win, 3), kernel_size=5, sigma_color=0.1, sigma_space=1.5
    )
    ref_u8 = np.clip(np.rint(ref * 255), 0, 255).astype(np.uint8)
    diff = np.abs(out.astype(int) - ref_u8.astype(int))
    assert diff.max() <= 1


def test_config_json_yaml_equivalent(tmp_path):
    d = {
        "name": "t",
        "pipeline": [
            {"op": "clahe", "clip_limit": 2.0, "grid_size": [8, 8]},
            {"op": "unsharp_mask", "radius": 1.0},
        ],
    }
    (tmp_path / "c.json").write_text(json.dumps(d))
    (tmp_path / "c.yaml").write_text(
        "name: t\npipeline:\n"
        "  - {op: clahe, clip_limit: 2.0, grid_size: [8, 8]}\n"
        "  - {op: unsharp_mask, radius: 1.0}\n"
    )
    cj = load_config(tmp_path / "c.json")
    cy = load_config(tmp_path / "c.yaml")
    assert cj.cache_key() == cy.cache_key()
    assert cj == cy


def test_config_rejects_unknown_op(tmp_path):
    (tmp_path / "bad.json").write_text(json.dumps({"pipeline": [{"op": "nope"}]}))
    with pytest.raises(ValueError, match="unknown op"):
        load_config(tmp_path / "bad.json")


def test_config_rejects_bad_param(tmp_path):
    (tmp_path / "bad.json").write_text(
        json.dumps({"pipeline": [{"op": "clahe", "clip": 2.0}]})
    )
    with pytest.raises(ValueError, match="does not accept"):
        load_config(tmp_path / "bad.json")


def test_config_roundtrip_to_dict():
    c = from_dict(WORKLOAD1.to_dict())
    assert c.cache_key() == WORKLOAD1.cache_key()


def test_enhance_image_end_to_end(tmp_path, xray):
    src = tmp_path / "in.png"
    save_image(src, from_float(xray))
    out = runner.enhance_image(src, WORKLOAD1, tmp_path / "out.png")
    assert out.dtype == np.uint8 and out.shape == xray.shape
    assert (tmp_path / "out.png").exists()


def test_enhance_batch_resume(tmp_path, xray):
    srcs = []
    for i in range(5):
        p = tmp_path / f"img{i}.png"
        save_image(p, from_float(np.roll(xray, i, axis=0)))
        srcs.append(p)
    outdir = tmp_path / "out"
    m1 = runner.enhance_batch(srcs, WORKLOAD1, outdir, batch_size=2, progress=False)
    assert m1.done_count == 5
    # resume: nothing left to do -> manifest reports same count, fast
    m2 = runner.enhance_batch(srcs, WORKLOAD1, outdir, batch_size=2, progress=False)
    assert m2.done_count == 5
    assert not m2.failures


def test_enhance_batch_isolates_corrupt_input(tmp_path, xray):
    good = tmp_path / "good.png"
    save_image(good, from_float(xray))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    outdir = tmp_path / "out"
    m = runner.enhance_batch([good, bad], WORKLOAD1, outdir, batch_size=2, progress=False)
    assert m.done_count == 1
    assert str(bad) in m.failures


def test_manifest_ignores_other_config(tmp_path):
    m1 = RunManifest(tmp_path / "m.jsonl", "aaaa")
    m1.mark_done("item1")
    m2 = RunManifest(tmp_path / "m.jsonl", "bbbb")
    assert not m2.is_done("item1")
    m3 = RunManifest(tmp_path / "m.jsonl", "aaaa")
    assert m3.is_done("item1")


def test_manifest_survives_torn_line(tmp_path):
    m = RunManifest(tmp_path / "m.jsonl", "cc")
    m.mark_done("a")
    with open(tmp_path / "m.jsonl", "a") as f:
        f.write('{"config": "cc", "item": "b", "sta')  # torn write
    m2 = RunManifest(tmp_path / "m.jsonl", "cc")
    assert m2.is_done("a") and not m2.is_done("b")


def test_enhance_volume_streaming(ct_slice_hu):
    vol = np.stack([ct_slice_hu] * 37)  # non-multiple of slab size
    out = runner.enhance_volume(vol, CT_CHAIN, slab_size=8, progress=False)
    assert out.shape == vol.shape and out.dtype == np.uint8
    # all slices identical input -> identical output
    np.testing.assert_array_equal(out[0], out[36])
    # and matches the single-slice path
    single = np.asarray(
        compile_pipeline(CT_CHAIN, donate=False)(jnp.asarray(ct_slice_hu))
    )
    np.testing.assert_array_equal(out[0], single)


# -- load-time value validation (VERDICT round 1, weak #4) --------------------


def _cfg_file(tmp_path, stages):
    import json
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"name": "t", "pipeline": stages}))
    return p


@pytest.mark.parametrize("stage,badparam", [
    ({"op": "clahe", "grid_size": [0, 8]}, "grid_size"),
    ({"op": "clahe", "clip_limit": -1.0}, "clip_limit"),
    ({"op": "clahe", "convention": "torch"}, "convention"),
    ({"op": "median_blur", "kernel_size": 4}, "kernel_size"),
    ({"op": "bilateral_blur", "kernel_size": 5, "sigma_color": 0.0}, "sigma_color"),
    ({"op": "gaussian_blur", "sigma": -2.0}, "sigma"),
    ({"op": "gaussian_blur", "mode": "bogus"}, "mode"),
    ({"op": "adjust_gamma", "gamma": 0}, "gamma"),
    ({"op": "window_hu", "center": 40, "width": 0}, "width"),
    ({"op": "posterize", "bits": 12}, "bits"),
    ({"op": "resize", "height": -64, "width": 64}, "height"),
    ({"op": "normalize_meanstd", "std": 0}, "std"),
    ({"op": "clahe", "grid_size": [8.5, 8]}, "grid_size"),
])
def test_load_config_rejects_bad_values(tmp_path, stage, badparam):
    """Bad values fail at load_config with the stage + param named."""
    from mies_tpu.pipeline.config import load_config

    with pytest.raises(ValueError, match=badparam):
        load_config(_cfg_file(tmp_path, [stage]))


def test_load_config_names_offending_stage(tmp_path):
    from mies_tpu.pipeline.config import load_config

    with pytest.raises(ValueError, match=r"stage 1 \('median_blur'\)"):
        load_config(_cfg_file(tmp_path, [
            {"op": "adjust_gamma", "gamma": 0.9},
            {"op": "median_blur", "kernel_size": 2},
        ]))


def test_load_config_accepts_valid_values(tmp_path):
    from mies_tpu.pipeline.config import load_config

    cfg = load_config(_cfg_file(tmp_path, [
        {"op": "clahe", "clip_limit": 2.0, "grid_size": [8, 8],
         "convention": "skimage", "kernel_size": [64, 64]},
        {"op": "median_blur", "kernel_size": 5},
        {"op": "unsharp_mask", "radius": 1.5, "amount": 1.0},
    ]))
    assert len(cfg.stages) == 3


def test_shipped_configs_pass_validation():
    from pathlib import Path
    from mies_tpu.pipeline.config import load_config

    shipped = sorted(Path("configs").glob("*.yaml"))
    assert shipped, "no shipped configs found"
    for p in shipped:
        load_config(p)


def test_enhance_batch_mixed_sizes_and_corrupt(tmp_path, rng):
    """Mixed-size inputs bucket by shape (one program per bucket); a
    corrupt item is recorded failed — nothing kills the job (VERDICT
    round 1, weak #3)."""
    from PIL import Image

    sizes = [(64, 64), (64, 64), (96, 64), (64, 96), (96, 64)]
    srcs = []
    for i, (h, w) in enumerate(sizes):
        p = tmp_path / f"img{i}_{h}x{w}.png"
        arr = (rng.random((h, w)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)
        srcs.append(p)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"corrupt bytes")
    srcs.insert(2, bad)

    outdir = tmp_path / "out"
    m = runner.enhance_batch(srcs, WORKLOAD1, outdir, batch_size=4, progress=False)
    assert m.done_count == 5
    assert str(bad) in m.failures
    for i, (h, w) in enumerate(sizes):
        out = np.asarray(Image.open(outdir / f"img{i}_{h}x{w}.png"))
        assert out.shape == (h, w)


def test_enhance_image_single_dicom(tmp_path, ct_slice_hu):
    """A lone .dcm CT slice enhances through a window_hu chain — the 2-D
    path, not the volume directory path (VERDICT r2 missing #2)."""
    from mies_tpu.io.dicom import read_dicom, write_dicom
    from mies_tpu.io.image import load_image
    from mies_tpu.pipeline.compiler import compile_pipeline
    from mies_tpu.pipeline.config import load_config

    src = tmp_path / "slice.dcm"
    write_dicom(src, ct_slice_hu)

    # loader returns raw int16 HU
    raw = load_image(src, dtype="raw")
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw, ct_slice_hu)

    cfg = load_config("configs/ct_soft_tissue.yaml")
    out = runner.enhance_image(src, cfg, tmp_path / "out.png")
    ref = np.asarray(compile_pipeline(cfg)(jnp.asarray(ct_slice_hu)))
    np.testing.assert_array_equal(out, ref)
    assert (tmp_path / "out.png").exists()

    # .dcm output round-trips through write_dicom
    out2 = runner.enhance_image(src, cfg, tmp_path / "out.dcm")
    got = read_dicom(tmp_path / "out.dcm").pixels
    np.testing.assert_array_equal(got, out2)


def test_load_image_single_band_modes(tmp_path, rng):
    """PIL modes '1' (bilevel), 'P' (palette), 'F' (float) are SINGLE
    band: they must keep the classic convert('L') path, never trip the
    multi-channel policy error (review finding, round 4)."""
    from PIL import Image

    from mies_tpu.io.image import load_image

    gray = (rng.random((32, 32)) * 255).astype(np.uint8)
    cases = {
        "bilevel.png": Image.fromarray(gray > 128),             # mode '1'
        "palette.png": Image.fromarray(gray).convert("P"),      # mode 'P'
        "float.tif": Image.fromarray(gray.astype(np.float32)),  # mode 'F'
    }
    for name, im in cases.items():
        p = tmp_path / name
        im.save(p)
        arr = load_image(p)  # channels=None must NOT raise
        assert arr.shape == (32, 32) and arr.dtype == np.float32
        ref = np.asarray(Image.open(p).convert("L")).astype(np.float32) / 255.0
        np.testing.assert_array_equal(arr, ref)


def test_cli_report_on_single_dicom(tmp_path, ct_slice_hu):
    """--report on a lone .dcm uses the chain's own HU window as the
    comparison baseline instead of crashing on the float-load guard."""
    import json as _json

    from mies_tpu import cli
    from mies_tpu.io.dicom import write_dicom

    src = tmp_path / "s.dcm"
    write_dicom(src, ct_slice_hu)
    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"name": "ct", "pipeline": [
        {"op": "window_hu", "center": 40.0, "width": 400.0},
        {"op": "adjust_gamma", "gamma": 0.9},
    ]}))
    rep = tmp_path / "run.json"
    rc = cli.main(["enhance", str(src), "-c", str(cfg),
                   "-o", str(tmp_path / "o.png"), "--run-report", str(rep)])
    assert rc == 0
    report = _json.loads(rep.read_text())
    assert np.isfinite(report["metrics"]["psnr"])


def test_load_image_dicom_float_requires_window(tmp_path, ct_slice_hu):
    from mies_tpu.io.dicom import write_dicom
    from mies_tpu.io.image import load_image

    src = tmp_path / "s.dcm"
    write_dicom(src, ct_slice_hu)
    with pytest.raises(ValueError, match="window_hu"):
        load_image(src)  # float32 default has no canonical HU mapping


def test_enhance_batch_dicom_files(tmp_path, ct_slice_hu):
    """enhance_batch accepts .dcm inputs alongside PNGs (shape-bucketed)."""
    from PIL import Image

    from mies_tpu.io.dicom import write_dicom

    srcs = []
    for i in range(3):
        p = tmp_path / f"ct{i}.dcm"
        write_dicom(p, ct_slice_hu + np.int16(i))
        srcs.append(p)
    png = tmp_path / "x.png"
    Image.fromarray(
        (np.abs(ct_slice_hu.astype(np.int32)) % 255).astype(np.uint8)
    ).save(png)
    srcs.append(png)

    cfg = PipelineConfig.make(
        [("window_hu", {"center": 40.0, "width": 400.0}),
         ("adjust_gamma", {"gamma": 0.9})],
        name="dcm-batch",
    )
    outdir = tmp_path / "out"
    m = runner.enhance_batch(srcs, cfg, outdir, batch_size=2, progress=False)
    assert m.done_count == 4
    for i in range(3):
        assert (outdir / f"ct{i}.dcm").exists()


def _rgb_png(tmp_path, rng, name="rgb.png", shape=(64, 64)):
    from PIL import Image

    arr = (rng.random((*shape, 3)) * 255).astype(np.uint8)
    p = tmp_path / name
    Image.fromarray(arr, mode="RGB").save(p)
    return p, arr


def test_time_latency_device_smoke():
    cfg = PipelineConfig.make(
        [("adjust_gamma", {"gamma": 0.9}),
         ("gaussian_blur", {"sigma": 1.0})],
        name="lat-dev",
    )
    r = runner.time_latency_device(cfg, shape=(64, 64), inner=4, repeats=2)
    assert r["p50_ms"] >= 0.0 and r["p95_ms"] >= r["p50_ms"] - 1e-9


def test_time_pipeline_device_smoke():
    cfg = PipelineConfig.make(
        [("adjust_gamma", {"gamma": 0.9}),
         ("gaussian_blur", {"sigma": 1.0})],
        name="tp-dev",
    )
    r = runner.time_pipeline_device(
        cfg, shape=(64, 64), batch_size=4, inner=2, repeats=2
    )
    assert r["slices_per_sec"] > 0.0
    assert r["batch_size"] == 4


def test_time_pipeline_device_rejects_shape_changing_chain():
    """A shape-changing chain can't carry through the fori_loop; the
    harness must refuse with the config named, not crash in tracing."""
    cfg = PipelineConfig.make(
        [("resize", {"height": 32, "width": 32})], name="rs-dev",
    )
    with pytest.raises(ValueError, match="rs-dev"):
        runner.time_pipeline_device(cfg, shape=(64, 64), batch_size=2)


def test_multichannel_requires_explicit_policy(tmp_path, rng):
    """RGB input with no io.channels is an ERROR with guidance — never a
    silent luminance collapse (VERDICT r2 missing #1)."""
    p, _ = _rgb_png(tmp_path, rng)
    with pytest.raises(ValueError, match="io.channels"):
        runner.enhance_image(p, WORKLOAD1, tmp_path / "out.png")


def test_multichannel_per_channel_processing(tmp_path, rng):
    """io.channels: per-channel processes every band independently —
    identical to running each channel through the grayscale chain."""
    from PIL import Image

    p, arr = _rgb_png(tmp_path, rng)
    cfg = PipelineConfig.make(
        [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})],
        name="w1-rgb", io={"channels": "per-channel"},
    )
    out = runner.enhance_image(p, cfg, tmp_path / "out.png")
    assert out.shape == (3, 64, 64) and out.dtype == np.uint8

    # channel c == the grayscale chain on channel c alone
    gray_fn = compile_pipeline(WORKLOAD1)
    for c in range(3):
        ref = np.asarray(gray_fn(jnp.asarray(arr[:, :, c])))
        np.testing.assert_array_equal(out[c], ref)

    saved = np.asarray(Image.open(tmp_path / "out.png"))
    np.testing.assert_array_equal(saved, out.transpose(1, 2, 0))


def test_color_dicom_rides_channels_policy(tmp_path, rng):
    """A color DICOM slice (VERDICT r4 item 7) through the pipeline ==
    the same RGB pixels from a PNG — per-channel and gray policies
    both, covering the runner's _load_dicom_slice color path e2e."""
    from PIL import Image

    from mies_tpu.io.dicom import write_dicom

    rgb = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    dcm = tmp_path / "us.dcm"
    write_dicom(dcm, rgb)
    png = tmp_path / "us.png"
    Image.fromarray(rgb).save(png)
    cfg = PipelineConfig.make(
        [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})],
        name="w1-color-dcm", io={"channels": "per-channel"},
    )
    out_dcm = runner.enhance_image(dcm, cfg, tmp_path / "a.png")
    out_png = runner.enhance_image(png, cfg, tmp_path / "b.png")
    np.testing.assert_array_equal(out_dcm, out_png)
    cfg_g = PipelineConfig.make(
        [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})],
        name="w1-color-dcm-g", io={"channels": "gray"},
    )
    np.testing.assert_array_equal(
        runner.enhance_image(dcm, cfg_g, tmp_path / "c.png"),
        runner.enhance_image(png, cfg_g, tmp_path / "d.png"))


def test_multichannel_gray_policy_collapses(tmp_path, rng):
    from PIL import Image

    p, arr = _rgb_png(tmp_path, rng)
    cfg = PipelineConfig.make(
        [("equalize_hist", {}), ("adjust_gamma", {"gamma": 0.8})],
        name="w1-gray", io={"channels": "gray"},
    )
    out = runner.enhance_image(p, cfg, tmp_path / "out.png")
    lum = np.asarray(Image.open(p).convert("L"))
    ref = np.asarray(compile_pipeline(WORKLOAD1)(jnp.asarray(lum)))
    np.testing.assert_array_equal(out, ref)


def test_multichannel_batched_fold(rng):
    """[B, C, H, W] through the batched program == per-channel results."""
    cfg = PipelineConfig.make(
        [("clahe", {"clip_limit": 2.0, "grid_size": (4, 4),
                    "convention": "opencv"})],
        name="rgb-clahe",
    )
    x = rng.random((2, 3, 64, 64), dtype=np.float32)
    fn = compile_pipeline(cfg, batched=True, donate=False)
    out = np.asarray(fn(jnp.asarray(x)))
    assert out.shape == (2, 3, 64, 64)
    ref = np.asarray(fn(jnp.asarray(x.reshape(6, 64, 64))))
    np.testing.assert_array_equal(out.reshape(6, 64, 64), ref)


def test_multichannel_enhance_batch(tmp_path, rng):
    from PIL import Image

    cfg = PipelineConfig.make(
        [("adjust_gamma", {"gamma": 0.8})],
        name="rgb-batch", io={"channels": "per-channel"},
    )
    srcs = [_rgb_png(tmp_path, rng, f"im{i}.png")[0] for i in range(3)]
    outdir = tmp_path / "out"
    m = runner.enhance_batch(srcs, cfg, outdir, batch_size=2, progress=False)
    assert m.done_count == 3
    got = np.asarray(Image.open(outdir / "im0.png"))
    assert got.shape == (64, 64, 3)


def test_config_rejects_bad_channels_policy():
    from mies_tpu.pipeline.config import validate

    cfg = PipelineConfig.make(
        [("adjust_gamma", {"gamma": 0.8})], io={"channels": "rgb"}
    )
    with pytest.raises(ValueError, match="channels"):
        validate(cfg)


def test_cli_enhance_volume_stream(tmp_path, monkeypatch):
    """CLI --stream: disk-to-disk, output readable, metadata printed."""
    import json as _json

    from mies_tpu import cli
    from mies_tpu.io.volume import load_volume, save_volume

    vol = np.random.default_rng(9).integers(-500, 1500, (9, 32, 32), dtype=np.int16)
    src = tmp_path / "ct.nc"
    save_volume(src, vol, var_name="hu")
    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"name": "s", "pipeline": [
        {"op": "window_hu", "center": 40.0, "width": 400.0},
        {"op": "adjust_gamma", "gamma": 0.9},
    ]}))
    out = tmp_path / "enhanced.nc"
    rc = cli.main(["enhance-volume", str(src), "-c", str(cfg),
                   "-o", str(out), "--stream", "-q"])
    assert rc == 0
    got, meta = load_volume(out)
    assert got.shape == (9, 32, 32) and got.dtype == np.uint8


def test_cli_enhance_volume_hdf5_stream(tmp_path):
    """An HDF5-backed .nc (gzip-chunked, as netCDF4 writes) streams
    through enhance-volume via the in-tree reader — VERDICT r4 item 9's
    end-to-end contract (netCDF4-the-package is absent here)."""
    import json as _json

    h5py = pytest.importorskip("h5py")
    from mies_tpu import cli
    from mies_tpu.io.volume import load_volume

    vol = np.random.default_rng(9).integers(
        -500, 1500, (9, 32, 32), dtype=np.int16)
    src = tmp_path / "ct4.nc"
    with h5py.File(src, "w") as f:
        f.create_dataset("hu", data=vol, chunks=(4, 32, 32),
                         compression="gzip", shuffle=True)
    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"name": "s", "pipeline": [
        {"op": "window_hu", "center": 40.0, "width": 400.0},
        {"op": "adjust_gamma", "gamma": 0.9},
    ]}))
    out = tmp_path / "enhanced.nc"
    rc = cli.main(["enhance-volume", str(src), "-c", str(cfg),
                   "-o", str(out), "--stream", "-q"])
    assert rc == 0
    got, _meta = load_volume(out)
    assert got.shape == (9, 32, 32) and got.dtype == np.uint8
    # equal to the classic-.nc route through the same chain
    from mies_tpu.io.volume import save_volume

    src3 = tmp_path / "ct3.nc"
    save_volume(src3, vol, var_name="hu")
    out3 = tmp_path / "enhanced3.nc"
    assert cli.main(["enhance-volume", str(src3), "-c", str(cfg),
                     "-o", str(out3), "--stream", "-q"]) == 0
    got3, _ = load_volume(out3)
    np.testing.assert_array_equal(got, got3)


def test_cli_stream_rejects_metrics(tmp_path):
    import json as _json

    from mies_tpu import cli
    from mies_tpu.io.volume import save_volume

    src = tmp_path / "v.nc"
    save_volume(src, np.zeros((4, 16, 16), np.int16), var_name="hu")
    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"name": "s", "pipeline": [
        {"op": "window_hu", "center": 0.0, "width": 100.0}]}))
    with pytest.raises(SystemExit, match="stream"):
        cli.main(["enhance-volume", str(src), "-c", str(cfg),
                  "-o", str(tmp_path / "o.nc"), "--stream",
                  "--metrics", "psnr"])


def test_empty_pipeline_is_quantized_passthrough(rng):
    cfg = PipelineConfig.make([], name="empty")
    img = rng.random((32, 32)).astype(np.float32)
    out = np.asarray(compile_pipeline(cfg, donate=False)(jnp.asarray(img)))
    want = np.clip(np.rint(img * 255), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_chain_with_unsharp_gauss_pair_matches_unfused(rng):
    """The peephole must not change results on CPU (falls back) and the
    bound structure must keep surrounding stages intact."""
    import jax

    from mies_tpu.pipeline.compiler import build_batched_chain

    cfg = PipelineConfig.make(
        [("adjust_gamma", {"gamma": 0.9}),
         ("unsharp_mask", {"radius": 1.5, "amount": 1.0}),
         ("gaussian_blur", {"sigma": 1.5}),
         ("adjust_contrast", {"factor": 1.1})],
        name="w3ish",
    )
    batch = rng.random((2, 128, 128)).astype(np.float32)
    got = np.asarray(build_batched_chain(cfg)(jnp.asarray(batch)))
    # reference: compose per-image ops directly
    from mies_tpu.ops.filters import gaussian_blur, unsharp_mask
    from mies_tpu.ops.intensity import adjust_contrast, adjust_gamma

    def ref_one(x):
        x = adjust_gamma(x, gamma=0.9)
        x = unsharp_mask(x, radius=1.5, amount=1.0)
        x = gaussian_blur(x, sigma=1.5)
        return adjust_contrast(x, factor=1.1)

    want = np.asarray(jax.vmap(ref_one)(jnp.asarray(batch)))
    np.testing.assert_array_equal(got, want)


def test_cli_enhance_volume_3d_data_parallel(tmp_path):
    """--mode 3d --data-parallel z-shards the whole volume as one SPMD
    program over all (8 fake) devices; output equals the unsharded 3-D
    run at the repo's cross-program level contract."""
    import json as _json

    from mies_tpu import cli
    from mies_tpu.io.volume import load_volume, save_volume

    vol = np.random.default_rng(11).integers(
        -500, 1500, (64, 32, 32), dtype=np.int16)
    src = tmp_path / "ct.npz"
    save_volume(src, vol, var_name="hu")
    cfg = tmp_path / "c.json"
    cfg.write_text(_json.dumps({"name": "z3d", "pipeline": [
        {"op": "window_hu", "center": 40.0, "width": 400.0},
        {"op": "clahe3d", "clip_limit": 2.0, "grid_size": [8, 4, 4]},
        {"op": "unsharp_mask3d", "radius": 1.0, "amount": 0.5},
    ]}))
    out_sh = tmp_path / "sh.npz"
    out_un = tmp_path / "un.npz"
    assert cli.main(["enhance-volume", str(src), "-c", str(cfg),
                     "-o", str(out_sh), "--mode", "3d",
                     "--data-parallel", "-q"]) == 0
    assert cli.main(["enhance-volume", str(src), "-c", str(cfg),
                     "-o", str(out_un), "--mode", "3d", "-q"]) == 0
    sh, _ = load_volume(out_sh)
    un, _ = load_volume(out_un)
    d = np.abs(sh.astype(int) - un.astype(int))
    assert d.max() <= 1 and (d > 0).mean() < 1e-3

    # Z not divisible by the device count is a clean error
    bad = np.zeros((9, 32, 32), np.int16)
    src2 = tmp_path / "bad.npz"
    save_volume(src2, bad, var_name="hu")
    with pytest.raises(SystemExit, match="must divide"):
        cli.main(["enhance-volume", str(src2), "-c", str(cfg),
                  "-o", str(tmp_path / "x.npz"), "--mode", "3d",
                  "--data-parallel", "-q"])


def test_cli_enhance_volume_isotropic(tmp_path):
    """--isotropic resamples an anisotropic DICOM series to a uniform
    grid before the 3-D chain (5 mm z-spacing, 1 mm in-plane, target
    2.5 mm: 8x64x64 -> 16x26x26)."""
    from mies_tpu import cli
    from mies_tpu.io.dicom import write_dicom

    rng = np.random.default_rng(0)
    series = tmp_path / "series"
    series.mkdir()
    for i in range(8):
        write_dicom(series / f"s{i:03d}.dcm",
                    rng.integers(-500, 1500, (64, 64)).astype(np.int16),
                    instance_number=i + 1,
                    image_position=(0.0, 0.0, 5.0 * i),
                    pixel_spacing=(1.0, 1.0))
    cfgp = tmp_path / "c.yaml"
    cfgp.write_text(
        "name: iso\npipeline:\n"
        "  - {op: window_hu, center: 40.0, width: 400.0}\n"
        "  - {op: gaussian_blur3d, sigma: 1.0}\n"
    )
    out = tmp_path / "out.npz"
    rc = cli.main(["enhance-volume", str(series), "-c", str(cfgp),
                   "-o", str(out), "--mode", "3d", "--isotropic", "2.5"])
    assert rc == 0
    with np.load(out) as z:
        vol = z[z.files[0]]
    assert vol.shape == (16, 26, 26)  # round(8*5/2.5), round(64*1/2.5)


def test_cli_isotropic_rejected_combinations(tmp_path):
    """--isotropic must be rejected loudly with --stream (it would be
    silently ignored) and with --data-parallel (resample3d is not
    z-shardable)."""
    from mies_tpu import cli
    from mies_tpu.io.dicom import write_dicom

    series = tmp_path / "s"
    series.mkdir()
    for i in range(4):
        write_dicom(series / f"{i}.dcm", np.zeros((8, 8), np.int16),
                    instance_number=i + 1,
                    image_position=(0.0, 0.0, 2.0 * i),
                    pixel_spacing=(1.0, 1.0))
    cfgp = tmp_path / "c.yaml"
    cfgp.write_text(
        "name: x\npipeline:\n  - {op: gaussian_blur3d, sigma: 1.0}\n")
    with pytest.raises(SystemExit, match="stream"):
        cli.main(["enhance-volume", str(series), "-c", str(cfgp),
                  "-o", str(tmp_path / "o.nc"), "--stream",
                  "--isotropic", "1.0"])
    with pytest.raises(SystemExit, match="data-parallel"):
        cli.main(["enhance-volume", str(series), "-c", str(cfgp),
                  "-o", str(tmp_path / "o.npz"), "--mode", "3d",
                  "--data-parallel", "--isotropic", "1.0"])


class TestExport:
    def test_export_roundtrip_bit_equal(self, tmp_path, rng):
        """A deserialized .mies artifact reproduces the live compile
        bit-for-bit (same traced program, AOT-serialized)."""
        from mies_tpu.pipeline.export import export_pipeline, load_exported

        cfg = PipelineConfig.make(
            [("clahe", {"clip_limit": 2.0, "grid_size": (4, 4),
                        "convention": "opencv"}),
             ("unsharp_mask", {"radius": 1.0, "amount": 0.5})],
            name="exp",
        )
        p = export_pipeline(cfg, tmp_path / "c.mies", shape=(64, 64),
                            batch_size=2)
        fn, hdr = load_exported(p)
        assert hdr["input_shape"] == [2, 64, 64]
        assert hdr["config"]["name"] == "exp"
        x = jnp.asarray(rng.random((2, 64, 64)).astype(np.float32))
        got = np.asarray(fn(x))
        ref = np.asarray(
            compile_pipeline(cfg, batched=True, donate=False)(x))
        np.testing.assert_array_equal(got, ref)

    def test_export_diffusion_kernel_chain_roundtrip(self, tmp_path, rng):
        """A chain whose batched path dispatches the VMEM-resident
        Pallas diffusion kernel (on TPU) must export and reload
        bit-identically — Mosaic custom calls serialize in the
        StableHLO artifact. On CPU this exercises the jnp fallback;
        the platform gate in the loader covers the cross-platform
        case either way."""
        from mies_tpu.pipeline.export import export_pipeline, load_exported

        cfg = PipelineConfig.make(
            [("anisotropic_diffusion",
              {"niter": 4, "kappa": 0.05, "gamma": 0.2}),
             ("musica", {"levels": 3, "p": 0.6, "gain": 1.4})],
            name="musica-exp",
        )
        p = export_pipeline(cfg, tmp_path / "m.mies", shape=(64, 128),
                            batch_size=2)
        fn, hdr = load_exported(p)
        x = jnp.asarray(rng.random((2, 64, 128)).astype(np.float32))
        got = np.asarray(fn(x))
        ref = np.asarray(
            compile_pipeline(cfg, batched=True, donate=False)(x))
        np.testing.assert_array_equal(got, ref)

    def test_export_single_slice_and_header(self, tmp_path, rng):
        from mies_tpu.pipeline.export import (
            export_pipeline, load_exported, read_export_header,
        )

        cfg = PipelineConfig.make(
            [("adjust_gamma", {"gamma": 0.8})], name="g")
        p = export_pipeline(cfg, tmp_path / "g.mies", shape=(32, 32))
        hdr = read_export_header(p)
        assert hdr["input_shape"] == [32, 32] and "cpu" in [
            s.lower() for s in hdr["platforms"]]
        fn, _ = load_exported(p)
        out = np.asarray(fn(jnp.asarray(
            rng.random((32, 32)).astype(np.float32))))
        assert out.dtype == np.uint8

    def test_export_bad_magic(self, tmp_path):
        from mies_tpu.pipeline.export import load_exported

        bad = tmp_path / "x.mies"
        bad.write_bytes(b"NOTMIES!" + b"\x00" * 16)
        with pytest.raises(ValueError, match="bad magic"):
            load_exported(bad)

    def test_cli_export(self, tmp_path):
        from mies_tpu import cli

        cfgp = tmp_path / "c.yaml"
        cfgp.write_text(
            "name: e\npipeline:\n  - {op: adjust_gamma, gamma: 0.9}\n")
        out = tmp_path / "e.mies"
        rc = cli.main(["export", "-c", str(cfgp), "-o", str(out),
                       "--size", "32", "--batch", "2"])
        assert rc == 0 and out.exists()

    def test_export_volume(self, tmp_path, rng):
        from mies_tpu.pipeline.compiler import compile_volume_pipeline
        from mies_tpu.pipeline.export import export_pipeline, load_exported

        cfg = PipelineConfig.make(
            [("resample3d", {"depth": 8, "height": 32, "width": 32}),
             ("gaussian_blur3d", {"sigma": 1.0})],
            name="vexp",
        )
        p = export_pipeline(cfg, tmp_path / "v.mies", shape=(16, 32, 32),
                            volume=True, quantize=False)
        fn, hdr = load_exported(p)
        assert hdr["volume"] is True
        vol = jnp.asarray(rng.random((16, 32, 32)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(fn(vol)),
            np.asarray(compile_volume_pipeline(cfg, quantize=False)(vol)))

    def test_export_volume_rejects_batch(self, tmp_path):
        from mies_tpu.pipeline.export import export_pipeline

        cfg = PipelineConfig.make(
            [("gaussian_blur3d", {"sigma": 1.0})], name="v")
        with pytest.raises(ValueError, match="batch"):
            export_pipeline(cfg, tmp_path / "x.mies", shape=(8, 16, 16),
                            volume=True, batch_size=4)

"""I/O round trips: PNG, npz volumes, and the self-contained DICOM codec."""

import numpy as np
import pytest

from mies_tpu.io.image import from_float, load_image, save_image, to_float
from mies_tpu.io.volume import load_volume, save_volume
from mies_tpu.io.dicom import (
    read_dicom,
    read_dicom_series,
    write_dicom,
    DicomSlice,
    EXPLICIT_VR_LE,
)


def test_png_roundtrip(tmp_path, xray):
    p = tmp_path / "x.png"
    u8 = from_float(xray)
    save_image(p, u8)
    back = load_image(p)
    np.testing.assert_allclose(back, u8.astype(np.float32) / 255.0, atol=1e-7)


def test_save_accepts_float(tmp_path, xray):
    p = tmp_path / "f.png"
    save_image(p, xray)
    back = from_float(load_image(p))
    np.testing.assert_array_equal(back, from_float(xray))


def test_quantize_round_half_even():
    # 0.5/255 boundary values must round like the device path (rint)
    x = np.array([0.5 / 255.0, 1.5 / 255.0, 2.5 / 255.0], np.float32)
    np.testing.assert_array_equal(from_float(x), np.rint(x * 255).astype(np.uint8))


def test_to_float_dtypes():
    assert to_float(np.array([255], np.uint8))[0] == 1.0
    assert to_float(np.array([65535], np.uint16))[0] == 1.0
    assert to_float(np.array([0.25], np.float64)).dtype == np.float32


def test_npz_volume_roundtrip(tmp_path, ct_slice_hu):
    vol = np.stack([ct_slice_hu] * 5)
    p = tmp_path / "vol.npz"
    save_volume(p, vol)
    back, meta = load_volume(p)
    np.testing.assert_array_equal(back, vol)
    assert meta.shape == vol.shape and meta.dtype == "int16"


def test_npy_volume_roundtrip(tmp_path, ct_slice_hu):
    vol = np.stack([ct_slice_hu] * 3)
    p = tmp_path / "vol.npy"
    save_volume(p, vol)
    back, _ = load_volume(p)
    np.testing.assert_array_equal(back, vol)


def test_dicom_roundtrip_int16(tmp_path, ct_slice_hu):
    p = tmp_path / "s.dcm"
    write_dicom(p, ct_slice_hu, instance_number=7, slice_location=12.5)
    s = read_dicom(p)
    assert isinstance(s, DicomSlice)
    np.testing.assert_array_equal(s.pixels, ct_slice_hu)
    assert s.rows == ct_slice_hu.shape[0]
    assert s.instance_number == 7
    assert s.slice_location == 12.5
    assert s.transfer_syntax == EXPLICIT_VR_LE


def test_dicom_rescale_to_hu(tmp_path):
    # stored uint16 with slope/intercept -> int16 HU on read
    raw = np.arange(0, 4096, 1, dtype=np.uint16).reshape(64, 64)
    p = tmp_path / "r.dcm"
    write_dicom(p, raw, rescale_slope=1.0, rescale_intercept=-1024.0)
    s = read_dicom(p)
    assert s.pixels.dtype == np.int16
    assert s.pixels.min() == -1024
    assert s.pixels.max() == 4095 - 1024


def test_dicom_series_sorted_by_slice_location(tmp_path, ct_slice_hu):
    # write slices out of order; series loader must sort by location
    locs = [30.0, 10.0, 20.0]
    for i, loc in enumerate(locs):
        write_dicom(
            tmp_path / f"slice{i}.dcm",
            (ct_slice_hu + i).astype(np.int16),
            instance_number=i + 1,
            slice_location=loc,
        )
    vol = read_dicom_series(tmp_path)
    assert vol.shape == (3, *ct_slice_hu.shape)
    # order by location: file1 (10), file2 (20), file0 (30)
    np.testing.assert_array_equal(vol[0], ct_slice_hu + 1)
    np.testing.assert_array_equal(vol[1], ct_slice_hu + 2)
    np.testing.assert_array_equal(vol[2], ct_slice_hu + 0)


def test_dicom_series_volume_via_load_volume(tmp_path, ct_slice_hu):
    for i in range(3):
        write_dicom(tmp_path / f"s{i}.dcm", ct_slice_hu, instance_number=i)
    vol, meta = load_volume(tmp_path)
    assert vol.shape[0] == 3
    assert meta.source.startswith("dicom-series")


def test_dicom_unsupported_transfer_syntax(tmp_path, ct_slice_hu):
    p = tmp_path / "bad.dcm"
    write_dicom(p, ct_slice_hu)
    data = bytearray(p.read_bytes())
    # corrupt the TS UID to a JPEG one
    i = data.find(b"1.2.840.10008.1.2.1")
    data[i : i + 19] = b"1.2.840.10008.1.2.4"
    p.write_bytes(bytes(data))
    with pytest.raises(NotImplementedError):
        read_dicom(p)


def test_16bit_png_roundtrip(tmp_path):
    """uint16 PNG ingest keeps 16-bit precision (/65535), raw mode keeps u16."""
    from PIL import Image

    arr = (np.arange(64 * 64, dtype=np.uint32) * 16 % 65536).astype(np.uint16).reshape(64, 64)
    p = tmp_path / "x16.png"
    Image.fromarray(arr.astype(np.int32), mode="I").save(p)
    f = load_image(p)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, arr.astype(np.float32) / 65535.0, atol=1e-7)
    raw = load_image(p, dtype="raw")
    assert raw.dtype == np.uint16
    np.testing.assert_array_equal(raw, arr)


def test_raw_u8_load(tmp_path, xray):
    p = tmp_path / "u8.png"
    save_image(p, from_float(xray))
    raw = load_image(p, dtype="raw")
    assert raw.dtype == np.uint8
    np.testing.assert_array_equal(raw, from_float(xray))


# -- NetCDF-3 streaming writer + slab-streamed ingest (VERDICT r1 #2) ---------


@pytest.mark.parametrize("dtype", [np.int16, np.uint8, np.float32])
def test_netcdf3_writer_scipy_roundtrip(tmp_path, dtype):
    """Our streaming writer's files must be readable by an INDEPENDENT
    NetCDF implementation (scipy.io.netcdf_file)."""
    from scipy.io import netcdf_file

    from mies_tpu.io.netcdf3 import NetCDF3VolumeWriter

    rng = np.random.default_rng(0)
    vol = (rng.random((11, 16, 20)) * 200).astype(dtype)
    p = tmp_path / "v.nc"
    w = NetCDF3VolumeWriter(p, vol.shape, dtype, var_name="hu",
                            attrs={"units": "HU"})
    for k in range(0, 11, 4):  # uneven slabs incl. short tail
        w.append(vol[k:k + 4])
    w.close()

    f = netcdf_file(str(p), "r", mmap=False)
    data = np.asarray(f.variables["hu"][:])
    if dtype == np.uint8:
        # the convention puts _Unsigned on the VARIABLE (r2 review fix)
        assert f.variables["hu"]._attributes.get("_Unsigned") == b"true"
        data = data.view(np.uint8)
    np.testing.assert_array_equal(data, vol)
    f.close()


def test_netcdf3_writer_rejects_incomplete(tmp_path):
    from mies_tpu.io.netcdf3 import NetCDF3VolumeWriter

    w = NetCDF3VolumeWriter(tmp_path / "v.nc", (4, 8, 8), np.int16)
    w.append(np.zeros((2, 8, 8), np.int16))
    with pytest.raises(ValueError, match="incomplete"):
        w.close()


def test_save_load_volume_nc_roundtrip(tmp_path):
    from mies_tpu.io.volume import load_volume, save_volume

    vol = (np.random.default_rng(1).random((9, 12, 16)) * 3000 - 1000).astype(np.int16)
    p = tmp_path / "ct.nc"
    save_volume(p, vol, var_name="hu")
    back, meta = load_volume(p)
    np.testing.assert_array_equal(back, vol)
    assert back.dtype == np.int16
    assert meta.var_name == "hu"


@pytest.mark.parametrize("fmt", ["nc", "npy"])
def test_open_volume_slabs_lazy(tmp_path, fmt):
    from mies_tpu.io.volume import open_volume_slabs, save_volume

    vol = (np.random.default_rng(2).random((13, 8, 8)) * 100).astype(np.int16)
    p = tmp_path / f"v.{fmt}"
    save_volume(p, vol, var_name="hu")
    meta, slabs = open_volume_slabs(p, slab_size=5)
    assert "stream" in meta.source  # lazy path, not the full-load fallback
    assert meta.shape == (13, 8, 8) and meta.dtype == "int16"
    got = np.concatenate(list(slabs))
    np.testing.assert_array_equal(got, vol)


def test_open_volume_slabs_dicom_dir_ordered(tmp_path, ct_slice_hu):
    from mies_tpu.io.dicom import write_dicom
    from mies_tpu.io.volume import open_volume_slabs

    locs = [30.0, 10.0, 20.0, 40.0, 0.0]
    for i, loc in enumerate(locs):
        write_dicom(tmp_path / f"s{i}.dcm", (ct_slice_hu + i).astype(np.int16),
                    instance_number=i, slice_location=loc)
    meta, slabs = open_volume_slabs(tmp_path, slab_size=2)
    got = np.concatenate(list(slabs))
    # slices must come back in slice_location order: 0,10,20,30,40 -> i=4,1,2,0,3
    want = np.stack([(ct_slice_hu + i).astype(np.int16) for i in (4, 1, 2, 0, 3)])
    np.testing.assert_array_equal(got, want)


def test_enhance_volume_stream_disk_to_disk(tmp_path):
    """Disk-to-disk streaming == the in-memory path, bit for bit."""
    from mies_tpu.io.volume import load_volume, save_volume
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.runner import enhance_volume, enhance_volume_stream

    cfg = PipelineConfig.make(
        [("window_hu", {"center": 40.0, "width": 400.0}),
         ("unsharp_mask", {"radius": 1.0, "amount": 0.5})],
        name="stream-test",
    )
    vol = np.random.default_rng(3).integers(-1000, 2000, (19, 32, 32),
                                            dtype=np.int16)
    src = tmp_path / "ct.nc"
    save_volume(src, vol, var_name="hu")
    dst = tmp_path / "enhanced.nc"
    meta = enhance_volume_stream(src, cfg, dst, slab_size=8)
    assert meta.shape == (19, 32, 32)
    got, _ = load_volume(dst)
    want = enhance_volume(vol, cfg, slab_size=8)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_enhance_volume_stream_npy_output(tmp_path):
    from mies_tpu.io.volume import save_volume
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.runner import enhance_volume_stream

    cfg = PipelineConfig.make([("adjust_gamma", {"gamma": 0.8})])
    vol = np.random.default_rng(4).random((7, 16, 16)).astype(np.float32)
    src = tmp_path / "v.npy"
    np.save(src, vol)
    dst = tmp_path / "out.npy"
    enhance_volume_stream(src, cfg, dst, slab_size=4)
    out = np.load(dst)
    assert out.shape == (7, 16, 16) and out.dtype == np.uint8


def test_netcdf3_cdf2_header_for_large_volumes(tmp_path):
    """>2 GiB data regions must emit a CDF-2 header with an unsigned
    (capped) vsize instead of crashing in struct.pack (r2 review)."""
    from mies_tpu.io.netcdf3 import NetCDF3VolumeWriter

    p = tmp_path / "big.nc"
    w = NetCDF3VolumeWriter(p, (2048, 1024, 1024), np.uint8)  # 2 GiB
    w._f.close()  # header only — don't write 2 GiB in a test
    magic = p.read_bytes()[:4]
    assert magic == b"CDF\x02", magic


def test_netcdf3_unsigned_attr_on_variable(tmp_path):
    """uint8 roundtrip through load_volume with the per-variable
    _Unsigned convention."""
    from mies_tpu.io.volume import load_volume, save_volume

    vol = (np.random.default_rng(5).random((5, 8, 8)) * 255).astype(np.uint8)
    p = tmp_path / "u8.nc"
    save_volume(p, vol)
    back, _ = load_volume(p)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, vol)


def test_read_dicom_header_matches_full_parse(tmp_path, ct_slice_hu):
    from mies_tpu.io.dicom import read_dicom, read_dicom_header, write_dicom

    p = tmp_path / "h.dcm"
    write_dicom(p, ct_slice_hu, instance_number=7, slice_location=12.5)
    m = read_dicom_header(p)
    full = read_dicom(p)
    assert m["rows"] == full.rows and m["cols"] == full.cols
    assert m["instance"] == 7 and m["slice_loc"] == 12.5


def test_enhance_volume_stream_rejects_shape_changers(tmp_path):
    from mies_tpu.io.volume import save_volume
    from mies_tpu.pipeline.config import PipelineConfig
    from mies_tpu.pipeline.runner import enhance_volume_stream

    src = tmp_path / "v.nc"
    save_volume(src, np.zeros((4, 32, 32), np.int16), var_name="hu")
    cfg = PipelineConfig.make([("resize", {"height": 16, "width": 16})])
    with pytest.raises(ValueError, match="shape-changing"):
        enhance_volume_stream(src, cfg, tmp_path / "o.nc")


def test_dicom_stream_rejects_mixed_sizes(tmp_path, ct_slice_hu):
    """A localizer/scout with different dims must fail BEFORE any output
    is written, not mid-stream (r2 review)."""
    from mies_tpu.io.dicom import write_dicom
    from mies_tpu.io.volume import open_volume_slabs

    write_dicom(tmp_path / "a.dcm", ct_slice_hu, instance_number=1)
    write_dicom(tmp_path / "b.dcm", ct_slice_hu[:128], instance_number=2)
    with pytest.raises(ValueError, match="mixed slice sizes"):
        open_volume_slabs(tmp_path, slab_size=2)


def test_dicom_rescale_saturates_not_wraps(tmp_path):
    """uint16 pixels whose rescaled value exceeds int16 must clamp at
    the int16 range, not wrap negative (review finding, round 4)."""
    raw = np.array([[40000, 100], [65535, 0]], dtype=np.uint16).repeat(
        8, 0
    ).repeat(8, 1)
    p = tmp_path / "sat.dcm"
    write_dicom(p, raw, rescale_slope=1.0, rescale_intercept=-1024.0)
    s = read_dicom(p)
    assert s.pixels.dtype == np.int16
    assert s.pixels.max() == 32767          # 65535-1024 saturates
    assert s.pixels.min() == -1024          # 0-1024 stays exact
    assert (s.pixels >= -1024).all()        # nothing wrapped negative

    from mies_tpu import native

    if native.available():
        px, _ = native.read_dicom_native(p)
        np.testing.assert_array_equal(px, s.pixels)


def test_dicom_implicit_vr_without_preamble(tmp_path):
    """Headerless implicit-VR dumps (the DEFAULT transfer syntax) parse:
    the VR bytes are sniffed instead of assuming explicit."""
    import struct

    def el(group, elem, value):
        return struct.pack("<HHI", group, elem, len(value)) + value

    rows, cols = 4, 6
    px = np.arange(rows * cols, dtype=np.int16).reshape(rows, cols)
    ds = b""
    ds += el(0x0028, 0x0010, struct.pack("<H", rows))
    ds += el(0x0028, 0x0011, struct.pack("<H", cols))
    ds += el(0x0028, 0x0100, struct.pack("<H", 16))
    ds += el(0x0028, 0x0103, struct.pack("<H", 1))
    ds += el(0x7FE0, 0x0010, px.tobytes())
    p = tmp_path / "implicit.dcm"
    p.write_bytes(ds)  # no preamble, no DICM, implicit VR
    s = read_dicom(p)
    np.testing.assert_array_equal(s.pixels, px)

    # and the 2-D loader path survives it (native parser falls back)
    from mies_tpu.io.image import load_image

    got = load_image(p, dtype="raw")
    np.testing.assert_array_equal(got, px)


def test_dicom_series_mixed_metadata_merged_order(tmp_path):
    """A slice carrying only SliceLocation sorts by position alongside
    IPP-bearing slices (a tiered sort relocated it to the end)."""
    d = tmp_path / "series"
    d.mkdir()
    base = np.zeros((8, 8), np.int16)
    write_dicom(d / "a.dcm", base + 50, image_position=(0.0, 0.0, 5.0))
    write_dicom(d / "b.dcm", base + 10, slice_location=1.0)  # no IPP
    write_dicom(d / "c.dcm", base + 30, image_position=(0.0, 0.0, 3.0))
    vol = read_dicom_series(d)
    np.testing.assert_array_equal(vol[:, 0, 0], [10, 30, 50])

    from mies_tpu import native

    if native.available():
        nvol = native.read_dicom_series_native(d)
        np.testing.assert_array_equal(nvol, vol)


def test_dicom_spacing_roundtrip(tmp_path):
    """PixelSpacing/SliceThickness write+read; series_spacing prefers
    the median IPP z interval over SliceThickness."""
    from mies_tpu.io.dicom import read_dicom, series_spacing, write_dicom

    for i in range(4):
        write_dicom(tmp_path / f"s{i:03d}.dcm",
                    np.full((8, 8), i, np.int16), instance_number=i + 1,
                    image_position=(0.0, 0.0, 2.5 * i),
                    pixel_spacing=(0.7, 0.8), slice_thickness=2.0)
    s = read_dicom(tmp_path / "s000.dcm")
    assert s.pixel_spacing == (0.7, 0.8) and s.slice_thickness == 2.0
    assert series_spacing(tmp_path) == (2.5, 0.7, 0.8)
    # load_volume carries it into VolumeMeta
    from mies_tpu.io.volume import load_volume

    _, meta = load_volume(tmp_path)
    assert meta.spacing == (2.5, 0.7, 0.8)


def test_write_dicom_tags_ascending(tmp_path):
    """PS3.5 7.1: data-set elements must be in ascending tag order —
    strict readers/PACS rely on it (our linear scanner doesn't, which
    hid a violation once)."""
    from mies_tpu.io.dicom import _Reader, _parse_meta, write_dicom

    p = tmp_path / "x.dcm"
    write_dicom(p, np.zeros((4, 4), np.int16), instance_number=3,
                slice_location=1.5, image_position=(0.0, 0.0, 7.5),
                pixel_spacing=(0.7, 0.8), slice_thickness=2.0,
                rescale_slope=1.0, rescale_intercept=-1024.0)
    data = p.read_bytes()
    _, offset = _parse_meta(data)
    r = _Reader(data, explicit=True)
    r.pos = offset
    tags = []
    while not r.eof():
        t, vr, length = r.element()
        r.pos += length
        tags.append(t)
    assert tags == sorted(tags), tags


def test_dicom_reader_rejects_garbage_cleanly(tmp_path, rng):
    """Truncated/corrupt/garbage DICOM bytes raise ValueError-family
    errors (batch jobs bucket those as per-item failures) — never
    struct.error/IndexError crashes."""
    from mies_tpu.io.dicom import read_dicom, read_dicom_header, write_dicom

    good = tmp_path / "good.dcm"
    write_dicom(good, rng.integers(0, 1000, (16, 16)).astype(np.int16))
    blob = good.read_bytes()

    cases = {
        "empty": b"",
        "no_magic": b"\x00" * 200,
        "magic_only": b"\x00" * 128 + b"DICM",
        "trunc_meta": blob[:140],
        "trunc_mid": blob[: len(blob) // 2],
        "trunc_pixels": blob[:-7],
        "random": bytes(rng.integers(0, 256, 512, dtype=np.uint8)),
        # every prefix length in a window around the ROWS element —
        # lands mid-header AND mid-value of short (US) elements, the
        # class a fixed offset list missed (review finding)
        **{f"sweep_{n}": blob[:n] for n in range(150, 240, 3)},
    }
    for name, data in cases.items():
        p = tmp_path / f"{name}.dcm"
        p.write_bytes(data)
        for reader in (read_dicom, read_dicom_header):
            try:
                reader(p)
            except (ValueError, NotImplementedError):
                pass  # the contract
            except Exception as e:  # noqa: BLE001
                raise AssertionError(
                    f"{reader.__name__}({name}): leaked "
                    f"{type(e).__name__}: {e}") from e


class TestMultiFrameDicom:
    """Multi-frame DICOM (cine ultrasound / tomosynthesis): PS3.5
    frame-major PixelData. The 2-D reader REFUSES such files (it would
    silently drop N-1 frames); the volume paths load them whole."""

    def _write(self, tmp_path, rng, n=12, hw=(32, 40)):
        from mies_tpu.io.dicom import write_dicom

        vol = rng.integers(-1000, 2000, (n, *hw)).astype(np.int16)
        f = tmp_path / "cine.dcm"
        write_dicom(f, vol, slice_thickness=1.5, pixel_spacing=(0.7, 0.7))
        return f, vol

    def test_frames_roundtrip(self, tmp_path, rng):
        from mies_tpu.io.dicom import read_dicom_frames, read_dicom_header

        f, vol = self._write(tmp_path, rng)
        frames, info = self._read(f)
        np.testing.assert_array_equal(frames, vol)
        assert read_dicom_header(f).get("frames") == 12
        assert info.slice_thickness == 1.5

    def _read(self, f):
        from mies_tpu.io.dicom import read_dicom_frames

        return read_dicom_frames(f)

    def test_2d_reader_refuses(self, tmp_path, rng):
        from mies_tpu.io.dicom import read_dicom

        f, _ = self._write(tmp_path, rng)
        with pytest.raises(ValueError, match="multi-frame"):
            read_dicom(f)

    def test_volume_paths_load_it(self, tmp_path, rng):
        from mies_tpu.io.volume import load_volume, open_volume_slabs

        f, vol = self._write(tmp_path, rng)
        v, meta = load_volume(f)
        np.testing.assert_array_equal(v, vol)
        assert meta.spacing == (1.5, 0.7, 0.7)
        meta2, it = open_volume_slabs(f, slab_size=5)
        np.testing.assert_array_equal(np.concatenate(list(it)), vol)

    def test_series_dir_guards(self, tmp_path, rng):
        from mies_tpu.io.volume import load_volume, open_volume_slabs

        f, _ = self._write(tmp_path, rng)
        with pytest.raises(ValueError, match="multi-frame"):
            load_volume(tmp_path)
        with pytest.raises(ValueError, match="multi-frame"):
            meta, it = open_volume_slabs(tmp_path)
            list(it)

    def test_truncated_pixeldata_rejected(self, tmp_path, rng):
        from mies_tpu.io.dicom import read_dicom_frames

        f, _ = self._write(tmp_path, rng)
        data = f.read_bytes()
        f.write_bytes(data[:-64])  # chop the last frame's tail
        with pytest.raises(ValueError):
            read_dicom_frames(f)


class TestPhotometric:
    """DICOM PhotometricInterpretation: MONOCHROME1 (low = bright, the
    common CR/DX convention) inverts over the BitsStored range at
    ingest — what every viewer renders; MONOCHROME2 passes through."""

    def test_mono1_inverts_over_bits_stored(self, tmp_path, rng):
        from mies_tpu.io.dicom import write_dicom
        from mies_tpu.io.image import load_image

        px = rng.integers(0, 4096, (32, 40)).astype(np.uint16)
        f = tmp_path / "cr.dcm"
        write_dicom(f, px, photometric="MONOCHROME1", bits_stored=12)
        got = load_image(f, dtype="raw")
        np.testing.assert_array_equal(got, (4095 - px).astype(np.uint16))

    def test_mono2_and_absent_untouched(self, tmp_path, rng):
        from mies_tpu.io.dicom import write_dicom
        from mies_tpu.io.image import load_image

        px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        write_dicom(tmp_path / "a.dcm", px, photometric="MONOCHROME2")
        write_dicom(tmp_path / "b.dcm", px)
        np.testing.assert_array_equal(
            load_image(tmp_path / "a.dcm", dtype="raw"), px)
        np.testing.assert_array_equal(
            load_image(tmp_path / "b.dcm", dtype="raw"), px)

    def test_mono1_signed_rejected(self, tmp_path, rng):
        from mies_tpu.io.dicom import write_dicom
        from mies_tpu.io.image import load_image

        px = rng.integers(-1000, 2000, (16, 16)).astype(np.int16)
        f = tmp_path / "ct.dcm"
        write_dicom(f, px, photometric="MONOCHROME1",
                    rescale_intercept=-1024.0)
        with pytest.raises(ValueError, match="MONOCHROME1"):
            load_image(f, dtype="raw")

    def test_written_tags_stay_ascending(self, tmp_path, rng):
        # the tag-order regression test pattern: parse the file and
        # assert monotonic tags (PS3.5 7.1)
        from mies_tpu.io.dicom import (
            EXPLICIT_VR_LE, _Reader, _parse_meta, write_dicom,
        )

        px = rng.integers(0, 4096, (8, 8)).astype(np.uint16)
        f = tmp_path / "t.dcm"
        write_dicom(f, np.stack([px] * 3), photometric="MONOCHROME1",
                    bits_stored=12, slice_thickness=1.0,
                    pixel_spacing=(0.5, 0.5))
        data = f.read_bytes()
        ts, offset = _parse_meta(data)
        assert ts == EXPLICIT_VR_LE
        r = _Reader(data, explicit=True)
        r.pos = offset
        tags = []
        while not r.eof():
            t, vr, length = r.element()
            tags.append(t)
            r.pos += length
        assert tags == sorted(tags), tags


class TestFileWindow:
    def test_window_tags_roundtrip(self, tmp_path, rng):
        from mies_tpu.io.dicom import read_dicom_header, write_dicom

        px = rng.integers(-1000, 2000, (16, 16)).astype(np.int16)
        f = tmp_path / "w.dcm"
        write_dicom(f, px, window=(40.0, 400.0))
        h = read_dicom_header(f)
        assert h["window_center"] == 40.0 and h["window_width"] == 400.0

    def test_apply_file_window_rewrites_stage(self, tmp_path, rng):
        from mies_tpu.cli import _apply_file_window
        from mies_tpu.io.dicom import write_dicom
        from mies_tpu.pipeline.config import PipelineConfig

        px = rng.integers(-1000, 2000, (16, 16)).astype(np.int16)
        f = tmp_path / "w.dcm"
        write_dicom(f, px, window=(40.0, 400.0))
        cfg = PipelineConfig.make(
            [("window_hu", {"center": 300.0, "width": 1500.0}),
             ("adjust_gamma", {"gamma": 0.9})],
        )
        out = _apply_file_window(cfg, [f])
        kw = out.stages[0].kwargs()
        assert kw["center"] == 40.0 and kw["width"] == 400.0
        assert out.stages[1].op == "adjust_gamma"

    def test_apply_file_window_error_paths(self, tmp_path, rng, capsys):
        from mies_tpu.cli import _apply_file_window
        from mies_tpu.io.dicom import write_dicom
        from mies_tpu.pipeline.config import PipelineConfig

        px = rng.integers(0, 100, (8, 8)).astype(np.uint8)
        f = tmp_path / "n.dcm"
        write_dicom(f, px)  # no window tags
        cfg = PipelineConfig.make(
            [("window_hu", {"center": 1.0, "width": 2.0})]
        )
        assert _apply_file_window(cfg, [f]) is None
        # no window_hu stage in the chain
        f2 = tmp_path / "w.dcm"
        write_dicom(f2, px, window=(10.0, 20.0))
        cfg2 = PipelineConfig.make([("adjust_gamma", {"gamma": 1.1})])
        assert _apply_file_window(cfg2, [f2]) is None
        # non-DICOM input
        assert _apply_file_window(cfg, [tmp_path / "x.png"]) is None


class TestRLE:
    """RLE Lossless (1.2.840.10008.1.2.5) — PS3.5 Annex G codec,
    decode + encode, Python and native parsers (VERDICT r3 missing #1)."""

    def test_roundtrip_int16(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import RLE_LOSSLESS

        p = tmp_path / "rle.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=RLE_LOSSLESS,
                    instance_number=3, slice_location=7.5)
        s = read_dicom(p)
        np.testing.assert_array_equal(s.pixels, ct_slice_hu)
        assert s.transfer_syntax == RLE_LOSSLESS
        assert s.instance_number == 3 and s.slice_location == 7.5

    def test_roundtrip_uint8(self, tmp_path, rng):
        from mies_tpu.io.dicom import RLE_LOSSLESS

        px = rng.integers(0, 256, (33, 47)).astype(np.uint8)  # odd dims
        p = tmp_path / "u8.dcm"
        write_dicom(p, px, transfer_syntax=RLE_LOSSLESS)
        np.testing.assert_array_equal(read_dicom(p).pixels, px)

    def test_matches_uncompressed(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import RLE_LOSSLESS

        a, b = tmp_path / "raw.dcm", tmp_path / "rle.dcm"
        write_dicom(a, ct_slice_hu)
        write_dicom(b, ct_slice_hu, transfer_syntax=RLE_LOSSLESS)
        np.testing.assert_array_equal(
            read_dicom(a).pixels, read_dicom(b).pixels
        )
        assert b.stat().st_size < a.stat().st_size  # CT compresses

    def test_rescale_applied(self, tmp_path):
        from mies_tpu.io.dicom import RLE_LOSSLESS

        raw = np.arange(0, 4096, dtype=np.uint16).reshape(64, 64)
        p = tmp_path / "r.dcm"
        write_dicom(p, raw, rescale_slope=1.0, rescale_intercept=-1024.0,
                    transfer_syntax=RLE_LOSSLESS)
        s = read_dicom(p)
        assert s.pixels.dtype == np.int16
        assert s.pixels.min() == -1024 and s.pixels.max() == 3071

    def test_packbits_adversarial_rows(self):
        """Byte-level encode->decode identity on the control-byte knife
        edges: runs of 127/128/129/258, literals of 128+, length-1 rows,
        alternating bytes, and random data."""
        from mies_tpu.io.dicom import _packbits_decode, _packbits_encode_row

        rows = [
            b"\x00" * 127, b"\x00" * 128, b"\x00" * 129, b"\xff" * 258,
            b"\x07", b"\x01\x02" * 100, bytes(range(256)) * 2,
            b"ab" + b"c" * 130 + b"de", b"\x80" * 3 + b"\x81",
            np.random.default_rng(0).integers(0, 256, 1000)
            .astype(np.uint8).tobytes(),
        ]
        for row in rows:
            enc = bytes(_packbits_encode_row(row))
            dec = _packbits_decode(enc, len(row), "t")
            assert dec.tobytes() == row

    def test_multiframe_roundtrip(self, tmp_path, rng):
        from mies_tpu.io.dicom import RLE_LOSSLESS, read_dicom_frames

        frames = rng.integers(-1000, 2000, (4, 24, 32)).astype(np.int16)
        p = tmp_path / "mf.dcm"
        write_dicom(p, frames, transfer_syntax=RLE_LOSSLESS)
        got, _ = read_dicom_frames(p)
        np.testing.assert_array_equal(got, frames)
        with pytest.raises(ValueError, match="multi-frame"):
            read_dicom(p)

    def test_header_only_parse(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import RLE_LOSSLESS, read_dicom_header

        p = tmp_path / "h.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=RLE_LOSSLESS,
                    pixel_spacing=(0.7, 0.7))
        h = read_dicom_header(p)
        assert h["rows"] == ct_slice_hu.shape[0]
        assert h["pixel_spacing"] == (0.7, 0.7)

    def test_native_matches_python(self, tmp_path, ct_slice_hu):
        from mies_tpu import native
        from mies_tpu.io.dicom import RLE_LOSSLESS

        if not native.available():
            pytest.skip("native parser unavailable")
        p = tmp_path / "n.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=RLE_LOSSLESS)
        px, _ = native.read_dicom_native(p)
        np.testing.assert_array_equal(px, read_dicom(p).pixels)

    def test_native_rejects_multifragment(self, tmp_path, rng):
        from mies_tpu import native
        from mies_tpu.io.dicom import RLE_LOSSLESS

        if not native.available():
            pytest.skip("native parser unavailable")
        frames = rng.integers(0, 100, (2, 8, 8)).astype(np.int16)
        p = tmp_path / "mf.dcm"
        write_dicom(p, frames, transfer_syntax=RLE_LOSSLESS)
        with pytest.raises(ValueError, match="multi-f"):
            native.read_dicom_native(p)

    def test_series_streams(self, tmp_path, ct_slice_hu):
        """An RLE series loads ordered through the volume paths — incl.
        the native-parser slab decode used by enhance-volume --stream."""
        from mies_tpu.io.dicom import RLE_LOSSLESS
        from mies_tpu.io.volume import open_volume_slabs

        for i, loc in enumerate([30.0, 10.0, 20.0]):
            write_dicom(tmp_path / f"s{i}.dcm",
                        (ct_slice_hu + i).astype(np.int16),
                        slice_location=loc,
                        transfer_syntax=RLE_LOSSLESS)
        vol, meta = load_volume(tmp_path)
        assert vol.shape == (3, *ct_slice_hu.shape)
        np.testing.assert_array_equal(vol[0], ct_slice_hu + 1)
        m, slabs = open_volume_slabs(tmp_path, slab_size=2)
        got = np.concatenate(list(slabs), axis=0)
        np.testing.assert_array_equal(got, vol)

    def test_unknown_syntax_refused_with_guidance(self, tmp_path,
                                                  ct_slice_hu):
        p = tmp_path / "j.dcm"
        write_dicom(p, ct_slice_hu)
        data = bytearray(p.read_bytes())
        # rewrite the TS UID to an unregistered syntax (same length)
        i = data.find(b"1.2.840.10008.1.2.1")
        data[i : i + 19] = b"1.2.840.10008.1.2.7"
        p.write_bytes(bytes(data))
        with pytest.raises(NotImplementedError) as ei:
            read_dicom(p)
        assert "unrecognized" in str(ei.value)
        assert "transcode" in str(ei.value)

    def test_write_rejects_unknown_syntax(self, tmp_path, ct_slice_hu):
        with pytest.raises(ValueError, match="transfer_syntax"):
            write_dicom(tmp_path / "x.dcm", ct_slice_hu,
                        transfer_syntax="1.2.840.10008.1.2.4.100")


class TestJpegLossless:
    """JPEG Lossless (1.2.840.10008.1.2.4.70 SV1 / .4.57) — the T.81
    process-14 SOF3 codec (io/jpegll.py), decode + encode, DICOM
    integration incl. the native series reader's per-file fallback."""

    def test_roundtrip_int16(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import JPEG_LOSSLESS_SV1

        p = tmp_path / "jll.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=JPEG_LOSSLESS_SV1,
                    instance_number=4, slice_location=2.5)
        s = read_dicom(p)
        np.testing.assert_array_equal(s.pixels, ct_slice_hu)
        assert s.transfer_syntax == JPEG_LOSSLESS_SV1
        assert s.instance_number == 4 and s.slice_location == 2.5

    def test_roundtrip_uint8_and_p14(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_LOSSLESS_P14, JPEG_LOSSLESS_SV1

        px = rng.integers(0, 256, (33, 47)).astype(np.uint8)  # odd dims
        for ts in (JPEG_LOSSLESS_SV1, JPEG_LOSSLESS_P14):
            p = tmp_path / f"u8-{ts[-2:]}.dcm"
            write_dicom(p, px, transfer_syntax=ts)
            got = read_dicom(p)
            np.testing.assert_array_equal(got.pixels, px)
            assert got.pixels.dtype == np.uint8

    def test_matches_uncompressed_and_compresses(self, tmp_path,
                                                 ct_slice_hu):
        from mies_tpu.io.dicom import JPEG_LOSSLESS_SV1

        a, b = tmp_path / "raw.dcm", tmp_path / "jll.dcm"
        write_dicom(a, ct_slice_hu)
        write_dicom(b, ct_slice_hu, transfer_syntax=JPEG_LOSSLESS_SV1)
        np.testing.assert_array_equal(
            read_dicom(a).pixels, read_dicom(b).pixels
        )
        assert b.stat().st_size < a.stat().st_size  # CT compresses

    def test_rescale_applied(self, tmp_path):
        from mies_tpu.io.dicom import JPEG_LOSSLESS_SV1

        raw = np.arange(0, 4096, dtype=np.uint16).reshape(64, 64)
        p = tmp_path / "r.dcm"
        write_dicom(p, raw, rescale_slope=1.0, rescale_intercept=-1024.0,
                    transfer_syntax=JPEG_LOSSLESS_SV1)
        s = read_dicom(p)
        assert s.pixels.dtype == np.int16
        assert s.pixels.min() == -1024 and s.pixels.max() == 3071

    def test_multiframe_roundtrip(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_LOSSLESS_SV1, read_dicom_frames

        frames = rng.integers(-1000, 2000, (4, 24, 32)).astype(np.int16)
        p = tmp_path / "mf.dcm"
        write_dicom(p, frames, transfer_syntax=JPEG_LOSSLESS_SV1)
        got, _ = read_dicom_frames(p)
        np.testing.assert_array_equal(got, frames)
        with pytest.raises(ValueError, match="multi-frame"):
            read_dicom(p)

    def test_codec_all_predictors_all_dtypes(self, rng):
        from mies_tpu.io.jpegll import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        cases = [
            rng.integers(0, 65536, (24, 31), dtype=np.uint16),
            rng.integers(0, 256, (16, 17), dtype=np.uint8),
            (np.add.outer(np.arange(20) * 7, np.arange(26) * 3) % 4000
             ).astype(np.uint16),
            np.full((8, 9), 777, np.uint16),
        ]
        for img in cases:
            for pred in range(1, 8):
                got = decode_jpeg_lossless(
                    encode_jpeg_lossless(img, predictor=pred)
                )
                np.testing.assert_array_equal(got, img)

    def test_codec_knife_edges(self, rng):
        from mies_tpu.io.jpegll import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        # SSSS=16: alternating 0/32768 forces the no-extra-bits code
        img = np.zeros((4, 8), np.uint16)
        img[:, 1::2] = 32768
        for pred in (1, 2, 4, 7):
            np.testing.assert_array_equal(
                decode_jpeg_lossless(encode_jpeg_lossless(
                    img, predictor=pred)), img)
        # 0xFF-dense data exercises byte stuffing
        img = rng.choice(
            np.asarray([0, 65535, 65280, 255], np.uint16), (32, 32))
        np.testing.assert_array_equal(
            decode_jpeg_lossless(encode_jpeg_lossless(img)), img)
        # 12-bit precision in a 16-bit container
        img12 = rng.integers(0, 4096, (20, 20), dtype=np.uint16)
        np.testing.assert_array_equal(
            decode_jpeg_lossless(encode_jpeg_lossless(
                img12, precision=12)), img12)
        # int16 encodes bit-preservingly as uint16
        s = rng.integers(-32768, 32767, (12, 12)).astype(np.int16)
        np.testing.assert_array_equal(
            decode_jpeg_lossless(encode_jpeg_lossless(s)),
            s.view(np.uint16))

    def test_codec_restart_intervals(self, rng):
        from mies_tpu.io.jpegll import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        img = rng.integers(0, 65536, (23, 17), dtype=np.uint16)
        for rr in (1, 4, 23, 40):  # incl. >rows and non-dividing
            np.testing.assert_array_equal(
                decode_jpeg_lossless(encode_jpeg_lossless(
                    img, restart_rows=rr)), img)

    def test_codec_error_paths(self, rng):
        from mies_tpu.io.jpegll import (
            decode_jpeg_lossless,
            encode_jpeg_lossless,
        )

        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_lossless(b"\x00\x01\x02\x03")
        blob = encode_jpeg_lossless(
            rng.integers(0, 100, (8, 8), dtype=np.uint16))
        with pytest.raises(ValueError, match="truncated|exhausted|scan"):
            decode_jpeg_lossless(blob[:20])
        # a lossy SOF0 must be refused by NAME
        lossy = bytearray(blob)
        i = lossy.find(b"\xff\xc3")
        lossy[i + 1] = 0xC0
        with pytest.raises(ValueError, match="SOF0"):
            decode_jpeg_lossless(bytes(lossy))

    def test_series_streams_and_native_fallback(self, tmp_path,
                                                ct_slice_hu):
        """A JPEG Lossless series loads ordered through BOTH volume
        paths — the native series reader falls back per-file to the
        Python decoder for syntaxes its C core doesn't know."""
        from mies_tpu.io.dicom import JPEG_LOSSLESS_SV1
        from mies_tpu.io.volume import open_volume_slabs

        for i, loc in enumerate([30.0, 10.0, 20.0]):
            write_dicom(tmp_path / f"s{i}.dcm",
                        (ct_slice_hu + i).astype(np.int16),
                        slice_location=loc,
                        transfer_syntax=JPEG_LOSSLESS_SV1)
        vol, meta = load_volume(tmp_path)
        assert vol.shape == (3, *ct_slice_hu.shape)
        np.testing.assert_array_equal(vol[0], ct_slice_hu + 1)
        m, slabs = open_volume_slabs(tmp_path, slab_size=2)
        got = np.concatenate(list(slabs), axis=0)
        np.testing.assert_array_equal(got, vol)

    def test_header_only_parse_skips_pixels(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import JPEG_LOSSLESS_SV1, read_dicom_header

        p = tmp_path / "h.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=JPEG_LOSSLESS_SV1,
                    pixel_spacing=(0.6, 0.6))
        h = read_dicom_header(p)
        assert h["rows"] == ct_slice_hu.shape[0]
        assert h["pixel_spacing"] == (0.6, 0.6)


class TestDeflated:
    """Deflated Explicit VR LE (1.2.840.10008.1.2.1.99) — the whole
    post-meta dataset is ONE raw-deflate stream (PS3.5 A.5), decode +
    encode via zlib; structured-report exports and some PACS archives
    use it."""

    def test_roundtrip_int16(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import DEFLATED_EXPLICIT_VR_LE

        p = tmp_path / "defl.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=DEFLATED_EXPLICIT_VR_LE,
                    instance_number=5, slice_location=-12.5,
                    pixel_spacing=(0.8, 0.8))
        s = read_dicom(p)
        np.testing.assert_array_equal(s.pixels, ct_slice_hu)
        assert s.transfer_syntax == DEFLATED_EXPLICIT_VR_LE
        assert s.instance_number == 5 and s.slice_location == -12.5
        assert s.pixel_spacing == (0.8, 0.8)

    def test_matches_uncompressed_and_compresses(self, tmp_path,
                                                 ct_slice_hu):
        from mies_tpu.io.dicom import DEFLATED_EXPLICIT_VR_LE

        a, b = tmp_path / "raw.dcm", tmp_path / "defl.dcm"
        write_dicom(a, ct_slice_hu)
        write_dicom(b, ct_slice_hu, transfer_syntax=DEFLATED_EXPLICIT_VR_LE)
        np.testing.assert_array_equal(
            read_dicom(a).pixels, read_dicom(b).pixels
        )
        assert b.stat().st_size < a.stat().st_size  # CT deflates well

    def test_raw_deflate_no_zlib_header(self, tmp_path, ct_slice_hu):
        """PS3.5 A.5 mandates RFC-1951 RAW deflate — the written byte
        stream must NOT carry an RFC-1950 zlib header (0x78 CMF)."""
        import zlib

        from mies_tpu.io.dicom import DEFLATED_EXPLICIT_VR_LE, _parse_meta

        p = tmp_path / "d.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=DEFLATED_EXPLICIT_VR_LE)
        data = p.read_bytes()
        ts, off = _parse_meta(data)
        assert ts == DEFLATED_EXPLICIT_VR_LE
        # raw-deflate inflates; zlib-wrapped decode must fail
        assert zlib.decompressobj(wbits=-15).decompress(data[off:])
        with pytest.raises(zlib.error):
            zlib.decompress(data[off:])

    def test_multiframe_and_rescale(self, tmp_path, rng):
        from mies_tpu.io.dicom import (
            DEFLATED_EXPLICIT_VR_LE,
            read_dicom_frames,
        )

        frames = rng.integers(0, 4096, (3, 16, 24)).astype(np.uint16)
        p = tmp_path / "mf.dcm"
        write_dicom(p, frames, transfer_syntax=DEFLATED_EXPLICIT_VR_LE,
                    rescale_slope=1.0, rescale_intercept=-1024.0)
        got, s = read_dicom_frames(p)
        assert got.dtype == np.int16
        np.testing.assert_array_equal(
            got, frames.astype(np.int32) - 1024)

    def test_header_only_parse(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import (
            DEFLATED_EXPLICIT_VR_LE,
            read_dicom_header,
        )

        p = tmp_path / "h.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=DEFLATED_EXPLICIT_VR_LE,
                    pixel_spacing=(0.9, 0.9))
        h = read_dicom_header(p)
        assert h["rows"] == ct_slice_hu.shape[0]
        assert h["pixel_spacing"] == (0.9, 0.9)

    def test_corrupt_stream_raises_valueerror(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import DEFLATED_EXPLICIT_VR_LE, _parse_meta

        p = tmp_path / "c.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=DEFLATED_EXPLICIT_VR_LE)
        data = bytearray(p.read_bytes())
        _, off = _parse_meta(bytes(data))
        data[off] ^= 0xFF  # wreck the first deflate block header
        p.write_bytes(bytes(data))
        with pytest.raises(ValueError, match="inflate|deflate|corrupt"):
            read_dicom(p)

    def test_series_streams_and_native_fallback(self, tmp_path,
                                                ct_slice_hu):
        """A deflated series loads ordered through BOTH volume paths —
        the native series reader falls back per-file to the Python
        decoder (its C core reports unsupported transfer syntax)."""
        from mies_tpu.io.dicom import DEFLATED_EXPLICIT_VR_LE
        from mies_tpu.io.volume import open_volume_slabs

        for i, loc in enumerate([30.0, 10.0, 20.0]):
            write_dicom(tmp_path / f"s{i}.dcm",
                        (ct_slice_hu + i).astype(np.int16),
                        slice_location=loc,
                        transfer_syntax=DEFLATED_EXPLICIT_VR_LE)
        vol, meta = load_volume(tmp_path)
        assert vol.shape == (3, *ct_slice_hu.shape)
        np.testing.assert_array_equal(vol[0], ct_slice_hu + 1)
        m, slabs = open_volume_slabs(tmp_path, slab_size=2)
        got = np.concatenate(list(slabs), axis=0)
        np.testing.assert_array_equal(got, vol)


class TestJpegDct:
    """JPEG Baseline / Extended (1.2.840.10008.1.2.4.50 / .4.51) — the
    T.81 sequential-DCT lossy codec (io/jpegdct.py), cross-checked
    against Pillow's libjpeg on 8-bit streams in BOTH directions."""

    @staticmethod
    def _smooth8(rng, shape=(96, 120)):
        y, x = np.mgrid[0 : shape[0], 0 : shape[1]].astype(np.float64)
        img = 128 + 70 * np.sin(x / 9.0) * np.cos(y / 7.0)
        return (img + rng.normal(0, 4, shape)).clip(0, 255).astype(np.uint8)

    def test_pil_decodes_our_stream_within_1(self, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct, encode_jpeg_dct

        img = self._smooth8(rng)
        for q, rb in ((90, None), (55, 7), (95, 1)):
            blob = encode_jpeg_dct(img, quality=q, restart_blocks=rb)
            ours = decode_jpeg_dct(blob)
            pil = np.asarray(Image.open(_io.BytesIO(blob)))
            assert pil.shape == img.shape
            # libjpeg's fixed-point islow IDCT vs our float64 IDCT:
            # T.81-conformance-style agreement is within one level
            assert np.abs(pil.astype(int) - ours.astype(int)).max() <= 1

    def test_we_decode_pil_stream_within_1(self, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct

        img = self._smooth8(rng, (101, 67))  # non-multiple-of-8 dims
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=80)
        foreign = buf.getvalue()
        ours = decode_jpeg_dct(foreign)
        theirs = np.asarray(Image.open(_io.BytesIO(foreign)))
        assert ours.shape == img.shape
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1

    def test_12bit_roundtrip_quality(self, rng):
        from mies_tpu.io.jpegdct import decode_jpeg_dct, encode_jpeg_dct

        y, x = np.mgrid[0:64, 0:80].astype(np.float64)
        img = (2048 + 900 * np.sin(x / 8.0) * np.cos(y / 6.0)).astype(
            np.uint16
        )
        blob = encode_jpeg_dct(img, quality=95)
        dec = decode_jpeg_dct(blob)
        assert dec.dtype == np.uint16 and dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        # ~4.5 mean on a 0..4095 scale (≈0.1%) at q95 — lossy contract
        assert err.mean() < 8 and err.max() < 40

    def test_quality_monotonic(self, rng):
        from mies_tpu.io.jpegdct import decode_jpeg_dct, encode_jpeg_dct

        img = self._smooth8(rng)
        lo = encode_jpeg_dct(img, quality=10)
        hi = encode_jpeg_dct(img, quality=95)
        assert len(lo) < len(hi)
        e_lo = np.abs(decode_jpeg_dct(lo).astype(int) - img.astype(int))
        e_hi = np.abs(decode_jpeg_dct(hi).astype(int) - img.astype(int))
        assert e_hi.mean() < e_lo.mean()

    def test_refusals_named(self, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct, encode_jpeg_dct

        img = self._smooth8(rng, (32, 32))
        # progressive -> SOF2, named
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", progressive=True)
        with pytest.raises(ValueError, match="progressive"):
            decode_jpeg_dct(buf.getvalue())
        # 3-component color DECODES since round 5 (VERDICT r4 item 7):
        # a gray image saved as RGB JPEG comes back near-gray RGB
        buf = _io.BytesIO()
        Image.fromarray(
            np.stack([img] * 3, axis=-1)
        ).save(buf, "JPEG", quality=80)
        rgb = decode_jpeg_dct(buf.getvalue())
        assert rgb.shape == img.shape + (3,) and rgb.dtype == np.uint8
        # 4-component (CMYK Adobe) stays refused by name
        cbuf = _io.BytesIO()
        Image.fromarray(
            np.stack([img] * 4, axis=-1), "CMYK"
        ).save(cbuf, "JPEG", quality=80)
        with pytest.raises(NotImplementedError, match="4-component"):
            decode_jpeg_dct(cbuf.getvalue())
        # lossless SOF3 belongs to the other codec
        from mies_tpu.io.jpegll import encode_jpeg_lossless

        with pytest.raises(ValueError, match="SOF3"):
            decode_jpeg_dct(encode_jpeg_lossless(img))
        # truncation + garbage
        blob = encode_jpeg_dct(img)
        with pytest.raises(ValueError, match="truncated|SOS"):
            decode_jpeg_dct(blob[:24])
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_dct(b"\x00" * 16)
        # encoder input validation
        with pytest.raises(TypeError, match="int16"):
            encode_jpeg_dct(img.astype(np.int16))
        with pytest.raises(ValueError, match="12-bit|range"):
            encode_jpeg_dct(
                np.full((8, 8), 5000, np.uint16), precision=12
            )

    def test_dicom_baseline_roundtrip(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_BASELINE

        img = self._smooth8(rng)
        p = tmp_path / "us.dcm"
        write_dicom(p, img, transfer_syntax=JPEG_BASELINE, jpeg_quality=92,
                    instance_number=2)
        s = read_dicom(p)
        assert s.transfer_syntax == JPEG_BASELINE
        assert s.pixels.dtype == np.uint8
        err = np.abs(s.pixels.astype(int) - img.astype(int))
        assert err.mean() < 3  # lossy but close at q92

    def test_dicom_extended_12bit(self, tmp_path):
        from mies_tpu.io.dicom import JPEG_EXTENDED

        y, x = np.mgrid[0:48, 0:56].astype(np.float64)
        img = (1000 + 800 * np.sin(x / 7.0) * np.cos(y / 5.0)).astype(
            np.uint16
        )
        p = tmp_path / "ct12.dcm"
        write_dicom(p, img, transfer_syntax=JPEG_EXTENDED, jpeg_quality=97,
                    bits_stored=12)
        s = read_dicom(p)
        assert s.pixels.dtype == np.uint16
        assert s.bits_stored == 12
        err = np.abs(s.pixels.astype(int) - img.astype(int))
        assert err.mean() < 6

    def test_dicom_lossy_writer_guards(self, tmp_path, rng, ct_slice_hu):
        from mies_tpu.io.dicom import JPEG_BASELINE, JPEG_EXTENDED

        with pytest.raises(TypeError, match="8-bit"):
            write_dicom(tmp_path / "a.dcm",
                        rng.integers(0, 4096, (8, 8)).astype(np.uint16),
                        transfer_syntax=JPEG_BASELINE)
        with pytest.raises(TypeError, match="signed|int16"):
            write_dicom(tmp_path / "b.dcm", ct_slice_hu,
                        transfer_syntax=JPEG_EXTENDED)
        with pytest.raises(ValueError, match="4096"):
            write_dicom(tmp_path / "c.dcm",
                        np.full((8, 8), 4100, np.uint16),
                        transfer_syntax=JPEG_EXTENDED)

    def test_dicom_multiframe_and_series(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_BASELINE, read_dicom_frames
        from mies_tpu.io.volume import open_volume_slabs

        frames = np.stack([self._smooth8(rng, (40, 48)) for _ in range(3)])
        p = tmp_path / "cine.dcm"
        write_dicom(p, frames, transfer_syntax=JPEG_BASELINE)
        got, s = read_dicom_frames(p)
        assert got.shape == frames.shape
        assert np.abs(
            got.astype(int) - frames.astype(int)).mean() < 3
        # a lossy series streams through the volume path (native parser
        # falls back per-file to the Python decoder)
        d = tmp_path / "series"
        d.mkdir()
        for i in range(3):
            write_dicom(d / f"s{i}.dcm", self._smooth8(rng, (40, 48)),
                        slice_location=float(i * 10),
                        transfer_syntax=JPEG_BASELINE)
        vol, meta = load_volume(d)
        assert vol.shape == (3, 40, 48)
        m, slabs = open_volume_slabs(d, slab_size=2)
        got2 = np.concatenate(list(slabs), axis=0)
        np.testing.assert_array_equal(got2, vol)


class TestJpegLs:
    """JPEG-LS (1.2.840.10008.1.2.4.80 / .4.81) — the T.87 LOCO-I codec
    (io/jpegls.py): regular + run modes, bit stuffing, near-lossless
    error bound, DICOM integration. No JPEG-LS library exists in this
    environment; the contract is spec-derived round-trip identity plus
    the CharLS pin replay (tools/verify_jpegls_golden.py) when one is
    available."""

    def test_roundtrip_classes(self, rng):
        from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls

        cases = [
            rng.integers(0, 256, (33, 47)).astype(np.uint8),  # noise
            np.zeros((20, 30), np.uint8),                      # pure run
            np.full((7, 1), 255, np.uint8),                    # 1-wide
            np.full((1, 9), 3, np.uint8),                      # 1-tall
            np.array([[0]], np.uint8),                         # 1x1
            (np.indices((40, 56)).sum(0) % 256).astype(np.uint8),
            rng.integers(0, 65536, (24, 40)).astype(np.uint16),
            (np.indices((30, 30)).sum(0) * 37 % 4096).astype(np.uint16),
        ]
        for img in cases:
            prec = 12 if img.dtype == np.uint16 and img.max() < 4096 \
                else None
            blob = encode_jpegls(img, precision=prec)
            np.testing.assert_array_equal(decode_jpegls(blob), img)

    def test_run_mode_interruptions(self, rng):
        """Runs broken at every relative position: end-of-line runs,
        single-sample interruptions, RItype 0 and 1 (a == b vs a != b),
        and runs spanning full segment boundaries (J-table growth)."""
        from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls

        img = np.zeros((16, 200), np.uint8)
        img[3, 199] = 9     # run to one-before-EOL, RItype by b
        img[4, 0] = 9       # interruption immediately at line start
        img[7, 100:] = 77   # half-line run into a new value
        img[9] = 5          # full-line run after a different line
        np.testing.assert_array_equal(
            decode_jpegls(encode_jpegls(img)), img)
        # long constant image exercises RUNindex growth to J=15
        big = np.full((64, 512), 200, np.uint8)
        big[63, 511] = 0
        np.testing.assert_array_equal(
            decode_jpegls(encode_jpegls(big)), big)

    def test_bit_stuffing_knife_edge(self):
        """Content engineered to emit 0xFF bytes in the scan stream —
        the decoder must consume the stuffed 0 bit after each."""
        from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls

        rng = np.random.default_rng(7)
        for seed in range(8):
            img = np.random.default_rng(seed).integers(
                0, 65536, (17, 23)).astype(np.uint16)
            blob = encode_jpegls(img)
            if b"\xff" in blob[20:-2]:  # scan contains 0xFF bytes
                np.testing.assert_array_equal(decode_jpegls(blob), img)

    def test_near_lossless_bound(self, rng):
        from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls

        img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
        for near in (1, 3, 7):
            dec = decode_jpegls(encode_jpegls(img, near=near))
            err = np.abs(dec.astype(int) - img.astype(int)).max()
            assert err <= near  # T.87's per-sample guarantee
        # smaller NEAR -> larger stream
        assert len(encode_jpegls(img, near=7)) < len(
            encode_jpegls(img, near=1)) < len(encode_jpegls(img))

    def test_int16_bit_preserving(self, rng):
        from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls

        s = rng.integers(-32768, 32767, (12, 18)).astype(np.int16)
        np.testing.assert_array_equal(
            decode_jpegls(encode_jpegls(s)), s.view(np.uint16))

    def test_error_paths(self, rng):
        from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls

        with pytest.raises(ValueError, match="SOI"):
            decode_jpegls(b"\x01\x02\x03\x04")
        img = rng.integers(0, 256, (8, 8)).astype(np.uint8)
        blob = encode_jpegls(img)
        # an SOF0 stream is refused by name
        from mies_tpu.io.jpegdct import encode_jpeg_dct

        with pytest.raises(ValueError, match="SOF0"):
            decode_jpegls(encode_jpeg_dct(img))
        with pytest.raises(ValueError, match="truncated|SOS"):
            decode_jpegls(blob[:12])
        with pytest.raises(ValueError, match="near"):
            encode_jpegls(img, near=-1)
        with pytest.raises(ValueError, match="range"):
            encode_jpegls(
                np.full((4, 4), 300, np.uint16), precision=8)

    def test_dicom_lossless_roundtrip(self, tmp_path, ct_slice_hu):
        from mies_tpu.io.dicom import JPEG_LS_LOSSLESS

        p = tmp_path / "ls.dcm"
        write_dicom(p, ct_slice_hu, transfer_syntax=JPEG_LS_LOSSLESS,
                    instance_number=4, slice_location=2.5)
        s = read_dicom(p)
        np.testing.assert_array_equal(s.pixels, ct_slice_hu)
        assert s.transfer_syntax == JPEG_LS_LOSSLESS
        assert s.instance_number == 4

    def test_dicom_near_lossless(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_LS_NEAR

        img = rng.integers(0, 256, (32, 40)).astype(np.uint8)
        p = tmp_path / "nl.dcm"
        write_dicom(p, img, transfer_syntax=JPEG_LS_NEAR, jpegls_near=3)
        s = read_dicom(p)
        assert np.abs(
            s.pixels.astype(int) - img.astype(int)).max() <= 3
        # syntax/near consistency guards
        with pytest.raises(ValueError, match="NEAR=0"):
            write_dicom(tmp_path / "x.dcm", img,
                        transfer_syntax="1.2.840.10008.1.2.4.80",
                        jpegls_near=2)
        with pytest.raises(ValueError, match=">= 1"):
            write_dicom(tmp_path / "y.dcm", img,
                        transfer_syntax=JPEG_LS_NEAR, jpegls_near=0)

    def test_dicom_multiframe_and_series(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_LS_LOSSLESS, read_dicom_frames
        from mies_tpu.io.volume import open_volume_slabs

        frames = rng.integers(-500, 1500, (3, 16, 20)).astype(np.int16)
        p = tmp_path / "mf.dcm"
        write_dicom(p, frames, transfer_syntax=JPEG_LS_LOSSLESS)
        got, _ = read_dicom_frames(p)
        np.testing.assert_array_equal(got, frames)
        # series streams through the volume path; native parser falls
        # back per-file to the Python decoder
        d = tmp_path / "series"
        d.mkdir()
        base = rng.integers(-100, 400, (12, 16)).astype(np.int16)
        for i in range(3):
            write_dicom(d / f"s{i}.dcm", (base + i).astype(np.int16),
                        slice_location=float(30 - i * 10),
                        transfer_syntax=JPEG_LS_LOSSLESS)
        vol, meta = load_volume(d)
        assert vol.shape == (3, 12, 16)
        np.testing.assert_array_equal(vol[0], base + 2)
        m, slabs = open_volume_slabs(d, slab_size=2)
        np.testing.assert_array_equal(
            np.concatenate(list(slabs), axis=0), vol)


def test_jpegls_pin_replay():
    """Replays tests/goldens/jpegls_pin.npz (written by
    tools/verify_jpegls_golden.py in a CharLS-capable environment):
    our decoder must reproduce the REAL codec's streams bit-exactly —
    interoperability, not just self round-trip."""
    from pathlib import Path

    from mies_tpu.io.jpegls import decode_jpegls

    pin_path = Path(__file__).parent / "goldens" / "jpegls_pin.npz"
    if not pin_path.exists():
        pytest.skip(
            "no jpegls_pin.npz yet — run tools/verify_jpegls_golden.py "
            "in an environment with imagecodecs or pillow-jpls"
        )
    pins = np.load(pin_path)
    names = sorted({k.split("__")[0] for k in pins.files})
    for name in names:
        img = pins[f"{name}__img"]
        blob = pins[f"{name}__blob"].tobytes()
        near = int(pins[f"{name}__near"])
        dec = decode_jpegls(blob)
        if near == 0:
            np.testing.assert_array_equal(dec, img)
        else:
            assert np.abs(
                dec.astype(int) - img.astype(int)).max() <= near


class TestBigEndian:
    """Explicit VR Big Endian (1.2.840.10008.1.2.2, retired) — READ
    support for legacy archives: tag/length fields and fixed-width
    binary values (US/OW/...) parse big-endian and are normalized to
    LE at the reader layer, so every downstream path is unchanged."""

    @staticmethod
    def _be_file(tmp_path, px: np.ndarray, intercept: float | None
                 ) -> "Path":
        import struct as st

        from mies_tpu.io.dicom import EXPLICIT_VR_BE, _el_short

        def short(tag, vr, v):
            return st.pack(">HH", *tag) + vr + st.pack(">H", len(v)) + v

        def long_(tag, vr, v):
            return (st.pack(">HH", *tag) + vr + b"\x00\x00"
                    + st.pack(">I", len(v)) + v)

        ts = EXPLICIT_VR_BE.encode() + b"\x00"  # odd length, null pad
        meta_body = _el_short((0x0002, 0x0010), b"UI", ts)
        meta = _el_short(
            (0x0002, 0x0000), b"UL", st.pack("<I", len(meta_body))
        ) + meta_body
        rows, cols = px.shape
        ds = short((0x0028, 0x0010), b"US", st.pack(">H", rows))
        ds += short((0x0028, 0x0011), b"US", st.pack(">H", cols))
        ds += short((0x0028, 0x0100), b"US", st.pack(">H", 16))
        ds += short((0x0028, 0x0103), b"US",
                    st.pack(">H", 1 if px.dtype == np.int16 else 0))
        if intercept is not None:
            ds += short((0x0028, 0x1052), b"DS", b"-1024 ")
            ds += short((0x0028, 0x1053), b"DS", b"1 ")
        ds += long_((0x7FE0, 0x0010), b"OW",
                    px.astype(px.dtype.newbyteorder(">")).tobytes())
        p = tmp_path / "be.dcm"
        p.write_bytes(b"\x00" * 128 + b"DICM" + meta + ds)
        return p

    def test_int16_pixels_and_tags(self, tmp_path, rng):
        px = rng.integers(-2000, 3000, (19, 27)).astype(np.int16)
        p = self._be_file(tmp_path, px, intercept=None)
        s = read_dicom(p)
        np.testing.assert_array_equal(s.pixels, px)
        assert (s.rows, s.cols) == (19, 27)
        assert s.transfer_syntax == "1.2.840.10008.1.2.2"

    def test_rescale_text_values(self, tmp_path, rng):
        px = rng.integers(0, 4096, (8, 8)).astype(np.uint16)
        p = self._be_file(tmp_path, px, intercept=-1024.0)
        s = read_dicom(p)
        assert s.pixels.dtype == np.int16
        np.testing.assert_array_equal(
            s.pixels, px.astype(np.int32) - 1024)

    def test_header_only(self, tmp_path, rng):
        from mies_tpu.io.dicom import read_dicom_header

        px = rng.integers(0, 100, (12, 34)).astype(np.uint16)
        h = read_dicom_header(self._be_file(tmp_path, px, None))
        assert h["rows"] == 12 and h["cols"] == 34


def test_jpegls_native_matches_python(tmp_path, rng):
    """The C++ T.87 decoder (native/dicomfast.cpp::jls_decode_frame) is
    bit-exact vs io/jpegls.py on the series hot path (~110x faster —
    the Python coder is sample-sequential)."""
    from mies_tpu import native
    from mies_tpu.io.dicom import JPEG_LS_LOSSLESS, JPEG_LS_NEAR

    if not native.available():
        pytest.skip("native parser unavailable")
    cases = [
        rng.integers(-2000, 3000, (33, 47)).astype(np.int16),
        np.zeros((20, 30), np.int16),
        rng.integers(0, 256, (25, 31)).astype(np.uint8),
        ((np.indices((40, 56)).sum(0) * 13) % 4096 - 1000).astype(
            np.int16),
    ]
    for i, img in enumerate(cases):
        p = tmp_path / f"n{i}.dcm"
        write_dicom(p, img, transfer_syntax=JPEG_LS_LOSSLESS,
                    slice_location=float(i))
        nat, _ = native.read_dicom_native(p)
        np.testing.assert_array_equal(nat, read_dicom(p).pixels)
    # near-lossless decodes identically too
    img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
    p = tmp_path / "near.dcm"
    write_dicom(p, img, transfer_syntax=JPEG_LS_NEAR, jpegls_near=2)
    nat, _ = native.read_dicom_native(p)
    np.testing.assert_array_equal(nat, read_dicom(p).pixels)
    # a JPEG-LS series stays on the native fast path end to end
    d = tmp_path / "series"
    d.mkdir()
    base = rng.integers(-100, 400, (16, 24)).astype(np.int16)
    for i in range(3):
        write_dicom(d / f"s{i}.dcm", (base + i).astype(np.int16),
                    slice_location=float(i * 5),
                    transfer_syntax=JPEG_LS_LOSSLESS)
    vol = native.read_dicom_series_native(d)
    np.testing.assert_array_equal(vol[2], base + 2)


class TestJPEG2K:
    """JPEG 2000 (1.2.840.10008.1.2.4.90/.91) — the ISO 15444-1 EBCOT
    decoder in io/jpeg2k.py.  Unlike the CharLS/kornia pins, the golden
    SOURCE is in-tree: Pillow's OpenJPEG binding encodes AND decodes in
    this environment, so every case is generated and cross-checked
    live (reversible must match bit-exactly, irreversible within one
    code value — float evaluation order)."""

    @staticmethod
    def _enc(a, **kw):
        import io as _io

        from PIL import Image

        b = _io.BytesIO()
        if a.dtype == np.uint8:
            im = Image.fromarray(a)
        else:
            im = Image.fromarray(a.astype(np.int32), mode="I").convert(
                "I;16")
        im.save(b, format="JPEG2000", **kw)
        return b.getvalue()

    @staticmethod
    def _pillow_dec(blob):
        import io as _io

        from PIL import Image

        return np.array(Image.open(_io.BytesIO(blob)))

    def test_reversible_bit_exact(self, rng):
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        for shape in [(32, 32), (61, 47), (1, 17), (16, 1), (5, 5),
                      (96, 64)]:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            out = decode_jpeg2k(self._enc(img, irreversible=False),
                                f"rev{shape}")
            np.testing.assert_array_equal(out, img)

    def test_reversible_16bit(self, rng):
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        for hi in (4096, 65536):  # 12-bit CT range and full 16-bit
            img = rng.integers(0, hi, (48, 33)).astype(np.uint16)
            out = decode_jpeg2k(self._enc(img, irreversible=False),
                                f"u16-{hi}")
            np.testing.assert_array_equal(out, img)

    def test_irreversible_within_one(self, rng):
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        y, x = np.mgrid[0:64, 0:64].astype(np.float64)
        img = ((np.sin(x / 7) + np.cos(y / 5) + 2) / 4 * 255
               + rng.normal(0, 4, (64, 64))).clip(0, 255).astype(np.uint8)
        blob = self._enc(img, irreversible=True)
        out = decode_jpeg2k(blob, "irr")
        golden = self._pillow_dec(blob)
        assert np.abs(
            out.astype(np.int64) - golden.astype(np.int64)).max() <= 1

    def test_structural_variants_bit_exact(self, rng):
        """Tiles, every progression order, quality layers, small
        codeblocks, explicit precincts, shallow resolution count."""
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
        variants = [
            dict(tile_size=(32, 32)),
            dict(progression="RLCP"),
            dict(progression="RPCL"),
            dict(progression="PCRL"),
            dict(progression="CPRL"),
            dict(codeblock_size=(16, 16)),
            dict(precinct_size=(64, 64)),
            dict(num_resolutions=2),
        ]
        for kw in variants:
            blob = self._enc(img, irreversible=False, **kw)
            out = decode_jpeg2k(blob, str(kw))
            np.testing.assert_array_equal(out, img, err_msg=str(kw))

    def test_rate_limited_layers_match_pillow(self, rng):
        """Truncation path: lossy quality layers decode to exactly what
        OpenJPEG reconstructs (reversible wavelet, half-bin midpoints
        differ by at most one code value in float order)."""
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        y, x = np.mgrid[0:64, 0:64].astype(np.float64)
        img = ((np.sin(x / 9) * np.cos(y / 6) + 1) / 2 * 255).astype(
            np.uint8)
        blob = self._enc(img, irreversible=False, quality_mode="rates",
                         quality_layers=[20, 5, 1])
        out = decode_jpeg2k(blob, "layers")
        golden = self._pillow_dec(blob)
        np.testing.assert_array_equal(out, golden)

    def test_raw_codestream_and_jp2_container(self, rng):
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        img = rng.integers(0, 256, (24, 40)).astype(np.uint8)
        jp2 = self._enc(img, irreversible=False)
        raw = self._enc(img, irreversible=False, no_jp2=True)
        assert raw[:2] == b"\xff\x4f" and jp2[:2] != b"\xff\x4f"
        np.testing.assert_array_equal(decode_jpeg2k(jp2, "jp2"), img)
        np.testing.assert_array_equal(decode_jpeg2k(raw, "raw"), img)

    def test_truncated_midpacket_decodes_prefix(self, rng):
        # decode-what-is-present: a file cut ANYWHERE past the main
        # header (mid-packet-header, mid-body, between packets) keeps
        # the packets already decoded instead of raising — the same
        # contract _collect_tileparts applies to a cut last tile-part
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        img = rng.integers(0, 4096, (48, 56)).astype(np.uint16)
        blob = self._enc(img, irreversible=False)
        full = decode_jpeg2k(blob, "full")
        np.testing.assert_array_equal(full, img)
        for frac in (0.55, 0.7, 0.85, 0.97):
            cut = blob[:int(len(blob) * frac)]
            out = decode_jpeg2k(cut, f"cut{frac}")
            assert out.shape == img.shape and out.dtype == full.dtype

    def test_mb_over_31_refused_by_name(self, rng):
        # a QCD declaring guard+exponent-1 > 31 magnitude bitplanes
        # must be a named refusal, not an int overflow deep in Tier-1
        from mies_tpu.io.jpeg2k import decode_jpeg2k

        img = rng.integers(0, 4096, (16, 16)).astype(np.uint16)
        blob = bytearray(self._enc(img, irreversible=False))
        i = blob.find(b"\xff\x5c")
        assert i >= 0
        seglen = int.from_bytes(blob[i + 2:i + 4], "big")
        blob[i + 4] = 0xE0  # Sqcd: style 0 (no quant), 7 guard bits
        for j in range(i + 5, i + 2 + seglen):
            blob[j] = 0xF8  # every band exponent -> 31
        with pytest.raises(ValueError, match="Mb"):
            decode_jpeg2k(bytes(blob), "mb32")

    def test_refusals_name_the_feature(self, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpeg2k import decode_jpeg2k

        # 3-component RGB DECODES since round 5 (VERDICT r4 item 7):
        # bit-exact vs the original for a lossless Pillow stream
        b = _io.BytesIO()
        rgb = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        Image.fromarray(rgb).save(b, format="JPEG2000",
                                  irreversible=False)
        np.testing.assert_array_equal(
            decode_jpeg2k(b.getvalue(), "rgb"), rgb)
        with pytest.raises(ValueError, match="not JPEG 2000|SOC"):
            decode_jpeg2k(b"\x00\x01\x02\x03\x04", "junk")

    def test_dicom_roundtrip_int16_hu(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_2000_LOSSLESS

        raw = rng.integers(0, 4096, (64, 80)).astype(np.uint16)
        p = tmp_path / "j2k.dcm"
        write_dicom(p, raw, transfer_syntax=JPEG_2000_LOSSLESS,
                    encoded_frames=[self._enc(raw, irreversible=False)],
                    rescale_slope=1.0, rescale_intercept=-1024.0)
        s = read_dicom(p)
        assert s.transfer_syntax == JPEG_2000_LOSSLESS
        assert s.pixels.dtype == np.int16
        np.testing.assert_array_equal(
            s.pixels, raw.astype(np.int32) - 1024)

    def test_dicom_multiframe(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_2000_LOSSLESS, read_dicom_frames

        frames = rng.integers(0, 256, (3, 32, 32)).astype(np.uint8)
        p = tmp_path / "j2km.dcm"
        write_dicom(
            p, frames, transfer_syntax=JPEG_2000_LOSSLESS,
            encoded_frames=[self._enc(f, irreversible=False)
                            for f in frames],
        )
        np.testing.assert_array_equal(read_dicom_frames(p)[0], frames)

    def test_dicom_series_streams_via_python_fallback(self, tmp_path, rng):
        """A J2K series loads through load_volume: the native parser
        refuses the syntax per-file and the Python twin decodes."""
        from mies_tpu.io.dicom import JPEG_2000_LOSSLESS
        from mies_tpu.io.volume import load_volume

        d = tmp_path / "series"
        d.mkdir()
        base = rng.integers(0, 1200, (16, 24)).astype(np.uint16)
        for i in range(3):
            fr = (base + i).astype(np.uint16)
            write_dicom(
                d / f"s{i}.dcm", fr, transfer_syntax=JPEG_2000_LOSSLESS,
                encoded_frames=[self._enc(fr, irreversible=False)],
                slice_location=float(i * 5),
                rescale_slope=1.0, rescale_intercept=-1024.0,
            )
        vol, _meta = load_volume(d)
        assert vol.shape == (3, 16, 24)
        np.testing.assert_array_equal(
            vol[1], base.astype(np.int32) - 1024 + 1)

    def test_encode_passthrough_contracts(self, tmp_path, rng):
        # .4.91 (lossy, no in-tree rate control) still needs the
        # passthrough and its refusal points at the native .4.90 path;
        # the passthrough's own validation stays
        from mies_tpu.io.dicom import JPEG_2000, JPEG_2000_LOSSLESS

        img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        with pytest.raises(NotImplementedError, match=r"\.4\.90"):
            write_dicom(tmp_path / "x.dcm", img,
                        transfer_syntax=JPEG_2000)
        with pytest.raises(ValueError, match="encoded_frames"):
            write_dicom(tmp_path / "y.dcm", img,
                        encoded_frames=[b"zz"])  # uncompressed syntax
        with pytest.raises(ValueError, match="frame"):
            write_dicom(tmp_path / "z.dcm", img,
                        transfer_syntax=JPEG_2000_LOSSLESS,
                        encoded_frames=[b"a", b"b"])  # count mismatch


class TestJPEG2KEncode:
    """The reversible-5/3 encoder (io/jpeg2k.py::encode_jpeg2k, VERDICT
    r4 item 3): decode(encode(x)) bit-exact through BOTH the in-tree
    decoder and Pillow/OpenJPEG (the golden source lives in-tree, like
    the decode direction); native .4.90 DICOM writes round-trip."""

    @staticmethod
    def _pil_dec(blob, depth):
        import io as _io

        from PIL import Image

        arr = np.asarray(Image.open(_io.BytesIO(blob)))
        # Pillow scales sub-container depths to the full 8/16-bit range
        sh = 8 * arr.dtype.itemsize - depth
        a = arr.astype(np.int64)
        return a >> sh if sh > 0 else a

    def test_roundtrip_bit_exact_both_decoders(self, rng):
        from mies_tpu.io.jpeg2k import decode_jpeg2k, encode_jpeg2k

        for shape in [(48, 56), (64, 64), (65, 64), (1, 1), (1, 17),
                      (16, 1), (3, 5), (96, 130)]:
            img = rng.integers(0, 256, shape).astype(np.uint8)
            blob = encode_jpeg2k(img, ctx=f"e{shape}")
            np.testing.assert_array_equal(
                decode_jpeg2k(blob, f"e{shape}"), img)
            np.testing.assert_array_equal(
                self._pil_dec(blob, 8), img.astype(np.int64))

    def test_depths_and_signedness(self, rng):
        from mies_tpu.io.jpeg2k import decode_jpeg2k, encode_jpeg2k

        for depth, dt in ((12, np.uint16), (16, np.uint16),
                          (1, np.uint8), (7, np.uint8)):
            img = rng.integers(0, 1 << depth, (40, 44)).astype(dt)
            blob = encode_jpeg2k(img, depth=depth, ctx=f"d{depth}")
            out = decode_jpeg2k(blob, f"d{depth}")
            np.testing.assert_array_equal(out, img.astype(out.dtype))
            np.testing.assert_array_equal(
                self._pil_dec(blob, depth), img.astype(np.int64))
        ct = rng.integers(-1024, 3072, (33, 47)).astype(np.int16)
        blob = encode_jpeg2k(ct, depth=13, ctx="signed")
        out = decode_jpeg2k(blob, "signed")
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out, ct)

    def test_refusals_name_the_problem(self, rng):
        from mies_tpu.io.jpeg2k import encode_jpeg2k

        with pytest.raises(ValueError, match="2-D"):
            encode_jpeg2k(np.zeros((2, 3, 4), np.uint8))
        with pytest.raises(ValueError, match="dtype"):
            encode_jpeg2k(np.zeros((4, 4), np.float32))
        with pytest.raises(ValueError, match="exceed"):
            encode_jpeg2k(
                np.full((4, 4), 300, np.uint16), depth=8)
        with pytest.raises(ValueError, match="depth"):
            encode_jpeg2k(np.zeros((4, 4), np.uint8), depth=17)

    def test_dicom_native_j2k_write(self, tmp_path, rng):
        # the lossless-archive round trip the VERDICT named: write
        # .4.90 WITHOUT encoded_frames, read back bit-exact
        from mies_tpu.io.dicom import (JPEG_2000_LOSSLESS, read_dicom,
                                       read_dicom_frames)

        ct = rng.integers(-1024, 3072, (64, 80)).astype(np.int16)
        p = tmp_path / "ct.dcm"
        write_dicom(p, ct, transfer_syntax=JPEG_2000_LOSSLESS,
                    bits_stored=13)
        sl = read_dicom(p)
        np.testing.assert_array_equal(sl.pixels, ct)
        mf = rng.integers(0, 256, (3, 32, 48)).astype(np.uint8)
        p2 = tmp_path / "mf.dcm"
        write_dicom(p2, mf, transfer_syntax=JPEG_2000_LOSSLESS)
        arr, _meta = read_dicom_frames(p2)
        np.testing.assert_array_equal(np.asarray(arr), mf)
        # bits_stored too small for the data is a named refusal
        with pytest.raises(ValueError, match="exceed"):
            write_dicom(tmp_path / "bad.dcm", ct,
                        transfer_syntax=JPEG_2000_LOSSLESS,
                        bits_stored=8)

    def test_header_ff_stuffing_roundtrip(self, rng):
        # sweep many random frames so some packet headers end on/near
        # 0xFF — exercises the writer's stuffed-byte flush AND the
        # decoder's align() skip (the opj_bio_inalign rule found while
        # building the encoder)
        from mies_tpu.io.jpeg2k import decode_jpeg2k, encode_jpeg2k

        for t in range(12):
            h = int(rng.integers(1, 90))
            w = int(rng.integers(1, 90))
            img = rng.integers(0, 4096, (h, w)).astype(np.uint16)
            blob = encode_jpeg2k(img, depth=12, ctx=f"s{t}")
            np.testing.assert_array_equal(
                decode_jpeg2k(blob, f"s{t}"), img)
            np.testing.assert_array_equal(
                self._pil_dec(blob, 12), img.astype(np.int64))


class TestHdf5:
    """Pure-Python HDF5 reader (io/hdf5.py, VERDICT r4 item 9) — the
    golden source lives in-tree: h5py/libhdf5 writes REAL files in
    this environment, so every case pins against the actual library
    (the same live-golden stance as the J2K codec vs Pillow)."""

    @pytest.fixture(autouse=True)
    def _h5py(self):
        # function-scope importorskip: a CLASS-body importorskip raises
        # Skipped during module import and would silently skip ALL of
        # test_io.py in an h5py-less environment (review finding)
        self.h5py = pytest.importorskip("h5py")

    def _roundtrip(self, tmp_path, name, want, **dset_kw):
        from mies_tpu.io.hdf5 import read_hdf5_volume

        p = tmp_path / f"{name}.nc"
        with self.h5py.File(p, "w", **dset_kw.pop("file_kw", {})) as f:
            f.create_dataset("vol", data=want, **dset_kw)
        vol, vn = read_hdf5_volume(p)
        assert vn == "vol"
        np.testing.assert_array_equal(vol, want)
        return vol

    def test_contiguous_dtypes(self, tmp_path, rng):
        for i, dt in enumerate(("int16", "uint8", "uint16", "float32",
                                "float64", ">i2", ">f4")):
            want = (rng.random((6, 8, 10)) * 100).astype(dt)
            got = self._roundtrip(tmp_path, f"c{i}", want)
            # values exact; byte order normalized to native
            assert got.dtype == np.dtype(dt).newbyteorder("=")

    def test_chunked_gzip_shuffle_fletcher(self, tmp_path, rng):
        want = rng.integers(-1024, 3072, (11, 24, 40)).astype(np.int16)
        self._roundtrip(tmp_path, "gz", want, chunks=(4, 16, 16),
                        compression="gzip", shuffle=True)
        self._roundtrip(tmp_path, "gz9", want, chunks=(3, 24, 40),
                        compression="gzip", compression_opts=9,
                        fletcher32=True)
        self._roundtrip(tmp_path, "plain", want, chunks=(5, 7, 13))

    def test_libver_latest(self, tmp_path, rng):
        # v3 superblock, OHDR v2 headers, link messages, layout v4
        # (contiguous AND the Fixed Array chunk index)
        want = rng.random((6, 8, 10)).astype(np.float32)
        self._roundtrip(tmp_path, "l1", want,
                        file_kw={"libver": "latest"})
        self._roundtrip(tmp_path, "l2", want, chunks=(2, 4, 5),
                        compression="gzip",
                        file_kw={"libver": "latest"})

    def test_netcdf_style_layout(self, tmp_path, rng):
        # dimension-scale datasets + attributes alongside the variable,
        # as netCDF4 emits: the 3-D variable is found, scales skipped
        from mies_tpu.io.hdf5 import read_hdf5_volume

        want = rng.integers(0, 255, (5, 7, 9)).astype(np.uint8)
        p = tmp_path / "nc4.nc"
        with self.h5py.File(p, "w") as f:
            ds = f.create_dataset("image", data=want)
            ds.attrs["units"] = "HU"
            f.attrs["_NCProperties"] = "version=2,netcdf=4.9.2"
            for i, nm in enumerate(("z", "y", "x")):
                dv = f.create_dataset(
                    nm, data=np.arange(want.shape[i], dtype=np.float64))
                dv.attrs["CLASS"] = np.bytes_("DIMENSION_SCALE")
        vol, vn = read_hdf5_volume(p)
        assert vn == "image"
        np.testing.assert_array_equal(vol, want)

    def test_slab_reads_match_full(self, tmp_path, rng):
        from mies_tpu.io.hdf5 import H5File

        want = rng.random((10, 16, 12)).astype(np.float32)
        p = tmp_path / "s.nc"
        with self.h5py.File(p, "w") as f:
            f.create_dataset("vol", data=want, chunks=(3, 16, 12),
                             compression="gzip")
        ds = H5File(p).datasets["vol"]
        for z0, z1 in ((0, 3), (2, 7), (9, 10), (0, 10)):
            np.testing.assert_array_equal(
                ds.read_slab(z0, z1), want[z0:z1])

    def test_load_volume_and_slab_stream_dispatch(self, tmp_path, rng):
        # volume.py routes HDF5 .nc through the in-tree reader when
        # netCDF4 is absent (it is absent here), both full-load and
        # the lazy slab stream
        from mies_tpu.io.volume import load_volume, open_volume_slabs

        want = rng.integers(-500, 2000, (9, 12, 16)).astype(np.int16)
        p = tmp_path / "v.nc"
        with self.h5py.File(p, "w") as f:
            f.create_dataset("ct", data=want, chunks=(4, 12, 16),
                             compression="gzip")
        vol, meta = load_volume(p)
        np.testing.assert_array_equal(vol, want)
        assert meta.source.startswith("hdf5:")
        meta2, gen = open_volume_slabs(p, slab_size=4)
        assert meta2.source.startswith("hdf5-stream:")
        got = np.concatenate(list(gen))
        np.testing.assert_array_equal(got, want)

    def test_v1_header_continuation_blocks(self, tmp_path, rng):
        # enough attributes/links to overflow the v1 object headers
        # into continuation blocks (netCDF4 files carry large
        # attribute sets — _NCProperties, DIMENSION_LIST, units, ...)
        from mies_tpu.io.hdf5 import read_hdf5_volume

        p = tmp_path / "attrs.nc"
        want = rng.integers(-100, 100, (2, 3, 4)).astype(np.int16)
        with self.h5py.File(p, "w") as f:
            ds = f.create_dataset("v", data=want)
            for i in range(40):
                ds.attrs[f"attribute_with_long_name_{i:02d}"] = float(i)
            for i in range(30):
                f.attrs[f"root_attr_{i:02d}"] = "v" * 30
            for j in range(12):
                f.create_dataset(f"extra_{j:02d}", data=np.arange(5))
        vol, vn = read_hdf5_volume(p)
        assert vn == "v"
        np.testing.assert_array_equal(vol, want)

    def test_refusals_name_the_feature(self, tmp_path, rng):
        from mies_tpu.io.hdf5 import read_hdf5_volume

        p = tmp_path / "str.nc"
        with self.h5py.File(p, "w") as f:
            f.create_dataset(
                "s", data=np.array([b"abc"], dtype="S3"))
            f.create_dataset("v", data=rng.random((2, 3, 4)))
        # the string dataset is refused by name only when requested
        vol, vn = read_hdf5_volume(p)
        assert vn == "v"
        with pytest.raises(NotImplementedError, match="string"):
            read_hdf5_volume(p, "s")
        noth5 = tmp_path / "x.nc"
        noth5.write_bytes(b"garbage here")
        with pytest.raises(ValueError, match="signature"):
            read_hdf5_volume(noth5)


class TestColorDicom:
    """Color DICOM (SamplesPerPixel=3) — VERDICT r4 item 7: JPEG
    Baseline YCbCr decode (libjpeg fancy upsampling + fixed-point
    color convert, cross-checked vs Pillow), J2K RGB with reversible
    RCT (encode AND decode, OpenJPEG-validated), uncompressed
    RGB/YBR_FULL, and the io.channels policy on color slices."""

    def _rgb(self, rng, shape=(40, 56)):
        return rng.integers(0, 256, shape + (3,)).astype(np.uint8)

    def test_jpeg_color_decode_all_subsamplings(self, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct

        rgb = self._rgb(rng, (45, 62))
        for sub in (0, 1, 2):  # 4:4:4 / 4:2:2 / 4:2:0
            b = _io.BytesIO()
            Image.fromarray(rgb).save(b, format="JPEG", quality=90,
                                      subsampling=sub)
            got = decode_jpeg_dct(b.getvalue(), f"sub{sub}")
            want = np.asarray(
                Image.open(_io.BytesIO(b.getvalue())).convert("RGB"))
            d = np.abs(got.astype(np.int32) - want.astype(np.int32))
            # our exact float IDCT vs libjpeg's islow integer IDCT:
            # a few levels through upsample + color convert
            assert d.max() <= 3 and d.mean() < 0.2, (sub, d.max())

    def test_jpeg_color_restart_intervals(self, rng):
        # restart markers reset ALL three component predictors — the
        # color-scan DRI path, cross-checked vs Pillow
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct

        rgb = self._rgb(rng, (64, 80))
        b = _io.BytesIO()
        Image.fromarray(rgb).save(b, format="JPEG", quality=85,
                                  subsampling=2,
                                  restart_marker_blocks=2)
        blob = b.getvalue()
        assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
        got = decode_jpeg_dct(blob, "rst")
        want = np.asarray(
            Image.open(_io.BytesIO(blob)).convert("RGB"))
        assert np.abs(got.astype(np.int32)
                      - want.astype(np.int32)).max() <= 3

    def test_uncompressed_rgb_and_ybr(self, tmp_path, rng):
        from mies_tpu.io.jpegdct import _ycbcr_to_rgb

        rgb = self._rgb(rng)
        p = tmp_path / "rgb.dcm"
        write_dicom(p, rgb)
        sl = read_dicom(p)
        assert sl.photometric == "RGB"
        np.testing.assert_array_equal(sl.pixels, rgb)
        # YBR_FULL converts on read with the same fixed-point math
        p2 = tmp_path / "ybr.dcm"
        write_dicom(p2, rgb, photometric="YBR_FULL")
        sl2 = read_dicom(p2)
        np.testing.assert_array_equal(
            sl2.pixels,
            _ycbcr_to_rgb(rgb[..., 0], rgb[..., 1], rgb[..., 2]))

    def test_jpeg_baseline_color_dicom(self, tmp_path, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.dicom import JPEG_BASELINE

        rgb = self._rgb(rng)
        b = _io.BytesIO()
        Image.fromarray(rgb).save(b, format="JPEG", quality=95,
                                  subsampling=0)
        p = tmp_path / "us.dcm"
        write_dicom(p, rgb, transfer_syntax=JPEG_BASELINE,
                    photometric="YBR_FULL_422",
                    encoded_frames=[b.getvalue()])
        sl = read_dicom(p)
        assert sl.pixels.shape == rgb.shape
        want = np.asarray(
            Image.open(_io.BytesIO(b.getvalue())).convert("RGB"))
        assert np.abs(sl.pixels.astype(np.int32)
                      - want.astype(np.int32)).max() <= 3

    def test_rle_color_dicom(self, tmp_path, rng):
        # PS3.5 G.2 color RLE: one PackBits segment per plane — native
        # encode AND decode, single frame + cine, bit-exact
        from mies_tpu.io.dicom import RLE_LOSSLESS, read_dicom_frames

        rgb = self._rgb(rng)
        p = tmp_path / "c.dcm"
        write_dicom(p, rgb, transfer_syntax=RLE_LOSSLESS)
        sl = read_dicom(p)
        np.testing.assert_array_equal(sl.pixels, rgb)
        mf = rng.integers(0, 256, (3, 24, 32, 3)).astype(np.uint8)
        p2 = tmp_path / "mf.dcm"
        write_dicom(p2, mf, transfer_syntax=RLE_LOSSLESS)
        arr, _info = read_dicom_frames(p2)
        np.testing.assert_array_equal(np.asarray(arr), mf)

    def test_native_color_j2k_dicom(self, tmp_path, rng):
        from mies_tpu.io.dicom import JPEG_2000_LOSSLESS

        rgb = self._rgb(rng)
        p = tmp_path / "c.dcm"
        write_dicom(p, rgb, transfer_syntax=JPEG_2000_LOSSLESS)
        sl = read_dicom(p)
        assert sl.photometric == "YBR_RCT"
        np.testing.assert_array_equal(sl.pixels, rgb)

    def test_j2k_rgb_rct_pillow_cross(self, rng):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpeg2k import decode_jpeg2k, encode_jpeg2k

        rgb = self._rgb(rng, (65, 33))
        # our encode -> OpenJPEG decode (conformance) + self decode
        blob = encode_jpeg2k(rgb)
        np.testing.assert_array_equal(
            np.asarray(Image.open(_io.BytesIO(blob))), rgb)
        np.testing.assert_array_equal(decode_jpeg2k(blob, "s"), rgb)
        # Pillow encode (MCT) -> our decode, incl. the 9/7 ICT within 1
        b = _io.BytesIO()
        Image.fromarray(rgb).save(b, format="JPEG2000",
                                  irreversible=True)
        out = decode_jpeg2k(b.getvalue(), "ict")
        want = np.asarray(Image.open(_io.BytesIO(b.getvalue())))
        assert np.abs(out.astype(np.int32)
                      - want.astype(np.int32)).max() <= 1

    def test_color_multiframe_and_channels_policy(self, tmp_path, rng):
        from mies_tpu.io.dicom import read_dicom_frames
        from mies_tpu.io.image import load_image

        mf = rng.integers(0, 256, (3, 24, 32, 3)).astype(np.uint8)
        p = tmp_path / "cine.dcm"
        write_dicom(p, mf)
        arr, _info = read_dicom_frames(p)
        np.testing.assert_array_equal(np.asarray(arr), mf)
        # channels policy on a color slice mirrors the PNG path
        p2 = tmp_path / "one.dcm"
        write_dicom(p2, mf[0])
        with pytest.raises(ValueError, match="io.channels"):
            load_image(p2, dtype="raw")
        pc = load_image(p2, dtype="raw", channels="per-channel")
        np.testing.assert_array_equal(pc, mf[0].transpose(2, 0, 1))
        from PIL import Image

        g = load_image(p2, dtype="raw", channels="gray")
        np.testing.assert_array_equal(
            g, np.asarray(Image.fromarray(mf[0]).convert("L")))

    def test_native_parser_routes_color_to_python(self, tmp_path, rng):
        # the C fast path REFUSES color (it would silently read 1/3 of
        # the frame as grayscale); _load_dicom_slice falls back
        from mies_tpu import native

        rgb = self._rgb(rng)
        p = tmp_path / "c.dcm"
        write_dicom(p, rgb)
        if native.available():
            with pytest.raises(ValueError, match="color"):
                native.read_dicom_native(p)

"""Native C++ DICOM decoder vs the Python reference implementation."""

import numpy as np
import pytest

from mies_tpu import native
from mies_tpu.io.dicom import read_dicom, read_dicom_series, write_dicom

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_matches_python_int16(tmp_path, ct_slice_hu):
    p = tmp_path / "s.dcm"
    write_dicom(p, ct_slice_hu, instance_number=3, slice_location=7.5)
    px, meta = native.read_dicom_native(p)
    ref = read_dicom(p)
    np.testing.assert_array_equal(px, ref.pixels)
    assert meta["instance"] == 3
    assert meta["slice_loc"] == 7.5


def test_native_rescale(tmp_path):
    raw = np.arange(0, 4096, dtype=np.uint16).reshape(64, 64)
    p = tmp_path / "r.dcm"
    write_dicom(p, raw, rescale_slope=1.0, rescale_intercept=-1024.0)
    px, _ = native.read_dicom_native(p)
    ref = read_dicom(p)
    np.testing.assert_array_equal(px, ref.pixels)
    assert px.min() == -1024


def test_native_series_matches_python(tmp_path, ct_slice_hu):
    locs = [30.0, 10.0, 20.0]
    for i, loc in enumerate(locs):
        write_dicom(
            tmp_path / f"s{i}.dcm",
            (ct_slice_hu + i).astype(np.int16),
            instance_number=i,
            slice_location=loc,
        )
    vol_n = native.read_dicom_series_native(tmp_path)
    vol_p = read_dicom_series(tmp_path)
    np.testing.assert_array_equal(vol_n, vol_p)


def test_native_error_on_garbage(tmp_path):
    p = tmp_path / "bad.dcm"
    p.write_bytes(b"not a dicom file at all, definitely not")
    with pytest.raises(ValueError):
        native.read_dicom_native(p)


def test_native_error_on_unsupported_syntax(tmp_path, ct_slice_hu):
    p = tmp_path / "jpg.dcm"
    write_dicom(p, ct_slice_hu)
    data = bytearray(p.read_bytes())
    i = data.find(b"1.2.840.10008.1.2.1")
    data[i : i + 19] = b"1.2.840.10008.1.2.4"
    p.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="transfer syntax"):
        native.read_dicom_native(p)


def test_load_volume_uses_native(tmp_path, ct_slice_hu):
    from mies_tpu.io.volume import load_volume

    for i in range(3):
        write_dicom(tmp_path / f"s{i}.dcm", ct_slice_hu, instance_number=i)
    vol, meta = load_volume(tmp_path)
    assert vol.shape[0] == 3
    assert "native" in meta.source


def test_native_zero_length_us_element_at_tail(tmp_path, ct_slice_hu):
    """A malformed zero-length (0028,xxxx) US element at the buffer end
    must not read out of bounds (ADVICE round 1, dicomfast.cpp): the
    short element is ignored and the valid metadata stands."""
    p = tmp_path / "tail.dcm"
    write_dicom(p, ct_slice_hu, instance_number=1)
    ref = read_dicom(p)
    # append explicit-VR (0028,0010) Rows, VR=US, length=0 — 8 bytes, no value
    with open(p, "ab") as f:
        f.write(bytes([0x28, 0x00, 0x10, 0x00]) + b"US" + bytes([0x00, 0x00]))
    px, meta = native.read_dicom_native(p)
    np.testing.assert_array_equal(px, ref.pixels)


def test_native_unsigned_no_rescale_dtype_matches_python(tmp_path):
    """A uint16 slice with NO rescale must decode to uint16 on BOTH
    paths — the native parser previously emitted wrapped int16 for
    values >= 32768 (review finding, round 4)."""
    raw = np.array([[0, 1000, 32767, 32768], [40000, 65535, 7, 9]],
                   dtype=np.uint16).repeat(16, 0).repeat(16, 1)
    p = tmp_path / "u16.dcm"
    write_dicom(p, raw)  # no rescale args
    px, _ = native.read_dicom_native(p)
    ref = read_dicom(p)
    assert px.dtype == ref.pixels.dtype == np.uint16
    np.testing.assert_array_equal(px, ref.pixels)


def test_native_uint8_no_rescale_dtype_matches_python(tmp_path):
    raw = np.arange(256, dtype=np.uint8).reshape(16, 16)
    p = tmp_path / "u8.dcm"
    write_dicom(p, raw)
    px, _ = native.read_dicom_native(p)
    ref = read_dicom(p)
    assert px.dtype == ref.pixels.dtype == np.uint8
    np.testing.assert_array_equal(px, ref.pixels)


def test_native_build_thread_safe(tmp_path):
    """Concurrent first-use from a decode pool must not race g++."""
    import importlib
    from concurrent.futures import ThreadPoolExecutor

    import mies_tpu.native as nat

    nat._lib = None  # force re-load through the locked path
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(lambda _: nat.build(), range(16)))
    assert all(results)


class TestNativeJ2kT1:
    """C++ EBCOT Tier-1 twin (native/jpeg2k_t1.cpp) vs the pure-Python
    coder — BIT equality at block and stream level (the Python twin
    defines the semantics; ADVICE r4 #1 measured the Python loops at
    ~2.7 s/frame, the twin runs ~115 ms for a 512² 12-bit frame)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from mies_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")

    def test_block_roundtrip_bit_equal(self, rng):
        from mies_tpu import native
        from mies_tpu.io.jpeg2k import (_t1_decode_block,
                                        _t1_encode_block)

        for t in range(12):
            h = int(rng.integers(1, 65))
            w = int(rng.integers(1, 65))
            numbps = int(rng.integers(1, 15))
            band = ["LL", "HL", "LH", "HH"][t % 4]
            mag = rng.integers(0, 1 << numbps, (h, w)).astype(np.int32)
            chi = rng.integers(0, 2, (h, w)).astype(np.uint8)
            pd, pn = _t1_encode_block(mag, chi, band, numbps)
            nd, nn = native.t1_encode(mag, chi, band, numbps)
            assert pd == nd and pn == nn
            m1, c1, u1 = _t1_decode_block(w, h, band, pd, pn, numbps)
            m2, c2, u2 = native.t1_decode(pd, w, h, band, pn, numbps)
            np.testing.assert_array_equal(m1, m2)
            np.testing.assert_array_equal(c1, c2)
            assert u1 == u2

    def test_stream_dispatch_bit_equal(self, rng, monkeypatch):
        from mies_tpu.io import jpeg2k

        img = rng.integers(0, 4096, (96, 80)).astype(np.uint16)
        monkeypatch.setenv("MIES_TPU_J2K_NATIVE", "0")
        blob_py = jpeg2k.encode_jpeg2k(img, depth=12)
        monkeypatch.setenv("MIES_TPU_J2K_NATIVE", "1")
        blob_nat = jpeg2k.encode_jpeg2k(img, depth=12)
        assert blob_py == blob_nat
        out_nat = jpeg2k.decode_jpeg2k(blob_py, "nat")
        monkeypatch.setenv("MIES_TPU_J2K_NATIVE", "0")
        out_py = jpeg2k.decode_jpeg2k(blob_py, "py")
        np.testing.assert_array_equal(out_py, out_nat)
        np.testing.assert_array_equal(out_nat, img)


class TestNativeJpegScan:
    """C++ T.81 entropy-scan twin (native/jpegdct_scan.cpp) vs the
    Python scan loops — BIT-equal whole decodes (integer coefficients,
    so equality is exact); ~40x on 512² frames (0.8-1.5 s -> 21-37 ms),
    the .4.50 ultrasound-cine ingest path."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from mies_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")

    def test_decodes_bit_equal(self, rng, monkeypatch):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct

        g = rng.integers(0, 256, (120, 150)).astype(np.uint8)
        rgb = rng.integers(0, 256, (90, 110, 3)).astype(np.uint8)
        blobs = []
        b = _io.BytesIO()
        Image.fromarray(g).save(b, format="JPEG", quality=88)
        blobs.append(("gray", b.getvalue()))
        b = _io.BytesIO()
        Image.fromarray(g).save(b, format="JPEG", quality=80,
                                restart_marker_blocks=3)
        blobs.append(("gray-rst", b.getvalue()))
        for sub in (0, 1, 2):
            b = _io.BytesIO()
            Image.fromarray(rgb).save(b, format="JPEG", quality=88,
                                      subsampling=sub)
            blobs.append((f"rgb{sub}", b.getvalue()))
        b = _io.BytesIO()
        Image.fromarray(rgb).save(b, format="JPEG", quality=85,
                                  subsampling=2,
                                  restart_marker_blocks=2)
        blobs.append(("rgb-rst", b.getvalue()))
        for name, blob in blobs:
            monkeypatch.setenv("MIES_TPU_JPEG_NATIVE", "1")
            a = decode_jpeg_dct(blob, name)
            monkeypatch.setenv("MIES_TPU_JPEG_NATIVE", "0")
            c = decode_jpeg_dct(blob, name)
            np.testing.assert_array_equal(a, c)

    def test_corrupt_streams_raise_valueerror(self, rng, monkeypatch):
        import io as _io

        from PIL import Image

        from mies_tpu.io.jpegdct import decode_jpeg_dct

        monkeypatch.setenv("MIES_TPU_JPEG_NATIVE", "1")
        g = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        b = _io.BytesIO()
        Image.fromarray(g).save(b, format="JPEG", quality=80)
        blob = bytearray(b.getvalue())
        blob[len(blob) // 2] ^= 0xFF  # corrupt mid-scan
        try:
            decode_jpeg_dct(bytes(blob), "corrupt")
        except (ValueError, NotImplementedError):
            pass  # named refusal is the contract; silent success is
            # also possible (the flip may land in droppable AC bits)

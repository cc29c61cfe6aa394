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

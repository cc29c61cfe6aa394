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

"""HTJ2K (ITU-T T.814) High-Throughput block coder + DICOM syntaxes.

Reference contracts:

* block level — ``encode_ht_block``/``decode_ht_block`` are exact
  inverses over adversarial coefficient statistics;
* stream level — ``encode_jpeg2k(ht=True)`` emits .4.201-profile
  codestreams that BOTH our decoder and the in-tree OpenJPEG 2.5.4
  (``tools/opj_oracle.py``, the reference HT implementation this
  codec was reconstructed from) decode bit-exactly;
* the extracted CxtVLC tables re-validate against every in-tree
  libopenjp2 build;
* DICOM — .4.201/.4.202 write+read round-trips (gray, signed CT,
  multi-frame, color), .4.203 write refusal, e2e series ingest.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

from mies_tpu.io import dicom as D
from mies_tpu.io.htj2k import (
    HTError,
    decode_ht_block,
    decode_ht_cleanup,
    encode_ht_block,
)
from mies_tpu.io.jpeg2k import decode_jpeg2k, encode_jpeg2k

ROOT = Path(__file__).resolve().parent.parent


def _oracle():
    sys.path.insert(0, str(ROOT / "tools"))
    from opj_oracle import opj_available, opj_decode

    if not opj_available():  # pragma: no cover - lib ships in-tree
        pytest.skip("no libopenjp2 for the HT oracle")
    return opj_decode


class TestHTBlockCodec:
    @pytest.mark.parametrize("kind", ["dense", "sparse", "wide",
                                      "zeros", "impulse", "half"])
    def test_block_roundtrip(self, rng, kind):
        for trial in range(8):
            h = int(rng.integers(1, 70))
            w = int(rng.integers(1, 70))
            if kind == "dense":
                c = rng.integers(-3, 4, (h, w))
            elif kind == "sparse":
                c = np.where(rng.random((h, w)) < 0.05,
                             rng.integers(-1000, 1000, (h, w)), 0)
            elif kind == "wide":
                c = rng.integers(-(2 ** 12), 2 ** 12, (h, w))
            elif kind == "zeros":
                c = np.zeros((h, w), int)
            elif kind == "impulse":
                c = np.zeros((h, w), int)
                c[rng.integers(0, h), rng.integers(0, w)] = int(
                    rng.integers(1, 2 ** 16)) * (-1) ** trial
            else:
                c = np.where(rng.random((h, w)) < 0.5,
                             rng.integers(-30, 30, (h, w)), 0)
            B = max(int(np.abs(c).max()).bit_length() + 1, 2)
            seg, zbp = encode_ht_block(c.astype(np.int64), B)
            out = decode_ht_block(seg, w, h, zbp, 1, B)
            np.testing.assert_array_equal(out, c)

    def test_scup_validation(self):
        with pytest.raises(HTError, match="Scup"):
            decode_ht_cleanup(b"\x00\xff\xff", 3, 2, 2, 8)

    def test_unencodable_exponent_refused(self):
        with pytest.raises(HTError, match="exponent"):
            encode_ht_block(np.array([[1 << 20]], np.int64), 4)

    def test_tables_match_every_intree_openjpeg(self):
        # the generated module must re-extract identically from each
        # libopenjp2 on this image (catches any hand edit drifting
        # from the reference tables)
        sys.path.insert(0, str(ROOT / "tools"))
        import extract_htj2k_tables as X

        t0, t1 = X.extract(X._default_library())
        text = X.render(t0, t1)
        assert X.OUT.read_text() == text


class TestHTCodestream:
    CASES = [
        ("u8", lambda r: r.integers(0, 256, (64, 64)).astype(np.uint8)),
        ("u8odd", lambda r: r.integers(0, 256, (65, 123)).astype(
            np.uint8)),
        ("u16", lambda r: r.integers(0, 65536, (96, 80)).astype(
            np.uint16)),
        ("i16", lambda r: r.integers(-2000, 3000, (96, 80)).astype(
            np.int16)),
        ("row", lambda r: r.integers(0, 256, (1, 130)).astype(np.uint8)),
        ("col", lambda r: r.integers(0, 256, (130, 1)).astype(np.uint8)),
        ("flat", lambda r: np.zeros((48, 48), np.uint8)),
        ("rgb", lambda r: r.integers(0, 256, (50, 34, 3)).astype(
            np.uint8)),
    ]

    @pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
    def test_self_roundtrip(self, rng, name, make):
        frame = make(rng)
        blob = encode_jpeg2k(frame, ht=True)
        out = decode_jpeg2k(blob)
        np.testing.assert_array_equal(
            out.astype(np.int64), frame.astype(np.int64))

    @pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
    def test_openjpeg_decodes_our_streams(self, rng, name, make):
        opj_decode = _oracle()
        frame = make(rng)
        blob = encode_jpeg2k(frame, ht=True)
        out = opj_decode(blob, verbose=False)
        np.testing.assert_array_equal(
            out.astype(np.int64), frame.astype(np.int64))

    def test_rpcl_progression(self, rng):
        opj_decode = _oracle()
        frame = rng.integers(0, 4096, (80, 96)).astype(np.uint16)
        blob = encode_jpeg2k(frame, ht=True, prog=2)
        np.testing.assert_array_equal(decode_jpeg2k(blob), frame)
        np.testing.assert_array_equal(
            opj_decode(blob, verbose=False).astype(np.int64),
            frame.astype(np.int64))

    def test_ht_streams_smaller_than_uncompressed(self, rng):
        # smooth clinical-looking content must actually compress
        y = np.add.outer(np.arange(256), np.arange(256)) % 512
        frame = (y // 2).astype(np.uint16)
        blob = encode_jpeg2k(frame, ht=True)
        assert len(blob) < frame.nbytes / 2

    def test_mixed_mode_refused_by_name(self, rng):
        frame = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        blob = bytearray(encode_jpeg2k(frame, ht=True))
        idx = blob.index(b"\xff\x52") + 12  # SPcod cbstyle byte
        assert blob[idx] == 0x40
        blob[idx] = 0xC0
        with pytest.raises(NotImplementedError, match="HT MIXED"):
            decode_jpeg2k(bytes(blob))

    @pytest.mark.parametrize("kind", ["dense", "smooth", "binary",
                                      "sparse"])
    def test_three_pass_matches_openjpeg(self, rng, kind):
        # the standard 3-pass form (cleanup at p=2 + SigProp + MagRef
        # in a second codeword segment): our decode must be
        # bit-identical to the reference decoder's.  (SigProp can only
        # reach neighbours of significant samples, so isolated
        # LSB-only coefficients are unreachable by design — the
        # arbiter is openjpeg, not the original pixels.)
        opj_decode = _oracle()
        if kind == "dense":
            f = rng.integers(0, 4096, (70, 90)).astype(np.uint16)
        elif kind == "smooth":
            f = (np.add.outer(np.arange(80), np.arange(60))
                 % 256).astype(np.uint8)
        elif kind == "binary":
            f = (128 + rng.integers(0, 2, (77, 53))).astype(np.uint8)
        else:
            f = (128 + np.where(rng.random((40, 44)) < 0.3,
                                rng.integers(-3, 4, (40, 44)),
                                0)).astype(np.uint8)
        blob = encode_jpeg2k(f, ht=True, ht_passes=3)
        mine = decode_jpeg2k(blob).astype(np.int64)
        opj = opj_decode(blob, verbose=False).astype(np.int64)
        np.testing.assert_array_equal(mine, opj)

    def test_three_pass_lossless_on_dense_content(self, rng):
        # with every coefficient's LSB reachable, 3-pass p=2 coding is
        # fully lossless end to end
        f = rng.integers(0, 4096, (96, 80)).astype(np.uint16)
        blob = encode_jpeg2k(f, ht=True, ht_passes=3)
        np.testing.assert_array_equal(decode_jpeg2k(blob), f)

    def test_more_than_three_passes_refused(self, rng):
        frame = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        blob = encode_jpeg2k(frame, ht=True, levels=0)
        from mies_tpu.io import jpeg2k as J

        orig = J._parse_num_passes
        J._parse_num_passes = lambda rd: orig(rd) + 4
        try:
            with pytest.raises(ValueError, match="max 3"):
                decode_jpeg2k(blob)
        finally:
            J._parse_num_passes = orig


class TestHTJ2KDicom:
    def test_int16_ct_roundtrip(self, tmp_path, ct_slice_hu):
        f = tmp_path / "ht.dcm"
        px = ct_slice_hu.astype(np.int16)
        D.write_dicom(f, px, transfer_syntax=D.HTJ2K_LOSSLESS)
        sl = D.read_dicom(f)
        np.testing.assert_array_equal(sl.pixels, px)
        assert D.HTJ2K_LOSSLESS.encode() in f.read_bytes()

    def test_rpcl_roundtrip(self, tmp_path, rng):
        f = tmp_path / "ht.dcm"
        px = rng.integers(0, 4096, (64, 96)).astype(np.uint16)
        D.write_dicom(f, px, transfer_syntax=D.HTJ2K_LOSSLESS_RPCL)
        np.testing.assert_array_equal(D.read_dicom(f).pixels, px)

    def test_multiframe_roundtrip(self, tmp_path, rng):
        f = tmp_path / "ht.dcm"
        px = rng.integers(0, 256, (3, 40, 56)).astype(np.uint8)
        D.write_dicom(f, px, transfer_syntax=D.HTJ2K_LOSSLESS)
        frames = D.read_dicom_frames(f)[0]
        np.testing.assert_array_equal(np.asarray(frames), px)

    def test_color_roundtrip(self, tmp_path, rng):
        f = tmp_path / "ht.dcm"
        px = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        D.write_dicom(f, px, transfer_syntax=D.HTJ2K_LOSSLESS)
        np.testing.assert_array_equal(
            np.asarray(D.read_dicom(f).pixels), px)

    def test_lossy_ht_write_refused(self, tmp_path, rng):
        px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        with pytest.raises(NotImplementedError, match="rate-control"):
            D.write_dicom(tmp_path / "x.dcm", px,
                          transfer_syntax=D.HTJ2K)

    def test_series_matches_j2k_twin(self, tmp_path, ct_slice_hu):
        # the VERDICT's done-bar: an HTJ2K series decodes bit-exact
        # vs its .4.90 twin, through the series reader
        px = ct_slice_hu.astype(np.int16)
        d_ht = tmp_path / "ht"
        d_j2k = tmp_path / "j2k"
        d_ht.mkdir(), d_j2k.mkdir()
        for i in range(3):
            fr = np.roll(px, i, axis=0)
            D.write_dicom(d_ht / f"s{i}.dcm", fr, instance_number=i + 1,
                          slice_location=float(i),
                          transfer_syntax=D.HTJ2K_LOSSLESS)
            D.write_dicom(d_j2k / f"s{i}.dcm", fr,
                          instance_number=i + 1,
                          slice_location=float(i),
                          transfer_syntax=D.JPEG_2000_LOSSLESS)
        a = D.read_dicom_series(d_ht)
        b = D.read_dicom_series(d_j2k)
        np.testing.assert_array_equal(a, b)


class TestHTNativeTwin:
    """C++ twin (native/htj2k_t1.cpp) vs the pure-Python coder —
    bit-equal segments and planes (the Python module defines the
    semantics; the twin is the hot path: 15.9/3.7 ms vs ~1.9 s/0.65 s
    per 512^2-equivalent)."""

    def _native(self):
        from mies_tpu import native

        if not native.available():
            pytest.skip("native toolchain unavailable")
        return native

    def test_encode_bit_equal(self, rng, monkeypatch):
        native = self._native()
        from mies_tpu.io import htj2k as H

        monkeypatch.setenv("MIES_TPU_HTJ2K_NATIVE", "0")
        for _ in range(12):
            h = int(rng.integers(1, 70))
            w = int(rng.integers(1, 70))
            c = np.where(rng.random((h, w)) < 0.3,
                         rng.integers(-2000, 2000, (h, w)), 0)
            B = max(int(np.abs(c).max()).bit_length() + 1, 2)
            seg_py, zbp_py = H.encode_ht_block(c.astype(np.int64), B)
            seg_c, zbp_c = native.ht_encode(c.astype(np.int32), B)
            assert (seg_py, zbp_py) == (seg_c, zbp_c)

    def test_decode_bit_equal(self, rng):
        native = self._native()
        from mies_tpu.io import htj2k as H

        for _ in range(12):
            h = int(rng.integers(1, 70))
            w = int(rng.integers(1, 70))
            c = np.where(rng.random((h, w)) < 0.3,
                         rng.integers(-2000, 2000, (h, w)), 0)
            B = max(int(np.abs(c).max()).bit_length() + 1, 2)
            seg, zbp = H.encode_ht_block(c.astype(np.int64), B)
            mag_py, sg_py = H.decode_ht_cleanup(seg, len(seg), w, h,
                                                zbp)
            mag_c, sg_c = native.ht_decode(seg, w, h, zbp)
            np.testing.assert_array_equal(mag_py, mag_c)
            np.testing.assert_array_equal(sg_py, sg_c)

    def test_stream_identical_via_env(self, rng, monkeypatch):
        frame = rng.integers(0, 4096, (96, 80)).astype(np.uint16)
        blob_native = encode_jpeg2k(frame, ht=True)
        monkeypatch.setenv("MIES_TPU_HTJ2K_NATIVE", "0")
        blob_py = encode_jpeg2k(frame, ht=True)
        assert blob_native == blob_py
        np.testing.assert_array_equal(decode_jpeg2k(blob_py), frame)


class TestHTFuzz:
    @pytest.mark.parametrize("native", ["1", "0"], ids=["native", "py"])
    def test_mutated_streams_fail_cleanly(self, rng, monkeypatch,
                                          native):
        """Byte mutations and truncations of valid HT codestreams must
        raise ValueError/NotImplementedError — never crash, assert, or
        mis-index (both coder paths; 5,500-trial sweeps ran clean in
        round 5, this pins a seeded subset)."""
        monkeypatch.setenv("MIES_TPU_HTJ2K_NATIVE", native)
        f = rng.integers(0, 4096, (32, 48)).astype(np.uint16)
        bases = [bytearray(encode_jpeg2k(f, ht=True)),
                 bytearray(encode_jpeg2k(f, ht=True, ht_passes=3))]
        for trial in range(120):
            blob = bytearray(bases[trial % 2])
            for _ in range(int(rng.integers(1, 8))):
                blob[int(rng.integers(0, len(blob)))] = int(
                    rng.integers(0, 256))
            if trial % 7 == 0:
                blob = blob[: int(rng.integers(2, len(blob)))]
            try:
                decode_jpeg2k(bytes(blob))
            except (ValueError, NotImplementedError):
                pass

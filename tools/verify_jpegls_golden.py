#!/usr/bin/env python
"""One-command verification of the JPEG-LS codec against a real
T.87 implementation (CharLS).

``mies_tpu/io/jpegls.py`` is a from-spec T.87 transcription written in
an environment with NO JPEG-LS library to pin against: its tested
contract here is round-trip identity plus the near-lossless error
bound. Interoperability with real archives needs one run of this tool
in ANY environment that has a CharLS binding, e.g.:

    pip install pillow-jpls   # or: pip install imagecodecs
    python tools/verify_jpegls_golden.py

It checks, across noise / run-heavy / gradient / 8- / 12- / 16-bit /
near-lossless cases:

  1. the external codec DECODES our encoder's streams bit-exactly, and
  2. our decoder decodes the EXTERNAL encoder's streams bit-exactly,

prints a parity report, and writes ``tests/goldens/jpegls_pin.npz``
holding the external encoder's codestreams. Once committed, the replay
test ``tests/test_io.py::test_jpegls_pin_replay`` asserts our decoder
against the pinned foreign streams in every future environment — no
CharLS needed again.

Exit codes: 0 = all cases match, 2 = mismatch (report printed),
3 = no JPEG-LS codec importable here.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from mies_tpu.io.jpegls import decode_jpegls, encode_jpegls  # noqa: E402


def _load_external():
    """Return (encode(arr, near) -> bytes, decode(bytes) -> arr) from
    whichever CharLS binding is installed."""
    try:
        import imagecodecs

        def enc(arr, near):
            return imagecodecs.jpegls_encode(arr, level=near)

        def dec(blob):
            return imagecodecs.jpegls_decode(blob)

        return enc, dec, "imagecodecs"
    except ImportError:
        pass
    try:
        import io as _io

        import pillow_jpls  # noqa: F401  (registers the PIL plugin)
        from PIL import Image

        def enc(arr, near):
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG-LS", near_lossless=near)
            return buf.getvalue()

        def dec(blob):
            return np.asarray(Image.open(_io.BytesIO(blob)))

        return enc, dec, "pillow-jpls"
    except ImportError:
        return None, None, None


# Deterministic across environments. DO NOT reorder — append only.
def make_cases() -> list[dict]:
    rng = np.random.default_rng(20260820)
    grad = (np.indices((48, 64)).sum(0) % 256).astype(np.uint8)
    runs = np.zeros((32, 200), np.uint8)
    runs[7, 100:] = 77
    runs[9] = 5
    cases = [
        dict(name="noise8", img=rng.integers(0, 256, (40, 56))
             .astype(np.uint8), near=0),
        dict(name="runs8", img=runs, near=0),
        dict(name="grad8", img=grad, near=0),
        dict(name="noise16", img=rng.integers(0, 65536, (24, 40))
             .astype(np.uint16), near=0),
        dict(name="smooth12", img=(np.indices((30, 30)).sum(0) * 37
             % 4096).astype(np.uint16), near=0),
        dict(name="near2", img=rng.integers(0, 256, (33, 47))
             .astype(np.uint8), near=2),
    ]
    return cases


def main() -> int:
    enc, dec, which = _load_external()
    if enc is None:
        print("no JPEG-LS codec (imagecodecs / pillow-jpls) importable")
        return 3
    print(f"external codec: {which}")
    failures = 0
    pins: dict[str, np.ndarray] = {}
    for case in make_cases():
        name, img, near = case["name"], case["img"], case["near"]
        ours = encode_jpegls(img, near=near)
        theirs = enc(img, near)
        pins[f"{name}__img"] = img
        pins[f"{name}__blob"] = np.frombuffer(theirs, np.uint8)
        pins[f"{name}__near"] = np.int64(near)
        try:
            ext_of_ours = dec(ours)
        except Exception as e:  # pragma: no cover - report path
            print(f"FAIL {name}: external codec rejects our stream: {e}")
            failures += 1
            continue
        our_of_ext = decode_jpegls(theirs)
        a = np.array_equal(
            ext_of_ours, img if near == 0 else decode_jpegls(ours)
        )
        b = (
            np.array_equal(our_of_ext, img)
            if near == 0
            else np.abs(
                our_of_ext.astype(int) - img.astype(int)
            ).max() <= near
        )
        print(f"{name}: ext-decodes-ours={'ok' if a else 'FAIL'} "
              f"we-decode-ext={'ok' if b else 'FAIL'}")
        failures += (not a) + (not b)
    out = ROOT / "tests" / "goldens" / "jpegls_pin.npz"
    np.savez_compressed(out, **pins)
    print(f"wrote {out}")
    return 0 if failures == 0 else 2


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""Extract and validate the HTJ2K (ITU-T T.814) CxtVLC decode tables
from an in-tree OpenJPEG shared library, and (re)generate
``mies_tpu/io/htj2k_tables.py``.

Why extraction: the CxtVLC codeword tables are TABULATED constants in
T.814 (designed by optimization, not derivable from the algorithm) and
no source shipping them exists in this offline environment — but the
BSD-licensed OpenJPEG >= 2.5 ``ht_dec.c`` compiles them into
``.rodata`` as two ``uint16[1024]`` arrays (``vlc_tbl0``/``vlc_tbl1``).
These are standard-mandated interoperability constants (like the MQ
coder's Qe table), so transcribing them from the open-source binary is
the offline equivalent of transcribing them from the spec.

Location method: scan ``.rodata`` for 2048-byte windows that decode as
a VALID CxtVLC table under the known entry packing

    entry = cwd_len | u_off << 3 | rho << 4 | e_1 << 8 | e_k << 12

validated by two structural properties that hold for the real tables
and are astronomically unlikely by chance:

  * prefix consistency — for every context c and 7-bit window w, the
    entry at (c << 7) | w depends only on the first cwd_len bits of w
    (all 2^(7-len) aliases carry the identical entry);
  * the EMB subset chain e_1 <= e_k <= rho (bitwise) on all 1024
    entries, with no zero-length entries.

Verified against libopenjp2 2.5.4 (pillow vendored build): exactly two
windows pass, adjacent in memory, in (tbl0, tbl1) order — matching the
``lea``-referenced operands of the two table lookups inside
``opj_t1_ht_decode_cblk``.

Usage:
    python tools/extract_htj2k_tables.py [path/to/libopenjp2.so]
        [--write]       # regenerate mies_tpu/io/htj2k_tables.py
        [--check]       # verify the checked-in module matches (default)
"""

from __future__ import annotations

import argparse
import struct
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "mies_tpu" / "io" / "htj2k_tables.py"


def _default_library() -> Path:
    import glob

    for pat in (
        "/opt/venv/lib/python3*/site-packages/pillow.libs/libopenjp2*",
        "/usr/lib/x86_64-linux-gnu/libopenjp2.so*",
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            return Path(hits[-1])
    raise SystemExit("no libopenjp2 found; pass a path")


def _rodata(so: bytes) -> tuple[int, int]:
    """Return (offset, size) of .rodata from the ELF section headers."""
    if so[:4] != b"\x7fELF":
        raise SystemExit("not an ELF file")
    is64 = so[4] == 2
    if not is64:
        raise SystemExit("only ELF64 supported")
    e_shoff = struct.unpack_from("<Q", so, 0x28)[0]
    e_shentsize = struct.unpack_from("<H", so, 0x3A)[0]
    e_shnum = struct.unpack_from("<H", so, 0x3C)[0]
    e_shstrndx = struct.unpack_from("<H", so, 0x3E)[0]
    strtab_off = struct.unpack_from(
        "<Q", so, e_shoff + e_shstrndx * e_shentsize + 0x18
    )[0]
    for i in range(e_shnum):
        base = e_shoff + i * e_shentsize
        name_off = struct.unpack_from("<I", so, base)[0]
        name_end = so.index(b"\0", strtab_off + name_off)
        name = so[strtab_off + name_off : name_end]
        if name == b".rodata":
            off = struct.unpack_from("<Q", so, base + 0x18)[0]
            size = struct.unpack_from("<Q", so, base + 0x20)[0]
            return off, size
    raise SystemExit("no .rodata section")


def _is_cxtvlc_table(t: tuple[int, ...]) -> bool:
    for e in t:
        ln = e & 7
        rho = (e >> 4) & 0xF
        e_1 = (e >> 8) & 0xF
        e_k = (e >> 12) & 0xF
        if ln == 0:
            return False
        if e_1 & ~e_k or e_k & ~rho:
            return False
    for c in range(8):
        for w in range(128):
            e = t[(c << 7) | w]
            ln = e & 7
            base = w & ((1 << ln) - 1)
            for w2 in range(base, 128, 1 << ln):
                if t[(c << 7) | w2] != e:
                    return False
    return True


def extract(path: Path) -> tuple[tuple[int, ...], tuple[int, ...]]:
    so = path.read_bytes()
    off, size = _rodata(so)
    hits = []
    # tables are 32-byte aligned const arrays; step 4 to be safe
    for pos in range(off, off + size - 2048 + 1, 4):
        t = struct.unpack_from("<1024H", so, pos)
        if _is_cxtvlc_table(t):
            if hits and pos < hits[-1][0] + 2048:
                continue  # overlapping re-detection of the same table
            hits.append((pos, t))
    if len(hits) != 2:
        raise SystemExit(
            f"expected exactly 2 CxtVLC tables in {path}, found "
            f"{len(hits)} at {[hex(p) for p, _ in hits]}"
        )
    # memory order varies between builds (2.5.0 and 2.5.4 ship them
    # swapped) — assign structurally: only the NON-initial table has
    # 1-bit codewords (high-context quads are highly predictable there;
    # the initial line-pair's shortest codes are 2 bits). Confirmed
    # against the 2.5.4 disassembly: the initial-row lookups reference
    # the no-len-1 table.
    (p0, t0), (p1, t1) = hits
    if any((e & 7) == 1 for e in t0):
        (p0, t0), (p1, t1) = (p1, t1), (p0, t0)
    if any((e & 7) == 1 for e in t0) or not any((e & 7) == 1 for e in t1):
        raise SystemExit("cwd_len==1 distinguisher failed — inspect")
    print(f"found tbl0 @ {hex(p0)}, tbl1 @ {hex(p1)} in {path}")
    return t0, t1


HEADER = '''\
"""HTJ2K (ITU-T T.814) CxtVLC decode tables — GENERATED FILE.

Regenerate / verify with ``python tools/extract_htj2k_tables.py``
(extracts from an in-tree BSD-licensed OpenJPEG >= 2.5 build of
``ht_dec.c`` and validates prefix consistency + the EMB subset chain;
see that tool's docstring for provenance).

Entry packing (uint16), index = (context << 7) | next-7-VLC-bits
(LSB first):

    bits 0-2   cwd_len  (VLC bits consumed, 1..7)
    bit  3     u_off    (quad has a UVLC exponent-offset contribution)
    bits 4-7   rho      (significance, column-major: b0 = top-left,
                         b1 = bottom-left, b2 = top-right,
                         b3 = bottom-right)
    bits 8-11  e_1      (EMB: implicit-MSB VALUE per sample)
    bits 12-15 e_k      (EMB: sample reads U_q - 1 MagSgn bits)

``VLC_TBL0`` covers the initial line-pair's contexts, ``VLC_TBL1``
the non-initial line-pairs'.  MEL exponents and the UVLC prefix table
are algorithm constants (T.814 clauses 7.1.1 / 7.3.5) included here
for one-stop lookup.
"""

MEL_E = (0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5)

# UVLC prefix decode, index = next 3 VLC bits (LSB first):
# (consumed_bits, suffix_len, base) — u_val = base + suffix.
UVLC_PREFIX = (
    (3, 5, 5),  # 000 -> 5 + 5 suffix bits
    (1, 0, 1),  # 1   -> 1
    (2, 0, 2),  # 01  -> 2
    (1, 0, 1),
    (3, 1, 3),  # 001 -> 3 + 1 suffix bit
    (1, 0, 1),
    (2, 0, 2),
    (1, 0, 1),
)

'''


def render(t0, t1) -> str:
    def arr(name, t):
        lines = [f"{name} = ("]
        for i in range(0, 1024, 8):
            lines.append(
                "    " + " ".join(f"0x{v:04x}," for v in t[i : i + 8])
            )
        lines.append(")")
        return "\n".join(lines)

    return HEADER + arr("VLC_TBL0", t0) + "\n\n" + arr("VLC_TBL1", t1) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("library", nargs="?", default=None)
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()
    path = Path(args.library) if args.library else _default_library()
    t0, t1 = extract(path)
    text = render(t0, t1)
    if args.write:
        OUT.write_text(text)
        print(f"wrote {OUT}")
        return 0
    if not OUT.exists():
        raise SystemExit(f"{OUT} missing — rerun with --write")
    if OUT.read_text() != text:
        raise SystemExit(f"{OUT} does NOT match extraction from {path}")
    print(f"{OUT} matches extraction — OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())

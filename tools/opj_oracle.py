"""Decode a J2K/HTJ2K codestream with the in-tree OpenJPEG via ctypes.

Pillow also wraps this library, but swallows OpenJPEG's event messages
— this harness registers error/warning handlers so codec-level
diagnostics surface, which is what makes it useful as an oracle while
bringing up the HT encoder.  Returns the decoded component planes.

Usage:  from tools.opj_oracle import opj_decode
        arr = opj_decode(codestream_bytes)   # [H, W] or [H, W, C]
"""

from __future__ import annotations

import ctypes as C
import glob
import os
import tempfile

import numpy as np


def _find_lib() -> str | None:
    for pat in (
        "/opt/venv/lib/python3*/site-packages/pillow.libs/libopenjp2*",
        "/usr/lib/x86_64-linux-gnu/libopenjp2.so*",
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            return hits[-1]
    return None


_MSG_CB = C.CFUNCTYPE(None, C.c_char_p, C.c_void_p)


class _ImageComp(C.Structure):
    # opj_image_comp_t, OpenJPEG 2.5.x (openjpeg.h)
    _fields_ = [
        ("dx", C.c_uint32), ("dy", C.c_uint32),
        ("w", C.c_uint32), ("h", C.c_uint32),
        ("x0", C.c_uint32), ("y0", C.c_uint32),
        ("prec", C.c_uint32), ("bpp", C.c_uint32),
        ("sgnd", C.c_uint32), ("resno_decoded", C.c_uint32),
        ("factor", C.c_uint32), ("data", C.POINTER(C.c_int32)),
        ("alpha", C.c_uint16),
    ]


class _Image(C.Structure):
    _fields_ = [
        ("x0", C.c_uint32), ("y0", C.c_uint32),
        ("x1", C.c_uint32), ("y1", C.c_uint32),
        ("numcomps", C.c_uint32), ("color_space", C.c_int),
        ("comps", C.POINTER(_ImageComp)),
        ("icc_profile_buf", C.c_void_p),
        ("icc_profile_len", C.c_uint32),
    ]


def opj_available() -> bool:
    return _find_lib() is not None


def opj_decode(blob: bytes, verbose: bool = True):
    """Decode with openjpeg; returns np planes [H, W] / [H, W, C].

    Raises RuntimeError with the library's own messages on failure.
    """
    path = _find_lib()
    if path is None:
        raise RuntimeError("no libopenjp2 available")
    lib = C.CDLL(path)
    lib.opj_create_decompress.restype = C.c_void_p
    lib.opj_stream_create_default_file_stream.restype = C.c_void_p
    lib.opj_stream_create_default_file_stream.argtypes = [
        C.c_char_p, C.c_int]
    lib.opj_read_header.argtypes = [
        C.c_void_p, C.c_void_p, C.POINTER(C.POINTER(_Image))]
    lib.opj_decode.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p]
    lib.opj_end_decompress.argtypes = [C.c_void_p, C.c_void_p]

    msgs: list[str] = []

    @_MSG_CB
    def _on_msg(msg, _user):
        msgs.append(msg.decode(errors="replace").strip())

    fmt = 2 if blob[:4] == b"\x00\x00\x00\x0c" else 0  # JP2 vs J2K
    codec = lib.opj_create_decompress(fmt)
    params = (C.c_byte * 16384)()
    lib.opj_set_default_decoder_parameters(C.byref(params))
    lib.opj_setup_decoder(C.c_void_p(codec), C.byref(params))
    for setter in ("opj_set_error_handler", "opj_set_warning_handler",
                   "opj_set_info_handler"):
        if setter == "opj_set_info_handler" and not verbose:
            continue
        getattr(lib, setter)(C.c_void_p(codec), _on_msg, None)

    with tempfile.NamedTemporaryFile(suffix=".j2k", delete=False) as f:
        f.write(blob)
        tmp = f.name
    try:
        stream = lib.opj_stream_create_default_file_stream(
            tmp.encode(), 1)
        if not stream:
            raise RuntimeError("opj stream creation failed")
        img_p = C.POINTER(_Image)()
        try:
            if not lib.opj_read_header(
                C.c_void_p(stream), C.c_void_p(codec), C.byref(img_p)
            ):
                raise RuntimeError(
                    "opj_read_header failed: " + " | ".join(msgs)
                )
            if not lib.opj_decode(
                C.c_void_p(codec), C.c_void_p(stream), img_p
            ):
                raise RuntimeError(
                    "opj_decode failed: " + " | ".join(msgs)
                )
            lib.opj_end_decompress(
                C.c_void_p(codec), C.c_void_p(stream))
            img = img_p.contents
            planes = []
            for ci in range(img.numcomps):
                comp = img.comps[ci]
                n = comp.w * comp.h
                arr = np.ctypeslib.as_array(comp.data, (n,)).copy()
                planes.append(arr.reshape(comp.h, comp.w))
            out = (planes[0] if len(planes) == 1
                   else np.stack(planes, axis=-1))
        finally:
            lib.opj_stream_destroy(C.c_void_p(stream))
            lib.opj_destroy_codec(C.c_void_p(codec))
            if img_p:
                lib.opj_image_destroy(img_p)
    finally:
        os.unlink(tmp)
    return out

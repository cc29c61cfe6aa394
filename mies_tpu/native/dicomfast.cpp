// dicomfast — native DICOM slice decoder for the host ingest path.
//
// Role: the reference delegated heavy host-side decode to native code
// (kornia-rs / torchvision C++, SURVEY.md section 2c); this is the
// TPU-framework equivalent for the volumetric ingest path: parsing a
// CT series of hundreds of slices is pure CPU work that sits on the
// critical path of volume streaming (SURVEY.md section 3.3), so it is
// implemented in C++ with a C ABI and called from Python via ctypes
// with the GIL released (one thread per file in the Python pool).
//
// Scope matches mies_tpu/io/dicom.py exactly (the Python twin defines
// the semantics and remains the fallback): Part-10 or raw datasets,
// implicit/explicit VR little endian, uncompressed 8/16-bit PixelData
// or RLE Lossless (PS3.5 Annex G segment table + PackBits, single
// fragment — the per-slice series contract), rescale slope/intercept
// applied to int16 output.
//
// Build: g++ -O3 -shared -fPIC -o _dicomfast.so dicomfast.cpp
//        (see mies_tpu/native/__init__.py::build)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <vector>

namespace {

constexpr uint32_t kUndefined = 0xFFFFFFFFu;

struct Meta {
  int32_t rows = 0;
  int32_t cols = 0;
  int32_t bits = 16;
  int32_t is_signed = 0;
  int32_t instance = -1;
  int32_t has_slice_loc = 0;
  int32_t has_ipp_z = 0;
  double slope = 1.0;
  double intercept = 0.0;
  double slice_loc = 0.0;
  double ipp_z = 0.0;
};

inline uint16_t rd16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0] | (p[1] << 8) | (p[2] << 16) |
                               (static_cast<uint32_t>(p[3]) << 24));
}

inline bool long_vr(const char* vr) {
  static const char* kLong[] = {"OB", "OW", "OF", "OD", "OL",
                                "SQ", "UC", "UR", "UT", "UN"};
  for (const char* v : kLong)
    if (vr[0] == v[0] && vr[1] == v[1]) return true;
  return false;
}

double parse_double(const uint8_t* v, uint32_t len) {
  char buf[64];
  uint32_t n = len < 63 ? len : 63;
  memcpy(buf, v, n);
  buf[n] = 0;
  return atof(buf);
}

// Reads one element header; advances pos. Returns false on truncation.
struct Elem {
  uint16_t group, elem;
  char vr[3] = {0, 0, 0};
  uint32_t length;
  size_t value_pos;
};

bool read_elem(const uint8_t* d, size_t n, size_t& pos, bool expl, Elem* e) {
  if (pos + 8 > n) return false;
  e->group = rd16(d + pos);
  e->elem = rd16(d + pos + 2);
  // item / delimiter tags always have implicit 4-byte length
  if (e->group == 0xFFFE) {
    e->length = rd32(d + pos + 4);
    pos += 8;
    e->value_pos = pos;
    return true;
  }
  if (expl) {
    e->vr[0] = static_cast<char>(d[pos + 4]);
    e->vr[1] = static_cast<char>(d[pos + 5]);
    if (long_vr(e->vr)) {
      if (pos + 12 > n) return false;
      e->length = rd32(d + pos + 8);
      pos += 12;
    } else {
      e->length = rd16(d + pos + 6);
      pos += 8;
    }
  } else {
    e->length = rd32(d + pos + 4);
    pos += 8;
  }
  e->value_pos = pos;
  return true;
}

// Skip an undefined-length element (sequence) by walking delimiters.
bool skip_undefined(const uint8_t* d, size_t n, size_t& pos, bool expl) {
  int depth = 1;
  Elem e;
  while (depth > 0) {
    if (!read_elem(d, n, pos, expl, &e)) return false;
    if (e.group == 0xFFFE && e.elem == 0xE0DD) {
      depth--;
    } else if (e.group == 0xFFFE) {
      // item start/end with defined or undefined length: contents are
      // parsed element-by-element, nothing to skip
    } else if (e.length == kUndefined) {
      depth++;
    } else {
      if (pos + e.length > n) return false;
      pos += e.length;
    }
  }
  return true;
}

// PackBits (PS3.5 G.3.2) -> exactly `expected` bytes; trailing pad
// replication past `expected` is discarded (mirrors the Python twin).
bool packbits_decode(const uint8_t* s, size_t len, uint8_t* out,
                     size_t expected) {
  size_t i = 0, o = 0;
  while (o < expected) {
    if (i >= len) return false;
    uint8_t n = s[i++];
    if (n < 128) {
      size_t cnt = static_cast<size_t>(n) + 1;
      if (i + cnt > len) return false;
      size_t take = cnt < expected - o ? cnt : expected - o;
      memcpy(out + o, s + i, take);
      i += cnt;
      o += take;
    } else if (n > 128) {
      if (i >= len) return false;
      size_t cnt = 257 - static_cast<size_t>(n);
      size_t take = cnt < expected - o ? cnt : expected - o;
      memset(out + o, s[i], take);
      i += 1;
      o += take;
    }  // n == 128: no-op
  }
  return true;
}

// One RLE Lossless fragment (64-byte segment table + PackBits planes,
// MSB plane first) -> little-endian raw pixel bytes in `out`
// (npx * bytes_per_px). Returns 0 / -7 (corrupt RLE).
int rle_decode_frame(const uint8_t* frag, size_t flen, size_t npx,
                     int bytes_per_px, std::vector<uint8_t>* out) {
  if (flen < 64) return -7;
  uint32_t nseg = rd32(frag);
  if (nseg != static_cast<uint32_t>(bytes_per_px)) return -7;
  out->resize(npx * bytes_per_px);
  std::vector<uint8_t> plane(npx);
  for (uint32_t k = 0; k < nseg; ++k) {
    uint32_t a = rd32(frag + 4 + 4 * k);
    uint32_t b = (k + 1 < nseg) ? rd32(frag + 4 + 4 * (k + 1))
                                : static_cast<uint32_t>(flen);
    if (a < 64 || b < a || b > flen) return -7;
    if (!packbits_decode(frag + a, b - a, plane.data(), npx)) return -7;
    // segment 0 carries the MSBs (PS3.5 G.2); output is little-endian
    size_t byte_idx = static_cast<size_t>(bytes_per_px - 1 - k);
    for (size_t i = 0; i < npx; ++i)
      (*out)[i * bytes_per_px + byte_idx] = plane[i];
  }
  return 0;
}

}  // namespace

extern "C" {

// Parse a DICOM file image held in memory.
//   data/len     — file bytes
//   meta         — output metadata (always filled on success)
//   out_pixels   — if non-null, int16 buffer of rows*cols receiving the
//                  rescaled HU pixels; pass null to probe metadata only.
// Returns 0 on success; negative error codes otherwise:
//   -1 truncated/garbled, -2 unsupported transfer syntax,
//   -3 missing PixelData/Rows/Cols, -4 unsupported BitsAllocated,
//   -7 corrupt RLE PixelData, -8 multi-fragment (multi-frame) RLE.
int mies_dicom_parse(const uint8_t* data, size_t len, Meta* meta,
                     int16_t* out_pixels) {
  *meta = Meta();
  size_t pos = 0;
  bool expl = true;
  bool rle = false;

  if (len > 132 && memcmp(data + 128, "DICM", 4) == 0) {
    // file-meta group: always explicit VR LE
    pos = 132;
    Elem e;
    while (pos < len) {
      size_t save = pos;
      if (!read_elem(data, len, pos, true, &e)) return -1;
      if (e.group != 0x0002) {
        pos = save;
        break;
      }
      if (pos + e.length > len) return -1;
      if (e.elem == 0x0010) {  // TransferSyntaxUID
        char uid[64] = {0};
        uint32_t n = e.length < 63 ? e.length : 63;
        memcpy(uid, data + pos, n);
        for (int i = static_cast<int>(n) - 1;
             i >= 0 && (uid[i] == 0 || uid[i] == ' '); --i)
          uid[i] = 0;
        if (strcmp(uid, "1.2.840.10008.1.2") == 0) {
          expl = false;
        } else if (strcmp(uid, "1.2.840.10008.1.2.1") == 0) {
          expl = true;
        } else if (strcmp(uid, "1.2.840.10008.1.2.5") == 0) {
          expl = true;  // encapsulated syntaxes are explicit VR LE
          rle = true;
        } else {
          return -2;
        }
      }
      pos += e.length;
    }
  }

  const uint8_t* px = nullptr;
  uint32_t px_len = 0;
  const uint8_t* frag = nullptr;  // the one RLE PixelData fragment
  uint32_t frag_len = 0;
  Elem e;
  while (pos < len) {
    if (!read_elem(data, len, pos, expl, &e)) break;
    if (e.length == kUndefined) {
      if (rle && e.group == 0x7FE0 && e.elem == 0x0010) {
        // encapsulated PixelData: Basic Offset Table item first
        // (redundant for RLE — one frame per fragment), then exactly
        // one fragment (the per-slice contract; the Python twin
        // handles multi-frame files), then the sequence delimiter.
        bool first = true;
        bool closed = false;
        while (pos < len) {
          Elem it;
          if (!read_elem(data, len, pos, expl, &it)) return -1;
          if (it.group == 0xFFFE && it.elem == 0xE0DD) {
            closed = true;
            break;
          }
          if (it.group != 0xFFFE || it.elem != 0xE000 ||
              it.length == kUndefined || pos + it.length > len)
            return -7;
          if (first) {
            first = false;  // Basic Offset Table
          } else {
            if (frag) return -8;  // second fragment = multi-frame
            frag = data + pos;
            frag_len = it.length;
          }
          pos += it.length;
        }
        if (!closed) return -7;
        continue;
      }
      if (!skip_undefined(data, len, pos, expl)) return -1;
      continue;
    }
    if (pos + e.length > len) return -1;
    const uint8_t* v = data + pos;
    uint32_t l = e.length;
    if (e.group == 0x7FE0 && e.elem == 0x0010) {
      px = v;
      px_len = l;
    } else if (e.group == 0x0028) {
      // rd16 needs 2 value bytes; a malformed zero-length US element at
      // the buffer tail must not read past the end (the Python twin
      // fails safely via struct.error) — ignore short elements instead
      switch (e.elem) {
        case 0x0010: if (l >= 2) meta->rows = rd16(v); break;
        case 0x0011: if (l >= 2) meta->cols = rd16(v); break;
        case 0x0100: if (l >= 2) meta->bits = rd16(v); break;
        case 0x0103: if (l >= 2) meta->is_signed = rd16(v) == 1; break;
        case 0x1052: if (l > 0) meta->intercept = parse_double(v, l); break;
        case 0x1053: if (l > 0) meta->slope = parse_double(v, l); break;
      }
    } else if (e.group == 0x0020) {
      if (e.elem == 0x0013) {
        meta->instance = static_cast<int32_t>(parse_double(v, l));
      } else if (e.elem == 0x1041) {
        meta->slice_loc = parse_double(v, l);
        meta->has_slice_loc = 1;
      } else if (e.elem == 0x0032) {
        // ImagePositionPatient: "x\\y\\z" — take z
        char buf[128] = {0};
        uint32_t n = l < 127 ? l : 127;
        memcpy(buf, v, n);
        char* last = strrchr(buf, '\\');
        if (last) {
          meta->ipp_z = atof(last + 1);
          meta->has_ipp_z = 1;
        }
      }
    }
    pos += e.length;
  }

  if ((!px && !frag) || meta->rows <= 0 || meta->cols <= 0) return -3;
  const size_t npx = static_cast<size_t>(meta->rows) * meta->cols;

  if (!out_pixels) return 0;

  std::vector<uint8_t> rle_buf;
  if (frag) {
    if (meta->bits != 8 && meta->bits != 16) return -4;
    int rc = rle_decode_frame(frag, frag_len, npx, meta->bits / 8, &rle_buf);
    if (rc != 0) return rc;
    px = rle_buf.data();
    px_len = static_cast<uint32_t>(rle_buf.size());
  }

  const double slope = meta->slope, icpt = meta->intercept;
  const bool rescale = slope != 1.0 || icpt != 0.0;
  // Rescaled values SATURATE at the int16 range (matching the Python
  // twin's np.clip; a float->int16 cast out of range is UB besides).
  // Unrescaled unsigned values use a bit-preserving modulo cast: the
  // Python wrapper views the buffer back as uint16.
  const auto sat16 = [](double v) -> int16_t {
    if (v <= -32768.0) return INT16_MIN;
    if (v >= 32767.0) return INT16_MAX;
    return static_cast<int16_t>(v);
  };
  if (meta->bits == 16) {
    if (px_len < npx * 2) return -1;
    if (meta->is_signed) {
      const int16_t* s = reinterpret_cast<const int16_t*>(px);
      if (rescale)
        for (size_t i = 0; i < npx; ++i)
          out_pixels[i] = sat16(static_cast<double>(
              static_cast<float>(s[i]) * slope + icpt));
      else
        memcpy(out_pixels, s, npx * 2);
    } else {
      const uint16_t* s = reinterpret_cast<const uint16_t*>(px);
      for (size_t i = 0; i < npx; ++i)
        out_pixels[i] = rescale
            ? sat16(static_cast<double>(
                  static_cast<float>(s[i]) * slope + icpt))
            : static_cast<int16_t>(s[i]);
    }
  } else if (meta->bits == 8) {
    if (px_len < npx) return -1;
    for (size_t i = 0; i < npx; ++i)
      out_pixels[i] = rescale
          ? sat16(static_cast<double>(
                static_cast<float>(px[i]) * slope + icpt))
          : static_cast<int16_t>(px[i]);
  } else {
    return -4;
  }
  return 0;
}

// Read + parse a file from disk (avoids shipping bytes through Python).
int mies_dicom_read_file(const char* path, Meta* meta, int16_t* out_pixels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -5;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz <= 0) {
    fclose(f);
    return -5;
  }
  uint8_t* buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(sz)));
  if (!buf) {
    fclose(f);
    return -6;
  }
  size_t got = fread(buf, 1, static_cast<size_t>(sz), f);
  fclose(f);
  int rc = (got == static_cast<size_t>(sz))
               ? mies_dicom_parse(buf, got, meta, out_pixels)
               : -5;
  free(buf);
  return rc;
}

}  // extern "C"

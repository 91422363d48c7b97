// Snappy block-format codec, implemented from the public format description
// (github.com/google/snappy/blob/main/format_description.txt).
//
// Native equivalent of the reference's snappy dependency: the reference
// camera server compresses each packed point payload with snappy::Compress
// and the client decompresses with snappy::Uncompress (reference:
// src/pcs-camera-server.cpp / src/pcs-multicamera-client.cpp — SURVEY.md §1
// L1 "snappy-compressed payload"). This implementation is wire-compatible:
// it decodes any valid snappy stream and produces streams any snappy
// decoder accepts (greedy 64 KiB-block LZ77 with 2-byte-offset copies).
//
// Exposed as a plain C ABI for ctypes (no CPython API dependency).

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

constexpr size_t kBlockSize = 1 << 16;        // 64 KiB compression blocks
constexpr int kHashBits = 14;
constexpr size_t kHashSize = 1 << kHashBits;

inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint32_t hash32(uint32_t v) {
  return (v * 0x1e35a7bdu) >> (32 - kHashBits);
}

// --- varint --------------------------------------------------------------

inline size_t varint_encode(uint64_t v, uint8_t* out) {
  size_t n = 0;
  while (v >= 0x80) {
    out[n++] = static_cast<uint8_t>(v) | 0x80;
    v >>= 7;
  }
  out[n++] = static_cast<uint8_t>(v);
  return n;
}

inline bool varint_decode(const uint8_t*& p, const uint8_t* end,
                          uint64_t* out) {
  uint64_t v = 0;
  int shift = 0;
  while (p < end && shift <= 63) {
    uint8_t b = *p++;
    v |= static_cast<uint64_t>(b & 0x7f) << shift;
    if (!(b & 0x80)) {
      *out = v;
      return true;
    }
    shift += 7;
  }
  return false;
}

// --- emit helpers --------------------------------------------------------

inline uint8_t* emit_literal(uint8_t* op, const uint8_t* lit, size_t len) {
  size_t n = len - 1;
  if (n < 60) {
    *op++ = static_cast<uint8_t>(n << 2);
  } else if (n < (1u << 8)) {
    *op++ = 60 << 2;
    *op++ = static_cast<uint8_t>(n);
  } else if (n < (1u << 16)) {
    *op++ = 61 << 2;
    *op++ = static_cast<uint8_t>(n);
    *op++ = static_cast<uint8_t>(n >> 8);
  } else if (n < (1u << 24)) {
    *op++ = 62 << 2;
    *op++ = static_cast<uint8_t>(n);
    *op++ = static_cast<uint8_t>(n >> 8);
    *op++ = static_cast<uint8_t>(n >> 16);
  } else {
    *op++ = 63 << 2;
    *op++ = static_cast<uint8_t>(n);
    *op++ = static_cast<uint8_t>(n >> 8);
    *op++ = static_cast<uint8_t>(n >> 16);
    *op++ = static_cast<uint8_t>(n >> 24);
  }
  std::memcpy(op, lit, len);
  return op + len;
}

// copy with 2-byte offset: len in [1, 64], offset in [1, 65535]
inline uint8_t* emit_copy2(uint8_t* op, size_t offset, size_t len) {
  *op++ = static_cast<uint8_t>(((len - 1) << 2) | 2);
  *op++ = static_cast<uint8_t>(offset);
  *op++ = static_cast<uint8_t>(offset >> 8);
  return op;
}

inline uint8_t* emit_copy(uint8_t* op, size_t offset, size_t len) {
  while (len >= 68) {
    op = emit_copy2(op, offset, 64);
    len -= 64;
  }
  if (len > 64) {
    op = emit_copy2(op, offset, 60);
    len -= 60;
  }
  return emit_copy2(op, offset, len);
}

}  // namespace

extern "C" {

// Worst-case compressed size (mirrors snappy::MaxCompressedLength).
size_t pcs_snappy_max_compressed_length(size_t n) {
  return 32 + n + n / 6;
}

// Returns compressed size, or 0 on error. `out` must have
// pcs_snappy_max_compressed_length(n) bytes.
size_t pcs_snappy_compress(const uint8_t* in, size_t n, uint8_t* out) {
  uint8_t* op = out + varint_encode(n, out);
  static thread_local uint16_t table[kHashSize];

  size_t pos = 0;
  while (pos < n) {
    const size_t block_len = (n - pos < kBlockSize) ? (n - pos) : kBlockSize;
    const uint8_t* base = in + pos;
    std::memset(table, 0, sizeof(table));

    size_t ip = 0;
    size_t lit_start = 0;
    if (block_len >= 15) {
      const size_t limit = block_len - 4;  // room to load 4 bytes
      ip = 1;
      while (ip < limit) {
        uint32_t cur = load32(base + ip);
        uint32_t h = hash32(cur);
        size_t cand = table[h];
        table[h] = static_cast<uint16_t>(ip);
        if (cand < ip && load32(base + cand) == cur) {
          // extend match
          size_t mlen = 4;
          while (ip + mlen < block_len && base[cand + mlen] == base[ip + mlen])
            ++mlen;
          if (ip > lit_start)
            op = emit_literal(op, base + lit_start, ip - lit_start);
          op = emit_copy(op, ip - cand, mlen);
          ip += mlen;
          lit_start = ip;
          // re-prime the table at the new position
          if (ip < limit) {
            table[hash32(load32(base + ip - 1))] =
                static_cast<uint16_t>(ip - 1);
          }
          continue;
        }
        ++ip;
      }
    }
    if (block_len > lit_start)
      op = emit_literal(op, base + lit_start, block_len - lit_start);
    pos += block_len;
  }
  return static_cast<size_t>(op - out);
}

// Returns the uncompressed length encoded in a snappy stream, or SIZE_MAX.
size_t pcs_snappy_uncompressed_length(const uint8_t* in, size_t n) {
  const uint8_t* p = in;
  uint64_t len;
  if (!varint_decode(p, in + n, &len)) return static_cast<size_t>(-1);
  return static_cast<size_t>(len);
}

// Returns 0 on success. `out` must have pcs_snappy_uncompressed_length bytes.
int pcs_snappy_decompress(const uint8_t* in, size_t n, uint8_t* out,
                          size_t out_cap) {
  const uint8_t* p = in;
  const uint8_t* end = in + n;
  uint64_t expected;
  if (!varint_decode(p, end, &expected)) return -1;
  if (expected > out_cap) return -2;

  uint8_t* op = out;
  uint8_t* op_end = out + expected;
  while (p < end) {
    const uint8_t tag = *p++;
    const int type = tag & 3;
    size_t len, offset = 0;
    if (type == 0) {                      // literal
      len = (tag >> 2) + 1;
      if (len > 60) {
        const size_t nb = len - 60;
        if (p + nb > end) return -3;
        len = 0;
        for (size_t i = 0; i < nb; ++i) len |= static_cast<size_t>(p[i]) << (8 * i);
        len += 1;
        p += nb;
      }
      if (p + len > end || op + len > op_end) return -4;
      std::memcpy(op, p, len);
      p += len;
      op += len;
      continue;
    } else if (type == 1) {               // copy, 1-byte offset
      if (p >= end) return -5;
      len = 4 + ((tag >> 2) & 0x7);
      offset = (static_cast<size_t>(tag >> 5) << 8) | *p++;
    } else if (type == 2) {               // copy, 2-byte offset
      if (p + 2 > end) return -5;
      len = (tag >> 2) + 1;
      offset = static_cast<size_t>(p[0]) | (static_cast<size_t>(p[1]) << 8);
      p += 2;
    } else {                              // copy, 4-byte offset
      if (p + 4 > end) return -5;
      len = (tag >> 2) + 1;
      offset = static_cast<size_t>(p[0]) | (static_cast<size_t>(p[1]) << 8) |
               (static_cast<size_t>(p[2]) << 16) |
               (static_cast<size_t>(p[3]) << 24);
      p += 4;
    }
    if (offset == 0 || offset > static_cast<size_t>(op - out)) return -6;
    if (op + len > op_end) return -7;
    // overlapping copies must run byte-by-byte (RLE-style references)
    const uint8_t* src = op - offset;
    for (size_t i = 0; i < len; ++i) op[i] = src[i];
    op += len;
  }
  return (op == op_end) ? 0 : -8;
}

}  // extern "C"

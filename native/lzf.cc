// LZF codec — the compression PCL uses for PCD `DATA binary_compressed`
// sections (pcl::lzfCompress/lzfDecompress, themselves liblzf-format).
// Implemented from scratch against the public LZF stream format so PCD
// files round-trip with PCL tooling (SURVEY.md §1 L4 / §3.4: the
// registration tool loads .pcd clouds; compressed is PCL's default
// on-disk mode for `pcl_convert_pcd_ascii_binary 2`).
//
// Stream format (canonical, fixed by every decoder):
//   ctrl < 0x20 : literal run of (ctrl+1) bytes follows
//   ctrl >= 0x20: back-reference; len = (ctrl >> 5), len == 7 adds the
//                 next byte; offset = ((ctrl & 0x1f) << 8 | next) + 1
//                 back from the current output position; copy len+2
//                 bytes (overlap allowed, byte-serial semantics).
//
// Any format-valid encoder is interchangeable; this one uses the usual
// 3-byte-hash greedy parse with an 8 KiB window.

#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

constexpr std::size_t kHashBits = 14;
constexpr std::size_t kHashSize = std::size_t(1) << kHashBits;
constexpr std::ptrdiff_t kMaxOff = 1 << 13;     // 8 KiB window
constexpr std::size_t kMaxMatch = 264;          // 2 + 7 + 255
constexpr std::size_t kMaxLit = 32;             // ctrl 0..31

inline std::uint32_t seq3(const std::uint8_t *p) {
  return std::uint32_t(p[0]) << 16 | std::uint32_t(p[1]) << 8 | p[2];
}

inline std::size_t hash3(std::uint32_t s) {
  return (s * 2654435761u) >> (32 - kHashBits) & (kHashSize - 1);
}

}  // namespace

extern "C" {

// Compress in[0..in_len) into out (capacity out_cap). Returns bytes
// written, or 0 if the output would not fit (callers size out_cap >=
// in_len + in_len/32 + 2 to make failure impossible) or in_len == 0.
std::size_t pcs_lzf_compress(const std::uint8_t *in, std::size_t in_len,
                             std::uint8_t *out, std::size_t out_cap) {
  if (in_len == 0) return 0;
  std::ptrdiff_t htab[kHashSize];
  for (std::size_t i = 0; i < kHashSize; ++i) htab[i] = -1;

  std::size_t ip = 0, op = 0, lit_start = 0, nlit = 0;

  auto flush_literals = [&]() -> bool {
    while (nlit) {
      std::size_t run = nlit < kMaxLit ? nlit : kMaxLit;
      if (op + 1 + run > out_cap) return false;
      out[op++] = std::uint8_t(run - 1);
      std::memcpy(out + op, in + lit_start, run);
      op += run;
      lit_start += run;
      nlit -= run;
    }
    return true;
  };

  while (ip + 2 < in_len) {
    std::uint32_t s = seq3(in + ip);
    std::size_t h = hash3(s);
    std::ptrdiff_t ref = htab[h];
    htab[h] = std::ptrdiff_t(ip);
    std::ptrdiff_t off = std::ptrdiff_t(ip) - ref - 1;
    if (ref >= 0 && off < kMaxOff && seq3(in + ref) == s) {
      std::size_t limit = in_len - ip;
      if (limit > kMaxMatch) limit = kMaxMatch;
      std::size_t len = 3;
      while (len < limit && in[std::size_t(ref) + len] == in[ip + len])
        ++len;
      if (!flush_literals()) return 0;
      std::size_t l = len - 2;
      if (l < 7) {
        if (op + 2 > out_cap) return 0;
        out[op++] = std::uint8_t((l << 5) | (off >> 8));
      } else {
        if (op + 3 > out_cap) return 0;
        out[op++] = std::uint8_t((7 << 5) | (off >> 8));
        out[op++] = std::uint8_t(l - 7);
      }
      out[op++] = std::uint8_t(off & 0xff);
      // seed the table with a couple of in-match positions so runs of
      // the same pattern keep matching (greedy parse quality, not
      // format correctness)
      if (ip + len + 2 < in_len) {
        htab[hash3(seq3(in + ip + 1))] = std::ptrdiff_t(ip + 1);
        htab[hash3(seq3(in + ip + 2))] = std::ptrdiff_t(ip + 2);
      }
      ip += len;
      lit_start = ip;
    } else {
      ++nlit;
      ++ip;
    }
  }
  nlit += in_len - ip;  // tail (< 3 bytes) can only be literal
  if (!flush_literals()) return 0;
  return op;
}

// Decompress in[0..in_len) into out (capacity out_cap). Returns bytes
// written, or 0 on a corrupt stream / capacity overrun.
std::size_t pcs_lzf_decompress(const std::uint8_t *in, std::size_t in_len,
                               std::uint8_t *out, std::size_t out_cap) {
  std::size_t ip = 0, op = 0;
  while (ip < in_len) {
    std::uint8_t ctrl = in[ip++];
    if (ctrl < 0x20) {  // literal run
      std::size_t run = std::size_t(ctrl) + 1;
      if (ip + run > in_len || op + run > out_cap) return 0;
      std::memcpy(out + op, in + ip, run);
      ip += run;
      op += run;
    } else {  // back-reference
      std::size_t len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return 0;
        len += in[ip++];
      }
      len += 2;
      if (ip >= in_len) return 0;
      std::size_t back = (std::size_t(ctrl & 0x1f) << 8 | in[ip++]) + 1;
      if (back > op || op + len > out_cap) return 0;
      // byte-serial copy: overlapping references repeat the window
      const std::uint8_t *src = out + op - back;
      std::uint8_t *dst = out + op;
      for (std::size_t i = 0; i < len; ++i) dst[i] = src[i];
      op += len;
    }
  }
  return op;
}

}  // extern "C"

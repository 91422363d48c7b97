// Native camera server daemon.
//
// C++ counterpart of the reference's pcs-camera-server (reference:
// src/pcs-camera-server.cpp — SURVEY.md §3.1): bind/listen/accept, then one
// depth frame per 1-byte pull request, snappy-compressed, length-prefixed.
// Per the rebuild plan (SURVEY.md §2.1 native checklist), capture + socket
// ingest stay native on the host while all geometry runs on the TPU, so the
// wire carries raw u16 depth (DEPTH16 frames of runtime/wire.py).
//
// Frame sources:
//   --file scene.npy   replay a [T, H, W] uint16 .npy recording (the format
//                      MulticameraClient.save_recording writes)
//   --synthetic        procedural multi-octave scene (matches the Python
//                      generator's character, not its exact values)
// A librealsense capture source slots in where FrameSource does — this
// daemon is the deployment shell for it (librealsense is not available in
// this build environment).
//
// Build: make native-server  (or scripts in native/)
//
// Wire header (little-endian, 16 bytes — see runtime/wire.py):
//   u32 payload_size | u8 kind | u8 codec | u8 flags | u8 rsvd |
//   u32 seq | u16 rows | u16 cols

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

extern "C" {
size_t pcs_snappy_max_compressed_length(size_t n);
size_t pcs_snappy_compress(const uint8_t* in, size_t n, uint8_t* out);
}

namespace {

constexpr uint8_t kKindDepth16 = 0;
constexpr uint8_t kKindDepth16Color = 2;
constexpr uint8_t kCodecRaw = 0;
constexpr uint8_t kCodecSnappy = 2;

struct Frames {
  size_t t = 0, h = 0, w = 0;
  std::vector<uint16_t> data;
  std::vector<uint8_t> rgb;  // empty, or [t, h, w, 3] depth-aligned color
  const uint16_t* frame(size_t i) const { return data.data() + (i % t) * h * w; }
  const uint8_t* color(size_t i) const { return rgb.data() + (i % t) * h * w * 3; }
};

// Synthetic depth-aligned RGB, same formula as the Python fake server
// (runtime/fake_server.py): hue from depth, stable per pixel.
void make_colors(Frames* fr) {
  fr->rgb.resize(fr->data.size() * 3);
  for (size_t i = 0; i < fr->data.size(); ++i) {
    const float d = static_cast<float>(fr->data[i]);
    auto clip = [](float x) {
      return static_cast<uint8_t>(x < 0.f ? 0.f : (x > 255.f ? 255.f : x));
    };
    fr->rgb[i * 3 + 0] = clip(d / 16.0f);
    fr->rgb[i * 3 + 1] = clip(255.0f - d / 16.0f);
    fr->rgb[i * 3 + 2] = 128;
  }
}

// Minimal .npy (v1/v2) reader for little-endian uint16 C-order arrays.
bool load_npy_u16(const std::string& path, Frames* out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  uint8_t ver[2];
  f.read(reinterpret_cast<char*>(ver), 2);
  uint32_t hlen = 0;
  if (ver[0] == 1) {
    uint16_t h16;
    f.read(reinterpret_cast<char*>(&h16), 2);
    hlen = h16;
  } else {
    f.read(reinterpret_cast<char*>(&hlen), 4);
  }
  std::string header(hlen, '\0');
  f.read(header.data(), hlen);
  if (header.find("'<u2'") == std::string::npos &&
      header.find("'|u2'") == std::string::npos &&
      header.find("uint16") == std::string::npos) {
    std::fprintf(stderr, "npy: expected uint16 ('<u2'), got: %s\n",
                 header.c_str());
    return false;
  }
  if (header.find("'fortran_order': False") == std::string::npos) return false;
  auto sp = header.find("'shape':");
  if (sp == std::string::npos) return false;
  size_t t, h, w;
  if (std::sscanf(header.c_str() + sp, "'shape': (%zu, %zu, %zu)",
                  &t, &h, &w) != 3)
    return false;
  out->t = t; out->h = h; out->w = w;
  out->data.resize(t * h * w);
  f.read(reinterpret_cast<char*>(out->data.data()),
         static_cast<std::streamsize>(out->data.size() * 2));
  return static_cast<bool>(f);
}

Frames synthetic_frames(size_t t, size_t h, size_t w, unsigned seed) {
  Frames fr;
  fr.t = t; fr.h = h; fr.w = w;
  fr.data.resize(t * h * w);
  unsigned state = seed * 2654435761u + 1u;
  auto rnd = [&state]() {
    state = state * 1664525u + 1013904223u;
    return (state >> 8) * (1.0f / 16777216.0f);
  };
  for (size_t k = 0; k < t; ++k) {
    const float p = 0.02f * static_cast<float>(k);
    for (size_t v = 0; v < h; ++v) {
      for (size_t u = 0; u < w; ++u) {
        float d = 1500.f
            + 500.f * std::sin(static_cast<float>(u) / (w * 0.23f) + p)
            + 400.f * std::cos(static_cast<float>(v) / (h * 0.19f))
            + 150.f * std::sin(static_cast<float>(u) / (w * 0.041f) + 1.f + p)
            + 120.f * std::cos(static_cast<float>(v) / (h * 0.037f));
        if (rnd() < 0.07f) d = 0.f;
        if (d < 0.f) d = 0.f;
        if (d > 4000.f) d = 4000.f;
        fr.data[(k * h + v) * w + u] = static_cast<uint16_t>(d);
      }
    }
  }
  return fr;
}

bool send_all(int fd, const uint8_t* p, size_t n) {
  while (n > 0) {
    ssize_t r = ::send(fd, p, n, 0);
    if (r <= 0) return false;
    p += r;
    n -= static_cast<size_t>(r);
  }
  return true;
}

void serve_client(int fd, const Frames& fr, uint8_t codec, double fps) {
  const bool with_color = !fr.rgb.empty();
  std::vector<uint8_t> out, staging;
  const size_t depth_len = fr.h * fr.w * 2;
  const size_t raw_len = depth_len + (with_color ? fr.h * fr.w * 3 : 0);
  out.resize(16 + pcs_snappy_max_compressed_length(raw_len));
  if (with_color) staging.resize(raw_len);
  uint32_t seq = 0;
  auto last = std::chrono::steady_clock::now();
  for (;;) {
    uint8_t pull;
    if (::recv(fd, &pull, 1, MSG_WAITALL) != 1) return;
    if (fps > 0.0) {
      auto next = last + std::chrono::duration_cast<
          std::chrono::steady_clock::duration>(
              std::chrono::duration<double>(1.0 / fps));
      std::this_thread::sleep_until(next);
      last = std::chrono::steady_clock::now();
    }
    const uint8_t* raw = reinterpret_cast<const uint8_t*>(fr.frame(seq));
    if (with_color) {
      // DEPTH16_COLOR payload: depth block then RGB block (wire.py)
      std::memcpy(staging.data(), raw, depth_len);
      std::memcpy(staging.data() + depth_len, fr.color(seq),
                  raw_len - depth_len);
      raw = staging.data();
    }
    size_t body;
    if (codec == kCodecSnappy) {
      body = pcs_snappy_compress(raw, raw_len, out.data() + 16);
    } else {
      std::memcpy(out.data() + 16, raw, raw_len);
      body = raw_len;
    }
    uint32_t size32 = static_cast<uint32_t>(body);
    uint16_t rows = static_cast<uint16_t>(fr.h);
    uint16_t cols = static_cast<uint16_t>(fr.w);
    std::memcpy(out.data() + 0, &size32, 4);
    out[4] = with_color ? kKindDepth16Color : kKindDepth16;
    out[5] = codec;
    out[6] = 0;
    out[7] = 0;
    std::memcpy(out.data() + 8, &seq, 4);
    std::memcpy(out.data() + 12, &rows, 2);
    std::memcpy(out.data() + 14, &cols, 2);
    if (!send_all(fd, out.data(), 16 + body)) return;
    ++seq;
  }
}

}  // namespace

int main(int argc, char** argv) {
  int port = 8000;
  std::string file;
  bool synthetic = false;
  size_t n_frames = 64, height = 480, width = 848;
  unsigned seed = 0;
  uint8_t codec = kCodecSnappy;
  double fps = 0.0;
  bool color = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() { return std::string(argv[++i]); };
    if (a == "--port") port = std::stoi(next());
    else if (a == "--file") file = next();
    else if (a == "--color") color = true;
    else if (a == "--synthetic") synthetic = true;
    else if (a == "--n-frames") n_frames = std::stoul(next());
    else if (a == "--height") height = std::stoul(next());
    else if (a == "--width") width = std::stoul(next());
    else if (a == "--seed") seed = std::stoul(next());
    else if (a == "--fps") fps = std::stod(next());
    else if (a == "--codec") codec = next() == "raw" ? kCodecRaw
                                                     : kCodecSnappy;
    else {
      std::fprintf(stderr,
                   "usage: %s [--port P] (--file X.npy | --synthetic) "
                   "[--n-frames T --height H --width W --seed S] "
                   "[--fps F] [--codec snappy|raw] [--color]\n", argv[0]);
      return 2;
    }
  }

  Frames fr;
  if (!file.empty()) {
    if (!load_npy_u16(file, &fr)) {
      std::fprintf(stderr, "failed to load %s\n", file.c_str());
      return 1;
    }
  } else if (synthetic) {
    fr = synthetic_frames(n_frames, height, width, seed);
  } else {
    std::fprintf(stderr, "need --file or --synthetic\n");
    return 2;
  }
  if (color) make_colors(&fr);

  int srv = ::socket(AF_INET, SOCK_STREAM, 0);
  int one = 1;
  ::setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (::bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0 ||
      ::listen(srv, 4) != 0) {
    std::perror("bind/listen");
    return 1;
  }
  std::printf("native camera server on 0.0.0.0:%d (%zu frames %zux%zu)\n",
              port, fr.t, fr.h, fr.w);
  std::fflush(stdout);
  for (;;) {
    int fd = ::accept(srv, nullptr, nullptr);
    if (fd < 0) continue;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    std::thread(serve_client, fd, std::cref(fr), codec, fps).detach();
  }
}

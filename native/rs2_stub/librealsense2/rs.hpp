// CI-only stub of the librealsense2 C++ API surface used by
// native/camera_server.cc's Rs2Source. librealsense2 is not installable in
// this build environment, so `make native-server-rs2check` compiles the
// daemon with -DPCS_WITH_RS2 -fsyntax-only against THIS header to keep the
// real-capture path buildable; a rig operator builds `make
// native-server-rs2` against the real SDK instead (which shadows this
// directory). Signatures mirror the public API of librealsense2 2.x
// (https://github.com/IntelRealSense/librealsense, rs.hpp et al.); bodies
// are inert placeholders.
#pragma once

#include <stdexcept>

typedef enum rs2_stream {
  RS2_STREAM_ANY,
  RS2_STREAM_DEPTH,
  RS2_STREAM_COLOR,
} rs2_stream;

typedef enum rs2_format {
  RS2_FORMAT_ANY,
  RS2_FORMAT_Z16,
  RS2_FORMAT_RGB8,
} rs2_format;

typedef enum rs2_distortion {
  RS2_DISTORTION_NONE,
  RS2_DISTORTION_MODIFIED_BROWN_CONRADY,
  RS2_DISTORTION_INVERSE_BROWN_CONRADY,
  RS2_DISTORTION_BROWN_CONRADY,
} rs2_distortion;

typedef struct rs2_intrinsics {
  int width;
  int height;
  float ppx;
  float ppy;
  float fx;
  float fy;
  rs2_distortion model;
  float coeffs[5];
} rs2_intrinsics;

namespace rs2 {

class error : public std::runtime_error {
 public:
  error() : std::runtime_error("rs2 stub") {}
};

class frame {
 public:
  explicit operator bool() const { return false; }
  const void* get_data() const { return nullptr; }
};

class video_frame : public frame {};
class depth_frame : public video_frame {};

class frameset : public frame {
 public:
  depth_frame get_depth_frame() const { return {}; }
  video_frame get_color_frame() const { return {}; }
};

class video_stream_profile;

class stream_profile {
 public:
  template <class T>
  T as() const {
    return T();
  }
};

class video_stream_profile : public stream_profile {
 public:
  rs2_intrinsics get_intrinsics() const { return rs2_intrinsics{}; }
};

class config {
 public:
  void enable_stream(rs2_stream, int, int, rs2_format, int) {}
};

class pipeline_profile {
 public:
  stream_profile get_stream(rs2_stream) const { return {}; }
};

class pipeline {
 public:
  pipeline_profile start(const config&) { return {}; }
  frameset wait_for_frames(unsigned int timeout_ms = 5000) { return {}; }
};

class align {
 public:
  explicit align(rs2_stream) {}
  frameset process(frameset f) { return f; }
};

}  // namespace rs2

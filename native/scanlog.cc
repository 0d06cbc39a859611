// Binary scan-log codec — the session recording/replay backend.
//
// The reference consumes live ROS topics and keeps nothing (SLAM.m:73-74);
// recorded sessions are this engine's replayable equivalent of a bag file.
// Format (little-endian):
//   header:  magic "EKSL" | u32 version | u32 n_ticks | u32 n_beams
//   payload: n_ticks records of { f32 odom[3]; f32 ranges[n_beams]; }
// NaN range values encode "no return", matching the simulator and the
// extractor's validity masking (ops/scan.py).
//
// Exposed as a tiny C ABI for ctypes (no pybind11 in the build image).
// I/O is done with buffered stdio in one pass; decode validates the header
// and sizes before touching output buffers.

#include <cstdint>
#include <cstdio>
#include <cstring>

#include "scanlog_format.h"

namespace {

using ekslog::kMagic;
using ekslog::kVersion;
using Header = ekslog::Header;

}  // namespace

extern "C" {

// Returns 0 on success, negative error codes otherwise.
int scanlog_write(const char* path, uint32_t n_ticks, uint32_t n_beams,
                  const float* odom, const float* ranges) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  Header h{kMagic, kVersion, n_ticks, n_beams};
  if (std::fwrite(&h, sizeof(h), 1, f) != 1) { std::fclose(f); return -2; }
  for (uint32_t t = 0; t < n_ticks; ++t) {
    if (std::fwrite(odom + 3ull * t, sizeof(float), 3, f) != 3 ||
        std::fwrite(ranges + (uint64_t)n_beams * t, sizeof(float), n_beams,
                    f) != n_beams) {
      std::fclose(f);
      return -2;
    }
  }
  return std::fclose(f) == 0 ? 0 : -2;
}

// Reads only the header; outputs tick/beam counts so the caller can size
// buffers.  Returns 0 on success.
int scanlog_info(const char* path, uint32_t* n_ticks, uint32_t* n_beams) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (std::fread(&h, sizeof(h), 1, f) != 1) { std::fclose(f); return -2; }
  std::fclose(f);
  if (h.magic != kMagic) return -3;
  if (h.version != kVersion) return -4;
  *n_ticks = h.n_ticks;
  *n_beams = h.n_beams;
  return 0;
}

// Full decode into caller-allocated buffers (odom: n_ticks*3 floats,
// ranges: n_ticks*n_beams floats).  Returns 0 on success.
int scanlog_read(const char* path, uint32_t n_ticks, uint32_t n_beams,
                 float* odom, float* ranges) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  Header h;
  if (std::fread(&h, sizeof(h), 1, f) != 1) { std::fclose(f); return -2; }
  if (h.magic != kMagic || h.version != kVersion ||
      h.n_ticks != n_ticks || h.n_beams != n_beams) {
    std::fclose(f);
    return -3;
  }
  for (uint32_t t = 0; t < n_ticks; ++t) {
    if (std::fread(odom + 3ull * t, sizeof(float), 3, f) != 3 ||
        std::fread(ranges + (uint64_t)n_beams * t, sizeof(float), n_beams,
                   f) != n_beams) {
      std::fclose(f);
      return -2;
    }
  }
  std::fclose(f);
  return 0;
}

}  // extern "C"

// Shared scan-log binary format (little-endian) — see scanlog.cc for the
// codec and scan_feeder.cc for the robot-side streamer.
//   header:  magic "EKSL" | u32 version | u32 n_ticks | u32 n_beams
//   payload: n_ticks records of { f32 odom[3]; f32 ranges[n_beams]; }
#ifndef EKF_SLAM_TPU_NATIVE_SCANLOG_FORMAT_H_
#define EKF_SLAM_TPU_NATIVE_SCANLOG_FORMAT_H_

#include <cstdint>

namespace ekslog {

constexpr uint32_t kMagic = 0x4c534b45;  // "EKSL"
constexpr uint32_t kVersion = 1;

struct Header {
  uint32_t magic;
  uint32_t version;
  uint32_t n_ticks;
  uint32_t n_beams;
};

}  // namespace ekslog

#endif  // EKF_SLAM_TPU_NATIVE_SCANLOG_FORMAT_H_

// Robot-side live scan feeder: stream a recorded scan log over TCP.
//
// The reference's robot side is a ROS publisher on the robot's own
// computer (test_SLAM.m:11 connects to 192.168.1.13) — native code, not
// MATLAB.  This is that side for this engine: a standalone C++ binary
// that replays a scan log (native/scanlog.cc format) over the EKSL
// socket protocol that io/socket_feed.SocketScanSource consumes:
//
//   header   : "EKSL" | u32 n_beams | u8 't' dtype ('f' = f32)
//   per tick : u32 tag=1 | (3 + n_beams) f32  (odom pose, then ranges)
//   shutdown : u32 tag=2
//
// Usage: scan_feeder <scanlog> <port> [rate_hz]
//   rate_hz > 0 paces ticks at the sensor cadence; 0/absent = as fast
//   as the socket accepts them.  Listens on 127.0.0.1, serves ONE
//   client, exits 0 after the end tag.
//
// Built on demand by io/socket_feed.native_feeder_path() (g++, like the
// scanlog codec); no dependencies beyond POSIX sockets.

#include <arpa/inet.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>

#include "scanlog_format.h"

namespace {

bool send_all(int fd, const void* buf, size_t n) {
  const char* p = static_cast<const char*>(buf);
  while (n > 0) {
    ssize_t w = ::send(fd, p, n, 0);
    if (w <= 0) return false;
    p += w;
    n -= static_cast<size_t>(w);
  }
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <scanlog> <port> [rate_hz]\n", argv[0]);
    return 2;
  }
  const char* path = argv[1];
  const int port = std::atoi(argv[2]);
  const double rate_hz = argc > 3 ? std::atof(argv[3]) : 0.0;

  // -- load the log ---------------------------------------------------------
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::perror("scanlog open"); return 1; }
  ekslog::Header h;
  if (std::fread(&h, sizeof(h), 1, f) != 1 || h.magic != ekslog::kMagic ||
      h.version != ekslog::kVersion) {
    std::fprintf(stderr, "not an EKSL scan log: %s\n", path);
    std::fclose(f);
    return 1;
  }
  const uint64_t rec = 3ull + h.n_beams;
  std::vector<float> data(rec * h.n_ticks);
  if (std::fread(data.data(), sizeof(float), data.size(), f) !=
      data.size()) {
    std::fprintf(stderr, "truncated scan log: %s\n", path);
    std::fclose(f);
    return 1;
  }
  std::fclose(f);

  // -- listen / accept one client ------------------------------------------
  int srv = ::socket(AF_INET, SOCK_STREAM, 0);
  if (srv < 0) { std::perror("socket"); return 1; }
  int one = 1;
  ::setsockopt(srv, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons(static_cast<uint16_t>(port));
  addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
  if (::bind(srv, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
    std::perror("bind");
    return 1;
  }
  if (::listen(srv, 1) != 0) { std::perror("listen"); return 1; }
  std::fprintf(stderr, "[scan_feeder] %u ticks x %u beams on 127.0.0.1:%d\n",
               h.n_ticks, h.n_beams, port);
  std::fflush(stderr);
  int cli = ::accept(srv, nullptr, nullptr);
  if (cli < 0) { std::perror("accept"); return 1; }
  ::setsockopt(cli, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));

  // -- protocol header (packed: 4s + u32 + u8) ------------------------------
  char hdr[9];
  std::memcpy(hdr, "EKSL", 4);
  uint32_t nb = h.n_beams;
  std::memcpy(hdr + 4, &nb, 4);
  hdr[8] = 'f';
  bool ok = send_all(cli, hdr, sizeof(hdr));

  // -- stream ---------------------------------------------------------------
  const uint32_t kTick = 1, kEnd = 2;
  timespec period{};
  if (rate_hz > 0) {
    period.tv_sec = static_cast<time_t>(1.0 / rate_hz);
    period.tv_nsec =
        static_cast<long>((1.0 / rate_hz - period.tv_sec) * 1e9);
  }
  for (uint32_t t = 0; ok && t < h.n_ticks; ++t) {
    if (rate_hz > 0) ::nanosleep(&period, nullptr);
    ok = send_all(cli, &kTick, 4) &&
         send_all(cli, data.data() + rec * t, rec * sizeof(float));
  }
  if (ok) ok = send_all(cli, &kEnd, 4);
  ::close(cli);
  ::close(srv);
  if (!ok) {
    std::fprintf(stderr, "[scan_feeder] client dropped mid-stream\n");
    return 1;
  }
  return 0;
}

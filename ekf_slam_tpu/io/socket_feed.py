"""Live sensor feed over a PROCESS boundary: the reference's ROS seam.

The reference's defining operating mode is a live scan/odometry stream
arriving from another process over the network — `rosinit` +
`rossubscriber('/scan'|'/odom')` + blocking `receive`
(/root/reference/SLAM.m:23-24, 73-74; /root/reference/test_SLAM.m:11).
This module is that seam without the ROS stack: a dependency-free
length-tagged binary protocol over TCP, a feeder (`serve_trajectory` —
the "robot" side) and a receiver (`SocketScanSource`) that plugs
straight into the streaming driver:

    src = SocketScanSource("localhost", port)            # blocks: connect
    stream = StreamingSlamSession(sess, n_beams=src.n_beams, ...)
    for odom, ranges in src:                             # blocking receive
        outs = stream.push(odom, ranges)

Wire format (little-endian):
    header   : magic b"EKSL" | u32 n_beams | u8 dtype ('f'=f32, 'd'=f64)
    per tick : u32 tag=1 | (3+n_beams) floats (odom pose, then ranges)
    shutdown : u32 tag=2

examples/socket_slam.py runs the full two-process loop and checks the
result is tick-exact against the offline fused run.
"""
from __future__ import annotations

import socket
import struct
import time
from typing import Iterator, Optional, Tuple

import numpy as np

MAGIC = b"EKSL"
_HDR = struct.Struct("<4sIB")
_TAG = struct.Struct("<I")
TAG_TICK = 1
TAG_END = 2


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError(
                f"scan feed closed mid-message ({len(buf)}/{n} bytes)")
        buf.extend(chunk)
    return bytes(buf)


def serve_trajectory(port: int, odom: np.ndarray, ranges: np.ndarray,
                     host: str = "127.0.0.1",
                     rate_hz: Optional[float] = None,
                     ready_event=None) -> None:
    """Feeder ("robot") side: listen, accept ONE client, stream every
    tick, send the end tag, close.  ``rate_hz`` throttles to a sensor
    cadence (None = as fast as the socket takes them).  Runs in its own
    process or thread; ``ready_event.set()`` fires once listening."""
    odom = np.asarray(odom)
    ranges = np.asarray(ranges)
    assert odom.ndim == 2 and odom.shape[1] == 3
    assert ranges.ndim == 2 and ranges.shape[0] == odom.shape[0]
    dt = np.float64 if odom.dtype == np.float64 else np.float32
    dtype_char = b"d" if dt == np.float64 else b"f"

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    if ready_event is not None:
        ready_event.set()
    conn, _ = srv.accept()
    try:
        conn.sendall(_HDR.pack(MAGIC, ranges.shape[1], dtype_char[0]))
        period = (1.0 / rate_hz) if rate_hz else 0.0
        nxt = time.perf_counter()
        for t in range(odom.shape[0]):
            if period:
                nxt += period
                lag = nxt - time.perf_counter()
                if lag > 0:
                    time.sleep(lag)
            frame = np.concatenate(
                [odom[t].astype(dt), ranges[t].astype(dt)])
            conn.sendall(_TAG.pack(TAG_TICK) + frame.tobytes())
        conn.sendall(_TAG.pack(TAG_END))
    finally:
        conn.close()
        srv.close()


def native_feeder_path() -> Optional[str]:
    """Compile (once) and return the path of the C++ robot-side feeder
    binary (native/scan_feeder.cc) — the reference's ROS-publisher side
    as a standalone native program: it replays a recorded scan log
    (io/scanlog format) over this module's TCP protocol.  None when no
    toolchain is available (callers fall back to the Python feeder).

        python: src = SocketScanSource("127.0.0.1", port)
        shell:  scan_feeder session.ekslog <port> [rate_hz]
    """
    import os
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(repo, "native", "scan_feeder.cc")
    out_dir = os.path.join(repo, "native", "build")
    binary = os.path.join(out_dir, "scan_feeder")
    try:
        if not os.path.exists(binary) or (
                os.path.getmtime(binary) < os.path.getmtime(src)):
            os.makedirs(out_dir, exist_ok=True)
            subprocess.run(["g++", "-O2", "-o", binary, src],
                           check=True, capture_output=True)
        return binary
    except Exception:
        return None


class SocketScanSource:
    """Receiver side of the seam: blocking per-tick iterator of
    ``(odom_pose f[3], ranges f[B])`` — the `receive(laser)`/
    `receive(odom)` pair of SLAM.m:73-74 as one framed message."""

    def __init__(self, host: str, port: int, connect_timeout: float = 30.0):
        self._sock = socket.create_connection((host, port),
                                              timeout=connect_timeout)
        self._sock.settimeout(None)
        magic, n_beams, dchar = _HDR.unpack(
            _recv_exact(self._sock, _HDR.size))
        if magic != MAGIC:
            self._sock.close()
            raise OSError(f"not an EKSL scan feed (magic {magic!r})")
        self.n_beams = int(n_beams)
        self.dtype = np.float64 if dchar == ord("d") else np.float32
        self._frame_bytes = (3 + self.n_beams) * np.dtype(
            self.dtype).itemsize

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        tag, = _TAG.unpack(_recv_exact(self._sock, _TAG.size))
        if tag == TAG_END:
            self._sock.close()
            raise StopIteration
        if tag != TAG_TICK:
            self._sock.close()
            raise OSError(f"scan feed protocol error (tag {tag})")
        frame = np.frombuffer(_recv_exact(self._sock, self._frame_bytes),
                              dtype=self.dtype)
        return frame[:3].copy(), frame[3:].copy()

    def close(self) -> None:
        self._sock.close()

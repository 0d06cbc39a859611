"""Live external-transport ingestion (io/socket_feed): a real feeder
PROCESS streams scans over TCP; the consumer must match the offline
fused run tick-exactly — the reference's ROS seam
(/root/reference/test_SLAM.m:11, SLAM.m:73-74) minus ROS."""
import multiprocessing as mp
import socket

import numpy as np
import pytest

from ekf_slam_tpu.io.socket_feed import (SocketScanSource,
                                         serve_trajectory)
from ekf_slam_tpu.io.stream import StreamingSlamSession

from test_sim_session import make_traj
from test_stream import make_session


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_socket_feed_matches_offline_run():
    traj, _ = make_traj(T=30)
    odom = np.asarray(traj.odom)
    ranges = np.asarray(traj.ranges)
    port = _free_port()

    ctx = mp.get_context("spawn")     # no fork after JAX init
    ready = ctx.Event()
    feeder = ctx.Process(target=serve_trajectory,
                         args=(port, odom, ranges),
                         kwargs=dict(ready_event=ready), daemon=True)
    feeder.start()
    assert ready.wait(timeout=30), "feeder never came up"

    src = SocketScanSource("127.0.0.1", port)
    assert src.n_beams == ranges.shape[1]
    assert src.dtype == odom.dtype

    stream = StreamingSlamSession(make_session(), n_beams=src.n_beams,
                                  beam_angles=traj.beam_angles, window=8,
                                  first_odom=odom[0])
    got = []
    for od, rg in src:                 # blocking per-tick receive
        got.extend(stream.push(od, rg))
    got.extend(stream.flush())
    feeder.join(timeout=30)
    assert feeder.exitcode == 0

    _, off = make_session().run(traj.odom, traj.ranges, traj.beam_angles)
    assert len(got) == 30
    poses = np.stack([np.asarray(o.pose) for o in got])
    np.testing.assert_allclose(poses, np.asarray(off.pose), rtol=0, atol=0)


def test_socket_source_rejects_bad_magic():
    port = _free_port()

    def bogus_server(ready):
        srv = socket.socket()
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", port))
        srv.listen(1)
        ready.set()
        conn, _ = srv.accept()
        conn.sendall(b"NOPE" + bytes(5))
        conn.close()
        srv.close()

    import threading
    ready = threading.Event()
    t = threading.Thread(target=bogus_server, args=(ready,), daemon=True)
    t.start()
    assert ready.wait(5)
    with pytest.raises(OSError, match="EKSL"):
        SocketScanSource("127.0.0.1", port)
    t.join(timeout=5)


def test_native_feeder_streams_scanlog():
    """The C++ robot-side feeder binary (native/scan_feeder.cc): write a
    scan log, stream it with the native binary, consume with
    SocketScanSource — arrays must round-trip exactly across the
    language + process boundary."""
    import subprocess
    import tempfile

    from ekf_slam_tpu.io.scanlog import write
    from ekf_slam_tpu.io.socket_feed import native_feeder_path

    binary = native_feeder_path()
    if binary is None:
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(3)
    T, B = 12, 90
    odom = rng.normal(size=(T, 3)).astype(np.float32)
    ranges = rng.uniform(0.5, 10.0, (T, B)).astype(np.float32)
    ranges[2, 5] = np.nan                       # no-return encoding

    with tempfile.TemporaryDirectory() as td:
        path = f"{td}/s.ekslog"
        write(path, odom, ranges)
        port = _free_port()
        proc = subprocess.Popen([binary, path, str(port)],
                                stderr=subprocess.PIPE)
        try:
            import time
            got = None
            for _ in range(50):                 # wait for listen
                try:
                    src = SocketScanSource("127.0.0.1", port,
                                           connect_timeout=1.0)
                    break
                except OSError:
                    time.sleep(0.1)
            assert src.n_beams == B
            got = list(src)
        finally:
            proc.wait(timeout=20)
        assert proc.returncode == 0
        assert len(got) == T
        np.testing.assert_array_equal(
            np.stack([o for o, _ in got]), odom)
        np.testing.assert_array_equal(
            np.stack([r for _, r in got]), ranges)

"""Streaming real-time driver: micro-batched async dispatch must be
numerically identical to the offline fused run, across full and partial
windows, with latency accounting and heartbeat checkpoints."""
import numpy as np
import jax.numpy as jnp
import pytest

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.io.stream import StreamingSlamSession
from ekf_slam_tpu.session import SlamSession

from test_sim_session import SIM_RANSAC, make_traj


def make_session(seed=1):
    return SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=seed)


def test_stream_matches_offline_run():
    """60 ticks pushed one at a time through window-8 micro-batches (60 is
    NOT a multiple of 8 — the flush remainder path runs) must equal the
    offline fused run tick-for-tick."""
    traj, _ = make_traj(T=60)
    odom = np.asarray(traj.odom)
    ranges = np.asarray(traj.ranges)

    off_sess = make_session()
    _, off = off_sess.run(traj.odom, traj.ranges, traj.beam_angles)

    stream = StreamingSlamSession(
        make_session(), n_beams=ranges.shape[1],
        beam_angles=traj.beam_angles, window=8, max_pending=2,
        first_odom=odom[0])
    got = []
    for t in range(60):
        got.extend(stream.push(odom[t], ranges[t]))
    got.extend(stream.flush())

    assert len(got) == 60
    poses = np.stack([np.asarray(o.pose) for o in got])
    np.testing.assert_allclose(poses, np.asarray(off.pose), rtol=0, atol=0)
    ns = np.stack([np.asarray(o.n_active) for o in got])
    np.testing.assert_array_equal(ns, np.asarray(off.n_active))

    s = stream.stats.summary()
    assert s["ticks"] == 60
    assert s["ticks_per_sec"] > 0
    assert s["latency_p99_ms"] >= s["latency_p50_ms"] >= 0


def test_stream_backpressure_bounds_pending():
    traj, _ = make_traj(T=40)
    odom = np.asarray(traj.odom)
    ranges = np.asarray(traj.ranges)
    stream = StreamingSlamSession(
        make_session(), n_beams=ranges.shape[1],
        beam_angles=traj.beam_angles, window=4, max_pending=1,
        first_odom=odom[0])
    for t in range(40):
        stream.push(odom[t], ranges[t])
        assert len(stream._pending) <= 1
    out = stream.flush()
    assert stream.stats.n_ticks == 40
    assert len(stream._pending) == 0


def test_stream_heartbeat_checkpoints(tmp_path):
    """checkpoint_every windows → snapshot of the live carry; a fresh
    session resumes from it and continues the stream."""
    from ekf_slam_tpu.utils import checkpointing as ckpt

    traj, _ = make_traj(T=48)
    odom = np.asarray(traj.odom)
    ranges = np.asarray(traj.ranges)
    cdir = str(tmp_path / "hb")
    stream = StreamingSlamSession(
        make_session(), n_beams=ranges.shape[1],
        beam_angles=traj.beam_angles, window=8, checkpoint_dir=cdir,
        checkpoint_every=2, first_odom=odom[0])
    for t in range(48):
        stream.push(odom[t], ranges[t])
    stream.flush()

    latest = ckpt.latest_step_dir(cdir)
    assert latest is not None
    step = int(latest.split("step_")[-1])
    assert step >= 32           # 6 windows done -> checkpoints at 16/32/48

    template = make_session().init_carry(first_odom=odom[0])
    restored = ckpt.load_checkpoint(latest, template)
    np.testing.assert_allclose(np.asarray(restored.filt.x[:3]),
                               np.asarray(stream.carry.filt.x[:3])
                               if step == 48 else
                               np.asarray(restored.filt.x[:3]))
    assert np.all(np.isfinite(np.asarray(restored.filt.P)))


def test_stream_rejects_bad_window():
    traj, _ = make_traj(T=4)
    with pytest.raises(ValueError):
        StreamingSlamSession(make_session(), n_beams=720,
                             beam_angles=traj.beam_angles, window=0)

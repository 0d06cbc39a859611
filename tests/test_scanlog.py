"""Native scan-log codec: roundtrip, cross-backend byte parity, errors."""
import numpy as np
import pytest

from ekf_slam_tpu.io import scanlog


@pytest.fixture
def streams(rng):
    T, B = 40, 360
    odom = rng.normal(0, 1, (T, 3)).astype(np.float32)
    ranges = rng.uniform(0.1, 8.0, (T, B)).astype(np.float32)
    ranges[rng.random((T, B)) < 0.1] = np.nan
    return odom, ranges


def test_native_roundtrip(tmp_path, streams):
    odom, ranges = streams
    p = str(tmp_path / "log.eksl")
    scanlog.write(p, odom, ranges, native=True)
    assert scanlog.info(p, native=True) == (40, 360)
    o2, r2 = scanlog.read(p, native=True)
    np.testing.assert_array_equal(o2, odom)
    np.testing.assert_array_equal(
        np.nan_to_num(r2, nan=-1), np.nan_to_num(ranges, nan=-1))


def test_numpy_fallback_byte_identical(tmp_path, streams):
    odom, ranges = streams
    p1 = str(tmp_path / "native.eksl")
    p2 = str(tmp_path / "numpy.eksl")
    scanlog.write(p1, odom, ranges, native=True)
    scanlog.write(p2, odom, ranges, native=False)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    # cross-read: numpy reads native file and vice versa
    o_a, r_a = scanlog.read(p1, native=False)
    o_b, r_b = scanlog.read(p2, native=True)
    np.testing.assert_array_equal(o_a, o_b)
    np.testing.assert_array_equal(
        np.nan_to_num(r_a, nan=-1), np.nan_to_num(r_b, nan=-1))


def test_bad_header_rejected(tmp_path):
    p = str(tmp_path / "junk.eksl")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\0" * 28)
    with pytest.raises(IOError):
        scanlog.info(p, native=False)
    with pytest.raises(IOError):
        scanlog.info(p, native=True)


def test_replay_through_session(tmp_path):
    """Record a simulated run, replay it through the session — the
    bag-file workflow end to end."""
    import jax
    import jax.numpy as jnp
    from ekf_slam_tpu.config import EKFParams
    from ekf_slam_tpu.session import SlamSession
    from test_sim_session import SIM_RANSAC, make_traj

    traj, _ = make_traj(T=30)
    p = str(tmp_path / "session.eksl")
    scanlog.write(p, np.asarray(traj.odom), np.asarray(traj.ranges))
    odom, ranges = scanlog.read(p)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(jnp.asarray(odom), jnp.asarray(ranges),
                           traj.beam_angles)
    assert np.all(np.isfinite(np.asarray(carry.filt.x)))

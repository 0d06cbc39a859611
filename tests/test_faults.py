"""Fault injection + failure detection / rollback (SURVEY.md §5)."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.session import SlamSession
from ekf_slam_tpu.sim import world as W
from ekf_slam_tpu.utils import faults

from test_sim_session import SIM_RANSAC, make_traj


def test_drop_scans_and_sectors():
    key = jax.random.PRNGKey(0)
    ranges = jnp.ones((50, 100))
    dropped = faults.drop_scans(ranges, key, 0.3)
    nan_ticks = np.isnan(np.asarray(dropped)).all(axis=1).sum()
    assert 5 <= nan_ticks <= 25
    blanked = faults.blank_sectors(ranges, key, 0.5, sector_frac=0.25)
    per_tick = np.isnan(np.asarray(blanked)).sum(axis=1)
    assert set(np.unique(per_tick)) <= {0, 25}


def test_corrupt_odometry():
    key = jax.random.PRNGKey(1)
    odom = jnp.zeros((100, 3))
    bad = faults.corrupt_odometry(odom, key, 0.1, magnitude=5.0)
    moved = np.linalg.norm(np.asarray(bad[:, :2]), axis=1) > 0.5
    assert 2 <= moved.sum() <= 30


def test_check_tick_verdicts():
    ep = EKFParams(capacity=4, dtype=jnp.float64)
    from ekf_slam_tpu.state import init_state
    s0 = init_state(ep)
    ok = s0._replace(x=s0.x.at[0].set(0.1))
    v = faults.check_tick(s0, ok)
    assert bool(v.ok)
    nanned = s0._replace(x=s0.x.at[0].set(jnp.nan))
    assert not bool(faults.check_tick(s0, nanned).ok)
    jumped = s0._replace(x=s0.x.at[0].set(5.0))
    v = faults.check_tick(s0, jumped, max_pose_jump=1.0)
    assert (not bool(v.ok)) and bool(v.finite)
    negvar = s0._replace(P=s0.P.at[0, 0].set(-1.0))
    assert not bool(faults.check_tick(s0, negvar).diag_ok)


def test_guarded_rolls_back():
    ep = EKFParams(capacity=4, dtype=jnp.float64)
    from ekf_slam_tpu.state import init_state
    s0 = init_state(ep)
    bad = s0._replace(x=s0.x.at[0].set(jnp.nan))
    out, v = faults.guarded(s0, bad)
    assert not bool(v.ok)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(s0.x))


def test_session_guard_catches_seam_divergence():
    """The ref-compat 0/360-seam innovation glitch throws the pose ~18 m
    (see test_sim_session).  With the guard enabled, the tick is rolled
    back and the session stays on track even in ref-compat mode."""
    traj, _ = make_traj(T=150)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=True,
                   guard_max_jump=1.0, dtype=jnp.float64)
    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    est = np.asarray(outs.pose)
    truth = np.asarray(traj.truth)
    ate = float(W.ate_rmse(jnp.asarray(est[:, :2]),
                           jnp.asarray(truth[:, :2])))
    assert ate < 1.0, ate          # unguarded ref-compat diverges to ~14


def test_session_survives_scan_dropouts():
    traj, _ = make_traj(T=100)
    ranges = faults.drop_scans(traj.ranges, jax.random.PRNGKey(9), 0.3)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, ranges, traj.beam_angles)
    assert np.all(np.isfinite(np.asarray(carry.filt.x)))
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    assert ate < 1.0

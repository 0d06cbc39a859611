"""Aux subsystems: quaternion helpers, checkpoint/resume, metrics, viz."""
import io
import json

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.session import SlamSession
from ekf_slam_tpu.utils import checkpointing, metrics, quat
from ekf_slam_tpu.state import init_state

from test_sim_session import SIM_RANSAC, make_traj


# -- quaternions ------------------------------------------------------------

def test_quat_inv():
    q = jnp.array([0.5, 0.5, 0.5, 0.5])
    qi = quat.quat_inv(q)
    np.testing.assert_allclose(np.asarray(qi), [0.5, -0.5, -0.5, -0.5],
                               atol=1e-12)
    # non-unit: q * q^-1 has |.|=1 scalar part behavior via norm scaling
    q2 = jnp.array([2.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(quat.quat_inv(q2)),
                               [0.5, 0, 0, 0], atol=1e-12)


def test_quat_to_yaw():
    # 90-degree Z rotation: q = [cos45, 0, 0, sin45]
    q = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)])
    np.testing.assert_allclose(float(quat.quat_to_yaw_deg(q)), 90.0,
                               atol=1e-9)
    pose = quat.odom_pose_from_quat(jnp.array([1.0, 2.0]), q)
    np.testing.assert_allclose(np.asarray(pose), [1.0, 2.0, 90.0],
                               atol=1e-9)


# -- checkpoint / resume ----------------------------------------------------

def test_checkpoint_resume_identical(tmp_path):
    """Interrupt a session, checkpoint, resume — must equal the
    uninterrupted run exactly (SURVEY.md §5 checkpoint/resume)."""
    traj, _ = make_traj(T=30)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)

    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=7)
    carry = sess.init_carry(first_odom=traj.odom[0])
    for t in range(15):
        carry, _ = sess.step(carry, traj.odom[t], traj.ranges[t],
                             traj.beam_angles)
    path = checkpointing.save_checkpoint(str(tmp_path / "ckpt"), carry,
                                         step=15)

    # resume in a fresh session object
    sess2 = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=7)
    template = sess2.init_carry(first_odom=traj.odom[0])
    carry2 = checkpointing.load_checkpoint(path, template)
    for t in range(15, 30):
        carry, _ = sess.step(carry, traj.odom[t], traj.ranges[t],
                             traj.beam_angles)
        carry2, _ = sess2.step(carry2, traj.odom[t], traj.ranges[t],
                               traj.beam_angles)
    np.testing.assert_array_equal(np.asarray(carry.filt.x),
                                  np.asarray(carry2.filt.x))
    np.testing.assert_array_equal(np.asarray(carry.filt.P),
                                  np.asarray(carry2.filt.P))
    np.testing.assert_array_equal(np.asarray(carry.table.loc),
                                  np.asarray(carry2.table.loc))
    assert checkpointing.latest_step_dir(str(tmp_path / "ckpt")) == path


# -- metrics ----------------------------------------------------------------

def test_filter_health():
    ep = EKFParams(capacity=8, dtype=jnp.float64)
    st = init_state(ep)
    h = metrics.filter_health(st)
    assert bool(h.finite)
    assert float(h.asym) == 0.0
    np.testing.assert_allclose(float(h.trace), 0.3, atol=1e-12)
    np.testing.assert_allclose(float(h.min_diag), 0.1, atol=1e-12)


def test_metrics_logger_jsonl():
    buf = io.StringIO()
    log = metrics.MetricsLogger(stream=buf)
    log.log(0, ate=jnp.asarray(0.5), n_active=jnp.asarray(3))
    log.log(1, accept_rate=0.75)
    lines = [json.loads(l) for l in buf.getvalue().strip().split("\n")]
    assert lines[0]["step"] == 0 and lines[0]["ate"] == 0.5
    assert lines[0]["n_active"] == 3
    assert lines[1]["accept_rate"] == 0.75


# -- viz --------------------------------------------------------------------

def test_viz_parity_frame(tmp_path):
    from ekf_slam_tpu import viz
    traj, _ = make_traj(T=40)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    last_obs = jax.tree_util.tree_map(lambda a: a[-1], outs.obs)
    p = viz.save_frame(str(tmp_path / "frame.png"), carry.filt,
                       table=carry.table, obs=last_obs,
                       truth=traj.truth)
    import os
    assert os.path.getsize(p) > 5000


def test_viz_ellipse_math():
    from ekf_slam_tpu import viz
    # isotropic covariance -> circle of radius 2*sqrt(chi2*s)*scale
    ell = viz.covariance_ellipse([0, 0], np.eye(2) * 0.04, 1.0)
    r = np.hypot(ell[:, 0], ell[:, 1])
    np.testing.assert_allclose(r, 2 * np.sqrt(2.2788 * 0.04), atol=1e-6)


def test_debug_validate_state():
    from ekf_slam_tpu.utils import debug
    from test_sim_session import make_traj
    traj, _ = make_traj(T=40)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=1)
    carry, _ = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    debug.validate_state(carry.filt, ep)     # must pass on a healthy run

    # corrupt it -> must raise
    import pytest
    bad = carry.filt._replace(x=carry.filt.x.at[0].set(jnp.nan))
    with pytest.raises(AssertionError):
        debug.validate_state(bad, ep)
    bad2 = carry.filt._replace(
        P=carry.filt.P.at[ep.dim - 1, ep.dim - 1].set(1.0))
    with pytest.raises(AssertionError):
        debug.validate_state(bad2, ep)

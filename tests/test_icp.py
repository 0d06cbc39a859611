"""2-D ICP scan matching: synthetic transforms recovered under jit."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.ops import icp as I


def room_points(n=300, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 4, n)
    side = rng.integers(0, 4, n)
    pts = np.zeros((n, 2))
    pts[side == 0] = np.stack([t[side == 0] - 2, np.full((side == 0).sum(), -1.5)], -1)
    pts[side == 1] = np.stack([t[side == 1] - 2, np.full((side == 1).sum(), 1.5)], -1)
    pts[side == 2] = np.stack([np.full((side == 2).sum(), -2.0), t[side == 2] * 0.75 - 1.5], -1)
    pts[side == 3] = np.stack([np.full((side == 3).sum(), 2.0), t[side == 3] * 0.75 - 1.5], -1)
    return pts + rng.normal(0, noise, (n, 2))


def apply_pose(pts, pose):
    th = np.deg2rad(pose[2])
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return pts @ R.T + pose[:2]


def test_icp_recovers_known_transform():
    src = room_points(300, seed=1, noise=0.005)
    true_pose = np.array([0.3, -0.2, 8.0])
    dst = apply_pose(src, true_pose)
    res = I.icp(jnp.asarray(src), jnp.ones(300, bool),
                jnp.asarray(dst), jnp.ones(300, bool), iters=25)
    est = np.asarray(res.pose)
    np.testing.assert_allclose(est, true_pose, atol=0.05)
    assert float(res.rmse) < 0.02
    assert int(res.n_inliers) > 250


def test_icp_with_partial_overlap_and_masks():
    src = room_points(400, seed=2, noise=0.01)
    true_pose = np.array([-0.2, 0.15, -5.0])
    dst_full = apply_pose(room_points(400, seed=3, noise=0.01), true_pose)
    sv = np.ones(400, bool); sv[350:] = False   # padded tail
    dv = np.ones(400, bool); dv[370:] = False
    res = I.icp(jnp.asarray(src), jnp.asarray(sv),
                jnp.asarray(dst_full), jnp.asarray(dv),
                init_pose=jnp.asarray([0.0, 0.0, 0.0]), iters=30)
    est = np.asarray(res.pose)
    np.testing.assert_allclose(est[:2], true_pose[:2], atol=0.1)
    np.testing.assert_allclose(est[2], true_pose[2], atol=1.5)


def test_icp_jits():
    src = jnp.asarray(room_points(128, seed=4))
    dst = src + jnp.asarray([0.1, 0.0])
    f = jax.jit(lambda s, d: I.icp(s, jnp.ones(128, bool), d,
                                   jnp.ones(128, bool), iters=10))
    res = f(src, dst)
    np.testing.assert_allclose(np.asarray(res.pose), [0.1, 0.0, 0.0],
                               atol=1e-3)


def test_session_icp_control_source():
    """Scan-to-scan ICP as the control source: no odometry at all (zeros
    passed), the session still tracks the trajectory (the reference cannot
    run without /odom; this is the odometry-free mode, session.py)."""
    import jax.numpy as jnp
    from ekf_slam_tpu.config import EKFParams
    from ekf_slam_tpu.session import SlamSession
    from ekf_slam_tpu.sim import world as W
    from test_sim_session import SIM_RANSAC, make_traj

    traj, _ = make_traj(T=100)
    sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1,
        control_source="icp", icp_iters=15, icp_max_pair_dist=0.5)
    garbage_odom = jnp.zeros_like(jnp.asarray(traj.odom))
    carry, outs = sess.run(garbage_odom, traj.ranges, traj.beam_angles)
    assert int(carry.filt.n_active) >= 1
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    assert ate < 0.5, ate
    # the carried previous scan is part of the pytree (checkpointable)
    assert carry.prev_pts is not None and carry.prev_valid is not None


def make_reversing_traj(T=80, n_beams=720, seed=0):
    """Drive forward T/2 ticks, then reverse back along the same line —
    the case the reference's unsigned hypot dead-reckoning (SLAM.m:105)
    aliases to continued forward motion."""
    import numpy as np
    from ekf_slam_tpu.config import SimConfig
    from ekf_slam_tpu.sim import world as W
    cfg = SimConfig(n_beams=n_beams, max_range=12.0, range_noise_std=0.005,
                    odom_xy_noise_std=0.0, odom_theta_noise_std=0.0)
    room = W.rectangle_room(4.0, 3.0)
    dD = np.full(T, 0.05)
    dD[T // 2:] = -0.05
    controls = jnp.asarray(np.stack([dD, np.zeros(T)], -1))
    traj = W.simulate(room, controls, cfg, jax.random.PRNGKey(seed),
                      start_pose=(-1.5, 0.0, 0.0))
    return traj


def test_session_icp_signed_handles_reversing():
    """Signed ICP ΔD tracks a reversing trajectory; the unsigned mode
    (reference-style hypot) provably cannot (session.py icp_signed)."""
    from ekf_slam_tpu.config import EKFParams
    from ekf_slam_tpu.session import SlamSession
    from ekf_slam_tpu.sim import world as W
    from test_sim_session import SIM_RANSAC

    traj = make_reversing_traj(T=80)
    kw = dict(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1,
        control_source="icp", icp_iters=15, icp_max_pair_dist=0.5)
    garbage_odom = jnp.zeros_like(jnp.asarray(traj.odom))

    signed = SlamSession(icp_signed=True, **kw)
    _, outs = signed.run(garbage_odom, traj.ranges, traj.beam_angles)
    # SLAM frame starts at the filter origin; truth starts at (-1.5,0,0),
    # so compare displacements from the start.
    est = np.asarray(outs.pose[:, :2]) - np.asarray(outs.pose[0, :2])
    tru = np.asarray(traj.truth[:, :2]) - np.asarray(traj.truth[0, :2])
    ate_signed = float(np.sqrt(np.mean(np.sum((est - tru) ** 2, -1))))
    assert ate_signed < 0.3, ate_signed

    unsigned = SlamSession(icp_signed=False, **kw)
    _, outs_u = unsigned.run(garbage_odom, traj.ranges, traj.beam_angles)
    est_u = np.asarray(outs_u.pose[:, :2]) - np.asarray(outs_u.pose[0, :2])
    ate_unsigned = float(np.sqrt(np.mean(np.sum((est_u - tru) ** 2, -1))))
    # the unsigned filter keeps predicting forward while reversing —
    # visibly worse than the signed run
    assert ate_unsigned > 2 * ate_signed, (ate_unsigned, ate_signed)


def test_session_fused_control_falls_back_to_odometry():
    """control_source='fused': ICP drives when the scan match is good;
    dead-reckoned odometry takes over when it degenerates (here: scans
    blanked mid-run so ICP has nothing to match)."""
    from ekf_slam_tpu.config import EKFParams
    from ekf_slam_tpu.sim import world as W
    from ekf_slam_tpu.session import SlamSession
    from test_sim_session import SIM_RANSAC, make_traj

    traj, _ = make_traj(T=60)
    ranges = np.asarray(traj.ranges).copy()
    ranges[20:30] = np.nan              # sensor dropout: ICP must not win
    sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1,
        control_source="fused", icp_iters=15, icp_max_pair_dist=0.5,
        icp_min_inliers=30, icp_max_rmse=0.25)
    carry, outs = sess.run(traj.odom, jnp.asarray(ranges),
                           traj.beam_angles)
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    assert ate < 0.5, ate
    # during the dropout the control must equal the odometry dead-reckon
    odom = np.asarray(traj.odom)
    dd = np.hypot(np.diff(odom[:, 0]), np.diff(odom[:, 1]))
    u = np.asarray(outs.u)
    np.testing.assert_allclose(u[22:29, 0], dd[21:28], rtol=1e-6)


def test_session_icp_requires_beams_at_init():
    from ekf_slam_tpu.config import EKFParams
    from ekf_slam_tpu.session import SlamSession
    import pytest
    sess = SlamSession(control_source="icp",
                       ekf_params=EKFParams(capacity=8))
    with pytest.raises(ValueError, match="n_beams"):
        sess.init_carry()


def test_session_bad_control_source():
    from ekf_slam_tpu.session import SlamSession
    import pytest
    with pytest.raises(ValueError, match="control_source"):
        SlamSession(control_source="teleport")

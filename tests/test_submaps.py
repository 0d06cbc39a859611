"""Submap SLAM: segmentation, anchor composition, loop closure, global map."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams, SimConfig
from ekf_slam_tpu.parallel import posegraph as pg
from ekf_slam_tpu.parallel.submaps import (SubmapSlam, compose,
                                           transform_points)
from ekf_slam_tpu.sim import world as W

from test_sim_session import SIM_RANSAC


def test_compose_roundtrip():
    anchor = np.array([1.0, 2.0, 90.0])
    local = np.array([1.0, 0.0, 10.0])
    g = compose(anchor, local)
    np.testing.assert_allclose(g, [1.0, 3.0, 100.0], atol=1e-12)
    pts = transform_points(anchor, np.array([[1.0, 0.0], [0.0, 1.0]]))
    np.testing.assert_allclose(pts, [[1.0, 3.0], [0.0, 2.0]], atol=1e-12)


def make_loop_traj(T=240, seed=0, noisy=True):
    cfg = SimConfig(
        n_beams=720, max_range=12.0,
        range_noise_std=0.01 if noisy else 0.0,
        odom_xy_noise_std=0.001 if noisy else 0.0,
        odom_theta_noise_std=0.05 if noisy else 0.0)
    room = W.rectangle_room(4.0, 3.0)
    controls = W.circle_controls(T, dD=0.05, dTh=360.0 / T * 2)
    return W.simulate(room, controls, cfg, jax.random.PRNGKey(seed))


def test_submaps_segment_and_compose():
    traj = make_loop_traj(T=120)
    slam = SubmapSlam(
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, ticks_per_submap=40, seed=1)
    poses = slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
                     traj.beam_angles)
    assert len(slam.submaps) == 3
    # composed global trajectory tracks truth
    truth = np.asarray(traj.truth)
    err = np.linalg.norm(poses[:, :2] - truth[:, :2], axis=1)
    assert err.mean() < 0.6, err.mean()
    # keyframe nodes = submaps + 1
    assert int(slam.graph.n_nodes) == 4
    assert int(slam.graph.n_edges) == 3


def test_submap_loop_closure_improves_anchors():
    traj = make_loop_traj(T=240)
    slam = SubmapSlam(
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, ticks_per_submap=60, seed=1)
    slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
             traj.beam_angles)
    n = len(slam.submaps)
    assert n == 4

    # ground-truth relative pose between first and last anchors: both spawn
    # at known tick indices (0, 180); use truth poses there
    t_first, t_last = 0, 180
    truth = np.asarray(traj.truth)
    pa = np.concatenate([[0.0, 0.0], [0.0]])   # first anchor = start = origin
    pb_truth = truth[t_last - 1]
    z_truth = pg.relative_pose(jnp.asarray(np.append(truth[t_first], [])[:3]
                                           if t_first > 0 else pa),
                               jnp.asarray(pb_truth))

    before = np.array([sm.anchor for sm in slam.submaps])
    slam.add_loop_closure(0, 3, np.asarray(z_truth))
    slam.optimize(iters=15)
    after = np.array([sm.anchor for sm in slam.submaps])

    # last anchor must now sit at its true pose (strong closure prior)
    err_before = np.linalg.norm(before[3, :2] - pb_truth[:2])
    err_after = np.linalg.norm(after[3, :2] - pb_truth[:2])
    assert err_after <= err_before + 1e-9
    # global landmarks lie ON the wall lines (each submap's landmark is the
    # perpendicular foot from ITS OWN origin — globally that is some point
    # on the wall, not the world-origin foot)
    lms = slam.global_landmarks()
    assert lms.shape[0] >= 2
    for lm in lms:
        d_walls = min(abs(lm[0] - 4), abs(lm[0] + 4),
                      abs(lm[1] - 3), abs(lm[1] + 3))
        assert d_walls < 0.5, lm
        assert abs(lm[0]) < 4.6 and abs(lm[1]) < 3.6, lm


def test_auto_loop_closure_detection():
    """Drive two full circles: the second pass brings anchors back near
    the first pass's anchors — detection must find closures and
    optimization must keep the graph consistent."""
    traj = make_loop_traj(T=240)
    slam = SubmapSlam(
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, ticks_per_submap=30, seed=1)
    slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
             traj.beam_angles)
    assert len(slam.submaps) == 8          # two circles, 4 submaps each
    n_closed = slam.detect_loop_closures(radius=1.0)
    assert n_closed >= 1                   # revisits detected
    err_before = float(pg.graph_error(slam.graph))
    slam.optimize(iters=10)
    err_after = float(pg.graph_error(slam.graph))
    assert np.isfinite(err_after)
    assert err_after <= err_before + 1e-6


def test_icp_loop_closure_measurements():
    """ICP scan-matching closures: the measured relative pose must be
    close to the TRUE relative pose between the submap frames (which the
    anchor estimates only approximate under drift)."""
    traj = make_loop_traj(T=240)
    slam = SubmapSlam(
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, ticks_per_submap=30, seed=1)
    slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
             traj.beam_angles)
    assert slam.submaps[0].scan_pts is not None
    n_closed = slam.detect_loop_closures(radius=1.0, use_icp=True,
                                         icp_max_rmse=0.15,
                                         icp_min_inliers=100)
    assert n_closed >= 1
    slam.optimize(iters=10)
    # after ICP-closed optimization the anchors of revisited submaps agree
    nodes = slam.global_trajectory_nodes()
    assert np.all(np.isfinite(nodes))

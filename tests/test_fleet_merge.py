"""Multi-robot map merging: N fleet sessions' local maps fused into one
global frame via ICP scan-match alignment + the pose graph."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams, SimConfig
from ekf_slam_tpu.parallel.fleet_merge import (RobotMap, merge_maps,
                                               robot_map_from_carry)
from ekf_slam_tpu.parallel.multi import FleetSlamSession
from ekf_slam_tpu.parallel.submaps import transform_points
from ekf_slam_tpu.sim import world as W

from test_sim_session import SIM_RANSAC

STARTS = np.array([[0.0, 0.0, 0.0],
                   [1.5, 0.8, 90.0],
                   [-1.2, -0.7, 200.0]])


def make_fleet_maps(T=80, guess_noise=(0.25, 8.0), seed=0):
    cfg = SimConfig(n_beams=720, max_range=12.0, range_noise_std=0.005,
                    odom_xy_noise_std=0.0005, odom_theta_noise_std=0.02)
    room = W.world_with_obstacles(4.0, 3.0)   # asymmetric: ICP-friendly
    trajs = [W.simulate(room, W.circle_controls(T, 0.05, 3.0 + i), cfg,
                        jax.random.PRNGKey(seed + i),
                        start_pose=tuple(STARTS[i]))
             for i in range(3)]

    fleet = FleetSlamSession(
        n_sessions=3,
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1)
    odom = jnp.stack([t.odom for t in trajs], axis=1)       # [T,N,3]
    ranges = jnp.stack([t.ranges for t in trajs], axis=1)   # [T,N,B]
    carry, _ = fleet.run(odom, ranges, trajs[0].beam_angles)

    rng = np.random.default_rng(seed + 7)
    maps = []
    for k in range(3):
        guess = STARTS[k] + np.concatenate([
            rng.normal(0, guess_noise[0], 2),
            rng.normal(0, guess_noise[1], 1)])
        ck = jax.tree_util.tree_map(lambda a, k=k: a[k], carry)
        maps.append(robot_map_from_carry(
            ck, np.asarray(trajs[k].ranges[0]), trajs[k].beam_angles,
            guess))
    return maps


def test_merge_refines_anchors_and_maps():
    maps = make_fleet_maps()
    res = merge_maps(maps, icp_min_inliers=80, icp_max_rmse=0.2)

    # scan matching accepted at least one inter-robot alignment
    assert res.n_icp_edges >= 1

    # optimized anchors beat the noisy deployment guesses (relative to
    # robot 0's frame, which fixes the gauge)
    def rel_err(anchors):
        e = 0.0
        for k in range(1, 3):
            z = np.asarray(anchors[k, :2]) - np.asarray(anchors[0, :2])
            zt = STARTS[k, :2] - STARTS[0, :2]
            e += float(np.linalg.norm(z - zt))
        return e
    err_guess = rel_err(np.stack([m.anchor_guess for m in maps]))
    err_opt = rel_err(res.anchors)
    assert err_opt < 0.7 * err_guess, (err_opt, err_guess)
    assert err_opt < 0.35, err_opt

    # merged landmarks lie on the global room walls / obstacle
    assert res.landmarks.shape[0] >= 3
    assert res.n_before_merge >= res.landmarks.shape[0]
    for lm in res.landmarks:
        assert abs(lm[0]) < 4.6 and abs(lm[1]) < 3.6, lm


def test_merge_single_robot_degenerate():
    maps = make_fleet_maps()[:1]
    res = merge_maps(maps)
    assert res.n_icp_edges == 0
    np.testing.assert_allclose(res.anchors[0, :2], maps[0].anchor_guess[:2],
                               atol=1e-6)
    dth = np.mod(res.anchors[0, 2] - maps[0].anchor_guess[2] + 180.0,
                 360.0) - 180.0
    assert abs(dth) < 1e-6


def test_dedupe_merges_close_points():
    from ekf_slam_tpu.parallel.fleet_merge import _dedupe
    pts = np.array([[0.0, 0.0], [0.05, 0.0], [2.0, 2.0]])
    out = _dedupe(pts, 0.2)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[0], [0.025, 0.0], atol=1e-9)

"""Concurrent submaps: S segment-filters advancing at once across the
virtual device mesh, tied together by the host pose graph (BASELINE.json
config 5 — the partitioned map actually running in parallel)."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.parallel import posegraph as pg
from ekf_slam_tpu.parallel.mesh import make_mesh
from ekf_slam_tpu.parallel.parallel_submaps import ParallelSubmapSlam

from test_sim_session import SIM_RANSAC
from test_submaps import make_loop_traj


def make_slam(n_submaps, mesh=None, seed=1):
    return ParallelSubmapSlam(
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, n_submaps=n_submaps, mesh=mesh,
        seed=seed)


def test_parallel_submaps_concurrent_on_devices():
    """8 submaps, one per virtual device: the filters advance as ONE
    sharded device program (each device holds exactly its region's
    covariance), and the composed global trajectory tracks truth."""
    assert len(jax.devices()) == 8
    traj = make_loop_traj(T=240)
    mesh = make_mesh(n_map=1, n_data=8)
    slam = make_slam(8, mesh=mesh)
    poses = slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
                     traj.beam_angles)

    # concurrency evidence: the fleet carry's covariance is laid out with
    # one submap per device (8 shards, each [1, D, D])
    P = slam._last_carry.filt.P
    shards = P.addressable_shards
    assert len(shards) == 8
    devices = {s.device for s in shards}
    assert len(devices) == 8
    assert shards[0].data.shape[0] == 1

    assert len(slam.submaps) == 8
    assert int(slam.graph.n_nodes) == 9
    assert int(slam.graph.n_edges) == 8
    truth = np.asarray(traj.truth)
    err = np.linalg.norm(poses[:, :2] - truth[:, :2], axis=1)
    assert err.mean() < 0.6, err.mean()


def test_parallel_submaps_loop_closure_realigns():
    """Two circles → the second pass's submaps revisit the first pass's
    anchors; detection finds closures and optimization re-aligns the
    concurrent submaps' anchors (graph error decreases, anchors move)."""
    traj = make_loop_traj(T=240)
    mesh = make_mesh(n_map=1, n_data=8)
    slam = make_slam(8, mesh=mesh)
    slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
             traj.beam_angles)

    # ICP-measured closures: the measurement comes from matching the two
    # submaps' stored scans, so it is independent of the (drifted) anchor
    # estimates and actually corrects them.
    n_closed = slam.detect_loop_closures(radius=1.0, use_icp=True,
                                         icp_max_rmse=0.15,
                                         icp_min_inliers=100)
    assert n_closed >= 1
    before = np.array([sm.anchor for sm in slam.submaps])
    err_before = float(pg.graph_error(slam.graph))
    slam.optimize(iters=10)
    err_after = float(pg.graph_error(slam.graph))
    after = np.array([sm.anchor for sm in slam.submaps])
    assert np.isfinite(err_after) and err_after <= err_before + 1e-6
    # optimization actually moved the anchors (drift corrected)
    assert np.any(np.linalg.norm(after[:, :2] - before[:, :2], axis=1)
                  > 1e-6)
    # global landmarks still lie on the room walls after re-alignment
    lms = slam.global_landmarks()
    assert lms.shape[0] >= 2
    for lm in lms:
        d_walls = min(abs(lm[0] - 4), abs(lm[0] + 4),
                      abs(lm[1] - 3), abs(lm[1] + 3))
        assert d_walls < 0.6, lm


def test_parallel_submaps_no_mesh_still_works():
    """mesh=None: same math, single-device vmap (CI-friendly path)."""
    traj = make_loop_traj(T=120)
    slam = make_slam(4, mesh=None)
    poses = slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
                     traj.beam_angles)
    truth = np.asarray(traj.truth)
    err = np.linalg.norm(poses[:, :2] - truth[:, :2], axis=1)
    assert err.mean() < 0.6, err.mean()


def test_parallel_submaps_rejects_ragged_t():
    import pytest
    traj = make_loop_traj(T=120)
    slam = make_slam(7)
    with pytest.raises(ValueError, match="divide"):
        slam.run(np.asarray(traj.odom), np.asarray(traj.ranges),
                 traj.beam_angles)

"""Large-world end-to-end SLAM campaign: map a multi-room floorplan.

The reference's only demonstrated scale is one 4x3 m room over a live ROS
feed (test_SLAM.m:16-18; SLAM.m:70-144).  This example runs the FULL
pipeline — RANSAC wall extraction (gap/kink-split, refined fits), ML
gating, the batched joint update, per-tick maintenance — over a
procedurally generated multi-room world (sim.world.floorplan_world) with
hundreds of distinct wall landmarks, and reports the campaign metrics:

  * ATE of the SLAM estimate vs ground truth, against the dead-reckoned
    odometry baseline (what the robot would believe without SLAM);
  * landmarks mapped vs the world's effective ground truth (foot
    clustering — sim.world.map_accuracy);
  * NIS consistency (per-observation normalized innovation squared,
    ~chi^2(2) when the filter is honest — SlamSession(collect_nis=True)).

Controls come from noisy odometry by default; --control fused uses
scan-to-scan ICP with odometry fallback (ops/icp.py) — lidar odometry,
which is what keeps dead-reckoning drift inside the gate at large scale.

CPU-runnable at the default size (3x3 rooms); the chip campaign at
16x16 rooms / ~2k landmarks lives in experiments/chip_r5_world.py with
its results recorded in BASELINE.md.
"""
import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams, RansacParams, SimConfig
from ekf_slam_tpu.session import SlamSession
from ekf_slam_tpu.sim import world as W


def campaign_params(capacity: int, dtype, control: str = "fused",
                    odo_theta_std: float = 0.5):
    """The tuned large-world configuration (round-5 campaign).

    Extractor: batched-hypothesis search with tightened refits plus the
    gap/kink splitters — without them, merged near-collinear walls put
    ~1 m errors on the perpendicular-foot landmarks (the world-origin
    lever arm amplifies fitted-angle error; measured in BASELINE.md's
    round-5 extractor table).  Filter: constant-std measurement noise
    (noise_model='constant'; the reference's value-scaled R makes the
    gate's tightness depend on the bearing's wrap convention) and a
    process-noise floor matched to the control source's per-tick error
    (q_floor; the reference's rank-1 Q adds nothing on straight drives).
    """
    ekf = EKFParams(
        capacity=capacity, max_obs=24, ref_compat=False,
        association="ml", s_cost=1e6, s_thresh=9.2,
        # fit-propagated anisotropic R (ObsBatch.R) + this constant
        # floor: the foot feature's error is lever_arm-dominated and no
        # constant R models it (see config.EKFParams.noise_model='fit')
        rc=(0.05, 0.3), noise_model="fit",
        # honest process noise: the reference's C=0.2 injects 0.2*dTh^2
        # deg^2/tick of heading noise — ~16 deg^2/tick during turns —
        # which blows the pose covariance open and lets every biased
        # foot re-steer the heading (measured campaign divergence
        # driver); 0.01 matches a ~10% control-noise platform, with
        # q_floor carrying the per-tick floor
        c_process=0.01,
        q_floor=((0.003 ** 2, 0.003 ** 2, 0.08 ** 2)
                 if control in ("icp", "fused")
                 else (0.004 ** 2, 0.004 ** 2, odo_theta_std ** 2)),
        guard_max_jump=0.5,
        update_mode="batched", dtype=dtype)
    ransac = RansacParams(
        line_consensus=36, bearing_window_deg=20.0,
        wall_search_timeout=9, sample_points=12,
        inlier_dist=0.15, assoc_dist=0.7,
        promote_count=4, freshness=90,
        table_capacity=max(256, 2 * capacity), n_hypotheses=192,
        refine_passes=2, refine_frac=0.4,
        split_gap=1.2, split_kink_deg=3.0, max_fit_rms=0.04,
        match_mode="nearest", writeback_mode="sig",
        ref_compat=False, writeback_last_only=False, dtype=dtype)
    return ekf, ransac


def run_campaign(rooms: int, ticks: int, capacity: int, control: str,
                 seed: int = 0, n_beams: int = 1024,
                 odo_theta_std: float = 0.5, dtype=jnp.float32,
                 maintain_merge_radius: float = 0.4):
    """Generate the world + trajectory, run the session, return metrics."""
    world = W.floorplan_world(rooms, rooms, seed=seed)
    gt = W.cluster_feet(W.true_feet(world), 0.5)
    wp = W.serpentine_waypoints(rooms, rooms)
    ctrl, start = W.waypoint_controls(wp, step=0.25, max_ticks=ticks)
    cfg = SimConfig(n_beams=n_beams, max_range=10.0, range_noise_std=0.01,
                    odom_xy_noise_std=0.004,
                    odom_theta_noise_std=odo_theta_std, dtype=dtype)
    traj = W.simulate(world, jnp.asarray(ctrl, dtype), cfg,
                      jax.random.PRNGKey(seed), start_pose=tuple(start))

    ekf, ransac = campaign_params(capacity, dtype, control, odo_theta_std)
    sess = SlamSession(ekf_params=ekf, ransac_params=ransac, seed=seed + 1,
                      control_source=control, collect_nis=True,
                      icp_max_pair_dist=0.4, icp_min_inliers=200,
                      icp_max_rmse=0.08,
                      maintain_merge_radius=maintain_merge_radius)
    carry = sess.init_carry(
        first_odom=traj.odom[0], init_pose=start,
        n_beams=n_beams if control in ("icp", "fused") else None)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles,
                           carry=carry)

    est = np.asarray(outs.pose, np.float64)
    truth = np.asarray(traj.truth, np.float64)
    K = int(carry.filt.n_active)
    lm = np.asarray(carry.filt.x, np.float64)[3:3 + 2 * K].reshape(K, 2)
    nis = np.asarray(outs.nis, np.float64)
    fin = np.isfinite(nis)
    # gauge-aligned metrics (standard trajectory evaluation): one rigid
    # SE(2) fit of the estimated trajectory onto truth, applied to the
    # map as well — raw ATE charges the anchored frame's gauge drift to
    # every landmark mapped after it
    Rg, tg = W.align_se2(est[:, :2], truth[:, :2])
    est_al = est[:, :2] @ Rg.T + tg
    lm_al = lm @ Rg.T + tg
    return {
        "segments": int(world.segments.shape[0]),
        "n_gt": int(len(gt)),
        "ticks": int(ticks),
        "ate_slam": float(W.ate_rmse(jnp.asarray(est[:, :2]),
                                     traj.truth[:, :2])),
        "ate_slam_aligned": float(np.sqrt(np.mean(
            np.sum((est_al - truth[:, :2]) ** 2, -1)))),
        "ate_odom": float(W.ate_rmse(traj.odom[:, :2], traj.truth[:, :2])),
        "landmarks": K,
        "map": W.map_accuracy(lm, gt, tol=0.6),
        "map_aligned": W.map_accuracy(lm_al, gt, tol=0.6),
        "nis_mean": float(nis[fin].mean()) if fin.any() else float("nan"),
        "nis_median": float(np.median(nis[fin])) if fin.any()
        else float("nan"),
        "n_nis": int(fin.sum()),
    }, carry, outs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rooms", type=int, default=3,
                    help="floorplan is rooms x rooms (default 3)")
    ap.add_argument("--ticks", type=int, default=700)
    ap.add_argument("--capacity", type=int, default=256)
    ap.add_argument("--control", default="fused",
                    choices=["odometry", "icp", "fused"])
    ap.add_argument("--odo-theta-std", type=float, default=0.5,
                    help="odometry heading noise, deg/tick (default 0.5)")
    ap.add_argument("--n-beams", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--f64", action="store_true")
    args = ap.parse_args(argv)

    m, _, _ = run_campaign(args.rooms, args.ticks, args.capacity,
                           args.control, seed=args.seed,
                           n_beams=args.n_beams,
                           odo_theta_std=args.odo_theta_std,
                           dtype=jnp.float64 if args.f64 else jnp.float32)
    acc = m["map_aligned"]
    print(f"world: {m['segments']} wall segments, {m['n_gt']} effective "
          f"ground-truth landmarks; {m['ticks']} ticks")
    print(f"ATE slam={m['ate_slam']:.3f} m (gauge-aligned "
          f"{m['ate_slam_aligned']:.3f}) vs dead-reckoned odometry "
          f"{m['ate_odom']:.3f} m  (control={args.control})")
    print(f"landmarks mapped: {m['landmarks']} "
          f"({acc['n_matched']}/{acc['n_gt']} ground-truth matched "
          f"after alignment, {acc['n_spurious']} spurious, "
          f"mean err {acc['mean_err']:.3f} m)")
    print(f"NIS: mean {m['nis_mean']:.2f} median {m['nis_median']:.2f} "
          f"over {m['n_nis']} gated observations (chi^2(2) ~ 2.0)")
    return m


if __name__ == "__main__":
    main()

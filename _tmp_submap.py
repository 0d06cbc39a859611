"""Scratch: submap+posegraph campaign quality at 5x5 (CPU)."""
import os
import sys
import time

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
import runpy

mod = runpy.run_path("examples/large_world_slam.py")
campaign_params = mod["campaign_params"]

from ekf_slam_tpu.config import SimConfig
from ekf_slam_tpu.parallel.submaps import SubmapSlam
from ekf_slam_tpu.sim import world as W

NXY = int(os.environ.get("NXY", 5))
CTRL = os.environ.get("CTRL", "icp")
TPS = int(os.environ.get("TPS", 300))

w = W.floorplan_world(NXY, NXY, seed=0)
gt = W.cluster_feet(W.true_feet(w), 0.5)
wp = W.serpentine_waypoints(NXY, NXY)
ctrl, start = W.waypoint_controls(wp, step=0.25)
T = ctrl.shape[0]
print(f"world {w.segments.shape[0]} segs, {len(gt)} GT, {T} ticks")
cfg = SimConfig(n_beams=1024, max_range=10.0, range_noise_std=0.01,
                odom_xy_noise_std=0.004, odom_theta_noise_std=0.5,
                dtype=jnp.float32)
traj = W.simulate(w, jnp.asarray(ctrl, jnp.float32), cfg,
                  jax.random.PRNGKey(0), start_pose=tuple(start))

ekf, ransac = campaign_params(192, jnp.float32, CTRL, 0.5)
import dataclasses
ransac = dataclasses.replace(ransac, table_capacity=512)
sm = SubmapSlam(ekf_params=ekf, ransac_params=ransac, seed=1,
                ticks_per_submap=TPS, kf_every=30,
                session_kwargs=dict(
                    control_source=CTRL, icp_max_pair_dist=0.4,
                    icp_min_inliers=200, icp_max_rmse=0.08,
                    maintain_merge_radius=0.4),
                start_pose=start)
t0 = time.time()
poses_pre = sm.run(np.asarray(traj.odom), np.asarray(traj.ranges),
                   traj.beam_angles)
print(f"submap run: {time.time()-t0:.1f}s, {len(sm.submaps)} submaps, "
      f"landmarks {[s.n_landmarks for s in sm.submaps]}")
truth = np.asarray(traj.truth, np.float64)
ate_pre = float(np.sqrt(np.mean(np.sum(
    (poses_pre[:, :2] - truth[:, :2]) ** 2, -1))))
n_lc = sm.detect_loop_closures_traj(np.asarray(traj.ranges),
                                    traj.beam_angles, radius=10.0, max_per_pair=2, max_corr_xy=3.0, max_corr_deg=5.0,
                                    min_separation=1,
                                    icp_max_rmse=0.16,
                                    icp_min_inliers=120)
sm.optimize(iters=25)
poses_post = sm.global_poses()
ate_post = float(np.sqrt(np.mean(np.sum(
    (poses_post[:, :2] - truth[:, :2]) ** 2, -1))))
ate_odom = float(np.sqrt(np.mean(np.sum(
    (np.asarray(traj.odom)[:, :2] - truth[:, :2]) ** 2, -1))))
lm = sm.global_landmarks()
lm_c = W.cluster_feet(lm, 0.5) if len(lm) else lm
acc = W.map_accuracy_lines(lm_c, w, tol=0.5)
print(f"loop closures: {n_lc}")
print(f"ATE pre {ate_pre:.2f} post {ate_post:.2f} vs odom {ate_odom:.2f}")
print(f"landmarks {len(lm)} -> {len(lm_c)} clustered; lines-map {acc}")

# closure accuracy vs truth
TPS_v = TPS
import math
g = sm.graph
ne = int(g.n_edges)
eij = np.asarray(g.edge_ij)[:ne]
ez = np.asarray(g.edge_z)[:ne]
n_odo = len(sm.submaps)  # first edges are the odometry chain
node_tick = {sm.submaps[k].node_id: k * TPS_v for k in range(len(sm.submaps))}
node_tick[int(eij[len(sm.submaps)-1,1])] = len(truth) - 1
from ekf_slam_tpu.parallel import posegraph as pg2
import jax.numpy as jnp3
for e in range(ne):
    i, j = int(eij[e,0]), int(eij[e,1])
    if i not in node_tick or j not in node_tick: continue
    ti, tj = min(node_tick[i], len(truth)-1), min(node_tick[j], len(truth)-1)
    zt = np.asarray(pg2.relative_pose(jnp3.asarray(truth[ti]), jnp3.asarray(truth[tj])))
    err = ez[e] - zt
    err[2] = (err[2] + 180) % 360 - 180
    kind = "odo " if e < len(sm.submaps) else "LOOP"
    if kind == "LOOP" or np.hypot(err[0], err[1]) > 1:
        print(f"{kind} edge {i}->{j}: err xy {np.hypot(err[0],err[1]):.2f} th {err[2]:.1f}")

# in-segment heading error trace for segment 0
lo = sm._segment_local[0]
t0 = 0
th_true0 = truth[t0, 2]
herr = [(lo[t][2] - (truth[t0+t, 2] - th_true0) + 180) % 360 - 180
        for t in range(len(lo))]
u_turn = np.abs(ctrl[:len(lo), 1])
for t in range(118, len(lo)):
    print(f"t={t:3d} herr={herr[t]:7.2f} dTh={ctrl[t][1]:6.2f}")

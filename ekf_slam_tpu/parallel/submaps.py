"""Submap SLAM: map-block partitioning tied together by the pose graph.

BASELINE.json config 5: "map-block partitioned EKF + keyframe pose-graph
layer".  The dense EKF's covariance couples every landmark to the robot, so
one global filter cannot shard across weakly-interacting regions without
paying for the full D².  Submaps break that coupling the classical way
(Atlas / submap SLAM):

* the robot always runs a normal EKF **in the local frame of the current
  submap** (filter starts at the origin — exactly init_state);
* when a submap fills up (landmark count) or ages out (tick budget), it is
  frozen, a keyframe node is dropped at its anchor, an odometry edge
  connects consecutive anchors, and a fresh submap starts at the current
  global pose;
* loop closures are edges between non-consecutive anchors; pose-graph
  optimization (parallel/posegraph.py) re-aligns all anchors, and the
  global map is each submap's landmarks pushed through its optimized
  anchor.

Submap transitions are host-driven (they are rare — one per hundreds of
ticks); each segment between transitions runs as one fused jitted scan, so
the hot path stays on-device.  Different submaps are independent filters —
they can run on different hosts/chips, which is the multi-host partition
story (each host owns a region's submaps; only anchor poses + edges cross
DCN).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..config import EKFParams, RansacParams
from ..session import SessionCarry, SlamSession
from . import posegraph as pg


def compose(anchor: np.ndarray, local: np.ndarray) -> np.ndarray:
    """Global pose of ``local`` expressed in ``anchor``'s frame (degrees)."""
    th = np.deg2rad(anchor[2])
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return np.concatenate([
        anchor[:2] + R @ np.asarray(local[:2]),
        [np.mod(anchor[2] + local[2], 360.0)],
    ])


def inverse_pose(p: np.ndarray) -> np.ndarray:
    """SE(2) inverse: compose(p, inverse_pose(p)) = identity (degrees)."""
    th = np.deg2rad(p[2])
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return np.concatenate([-(R.T @ np.asarray(p[:2])),
                           [np.mod(-p[2], 360.0)]])


def transform_points(anchor: np.ndarray, pts: np.ndarray) -> np.ndarray:
    th = np.deg2rad(anchor[2])
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    return pts @ R.T + anchor[:2]


@dataclasses.dataclass
class Submap:
    anchor: np.ndarray            # global pose of the submap frame at spawn
    node_id: int                  # pose-graph node of the anchor
    carry: SessionCarry           # frozen filter state (local frame)
    n_landmarks: int
    end_local_pose: np.ndarray    # robot pose in this submap at freeze time
    #: representative scan points in the SUBMAP frame (for ICP loop
    #: closures) + validity mask; None if scans were not recorded
    scan_pts: Optional[np.ndarray] = None
    scan_valid: Optional[np.ndarray] = None
    #: keyframe scans along the segment (ROBOT-frame points at each
    #: keyframe tick) + their local poses in the submap frame — the
    #: trajectory loop-closure detector matches against these, because
    #: a coverage route passes near the BODY of an old submap, rarely
    #: near its anchor (detect_loop_closures_traj).
    kf_pts: Optional[np.ndarray] = None      # [Nk,B,2]
    kf_valid: Optional[np.ndarray] = None    # [Nk,B]
    kf_pose: Optional[np.ndarray] = None     # [Nk,3] local poses


@dataclasses.dataclass
class SubmapSlam:
    """Host-orchestrated submap pipeline over fused on-device segments."""

    ekf_params: Optional[EKFParams] = None
    ransac_params: Optional[RansacParams] = None
    max_landmarks_per_submap: int = 24
    ticks_per_submap: int = 200
    seed: int = 0
    #: dtype for the pose-graph/loop-closure math; None follows the
    #: filter dtype.  Pass jnp.float64 explicitly on x64-enabled hosts
    #: to optimize the graph in double even for an f32 filter.
    graph_dtype: Optional[object] = None
    #: extra SlamSession keyword arguments for the per-submap session
    #: (e.g. control_source='icp', collect_nis=True,
    #: maintain_merge_radius=... — the large-world campaign runs its
    #: tuned session inside each submap).
    session_kwargs: Optional[dict] = None
    #: global pose of the FIRST submap's frame (the world anchor); the
    #: default origin matches the reference's x0=0 convention.
    start_pose: Optional[np.ndarray] = None
    #: record a ROBOT-frame keyframe scan every this many ticks within a
    #: segment (for trajectory loop closures); 0 disables keyframes.
    kf_every: int = 40

    def __post_init__(self):
        self.session = SlamSession(ekf_params=self.ekf_params,
                                   ransac_params=self.ransac_params,
                                   seed=self.seed,
                                   **(self.session_kwargs or {}))
        self.ekf_params = self.session.ekf_params
        # pose-graph dtype follows the filter params unless overridden:
        # hard-coded f64 here used to emit truncation warnings (and
        # silently compute f32) whenever x64 is disabled — exactly the
        # multichip dryrun setting
        self._dt = (self.graph_dtype if self.graph_dtype is not None
                    else self.ekf_params.dtype)
        self.graph = pg.init_graph(256, 1024, self._dt)
        self.submaps: List[Submap] = []
        self._anchor = (np.zeros(3) if self.start_pose is None
                        else np.asarray(self.start_pose, np.float64))
        self.graph, nid = pg.add_node(self.graph,
                                      jnp.asarray(self._anchor, self._dt))
        self._node = int(nid)
        self._carry = None
        self._segment_local: List[np.ndarray] = []
        # information = 1/sigma² on [m, m, RADIAN] residuals.  A
        # segment's end-pose error is ~0.3 m / ~1.5 deg (0.026 rad), so
        # heading information is two orders above position — the old
        # uniform (50,50,50) said sigma_theta = 8 deg, drowning the
        # heading consistency that actually drives global drift.
        self._odo_info = np.array([10.0, 10.0, 1500.0])

    # -- running ------------------------------------------------------------
    def run(self, odom: np.ndarray, ranges: np.ndarray,
            beam_angles) -> np.ndarray:
        """Feed the whole stream; returns global pose estimates [T,3].

        Splits the stream into submap segments; each segment runs fused
        (session.run) with odometry re-expressed so the filter works in the
        submap's local frame (the control vector u is frame-invariant)."""
        odom = np.asarray(odom)
        ranges = np.asarray(ranges)
        T = odom.shape[0]
        poses = np.zeros((T, 3))
        t0 = 0
        while t0 < T:
            t1 = min(t0 + self.ticks_per_submap, T)
            # anchor the new segment at the PREVIOUS tick's odometry:
            # its first step then integrates the t0-1 -> t0 motion, so
            # no tick of real motion is dropped at segment boundaries
            # (with first_odom=odom[t0] the first step's control is zero
            # and one tick vanishes per segment — measured as ~9 deg
            # edge error whenever a segment ended mid-turn).  The frame
            # bookkeeping stays consistent: the new submap's frame is
            # the robot pose at t0-1, which IS the previous segment's
            # end pose, i.e. exactly the anchor compose() uses.
            is_icp = self.session.control_source in ("icp", "fused")
            seg_carry = self.session.init_carry(
                first_odom=odom[t0] if t0 == 0 else odom[t0 - 1],
                n_beams=ranges.shape[1] if is_icp else None)
            if is_icp and t0 > 0:
                # same boundary fix for scan-matched control: seed the
                # carry with the t0-1 scan so the first tick's ICP
                # recovers the t0-1 -> t0 motion instead of u=0
                from ..ops.scan import scan_from_ranges, to_cartesian
                import jax.numpy as jnp
                scp = scan_from_ranges(jnp.asarray(ranges[t0 - 1]),
                                       jnp.asarray(beam_angles))
                seg_carry = seg_carry._replace(
                    prev_pts=jnp.asarray(to_cartesian(scp),
                                         self.ekf_params.dtype),
                    prev_valid=scp.valid)
            seg_carry, outs = self.session.run(
                odom[t0:t1], ranges[t0:t1], beam_angles, carry=seg_carry)
            local = np.asarray(outs.pose)
            self._segment_local.append(local)
            for i in range(t1 - t0):
                poses[t0 + i] = compose(self._anchor, local[i])
            # representative scan: first tick's scan in the submap frame
            # (robot starts at the submap origin, so local-frame points of
            # tick t0 ARE submap-frame points)
            from ..ops.scan import (scan_from_ranges, scan_to_world,
                                    to_cartesian)
            import jax.numpy as jnp
            sc = scan_from_ranges(jnp.asarray(ranges[t0]),
                                  jnp.asarray(beam_angles))
            pts0 = np.asarray(scan_to_world(sc, jnp.zeros(3)))
            kf_pts = kf_valid = kf_pose = None
            if self.kf_every > 0:
                ks = list(range(0, t1 - t0, self.kf_every))
                pts_l, val_l, pose_l = [], [], []
                for k in ks:
                    sck = scan_from_ranges(jnp.asarray(ranges[t0 + k]),
                                           jnp.asarray(beam_angles))
                    pts_l.append(np.asarray(to_cartesian(sck)))
                    val_l.append(np.asarray(sck.valid))
                    pose_l.append(local[k])
                kf_pts = np.stack(pts_l)
                kf_valid = np.stack(val_l)
                kf_pose = np.stack(pose_l)
            self._freeze_segment(seg_carry, local[-1],
                                 scan_pts=pts0,
                                 scan_valid=np.asarray(sc.valid),
                                 kf_pts=kf_pts, kf_valid=kf_valid,
                                 kf_pose=kf_pose)
            t0 = t1
        return poses

    def _freeze_segment(self, carry: SessionCarry, end_local: np.ndarray,
                        scan_pts=None, scan_valid=None, kf_pts=None,
                        kf_valid=None, kf_pose=None):
        """Freeze the current submap, drop a keyframe, spawn the next."""
        self.submaps.append(Submap(
            anchor=self._anchor.copy(), node_id=self._node,
            carry=carry, n_landmarks=int(carry.filt.n_active),
            end_local_pose=np.asarray(end_local),
            scan_pts=scan_pts, scan_valid=scan_valid,
            kf_pts=kf_pts, kf_valid=kf_valid, kf_pose=kf_pose))
        new_anchor = compose(self._anchor, end_local)
        self.graph, nid = pg.add_node(self.graph,
                                      jnp.asarray(new_anchor, self._dt))
        # odometry edge: measured relative pose between the two anchors is
        # the filter's end-of-segment local pose.
        z = jnp.asarray(
            [end_local[0], end_local[1],
             np.mod(end_local[2] + 180.0, 360.0) - 180.0], self._dt)
        self.graph = pg.add_edge(
            self.graph, self._node, int(nid), z,
            jnp.asarray(self._odo_info, self._dt))
        self._anchor = new_anchor
        self._node = int(nid)

    # -- loop closure / optimization -----------------------------------------
    def detect_loop_closures(self, radius: float = 1.0,
                             min_separation: int = 2,
                             info=(200.0, 200.0, 200.0),
                             use_icp: bool = False,
                             icp_max_rmse: float = 0.1,
                             icp_min_inliers: int = 50) -> int:
        """Loop-closure detection: when two non-adjacent submap anchors lie
        within ``radius`` (by current estimates), add a relative-pose edge.

        With ``use_icp`` the measurement is computed by matching the two
        submaps' stored scans (ops/icp.py) seeded from the anchor estimate
        — a genuine loop-closure observation, accepted only when the match
        converges (rmse / inlier gates).  Without it, the anchor-estimate
        relative pose is used directly.  Returns the closures added."""
        from ..ops.icp import icp as run_icp
        added = 0
        for i in range(len(self.submaps)):
            for j in range(i + min_separation + 1, len(self.submaps)):
                a, b = self.submaps[i], self.submaps[j]
                if np.linalg.norm(a.anchor[:2] - b.anchor[:2]) >= radius:
                    continue
                z0 = np.asarray(pg.relative_pose(
                    jnp.asarray(a.anchor, self._dt),
                    jnp.asarray(b.anchor, self._dt)))
                if (use_icp and a.scan_pts is not None
                        and b.scan_pts is not None):
                    # points of j's frame aligned into i's frame:
                    # p_i = T(z_ij) · p_j — ICP refines z_ij from z0
                    res = run_icp(
                        jnp.asarray(b.scan_pts, self._dt),
                        jnp.asarray(b.scan_valid),
                        jnp.asarray(a.scan_pts, self._dt),
                        jnp.asarray(a.scan_valid),
                        init_pose=jnp.asarray(z0, self._dt), iters=25)
                    if (float(res.rmse) > icp_max_rmse
                            or int(res.n_inliers) < icp_min_inliers):
                        continue
                    z = np.array(res.pose)   # writable host copy
                    z[2] = np.mod(z[2] + 180.0, 360.0) - 180.0
                else:
                    z = z0
                self.add_loop_closure(i, j, z, info)
                added += 1
        return added

    def detect_loop_closures_traj(self, ranges: np.ndarray, beam_angles,
                                  radius: float = 10.0,
                                  min_separation: int = 1,
                                  info=(6.0, 6.0, 3000.0),
                                  icp_max_rmse: float = 0.12,
                                  icp_min_inliers: int = 120,
                                  icp_max_pair_dist: float = 2.0,
                                  max_per_pair: int = 1,
                                  max_corr_xy: float = 4.0,
                                  max_corr_deg: float = 15.0) -> int:
        """Trajectory-based loop closures: the anchor-proximity detector
    above never fires on sweep/serpentine coverage routes (non-adjacent
    ANCHORS stay tens of meters apart even when the robot drives within
    meters of an old submap every row).  Here the detector walks each
    segment's per-tick GLOBAL pose estimates; whenever the robot passes
    within ``radius`` of an EARLIER submap's anchor, the that-tick scan
    (robot frame) is ICP-matched against the old submap's stored anchor
    scan, seeded from the current estimate — giving the robot's pose in
    the old submap's frame, hence a measured relative-pose edge between
    the two anchors: z_ij = z_icp ∘ (local_j[t])⁻¹.  Accepted only when
    the match converges (rmse / inlier gates).  Returns closures added.

    ``ranges``/``beam_angles`` are the same stream run() consumed (the
    segment tick offsets index into it)."""
        from ..ops.icp import icp as run_icp
        from ..ops.scan import scan_from_ranges, to_cartesian

        ranges = np.asarray(ranges)
        added = 0
        t_base = 0
        for j, (smj, local_j) in enumerate(zip(self.submaps,
                                               self._segment_local)):
            glob = np.stack([compose(smj.anchor, p) for p in local_j])
            for i in range(0, j - min_separation):
                smi = self.submaps[i]
                if smi.kf_pts is None:
                    continue
                # global poses of submap i's keyframes (current estimates)
                kf_glob = np.stack([compose(smi.anchor, p)
                                    for p in smi.kf_pose])
                # nearest (segment tick, keyframe) pairs
                d = np.hypot(glob[:, None, 0] - kf_glob[None, :, 0],
                             glob[:, None, 1] - kf_glob[None, :, 1])
                n_pair = 0
                while n_pair < max_per_pair:
                    t, kf = np.unravel_index(np.argmin(d), d.shape)
                    if d[t, kf] >= radius:
                        break
                    d[t, :] = np.inf      # one closure per tick/keyframe
                    d[:, kf] = np.inf
                    sc = scan_from_ranges(
                        jnp.asarray(ranges[t_base + t], self._dt),
                        jnp.asarray(beam_angles, self._dt))
                    pts = np.asarray(to_cartesian(sc))
                    # seed: robot pose in the KEYFRAME's robot frame per
                    # current estimates
                    z0 = np.asarray(pg.relative_pose(
                        jnp.asarray(kf_glob[kf], self._dt),
                        jnp.asarray(glob[t], self._dt)))
                    # coarse-to-fine: the seed error IS the accumulated
                    # drift being measured, so a first pass pairs
                    # coarsely to pull the alignment in, then a tight
                    # pass re-pairs at fine radius — the ACCEPT gate
                    # reads the fine pass (a coarse-radius rmse mixes
                    # mismatched pairs and rejects genuine closures)
                    a = (jnp.asarray(pts, self._dt),
                         jnp.asarray(np.asarray(sc.valid)),
                         jnp.asarray(smi.kf_pts[kf], self._dt),
                         jnp.asarray(smi.kf_valid[kf]))
                    coarse = run_icp(*a,
                                     init_pose=jnp.asarray(z0, self._dt),
                                     iters=25,
                                     max_pair_dist=icp_max_pair_dist)
                    res = run_icp(*a, init_pose=coarse.pose, iters=15,
                                  max_pair_dist=0.5)
                    if (float(res.rmse) > icp_max_rmse
                            or int(res.n_inliers) < icp_min_inliers):
                        continue
                    # perceptual-aliasing guard: semi-regular worlds
                    # (look-alike rooms) let ICP converge CONFIDENTLY on
                    # the wrong room — a closure correcting more than
                    # the plausible drift envelope is rejected (one such
                    # outlier edge NaN'd the f32 Gauss-Newton at 16x16)
                    z_fine = np.array(res.pose, np.float64)
                    dxy = float(np.hypot(z_fine[0] - z0[0],
                                         z_fine[1] - z0[1]))
                    dth = abs(((z_fine[2] - z0[2]) + 180.0) % 360.0
                              - 180.0)
                    if dxy > max_corr_xy or dth > max_corr_deg:
                        continue
                    # robot in submap i frame = kf_pose ∘ z_icp; edge
                    # z_ij = (robot in i) ∘ (robot in j)⁻¹
                    z_icp = z_fine
                    z = compose(compose(smi.kf_pose[kf], z_icp),
                                inverse_pose(local_j[t]))
                    z[2] = np.mod(z[2] + 180.0, 360.0) - 180.0
                    self.add_loop_closure(i, j, z, info)
                    added += 1
                    n_pair += 1
            t_base += len(local_j)
        return added

    def add_loop_closure(self, i: int, j: int, z_rel, info=(200.0, 200.0,
                                                           200.0)):
        """Relative-pose constraint between submap i's and submap j's
        anchors (e.g. from scan matching or re-observed landmarks)."""
        self.graph = pg.add_edge(
            self.graph, self.submaps[i].node_id, self.submaps[j].node_id,
            jnp.asarray(z_rel, self._dt), jnp.asarray(info, self._dt))

    def optimize(self, iters: int = 15) -> bool:
        """Re-align all anchors; updates each submap's stored anchor.

        Returns False (leaving the anchors untouched) if the optimized
        nodes are non-finite — a diverged Gauss-Newton (e.g. an outlier
        closure that slipped the gates) must not destroy the map."""
        before = self.graph
        # host f64 solve: the normal equations' gauge-prior/damping mix
        # is condition ~1e12 — an f32 backend solve diverges (pg
        # .optimize_np)
        self.graph = pg.optimize_np(self.graph, iters=iters)
        nodes = np.asarray(self.graph.nodes)
        n = int(self.graph.n_nodes)
        if not np.all(np.isfinite(nodes[:n])):
            self.graph = before
            return False
        for sm in self.submaps:
            sm.anchor = nodes[sm.node_id].copy()
            sm.anchor[2] = np.mod(sm.anchor[2], 360.0)
        return True

    # -- global map -----------------------------------------------------------
    def global_landmarks(self) -> np.ndarray:
        """All landmarks, each submap's pushed through its (optimized)
        anchor, concatenated [N,2]."""
        out = []
        for sm in self.submaps:
            n = sm.n_landmarks
            if n == 0:
                continue
            local = np.asarray(sm.carry.filt.x[3:3 + 2 * n]).reshape(n, 2)
            out.append(transform_points(sm.anchor, local))
        return (np.concatenate(out, axis=0) if out
                else np.zeros((0, 2)))

    def global_trajectory_nodes(self) -> np.ndarray:
        """Optimized anchor poses [S+1, 3] (the keyframe trajectory)."""
        n = int(self.graph.n_nodes)
        return np.asarray(self.graph.nodes[:n])

    def global_poses(self) -> np.ndarray:
        """Per-tick global pose estimates [T,3] recomposed through the
        CURRENT (e.g. post-optimize) anchors — run() returns the
        pre-optimization composition; call this after loop closures +
        optimize() for the corrected trajectory."""
        out = []
        for sm, local in zip(self.submaps, self._segment_local):
            out.append(np.stack([compose(sm.anchor, p) for p in local]))
        return (np.concatenate(out, axis=0) if out
                else np.zeros((0, 3)))

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

    def __post_init__(self):
        self.session = SlamSession(ekf_params=self.ekf_params,
                                   ransac_params=self.ransac_params,
                                   seed=self.seed)
        self.ekf_params = self.session.ekf_params
        # pose-graph dtype follows the filter params unless overridden:
        # hard-coded f64 here used to emit truncation warnings (and
        # silently compute f32) whenever x64 is disabled — exactly the
        # multichip dryrun setting
        self._dt = (self.graph_dtype if self.graph_dtype is not None
                    else self.ekf_params.dtype)
        self.graph = pg.init_graph(256, 1024, self._dt)
        self.submaps: List[Submap] = []
        self._anchor = np.zeros(3)
        self.graph, nid = pg.add_node(self.graph,
                                      jnp.asarray(self._anchor, self._dt))
        self._node = int(nid)
        self._carry = None
        self._odo_info = np.array([50.0, 50.0, 50.0])

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
            seg_carry = self.session.init_carry(first_odom=odom[t0])
            seg_carry, outs = self.session.run(
                odom[t0:t1], ranges[t0:t1], beam_angles, carry=seg_carry)
            local = np.asarray(outs.pose)
            for i in range(t1 - t0):
                poses[t0 + i] = compose(self._anchor, local[i])
            # representative scan: first tick's scan in the submap frame
            # (robot starts at the submap origin, so local-frame points of
            # tick t0 ARE submap-frame points)
            from ..ops.scan import scan_from_ranges, scan_to_world
            import jax.numpy as jnp
            sc = scan_from_ranges(jnp.asarray(ranges[t0]),
                                  jnp.asarray(beam_angles))
            pts0 = np.asarray(scan_to_world(sc, jnp.zeros(3)))
            self._freeze_segment(seg_carry, local[-1],
                                 scan_pts=pts0,
                                 scan_valid=np.asarray(sc.valid))
            t0 = t1
        return poses

    def _freeze_segment(self, carry: SessionCarry, end_local: np.ndarray,
                        scan_pts=None, scan_valid=None):
        """Freeze the current submap, drop a keyframe, spawn the next."""
        self.submaps.append(Submap(
            anchor=self._anchor.copy(), node_id=self._node,
            carry=carry, n_landmarks=int(carry.filt.n_active),
            end_local_pose=np.asarray(end_local),
            scan_pts=scan_pts, scan_valid=scan_valid))
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

    def add_loop_closure(self, i: int, j: int, z_rel, info=(200.0, 200.0,
                                                           200.0)):
        """Relative-pose constraint between submap i's and submap j's
        anchors (e.g. from scan matching or re-observed landmarks)."""
        self.graph = pg.add_edge(
            self.graph, self.submaps[i].node_id, self.submaps[j].node_id,
            jnp.asarray(z_rel, self._dt), jnp.asarray(info, self._dt))

    def optimize(self, iters: int = 15):
        """Re-align all anchors; updates each submap's stored anchor."""
        self.graph = pg.optimize(self.graph, iters=iters)
        nodes = np.asarray(self.graph.nodes)
        for sm in self.submaps:
            sm.anchor = nodes[sm.node_id].copy()
            sm.anchor[2] = np.mod(sm.anchor[2], 360.0)

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

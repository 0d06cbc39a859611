"""Multi-robot map merging: N independent sessions → one global map.

The fleet layer (parallel/multi.py) advances N robots as one vmapped
device program, but each robot maps in its OWN frame (its filter starts
at the origin of wherever it was switched on).  This module fuses the
fleet's maps into a single global frame — the swarm-mapping capability
the reference cannot express (one robot, one MATLAB session):

* one pose-graph node per robot = the global pose of its map frame,
  initialized from a coarse deployment guess (drop point, GPS, prior);
* a weak prior edge pins each guess, and pairwise **scan-match edges**
  (ops/icp.py between the robots' representative scans, seeded from the
  guesses and accepted only under rmse/inlier gates) supply the precise
  inter-robot alignment;
* Gauss-Newton over the graph (parallel/posegraph.py) solves all frames
  jointly, then every robot's landmarks are pushed through its optimized
  frame and near-duplicates are merged.

Anchors and scans are O(robots + beams) host data; the heavy per-robot
filtering stays on-device in the fleet program.
"""
from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.icp import icp as run_icp
from . import posegraph as pg
from .submaps import transform_points


@dataclasses.dataclass
class RobotMap:
    """One robot's contribution: its local map + a coarse global anchor."""
    anchor_guess: np.ndarray      # f[3] global pose of the robot's frame
    scan_pts: np.ndarray          # f[B,2] representative scan, robot FRAME
    scan_valid: np.ndarray        # bool[B]
    landmarks: np.ndarray         # f[n,2] local landmark estimates


class MergeResult(NamedTuple):
    anchors: np.ndarray           # f[N,3] optimized robot-frame poses
    landmarks: np.ndarray         # f[M,2] merged global landmarks
    n_before_merge: int           # landmark count before dedup
    n_icp_edges: int              # accepted inter-robot alignments
    graph: "pg.PoseGraph"


def robot_map_from_carry(carry, ranges0, beam_angles, anchor_guess,
                         local_pose=None) -> RobotMap:
    """Build a RobotMap from a session carry + the robot's first scan.

    ``local_pose``: the robot's pose in its own frame when ``ranges0`` was
    taken (origin for the first tick)."""
    from ..ops.scan import scan_from_ranges, scan_to_world
    sc = scan_from_ranges(jnp.asarray(ranges0), jnp.asarray(beam_angles))
    pose = (jnp.zeros(3, sc.ranges.dtype) if local_pose is None
            else jnp.asarray(local_pose, sc.ranges.dtype))
    n = int(carry.filt.n_active)
    lms = np.asarray(carry.filt.x[3:3 + 2 * n]).reshape(n, 2)
    return RobotMap(anchor_guess=np.asarray(anchor_guess, np.float64),
                    scan_pts=np.asarray(scan_to_world(sc, pose)),
                    scan_valid=np.asarray(sc.valid),
                    landmarks=lms)


def _dedupe(points: np.ndarray, radius: float) -> np.ndarray:
    """Greedy merge of points within ``radius`` (cluster means)."""
    out: List[np.ndarray] = []
    counts: List[int] = []
    for p in points:
        for k, q in enumerate(out):
            if np.linalg.norm(p - q) < radius:
                out[k] = (q * counts[k] + p) / (counts[k] + 1)
                counts[k] += 1
                break
        else:
            out.append(p.astype(np.float64))
            counts.append(1)
    return np.asarray(out) if out else np.zeros((0, 2))


def merge_maps(maps: Sequence[RobotMap], icp_iters: int = 25,
               icp_max_rmse: float = 0.15, icp_min_inliers: int = 80,
               guess_info=(2.0, 2.0, 2.0), icp_info=(300.0, 300.0, 300.0),
               merge_radius: float = 0.3, opt_iters: int = 15,
               dtype=None) -> MergeResult:
    """Fuse N robot maps into robot 0's frame (see module doc).

    ``dtype``: device dtype for the graph/ICP math; defaults to the scan
    points' dtype (requesting f64 under an x64-disabled runtime would
    emit truncation warnings and silently compute in f32)."""
    N = len(maps)
    dt = dtype if dtype is not None else jnp.asarray(maps[0].scan_pts).dtype
    graph = pg.init_graph(max(8, N), max(16, N * N), dt)
    ids = []
    for m in maps:
        graph, nid = pg.add_node(graph,
                                 jnp.asarray(m.anchor_guess, dt))
        ids.append(int(nid))

    # weak priors: keep every frame near its deployment guess
    for k in range(1, N):
        z = pg.relative_pose(jnp.asarray(maps[0].anchor_guess, dt),
                             jnp.asarray(maps[k].anchor_guess, dt))
        graph = pg.add_edge(graph, ids[0], ids[k], z,
                            jnp.asarray(guess_info, dt))

    # precise alignment: pairwise scan matches seeded from the guesses
    n_icp = 0
    for i in range(N):
        for j in range(i + 1, N):
            a, b = maps[i], maps[j]
            z0 = pg.relative_pose(jnp.asarray(a.anchor_guess, dt),
                                  jnp.asarray(b.anchor_guess, dt))
            res = run_icp(jnp.asarray(b.scan_pts, dt),
                          jnp.asarray(b.scan_valid),
                          jnp.asarray(a.scan_pts, dt),
                          jnp.asarray(a.scan_valid),
                          init_pose=jnp.asarray(z0, dt),
                          iters=icp_iters)
            if (float(res.rmse) > icp_max_rmse
                    or int(res.n_inliers) < icp_min_inliers):
                continue
            z = np.array(res.pose)            # writable host copy
            z[2] = np.mod(z[2] + 180.0, 360.0) - 180.0
            graph = pg.add_edge(graph, ids[i], ids[j],
                                jnp.asarray(z, dt),
                                jnp.asarray(icp_info, dt))
            n_icp += 1

    graph = pg.optimize(graph, iters=opt_iters)
    anchors = np.asarray(graph.nodes[:N]).copy()
    anchors[:, 2] = np.mod(anchors[:, 2], 360.0)

    pts = [transform_points(anchors[k], maps[k].landmarks)
           for k in range(N) if maps[k].landmarks.shape[0]]
    all_pts = (np.concatenate(pts, axis=0) if pts else np.zeros((0, 2)))
    merged = _dedupe(all_pts, merge_radius)
    return MergeResult(anchors=anchors, landmarks=merged,
                       n_before_merge=int(all_pts.shape[0]),
                       n_icp_edges=n_icp, graph=graph)

"""Concurrent submap SLAM: all map blocks advance at once across devices.

parallel/submaps.py runs one submap at a time on the host (the robot is
only ever *in* one submap).  For offline/large-scale mapping that leaves
the device fleet idle: the trajectory is separable — each segment's filter
runs in its own local frame and only anchor poses couple segments — so all
S segment-filters can advance CONCURRENTLY.  This module does exactly
that, the data-parallel complement of the serial pipeline
(BASELINE.json config 5, "map-block partitioned EKF + keyframe pose-graph
layer"):

* the T-tick stream is cut into S segments; segment s's filter starts at
  the origin of its own frame (anchored at the robot pose entering the
  segment) and is driven by the frame-invariant controls u=[ΔD,Δθ] from
  its odometry window;
* all S filters advance in lockstep as ONE vmapped device program
  (parallel/multi.FleetSlamSession), the submap axis sharded over the
  mesh's ``data`` axis — one map region per device, wall-clock T/S
  sequential ticks instead of T;
* anchors + odometry edges + ICP loop closures then cross to the host
  pose-graph layer exactly as in the serial pipeline (the machinery is
  inherited from SubmapSlam: detect_loop_closures / optimize /
  global_landmarks).

Segment boundaries use the dead-reckoned hand-off (segment s's frame =
robot pose at its first tick's predecessor), so no control step is lost
at a boundary.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..ops.scan import scan_from_ranges, scan_to_world
from .multi import FleetSlamSession
from .submaps import SubmapSlam, compose


@dataclasses.dataclass
class ParallelSubmapSlam(SubmapSlam):
    """S submaps advanced concurrently (vmapped + data-sharded), tied
    together by the inherited pose-graph layer."""

    n_submaps: int = 4
    mesh: Optional[Mesh] = None

    def __post_init__(self):
        super().__post_init__()
        self.fleet = FleetSlamSession(
            n_sessions=self.n_submaps, ekf_params=self.ekf_params,
            ransac_params=self.ransac_params, mesh=self.mesh,
            seed=self.seed)

    # -- running --------------------------------------------------------------
    def run(self, odom: np.ndarray, ranges: np.ndarray,
            beam_angles) -> np.ndarray:
        """Consume the whole stream with all submaps advancing at once;
        returns global pose estimates [T,3].

        T must divide by n_submaps (offline partitioning — pad or trim the
        stream to a multiple)."""
        odom = np.asarray(odom)
        ranges = np.asarray(ranges)
        T = odom.shape[0]
        S = self.n_submaps
        if T % S != 0:
            raise ValueError(f"T={T} must divide by n_submaps={S}")
        L = T // S

        # [T,...] → [L,S,...]: tick i of every segment advances together
        seg_odom = odom.reshape(S, L, 3).transpose(1, 0, 2)
        seg_rng = ranges.reshape(S, L, -1).transpose(1, 0, 2)
        # each segment dead-reckons from the tick before its window, so no
        # control step is lost at a boundary (s=0 anchors to its own first
        # tick: u=0 on tick 0, as in the single-session run)
        first = np.stack([odom[0]] + [odom[s * L - 1]
                                      for s in range(1, S)])

        carry = self.fleet.init_carry(first_odoms=first)
        carry, outs = self.fleet.run(
            jnp.asarray(seg_odom), jnp.asarray(seg_rng), beam_angles,
            carry=carry)
        self._last_carry = carry      # for placement introspection/tests
        local = np.asarray(outs.pose)                       # [L,S,3]

        # host side: chain anchors, freeze every submap, emit global poses
        poses = np.zeros((T, 3))
        for s in range(S):
            for i in range(L):
                poses[s * L + i] = compose(self._anchor, local[i, s])
            carry_s = jax.tree_util.tree_map(lambda a, s=s: a[s], carry)
            sc = scan_from_ranges(jnp.asarray(ranges[s * L]),
                                  jnp.asarray(beam_angles))
            pts0 = np.asarray(scan_to_world(
                sc, jnp.asarray(local[0, s], sc.ranges.dtype)))
            self._freeze_segment(carry_s, local[-1, s],
                                 scan_pts=pts0,
                                 scan_valid=np.asarray(sc.valid))
        return poses

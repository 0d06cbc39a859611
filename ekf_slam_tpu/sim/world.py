"""Deterministic differential-drive simulator — the fake backend replacing
the reference's ROS seam.

The reference consumes live ``/scan`` + ``/odom`` topics from a LAN robot
(SLAM.m:23-24, 73-74; test_SLAM.m:8-11), which makes it untestable offline
(SURVEY.md §4).  This module generates the same two streams hermetically:
a wall-segment world, ray-cast range scans with noise, and dead-reckoned
odometry with drift — everything below the receive() seam is then pure math
shared with the real pipeline.

Ground-truth kinematics use the same degree-valued unicycle step as the
filter's motion model (EKF_SLAM.m:58-60), so filter-vs-truth error isolates
estimation error from model mismatch.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops.angles import cosd, sind, wrap_to_360


class World(NamedTuple):
    """Wall segments [S,4] as (x1, y1, x2, y2)."""
    segments: jnp.ndarray


def rectangle_room(half_w: float = 4.0, half_h: float = 3.0) -> World:
    w, h = half_w, half_h
    return World(segments=jnp.array([
        [-w, -h, w, -h], [w, -h, w, h], [w, h, -w, h], [-w, h, -w, -h],
    ]))


def world_with_obstacles(half_w: float = 4.0, half_h: float = 3.0,
                         boxes: Tuple = ()) -> World:
    """Rectangular room plus axis-aligned box obstacles
    ((cx, cy, half_side), ...)."""
    segs = [[-half_w, -half_h, half_w, -half_h],
            [half_w, -half_h, half_w, half_h],
            [half_w, half_h, -half_w, half_h],
            [-half_w, half_h, -half_w, -half_h]]
    for (cx, cy, r) in boxes:
        segs += [[cx - r, cy - r, cx + r, cy - r],
                 [cx + r, cy - r, cx + r, cy + r],
                 [cx + r, cy + r, cx - r, cy + r],
                 [cx - r, cy + r, cx - r, cy - r]]
    return World(segments=jnp.array(segs, jnp.float64
                                    if jax.config.read("jax_enable_x64")
                                    else jnp.float32))


def raycast(world: World, pose: jnp.ndarray, beam_angles_deg: jnp.ndarray,
            max_range: float) -> jnp.ndarray:
    """Ranges for each beam (NaN where nothing is hit within max_range).

    Vectorized beam x segment ray-segment intersection; min over segments.
    """
    th = pose[2]
    wa = beam_angles_deg + th
    d = jnp.stack([cosd(wa), sind(wa)], axis=-1)          # [B,2]
    p1 = world.segments[:, :2]                             # [S,2]
    e = world.segments[:, 2:] - p1                         # [S,2]
    rel = p1 - pose[:2]                                    # [S,2]

    # solve t*d - s*e = rel  per (beam, segment)
    det = d[:, None, 0] * (-e[None, :, 1]) - d[:, None, 1] * (-e[None, :, 0])
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    t = (rel[None, :, 0] * (-e[None, :, 1])
         - rel[None, :, 1] * (-e[None, :, 0])) / det_safe   # [B,S]
    s = (d[:, None, 0] * rel[None, :, 1]
         - d[:, None, 1] * rel[None, :, 0]) / det_safe      # [B,S]
    hit = (jnp.abs(det) >= 1e-12) & (t > 1e-9) & (s >= 0.0) & (s <= 1.0)
    t = jnp.where(hit, t, jnp.inf)
    rng = jnp.min(t, axis=1)
    return jnp.where(rng <= max_range, rng, jnp.nan)


class Trajectory(NamedTuple):
    """Simulated session streams (one row per tick)."""
    truth: jnp.ndarray        # f[T,3] ground-truth poses (deg)
    odom: jnp.ndarray         # f[T,3] dead-reckoned odometry poses (deg)
    ranges: jnp.ndarray       # f[T,B] scans (NaN = no return)
    beam_angles: jnp.ndarray  # f[B]


def unicycle_step(pose: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """One ground-truth kinematic step, matching EKF_SLAM.m:58-60."""
    dD, dTh = u[0], u[1]
    th = pose[2]
    return jnp.stack([
        pose[0] + dD * cosd(th + dTh),
        pose[1] + dD * sind(th + dTh),
        wrap_to_360(th + dTh),
    ])


def simulate(world: World, controls: jnp.ndarray, cfg: SimConfig,
             key: jnp.ndarray, start_pose=(0.0, 0.0, 0.0)) -> Trajectory:
    """Run controls [T,2] = (dD, dTheta) rows through the world.

    Odometry is truth + integrated noise on each delta (dead-reckoning
    drift), mirroring what the reference reads from /odom (SLAM.m:84-93).
    """
    T = controls.shape[0]
    beam_angles = jnp.linspace(0.0, cfg.fov_deg, cfg.n_beams,
                               endpoint=False)
    k_odo, k_rng = jax.random.split(key)
    odo_noise = jnp.concatenate([
        jax.random.normal(k_odo, (T, 1)) * cfg.odom_xy_noise_std,
        jax.random.normal(jax.random.fold_in(k_odo, 1), (T, 1))
        * cfg.odom_theta_noise_std,
    ], axis=-1)

    def step(carry, inp):
        pose, odom = carry
        u, nz, rk = inp
        pose = unicycle_step(pose, u)
        odom = unicycle_step(odom, u + nz)
        rng = raycast(world, pose, beam_angles, cfg.max_range)
        rng = rng + jax.random.normal(rk, rng.shape) * cfg.range_noise_std
        return (pose, odom), (pose, odom, rng)

    p0 = jnp.asarray(start_pose, jnp.float64
                     if jax.config.read("jax_enable_x64") else jnp.float32)
    keys = jax.random.split(k_rng, T)
    _, (truth, odom, ranges) = jax.lax.scan(
        step, (p0, p0), (controls, odo_noise, keys))
    return Trajectory(truth=truth, odom=odom, ranges=ranges,
                      beam_angles=beam_angles)


def circle_controls(T: int, dD: float = 0.05, dTh: float = 2.0
                    ) -> jnp.ndarray:
    """A gentle loop trajectory (closes after 180/dTh ticks)."""
    return jnp.tile(jnp.array([dD, dTh]), (T, 1))


def ate_rmse(est_xy: jnp.ndarray, truth_xy: jnp.ndarray) -> jnp.ndarray:
    """Absolute trajectory error (RMSE over positions) — the parity metric
    from BASELINE.json (the reference publishes none, SURVEY.md §6)."""
    err = est_xy - truth_xy
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))

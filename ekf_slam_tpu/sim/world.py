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

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

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


def floorplan_world(nx: int, ny: int, seed: int = 0, room: float = 8.0,
                    door: float = 1.8, wall_jitter_deg: float = 4.0,
                    base_angle_deg: float = 45.0, boxes: bool = True,
                    box_half: float = 1.0) -> World:
    """Large multi-room floorplan: an nx x ny grid of ``room``-sized rooms
    with a centered doorway in every interior wall, one box obstacle per
    room (``boxes``), centered on the world origin.

    This is the scalable world the round-4 verdict asked for (the stock
    rectangle_room caps every end-to-end run at a handful of walls): a
    16x16 grid with boxes carries ~2,000 wall segments, i.e. ~2,000
    distinct landmark lines for the extractor to map.

    Two deliberate geometry choices keep the REFERENCE feature model
    honest at scale:

    * every segment is rotated about its midpoint by a small random
      jitter (``wall_jitter_deg`` std), so collinear grid walls become
      DISTINCT infinite lines — the reference's landmark is the
      perpendicular foot from the world origin to the wall's line
      (RANSAC.m:220), and unjittered grid rows would all collapse onto
      one foot;
    * the whole world is rotated by ``base_angle_deg`` (45 deg default),
      so no wall is near-vertical in world frame — the reference's line
      fit is y = m*x + b (polyfit, RANSAC.m:185), degenerate for
      vertical walls; at 45 deg +- jitter every slope stays O(1).

    Deterministic in ``seed`` (host-side numpy; the world is built once).
    """
    rng = np.random.default_rng(seed)
    W, H = nx * room, ny * room
    x0, y0 = -W / 2.0, -H / 2.0
    segs = []

    def add_wall(xa, ya, xb, yb, with_door):
        if not with_door:
            segs.append((xa, ya, xb, yb))
            return
        # centered door gap of width ``door`` along the wall
        ex, ey = xb - xa, yb - ya
        L = float(np.hypot(ex, ey))
        f0 = (L - door) / (2 * L)
        f1 = (L + door) / (2 * L)
        segs.append((xa, ya, xa + f0 * ex, ya + f0 * ey))
        segs.append((xa + f1 * ex, ya + f1 * ey, xb, yb))

    # horizontal wall rows j=0..ny (interior rows get doors)
    for j in range(ny + 1):
        y = y0 + j * room
        for i in range(nx):
            add_wall(x0 + i * room, y, x0 + (i + 1) * room, y,
                     with_door=0 < j < ny)
    # vertical wall columns i=0..nx
    for i in range(nx + 1):
        x = x0 + i * room
        for j in range(ny):
            add_wall(x, y0 + j * room, x, y0 + (j + 1) * room,
                     with_door=0 < i < nx)
    # one box obstacle per room, jittered off-center so it never blocks
    # the door axes through the room center
    if boxes:
        for j in range(ny):
            for i in range(nx):
                cx = x0 + (i + 0.5) * room + rng.uniform(1.2, 2.0) * (
                    1 if rng.random() < 0.5 else -1)
                cy = y0 + (j + 0.5) * room + rng.uniform(1.2, 2.0) * (
                    1 if rng.random() < 0.5 else -1)
                r = box_half
                segs += [(cx - r, cy - r, cx + r, cy - r),
                         (cx + r, cy - r, cx + r, cy + r),
                         (cx + r, cy + r, cx - r, cy + r),
                         (cx - r, cy + r, cx - r, cy - r)]

    segs = np.asarray(segs, np.float64)                        # [S,4]
    # per-segment jitter rotation about the midpoint
    mid = 0.5 * (segs[:, :2] + segs[:, 2:])
    ang = np.deg2rad(rng.normal(0.0, wall_jitter_deg, len(segs)))
    ca, sa = np.cos(ang), np.sin(ang)

    def rot_about(p, c):
        d = p - c
        return np.stack([c[:, 0] + ca * d[:, 0] - sa * d[:, 1],
                         c[:, 1] + sa * d[:, 0] + ca * d[:, 1]], -1)

    p1 = rot_about(segs[:, :2], mid)
    p2 = rot_about(segs[:, 2:], mid)
    # global base rotation about the world origin
    b = np.deg2rad(base_angle_deg)
    Rb = np.array([[np.cos(b), -np.sin(b)], [np.sin(b), np.cos(b)]])
    p1, p2 = p1 @ Rb.T, p2 @ Rb.T
    dt = (jnp.float64 if jax.config.read("jax_enable_x64")
          else jnp.float32)
    return World(segments=jnp.asarray(
        np.concatenate([p1, p2], -1), dt))


def true_feet(world: World) -> np.ndarray:
    """Ground-truth landmark positions [S,2]: the perpendicular foot from
    the WORLD ORIGIN to each segment's infinite line — exactly the
    feature the extractor maps (RANSAC.m:220, ops/ransac
    .perpendicular_foot)."""
    segs = np.asarray(world.segments, np.float64)
    p1, e = segs[:, :2], segs[:, 2:] - segs[:, :2]
    t = -np.sum(p1 * e, -1) / np.maximum(np.sum(e * e, -1), 1e-12)
    return p1 + t[:, None] * e


def cluster_feet(feet: np.ndarray, radius: float = 0.5) -> np.ndarray:
    """Greedy clustering of ground-truth feet: feet closer than
    ``radius`` are one EFFECTIVE landmark (the extractor's association
    radius cannot tell them apart — RANSAC.m:283's landmarkDistance).
    Returns the [C,2] cluster representatives."""
    reps = []
    left = feet.copy()
    while len(left):
        c = left[0]
        d = np.hypot(left[:, 0] - c[0], left[:, 1] - c[1])
        reps.append(left[d < radius].mean(axis=0))
        left = left[d >= radius]
    return np.asarray(reps)


def map_accuracy(est_landmarks: np.ndarray, gt_feet: np.ndarray,
                 tol: float = 0.5) -> dict:
    """Match estimated landmarks to ground-truth feet within ``tol``.

    Returns {n_gt, n_est, n_matched (gt feet with >=1 estimate in tol),
    mean_err (over matched nearest pairs), n_spurious (estimates with no
    gt foot within tol)}."""
    if len(est_landmarks) == 0:
        return {"n_gt": int(len(gt_feet)), "n_est": 0, "n_matched": 0,
                "mean_err": float("nan"), "n_spurious": 0}
    d = np.hypot(est_landmarks[:, None, 0] - gt_feet[None, :, 0],
                 est_landmarks[:, None, 1] - gt_feet[None, :, 1])  # [E,G]
    nearest = d.min(axis=0)                                       # per gt
    matched = nearest < tol
    spurious = d.min(axis=1) >= tol
    return {
        "n_gt": int(len(gt_feet)),
        "n_est": int(len(est_landmarks)),
        "n_matched": int(matched.sum()),
        "mean_err": float(nearest[matched].mean()) if matched.any()
        else float("nan"),
        "n_spurious": int(spurious.sum()),
    }


def map_accuracy_lines(est_landmarks: np.ndarray, world: World,
                       tol: float = 0.5, margin: float = 3.0) -> dict:
    """Frame-agnostic map accuracy: match estimated landmarks to WALL
    LINES instead of to world-origin feet.

    The reference's landmark is the perpendicular foot from the FILTER
    frame's origin (RANSAC.m:220) — a frame-dependent point on the
    wall's infinite line.  A submap pipeline maps each region in its own
    local frame, so its composed landmarks lie on the right lines but
    not at the world-origin feet; this metric scores what is actually
    frame-invariant: estimated landmarks must lie ON a wall's line
    (within ``tol`` perpendicular) near the physical segment (within
    ``margin`` beyond its endpoints along the line).  Returns
    {n_walls, n_covered (segments with >=1 matching estimate), n_est,
    n_spurious (estimates near no wall), mean_err (perpendicular)}."""
    segs = np.asarray(world.segments, np.float64)
    if len(est_landmarks) == 0:
        return {"n_walls": int(len(segs)), "n_covered": 0, "n_est": 0,
                "n_spurious": 0, "mean_err": float("nan")}
    p = np.asarray(est_landmarks, np.float64)
    a, b = segs[:, :2], segs[:, 2:]
    e = b - a
    L = np.maximum(np.hypot(e[:, 0], e[:, 1]), 1e-9)
    u = e / L[:, None]
    rel = p[:, None, :] - a[None, :, :]                     # [E,S,2]
    t = np.einsum("esk,sk->es", rel, u)                     # along-line
    perp = np.abs(rel[..., 0] * u[None, :, 1]
                  - rel[..., 1] * u[None, :, 0])            # [E,S]
    near = (perp < tol) & (t > -margin) & (t < L[None, :] + margin)
    covered = near.any(axis=0)
    spurious = ~near.any(axis=1)
    perr = np.where(near, perp, np.inf).min(axis=1)
    ok = np.isfinite(perr)
    return {
        "n_walls": int(len(segs)),
        "n_covered": int(covered.sum()),
        "n_est": int(len(p)),
        "n_spurious": int(spurious.sum()),
        "mean_err": float(perr[ok].mean()) if ok.any() else float("nan"),
    }


def serpentine_waypoints(nx: int, ny: int, room: float = 8.0,
                         base_angle_deg: float = 45.0) -> np.ndarray:
    """Coverage route for ``floorplan_world``: room centers in serpentine
    order with the shared-door midpoint inserted between consecutive
    rooms (so the path always crosses walls at their doorways), rotated
    by the world's base angle.  Returns waypoints [N,2]."""
    W, H = nx * room, ny * room
    x0, y0 = -W / 2.0, -H / 2.0
    centers = []
    for j in range(ny):
        cols = range(nx) if j % 2 == 0 else range(nx - 1, -1, -1)
        for i in cols:
            centers.append((x0 + (i + 0.5) * room, y0 + (j + 0.5) * room))
    pts = [centers[0]]
    for a, b in zip(centers[:-1], centers[1:]):
        pts.append(((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0))  # door
        pts.append(b)
    pts = np.asarray(pts, np.float64)
    rad = np.deg2rad(base_angle_deg)
    Rb = np.array([[np.cos(rad), -np.sin(rad)],
                   [np.sin(rad), np.cos(rad)]])
    return pts @ Rb.T


def waypoint_controls(waypoints: np.ndarray, step: float = 0.25,
                      max_turn_deg: float = 9.0, tol: float = 0.8,
                      max_ticks: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Pure-pursuit control rows (dD, dTheta) [T,2] driving the unicycle
    (``unicycle_step`` kinematics, degrees) through ``waypoints``.

    Matches the truth model exactly, so simulate() reproduces the route;
    ``max_ticks`` pads/truncates to a fixed T (padded ticks are
    stand-still).  Also returns the start pose [3]."""
    wp = np.asarray(waypoints, np.float64)
    d0 = wp[1] - wp[0]
    pose = np.array([wp[0][0], wp[0][1],
                     np.rad2deg(np.arctan2(d0[1], d0[0]))])
    start = pose.copy()
    controls = []
    k = 1
    while k < len(wp):
        if max_ticks is not None and len(controls) >= max_ticks:
            break
        tgt = wp[k]
        dx, dy = tgt[0] - pose[0], tgt[1] - pose[1]
        dist = np.hypot(dx, dy)
        if dist < tol:
            k += 1
            continue
        want = np.rad2deg(np.arctan2(dy, dx))
        diff = (want - pose[2] + 180.0) % 360.0 - 180.0
        dTh = float(np.clip(diff, -max_turn_deg, max_turn_deg))
        # slow through sharp turns so the arc stays near the door line
        dD = float(min(step, dist) * (0.35 if abs(diff) > 25 else 1.0))
        controls.append((dD, dTh))
        th = pose[2] + dTh
        pose[0] += dD * np.cos(np.deg2rad(th))
        pose[1] += dD * np.sin(np.deg2rad(th))
        pose[2] = (th + 360.0) % 360.0
    if max_ticks is not None and len(controls) < max_ticks:
        controls += [(0.0, 0.0)] * (max_ticks - len(controls))
    return np.asarray(controls, np.float64), start


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


def align_se2(est_xy: np.ndarray, truth_xy: np.ndarray):
    """Best rigid SE(2) transform (R, t) aligning est→truth (Umeyama
    without scale) — the standard trajectory-evaluation alignment: a
    SLAM estimate is defined up to a global gauge, and the filter's
    anchored frame accumulates gauge drift that raw ATE charges twice
    (once in the poses, once in every landmark mapped afterwards).
    Returns (R [2,2], t [2]); apply as ``p @ R.T + t``."""
    a = np.asarray(est_xy, np.float64)
    b = np.asarray(truth_xy, np.float64)
    ca, cb = a.mean(0), b.mean(0)
    H = (a - ca).T @ (b - cb)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    R = Vt.T @ np.diag([1.0, d]) @ U.T
    return R, cb - R @ ca


def ate_rmse(est_xy: jnp.ndarray, truth_xy: jnp.ndarray) -> jnp.ndarray:
    """Absolute trajectory error (RMSE over positions) — the parity metric
    from BASELINE.json (the reference publishes none, SURVEY.md §6)."""
    err = est_xy - truth_xy
    return jnp.sqrt(jnp.mean(jnp.sum(err * err, axis=-1)))

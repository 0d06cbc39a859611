"""Occupancy-grid mapping (the reference's dead setOccupancy path, done)."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.ops import occupancy as occ
from ekf_slam_tpu.ops.scan import scan_from_ranges
from ekf_slam_tpu.sim import world as W
from ekf_slam_tpu.config import SimConfig


def test_single_scan_marks_walls_and_free_space():
    grid = occ.init_grid(100, 80, 0.1, origin=(-5.0, -4.0),
                         dtype=jnp.float64)
    room = W.rectangle_room(4.0, 3.0)
    angles = jnp.linspace(0.0, 360.0, 720, endpoint=False)
    pose = jnp.array([0.0, 0.0, 0.0])
    ranges = W.raycast(room, pose, angles, 12.0)
    scan = scan_from_ranges(ranges, angles)
    grid = occ.update_grid(grid, scan, pose)
    p = np.asarray(occ.occupancy_probability(grid))

    def cell(x, y):
        return p[int((y + 4.0) / 0.1), int((x + 5.0) / 0.1)]

    # wall cells hot, interior cells cold, robot cell cold
    assert cell(4.0, 0.0) > 0.8 or cell(3.95, 0.0) > 0.8
    assert cell(0.0, 3.0) > 0.8 or cell(0.0, 2.95) > 0.8
    assert cell(0.0, 0.0) < 0.3
    assert cell(2.0, 1.0) < 0.3
    # outside the room: untouched (p = 0.5)
    assert abs(cell(4.8, 3.8) - 0.5) < 1e-6


def test_map_session_full_trajectory():
    cfg = SimConfig(n_beams=360, max_range=12.0, range_noise_std=0.0,
                    odom_xy_noise_std=0.0, odom_theta_noise_std=0.0)
    room = W.rectangle_room(4.0, 3.0)
    traj = W.simulate(room, W.circle_controls(60, 0.05, 6.0), cfg,
                      jax.random.PRNGKey(0))
    grid = occ.init_grid(100, 80, 0.1, origin=(-5.0, -4.0),
                         dtype=jnp.float64)
    grid = occ.map_session(grid, traj.truth, traj.ranges,
                           traj.beam_angles)
    p = np.asarray(occ.occupancy_probability(grid))
    # walls saturate occupied after repeated scans; interior saturates free
    assert (p > 0.9).sum() > 50          # plenty of confident wall cells
    interior = p[30:50, 35:65]           # central region
    assert (interior < 0.1).mean() > 0.9


def test_grid_jit_and_clamp():
    grid = occ.init_grid(64, 64, 0.25, origin=(-8.0, -8.0))
    angles = jnp.linspace(0.0, 360.0, 90, endpoint=False)
    ranges = jnp.full((90,), 2.0)
    scan = scan_from_ranges(ranges, angles)
    f = jax.jit(lambda g: occ.update_grid(g, scan,
                                          jnp.array([0.0, 0.0, 0.0])))
    g = grid
    for _ in range(20):
        g = f(g)
    lo = np.asarray(g.logodds)
    assert lo.max() <= 10.0 and lo.min() >= -10.0

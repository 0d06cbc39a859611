"""Simulator + end-to-end session tests (SURVEY.md §4.1/4.3): trajectory-level
integration on the hermetic fake backend replacing ROS, with ATE bounds and
an oracle-parity run on the identical observation stream."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams, RansacParams, SimConfig
from ekf_slam_tpu.models import ekf
from ekf_slam_tpu.oracle.np_ekf import NumpyEKFSLAM
from ekf_slam_tpu.session import SlamSession
from ekf_slam_tpu.sim import world as W


def make_traj(T=120, n_beams=720, noisy=True, seed=0):
    cfg = SimConfig(
        n_beams=n_beams, max_range=12.0,
        range_noise_std=0.01 if noisy else 0.0,
        odom_xy_noise_std=0.0005 if noisy else 0.0,
        odom_theta_noise_std=0.02 if noisy else 0.0)
    room = W.rectangle_room(4.0, 3.0)
    controls = W.circle_controls(T, dD=0.05, dTh=3.0)
    # start at the origin so the SLAM frame (anchored at the filter's
    # initial pose, EKF_SLAM.m:28) coincides with the world frame.
    return W.simulate(room, controls, cfg, jax.random.PRNGKey(seed),
                      start_pose=(0.0, 0.0, 0.0)), cfg


SIM_RANSAC = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                          wall_search_timeout=4, table_capacity=32,
                          promote_count=5, ref_compat=False,
                          dtype=jnp.float64)


def test_raycast_geometry():
    room = W.rectangle_room(4.0, 3.0)
    pose = jnp.array([0.0, 0.0, 0.0])
    angles = jnp.array([0.0, 90.0, 180.0, 270.0])
    r = W.raycast(room, pose, angles, 20.0)
    np.testing.assert_allclose(np.asarray(r), [4.0, 3.0, 4.0, 3.0],
                               atol=1e-9)
    # max_range cut
    r2 = W.raycast(room, pose, angles, 3.5)
    assert np.isnan(float(r2[0])) and float(r2[1]) == 3.0


def test_raycast_from_offset_heading():
    room = W.rectangle_room(4.0, 3.0)
    pose = jnp.array([2.0, 1.0, 90.0])
    r = W.raycast(room, pose, jnp.array([0.0]), 20.0)
    np.testing.assert_allclose(float(r[0]), 2.0, atol=1e-9)  # up to y=3


def test_simulate_dead_reckoning_consistency():
    traj, _ = make_traj(T=50, noisy=False)
    # noise-free: odom == truth
    np.testing.assert_allclose(np.asarray(traj.odom),
                               np.asarray(traj.truth), atol=1e-9)


def test_session_e2e_ate_bounded():
    """Config-2 analog (BASELINE.json): sim sequence + RANSAC extraction +
    EKF_SLAM_UC; estimated trajectory must track truth."""
    traj, _ = make_traj(T=150)
    # ref_compat=False: the reference's unwrapped bearing innovation
    # (EKF_SLAM_UC.m:145) throws the pose ~18 m the first time a bearing
    # crosses the 0/360 seam — reproduced faithfully in ref-compat mode
    # (see test_session_matches_oracle_on_same_obs_stream), but the
    # accuracy-bounded run uses the corrected math.
    sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    est = np.asarray(outs.pose)
    truth = np.asarray(traj.truth)
    assert int(carry.filt.n_active) >= 1       # landmarks were mapped
    assert int(outs.n_obs.sum()) > 10          # and observed repeatedly
    ate = float(W.ate_rmse(jnp.asarray(est[:, :2]),
                           jnp.asarray(truth[:, :2])))
    # odometry drift alone for comparison:
    ate_odo = float(W.ate_rmse(traj.odom[:, :2], traj.truth[:, :2]))
    assert ate < 0.5, (ate, ate_odo)


def test_session_matches_oracle_on_same_obs_stream():
    """Bit-parity run (north star, BASELINE.json): replay the jitted run's
    exact per-tick controls + observation batches through the dense NumPy
    oracle filter; the joint estimates must agree to fp round-off at f64."""
    traj, _ = make_traj(T=80)
    ep = EKFParams(capacity=16, max_obs=8, dtype=jnp.float64)
    sess = SlamSession(algorithm="EKF_SLAM_UC", ekf_params=ep,
                       ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)

    oracle = NumpyEKFSLAM(rc=ep.rc, s_cost=ep.s_cost, s_thresh=ep.s_thresh)
    T = traj.odom.shape[0]
    u_all = np.asarray(outs.u)
    valid = np.asarray(outs.obs.valid)
    rows_all = np.stack([np.asarray(outs.obs.rng),
                         np.asarray(outs.obs.bearing),
                         np.asarray(outs.obs.index).astype(float)], axis=-1)
    locs_all = np.asarray(outs.obs.loc)
    for t in range(T):
        oracle.predict(u_all[t])
        m = valid[t]
        if m.any():
            rows = rows_all[t][m]
            locs = {int(r[2]): locs_all[t][m][i]
                    for i, r in enumerate(rows)}
            oracle.measure(rows, u_all[t], locs)

    d = 3 + 2 * oracle.n_landmarks
    assert int(carry.filt.n_active) == oracle.n_landmarks
    np.testing.assert_allclose(np.asarray(carry.filt.x[:d]), oracle.x,
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(carry.filt.P[:d, :d]), oracle.P,
                               rtol=1e-5, atol=1e-8)


def test_step_vs_run_equivalence():
    """Per-tick step() and fused run() must produce identical results."""
    traj, _ = make_traj(T=30)
    ep = EKFParams(capacity=16, max_obs=8, dtype=jnp.float64)
    s1 = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=3)
    s2 = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=3)
    carry = s1.init_carry(first_odom=traj.odom[0])
    for t in range(30):
        carry, _ = s1.step(carry, traj.odom[t], traj.ranges[t],
                           traj.beam_angles)
    carry2, _ = s2.run(traj.odom, traj.ranges, traj.beam_angles)
    np.testing.assert_allclose(np.asarray(carry.filt.x),
                               np.asarray(carry2.filt.x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(carry.filt.P),
                               np.asarray(carry2.filt.P), atol=1e-12)
    assert int(carry.filt.n_active) == int(carry2.filt.n_active)


def test_known_correspondence_session():
    """EKF_SLAM (known-correspondence) path also runs end-to-end."""
    traj, _ = make_traj(T=60)
    sess = SlamSession(
        algorithm="EKF_SLAM",
        ekf_params=EKFParams(capacity=16, max_obs=8, rc=(0.01, 5.0),
                             association="known", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=2)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    assert np.all(np.isfinite(np.asarray(carry.filt.x)))
    assert int(carry.filt.n_active) >= 1


def test_session_batched_mode_ate_bounded():
    """The joint batched-innovation update must track truth as well as the
    sequential chain at session level (fast path, models/batched.py)."""
    traj, _ = make_traj(T=150)
    sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    assert int(carry.filt.n_active) >= 1
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    assert ate < 0.5, ate
    P = np.asarray(carry.filt.P)
    assert np.all(np.isfinite(P))


def test_session_ml_gate_end_to_end():
    """Full Mahalanobis gating (the math the reference builds but discards,
    Correspondence.m:69-75) driving association e2e: landmarks associate by
    position, not signature."""
    traj, _ = make_traj(T=150)
    sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             association="ml", s_cost=1e9, s_thresh=30.0,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    n = int(carry.filt.n_active)
    assert 1 <= n <= 8          # walls of one room — no landmark explosion
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    # pure-position gating with sparse landmarks is inherently looser than
    # signature association (this is exactly why the reference's author
    # shipped the signature-only gate): bounded, not sub-half-meter.
    assert ate < 1.5, ate
    assert np.all(np.isfinite(np.asarray(carry.filt.P)))


def test_filter_consistency_nis():
    """Innovation consistency: with correct math + Joseph form, the
    position-innovation NIS should be chi-square(2)-ish — mean within a
    loose band, not exploding (the filter is neither overconfident by
    orders of magnitude nor divergent)."""
    from ekf_slam_tpu.ops.association import gate_costs
    traj, _ = make_traj(T=120)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False, joseph=True,
                   association="ml", s_cost=1e9, s_thresh=30.0,
                   dtype=jnp.float64)
    sess = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=1)
    carry = sess.init_carry(first_odom=traj.odom[0])
    nis_vals = []
    for t in range(120):
        prev = carry
        carry, out = sess.step(carry, traj.odom[t], traj.ranges[t],
                               traj.beam_angles)
        v = np.asarray(out.obs.valid)
        if not v.any() or int(prev.filt.n_active) == 0:
            continue
        for m in np.where(v)[0]:
            z = np.array([float(out.obs.rng[m]), float(out.obs.bearing[m]),
                          float(out.obs.index[m])])
            R = np.diag([z[0] * ep.rc[0], z[1] * ep.rc[1]])
            pos_cost, _ = gate_costs(prev.filt, jnp.asarray(z),
                                     jnp.asarray(R), ep)
            active = np.asarray(prev.filt.active)
            if active.any():
                c = float(np.min(np.asarray(pos_cost)[active]))
                if c < 1e4:
                    nis_vals.append(c)
    nis_vals = np.asarray(nis_vals)
    assert len(nis_vals) > 20
    # chi2(2) mean is 2; allow a generous band (model mismatch: the
    # reference's value-scaled R is not the simulator's true noise)
    assert 0.01 < nis_vals.mean() < 50.0, nis_vals.mean()


def test_long_run_f32_stability():
    """Production dtype: 1000 fused ticks at f32 with Joseph-form updates —
    covariance must stay finite, near-symmetric, and positive on the
    diagonal (the (I−KH)P form famously drifts; SURVEY.md §5)."""
    traj, _ = make_traj(T=1000)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False, joseph=True,
                   update_mode="batched", dtype=jnp.float32)
    rp = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                      wall_search_timeout=4, table_capacity=32,
                      promote_count=5, ref_compat=False, dtype=jnp.float32)
    sess = SlamSession(ekf_params=ep, ransac_params=rp, seed=1)
    carry, outs = sess.run(jnp.asarray(traj.odom, jnp.float32),
                           jnp.asarray(traj.ranges, jnp.float32),
                           jnp.asarray(traj.beam_angles, jnp.float32))
    from ekf_slam_tpu.utils.metrics import filter_health
    h = filter_health(carry.filt)
    assert bool(h.finite)
    assert float(h.min_diag) > -1e-4
    assert float(h.asym) < 1e-2
    ate = float(W.ate_rmse(outs.pose[:, :2].astype(jnp.float64),
                           traj.truth[:, :2]))
    assert ate < 1.0, ate


def test_obstacle_world_batched_ml():
    """Richer world (room + box obstacles => many wall lines), batched ML
    association: the full config-3 shape (fixed-capacity masked state +
    batched association + loop trajectory)."""
    cfg = SimConfig(n_beams=1024, max_range=12.0, range_noise_std=0.01,
                    odom_xy_noise_std=0.0005, odom_theta_noise_std=0.02)
    world = W.world_with_obstacles(
        4.0, 3.0, boxes=((2.0, 1.5, 0.5), (-2.0, -1.5, 0.6)))
    controls = W.circle_controls(200, dD=0.04, dTh=2.0)
    traj = W.simulate(world, controls, cfg, jax.random.PRNGKey(4))
    rp = RansacParams(line_consensus=40, bearing_window_deg=12.0,
                      wall_search_timeout=6, table_capacity=64,
                      promote_count=4, ref_compat=False,
                      n_hypotheses=64, dtype=jnp.float64)
    sess = SlamSession(
        ekf_params=EKFParams(capacity=32, max_obs=8, ref_compat=False,
                             update_mode="batched", association="ml",
                             s_cost=1e9, s_thresh=30.0, joseph=True,
                             dtype=jnp.float64),
        ransac_params=rp, seed=2)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    assert int(carry.filt.n_active) >= 2
    assert np.all(np.isfinite(np.asarray(carry.filt.P)))
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    ate_odo = float(W.ate_rmse(traj.odom[:, :2], traj.truth[:, :2]))
    assert ate < max(1.5, 3 * ate_odo), (ate, ate_odo)

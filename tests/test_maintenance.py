"""Map lifecycle: eviction keeps the survivors' joint Gaussian exactly
(marginalization = row/col deletion), compaction preserves invariants,
duplicate/uncertainty policies pick the right victims."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import maintenance as M

from test_ekf_core import make_pair

PARAMS = EKFParams(capacity=8, max_obs=4, ref_compat=False,
                   dtype=jnp.float64)


def test_evict_middle_landmark_marginalizes_exactly():
    state, _ = make_pair(5, seed=31)
    P0 = np.asarray(state.P)
    x0 = np.asarray(state.x)

    drop = jnp.zeros(8, bool).at[2].set(True)
    out = M.evict_landmarks(state, drop, PARAMS)
    assert int(out.n_active) == 4
    # survivors in order 0,1,3,4 — their joint (pose+landmark) covariance
    # is the original with slot 2's rows/cols deleted
    old_rows = [0, 1, 2, 3, 4, 5, 6, 9, 10, 11, 12]
    d = len(old_rows)
    np.testing.assert_array_equal(np.asarray(out.x)[:d], x0[old_rows])
    np.testing.assert_array_equal(
        np.asarray(out.P)[:d, :d], P0[np.ix_(old_rows, old_rows)])
    # tail cleared, mask compacted
    assert np.all(np.asarray(out.x)[d:] == 0)
    assert np.all(np.asarray(out.P)[d:, :] == 0)
    act = np.asarray(out.active)
    assert act[:4].all() and not act[4:].any()
    np.testing.assert_array_equal(np.asarray(out.sig)[:4],
                                  np.asarray(state.sig)[[0, 1, 3, 4]])


def test_evict_is_jittable_and_gate_still_works():
    from ekf_slam_tpu.ops.association import gate_batch
    from test_batched import measurement_of
    state, _ = make_pair(5, seed=7)
    f = jax.jit(lambda s, d: M.evict_landmarks(s, d, PARAMS))
    out = f(state, jnp.zeros(8, bool).at[0].set(True))
    assert int(out.n_active) == 4
    # a measurement of the (shifted) landmark associates with its new slot
    rng = np.random.default_rng(0)
    z = measurement_of(out, 1, noise=0.0, rng=rng)   # old slot 2 → new 1
    R = jnp.asarray(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    p = EKFParams(capacity=8, association="ml", s_cost=1e6, s_thresh=1e12,
                  ref_compat=False, dtype=jnp.float64)
    is_new, slots = gate_batch(out, jnp.asarray(z)[None], R[None], p)
    assert not bool(is_new[0])
    assert int(slots[0]) == 1


def test_duplicate_mask_drops_the_noisier_twin():
    state, _ = make_pair(4, seed=11)
    # make slot 3 a near-duplicate of slot 1 with inflated covariance
    lm1 = state.x[3 + 2:3 + 4]
    x = state.x.at[3 + 6:3 + 8].set(lm1 + 0.05)
    r = 3 + 6
    P = state.P.at[r, r].set(5.0).at[r + 1, r + 1].set(5.0)
    state = state._replace(x=x, P=P)
    drop = M.duplicate_mask(state, radius=0.2)
    got = np.asarray(drop)
    assert got[3] and not got[1] and not got[0] and not got[2]


def test_session_with_maintenance_tracks_and_bounds_map():
    """Session-integrated maintenance: duplicates merged + stale pruned
    every tick; trajectory quality preserved and the map stays bounded."""
    from ekf_slam_tpu.session import SlamSession
    from ekf_slam_tpu.sim import world as W
    from test_sim_session import SIM_RANSAC, make_traj

    traj, _ = make_traj(T=80)
    base = dict(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1)
    plain = SlamSession(**base)
    c0, o0 = plain.run(traj.odom, traj.ranges, traj.beam_angles)

    kept = SlamSession(maintain_merge_radius=0.4, maintain_max_trace=25.0,
                       **base)
    c1, o1 = kept.run(traj.odom, traj.ranges, traj.beam_angles)
    assert int(c1.filt.n_active) <= int(c0.filt.n_active)
    ate = float(W.ate_rmse(o1.pose[:, :2], traj.truth[:, :2]))
    assert ate < 0.5, ate
    assert np.all(np.isfinite(np.asarray(c1.filt.P)))
    # invariants: active slots are exactly the leading n_active
    act = np.asarray(c1.filt.active)
    n = int(c1.filt.n_active)
    assert act[:n].all() and not act[n:].any()


def test_factored_evict_matches_dense():
    """Round 4: maintenance on a square-root state — eviction permutes
    the factor's ROWS (a P submatrix is the Gram of S's row subset) and
    recompresses; the result must equal the dense eviction exactly, with
    a clean triangular factor and zeroed freed columns."""
    from ekf_slam_tpu.models import srekf
    state, _ = make_pair(5, seed=31)
    drop = jnp.zeros(8, bool).at[2].set(True)
    dense = M.evict_landmarks(state, drop, PARAMS)

    sr = srekf.factor_from_state(state)
    out = M.evict_landmarks_factored(sr, drop, PARAMS)
    assert int(out.n_active) == 4
    S = np.asarray(out.P)
    assert np.allclose(S, np.tril(S))                 # triangular again
    d = 3 + 2 * 4
    np.testing.assert_allclose((S @ S.T)[:d, :d],
                               np.asarray(dense.P)[:d, :d],
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(dense.x),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_array_equal(np.asarray(out.sig),
                                  np.asarray(dense.sig))
    assert np.all(S[d:, :] == 0) and np.all(S[:, d:] == 0)


def test_session_maintenance_on_srekf_fast():
    """A square-root session with maintenance enabled: capacity stays
    bounded, factor invariants hold, the run is finite."""
    from ekf_slam_tpu.session import SlamSession
    from test_sim_session import SIM_RANSAC, make_traj

    traj, _ = make_traj(T=40)
    sess = SlamSession(
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="srekf_fast", sr_noise_buffer=8,
                             dtype=jnp.float64),
        ransac_params=SIM_RANSAC, seed=1, maintain_max_trace=25.0)
    carry, outs = sess.run(traj.odom, traj.ranges, traj.beam_angles)
    n = int(carry.filt.n_active)
    assert n >= 1
    act = np.asarray(carry.filt.active)
    assert act[:n].all() and not act[n:].any()
    S = np.asarray(carry.filt.P)
    assert np.all(np.isfinite(S))
    P = S @ S.T
    d = 3 + 2 * n
    assert np.all(np.diag(P)[:d] > 0)


def test_evict_nothing_is_identity():
    state, _ = make_pair(4, seed=3)
    out = M.evict_landmarks(state, jnp.zeros(8, bool), PARAMS)
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(state.x))
    np.testing.assert_array_equal(np.asarray(out.P), np.asarray(state.P))
    assert int(out.n_active) == 4


def test_prune_by_uncertainty_and_maintain():
    state, _ = make_pair(4, seed=13)
    r = 3 + 4                      # slot 2
    P = state.P.at[r, r].set(50.0).at[r + 1, r + 1].set(50.0)
    state = state._replace(P=P)
    drop = M.prune_by_uncertainty(state, max_trace=10.0)
    assert np.asarray(drop)[2] and np.asarray(drop).sum() == 1

    out, n = M.maintain(state, PARAMS, max_trace=10.0)
    assert int(n) == 1 and int(out.n_active) == 3
    assert np.all(np.isfinite(np.asarray(out.P)))

"""Square-root filter vs the dense paths: exact-arithmetic parity at f64,
PSD-by-construction under f32 stress (SURVEY.md §7 hard part (e))."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched, ekf, srekf
from ekf_slam_tpu.ops.observations import obs_from_rows
from ekf_slam_tpu.state import init_state

from test_batched import measurement_of
from test_ekf_core import dense_of, make_pair

PARAMS = EKFParams(capacity=8, max_obs=4, ref_compat=False,
                   dtype=jnp.float64)


def assert_factor_matches(sr_state, dense_state, rtol=1e-8, atol=1e-10):
    P_sr = np.asarray(sr_state.P @ sr_state.P.T)
    np.testing.assert_allclose(P_sr, np.asarray(dense_state.P),
                               rtol=rtol, atol=atol)
    np.testing.assert_allclose(np.asarray(sr_state.x),
                               np.asarray(dense_state.x),
                               rtol=rtol, atol=atol)


def test_factor_round_trip():
    state, _ = make_pair(3, seed=1)
    sr = srekf.factor_from_state(state)
    L = np.asarray(sr.P)
    assert np.allclose(L, np.tril(L))          # lower triangular
    d = 3 + 2 * int(state.n_active)
    assert np.all(L[d:, :] == 0)               # inactive rows exactly zero
    back = srekf.state_to_dense(sr)
    np.testing.assert_allclose(np.asarray(back.P), np.asarray(state.P),
                               rtol=1e-9, atol=1e-12)


def test_sr_predict_matches_dense():
    state, _ = make_pair(3, seed=2)
    u = jnp.array([0.15, 7.0])
    dense = ekf.predict(state, u, PARAMS)
    sr = srekf.sr_predict(srekf.factor_from_state(state), u, PARAMS)
    assert_factor_matches(sr, dense)
    # factor stays triangular with zero inactive rows
    L = np.asarray(sr.P)
    assert np.allclose(L @ L.T, (L @ L.T).T)
    d = 3 + 2 * int(sr.n_active)
    assert np.all(L[d:, :] == 0)


def test_sr_append_matches_dense():
    state, _ = make_pair(2, seed=3)
    u = jnp.array([0.1, 3.0])
    R = jnp.asarray(np.diag([0.02, 0.5]))
    loc = jnp.array([1.5, -0.7])
    dense = ekf.append(state, u, R, loc, 3.0, PARAMS)
    sr = srekf.sr_append(srekf.factor_from_state(state), u, R, loc, 3.0,
                         PARAMS)
    assert int(sr.n_active) == int(dense.n_active) == 3
    assert_factor_matches(sr, dense)
    L = np.asarray(sr.P)
    assert np.allclose(L, np.tril(L))          # append kept triangularity


def test_sr_append_capacity_noop():
    state, _ = make_pair(8, seed=3)            # full
    sr = srekf.factor_from_state(state)
    out = srekf.sr_append(sr, jnp.array([0.1, 3.0]),
                          jnp.asarray(np.diag([0.02, 0.5])),
                          jnp.array([1.0, 1.0]), 9.0, PARAMS)
    assert int(out.n_active) == 8
    np.testing.assert_array_equal(np.asarray(out.P), np.asarray(sr.P))


def test_sr_update_batch_matches_dense():
    state, _ = make_pair(4, seed=5)
    rng = np.random.default_rng(7)
    zs, Rs = [], []
    for slot in range(3):
        z = measurement_of(state, slot, noise=0.02, rng=rng)
        zs.append(z)
        Rs.append(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    zs_j = jnp.asarray(np.stack(zs))
    Rs_j = jnp.asarray(np.stack(Rs))
    slots = jnp.asarray([0, 1, 2])
    valid = jnp.ones((3,), bool)
    dense = batched.update_batch(state, zs_j, slots, Rs_j, valid, PARAMS)
    sr = srekf.sr_update_batch(srekf.factor_from_state(state), zs_j, slots,
                               Rs_j, valid, PARAMS)
    assert_factor_matches(sr, dense, rtol=1e-7, atol=1e-9)


def test_sr_update_masked_rows_are_noops():
    state, _ = make_pair(3, seed=6)
    z = measurement_of(state, 1)
    z[0] += 0.04
    R = np.diag([z[0] * 0.1, z[1] * 5.0])
    zpad = np.array([3.3, 77.0, 2.0])
    Rpad = np.diag([1.0, 1.0])
    sr0 = srekf.factor_from_state(state)
    only = srekf.sr_update_batch(
        sr0, jnp.asarray(z)[None], jnp.asarray([1]), jnp.asarray(R)[None],
        jnp.ones((1,), bool), PARAMS)
    padded = srekf.sr_update_batch(
        sr0, jnp.asarray(np.stack([z, zpad])), jnp.asarray([1, 0]),
        jnp.asarray(np.stack([R, Rpad])), jnp.asarray([True, False]), PARAMS)
    np.testing.assert_allclose(np.asarray(padded.x), np.asarray(only.x),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(padded.P @ padded.P.T), np.asarray(only.P @ only.P.T),
        rtol=1e-8, atol=1e-11)


def test_sr_strips_match_dense():
    from ekf_slam_tpu.ops.association import _lm_diag_blocks
    state, _ = make_pair(5, seed=9)
    sr = srekf.factor_from_state(state)
    Prr, Prl, Pll = srekf.sr_strips(sr.P, state.capacity)
    P = np.asarray(state.P)
    K = state.capacity
    end = 3 + 2 * K
    np.testing.assert_allclose(np.asarray(Prr), P[:3, :3], atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(Prl),
        P[:3, 3:end].reshape(3, K, 2).transpose(1, 0, 2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Pll),
                               np.asarray(_lm_diag_blocks(state.P, K)),
                               atol=1e-10)


def test_sr_measure_batched_matches_dense():
    """Full tick (gate + joint update + appends) equal to the dense batched
    path at f64 — gating via factor strips included."""
    state, _ = make_pair(3, seed=11)
    u = jnp.array([0.05, 2.0])
    rng = np.random.default_rng(3)
    z0 = measurement_of(state, 0, noise=0.01, rng=rng)
    z2 = measurement_of(state, 2, noise=0.01, rng=rng)
    rows = [z0.tolist(), z2.tolist(), [1.5, 100.0, 9.0]]   # 2 updates + 1 new
    locs = [[0.0, 0.0], [0.0, 0.0], [-0.3, 1.5]]
    obs = obs_from_rows(rows, locs, PARAMS.max_obs, jnp.float64)
    dense = batched.measure_batched(state, obs, u, PARAMS)
    sr = srekf.sr_measure_batched(srekf.factor_from_state(state), obs, u,
                                  PARAMS)
    assert int(sr.n_active) == int(dense.n_active) == 4
    assert_factor_matches(sr, dense, rtol=1e-7, atol=1e-9)


def test_session_srekf_mode_matches_batched():
    """update_mode='srekf' end-to-end: same trajectory estimate as the
    dense batched path at f64 (identical math, factored storage), factor
    triangular and PSD at the end."""
    from ekf_slam_tpu.session import SlamSession
    from test_sim_session import SIM_RANSAC, make_traj

    traj, _ = make_traj(T=60)
    common = dict(capacity=16, max_obs=8, ref_compat=False,
                  dtype=jnp.float64)
    sr_sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(update_mode="srekf", **common),
        ransac_params=SIM_RANSAC, seed=1)
    dn_sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(update_mode="batched", **common),
        ransac_params=SIM_RANSAC, seed=1)
    sr_carry, sr_outs = sr_sess.run(traj.odom, traj.ranges,
                                    traj.beam_angles)
    dn_carry, dn_outs = dn_sess.run(traj.odom, traj.ranges,
                                    traj.beam_angles)
    assert int(sr_carry.filt.n_active) == int(dn_carry.filt.n_active) >= 1
    np.testing.assert_allclose(np.asarray(sr_outs.pose),
                               np.asarray(dn_outs.pose),
                               rtol=1e-6, atol=1e-7)
    L = np.asarray(sr_carry.filt.P)
    assert np.allclose(L, np.tril(L))
    assert_factor_matches(sr_carry.filt, dn_carry.filt,
                          rtol=1e-5, atol=1e-7)


def test_sr_stays_psd_under_f32_stress():
    """Aggressive tiny-R updates at f32: the factored covariance is PSD by
    construction (P = L·Lᵀ); the dense plain form drifts.  This is the
    conditioning story the square-root mode exists for."""
    p32 = EKFParams(capacity=8, max_obs=4, ref_compat=False,
                    dtype=jnp.float32)
    state, _ = make_pair(4, seed=13)
    state = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        state)
    sr = srekf.factor_from_state(state)
    rng = np.random.default_rng(1)

    @jax.jit
    def tick(s):
        zs, Rs, slots = [], [], []
        for slot in range(4):
            z = measurement_of(state, slot)
            zs.append(z)
            Rs.append(np.diag([1e-6, 1e-6]))   # brutally overconfident R
            slots.append(slot)
        return srekf.sr_update_batch(
            s, jnp.asarray(np.stack(zs), jnp.float32),
            jnp.asarray(slots), jnp.asarray(np.stack(Rs), jnp.float32),
            jnp.ones((4,), bool), p32)

    for _ in range(30):
        sr = tick(sr)
        sr = srekf.sr_predict(sr, jnp.array([0.01, 0.5], jnp.float32), p32)
    L = np.asarray(sr.P, np.float64)
    P = L @ L.T
    assert np.all(np.isfinite(P))
    evals = np.linalg.eigvalsh(P)
    assert evals.min() >= 0.0                  # PSD exactly, by construction

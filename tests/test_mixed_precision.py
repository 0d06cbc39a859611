"""bf16 covariance storage (params.cov_dtype): compute stays f32, storage
halves HBM bytes.  Accuracy vs the f32 path and dtype stability under jit."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched
from ekf_slam_tpu.ops.association import gate_batch
from ekf_slam_tpu.state import FilterState, init_state

K = 32


def full_state(cov_dtype, seed=0):
    params = EKFParams(capacity=K, dtype=jnp.float32, cov_dtype=cov_dtype)
    rng = np.random.default_rng(seed)
    st = init_state(params)
    D = st.dim
    lm = rng.uniform(-10, 10, (K, 2))
    x = np.zeros(D, np.float32)
    x[3:3 + 2 * K] = lm.reshape(-1).astype(np.float32)
    A = rng.normal(0, 1, (D, 8)).astype(np.float32) / np.sqrt(D)
    P = (0.05 * np.eye(D, dtype=np.float32) + 0.02 * (A @ A.T))
    return params, FilterState(
        x=jnp.asarray(x),
        P=jnp.asarray(P, params.cov_dt),
        sig=jnp.arange(1, K + 1, dtype=jnp.float32),
        active=jnp.ones((K,), bool),
        n_active=jnp.asarray(K, jnp.int32),
    )


def measurements(st, n, seed=1):
    rng = np.random.default_rng(seed)
    x = np.asarray(st.x, np.float64)
    idx = rng.integers(0, K, n)
    lm = x[3:3 + 2 * K].reshape(K, 2)[idx]
    d = lm - x[:2]
    r = np.hypot(d[:, 0], d[:, 1]) + rng.normal(0, 0.01, n)
    b = np.mod(np.rad2deg(np.arctan2(d[:, 1], d[:, 0])) - x[2], 360.0)
    return np.stack([r, b, (idx + 1).astype(np.float64)], -1), idx


def test_bf16_update_batch_close_to_f32():
    p32, s32 = full_state(None)
    p16, s16 = full_state(jnp.bfloat16)
    assert s16.P.dtype == jnp.bfloat16 and s16.x.dtype == jnp.float32
    zs, idx = measurements(s32, 8)
    zs_j = jnp.asarray(zs, jnp.float32)
    Rs = jax.vmap(lambda z: jnp.diag(
        jnp.stack([z[0] * 0.1, z[1] * 5.0])))(zs_j)
    slots = jnp.asarray(idx, jnp.int32)
    valid = jnp.ones((8,), bool)
    o32 = batched.update_batch(s32, zs_j, slots, Rs, valid, p32)
    o16 = batched.update_batch(s16, zs_j, slots, Rs, valid, p16)
    assert o16.P.dtype == jnp.bfloat16        # storage dtype preserved
    assert o16.x.dtype == jnp.float32         # mean stays full precision
    np.testing.assert_allclose(np.asarray(o16.x), np.asarray(o32.x),
                               atol=0.05)
    np.testing.assert_allclose(
        np.asarray(o16.P, np.float32), np.asarray(o32.P),
        atol=0.02)                             # bf16 has ~8 mantissa bits


def test_bf16_gate_decisions_match_f32():
    p32, s32 = full_state(None, seed=3)
    p16, s16 = full_state(jnp.bfloat16, seed=3)
    zs, _ = measurements(s32, 16, seed=4)
    zs_j = jnp.asarray(zs, jnp.float32)
    Rs = jax.vmap(lambda z: jnp.diag(
        jnp.stack([z[0] * 0.1, z[1] * 5.0])))(zs_j)
    pml32 = EKFParams(capacity=K, association="ml", s_cost=1e6,
                      s_thresh=1e12, ref_compat=False, dtype=jnp.float32)
    pml16 = EKFParams(capacity=K, association="ml", s_cost=1e6,
                      s_thresh=1e12, ref_compat=False, dtype=jnp.float32,
                      cov_dtype=jnp.bfloat16)
    new32, slot32 = gate_batch(s32, zs_j, Rs, pml32)
    new16, slot16 = gate_batch(s16, zs_j, Rs, pml16)
    np.testing.assert_array_equal(np.asarray(new16), np.asarray(new32))
    np.testing.assert_array_equal(np.asarray(slot16), np.asarray(slot32))


def test_bf16_session_end_to_end():
    """Full pipeline with bf16 covariance storage: jit dtype stability
    through the lax.scan carry, bounded ATE, landmarks mapped."""
    from ekf_slam_tpu.session import SlamSession
    from ekf_slam_tpu.sim import world as W
    from test_sim_session import make_traj

    traj, _ = make_traj(T=120)
    from ekf_slam_tpu.config import RansacParams
    sess = SlamSession(
        algorithm="EKF_SLAM_UC",
        ekf_params=EKFParams(capacity=16, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float32,
                             cov_dtype=jnp.bfloat16, joseph=True,
                             symmetrize=True),
        ransac_params=RansacParams(
            line_consensus=60, bearing_window_deg=15.0,
            wall_search_timeout=4, table_capacity=32, promote_count=5,
            ref_compat=False, dtype=jnp.float32),
        seed=1)
    odom = jnp.asarray(traj.odom, jnp.float32)
    rngs = jnp.asarray(traj.ranges, jnp.float32)
    beams = jnp.asarray(traj.beam_angles, jnp.float32)
    carry, outs = sess.run(odom, rngs, beams)
    assert carry.filt.P.dtype == jnp.bfloat16
    assert int(carry.filt.n_active) >= 1
    assert np.all(np.isfinite(np.asarray(carry.filt.P, np.float32)))
    ate = float(W.ate_rmse(outs.pose[:, :2], traj.truth[:, :2]))
    assert ate < 0.5, ate


def test_sequential_update_dtype_stable_bf16():
    """The sequential path must at least preserve the storage dtype (scan
    carry stability), even though batched is the intended bf16 path."""
    from ekf_slam_tpu.models import ekf
    p16, s16 = full_state(jnp.bfloat16)
    zs, idx = measurements(s16, 1)
    z = jnp.asarray(zs[0], jnp.float32)
    R = jnp.diag(jnp.stack([z[0] * 0.1, z[1] * 5.0]))
    out = ekf.update(s16, z, int(idx[0]), R, p16)
    assert out.P.dtype == jnp.bfloat16
    assert out.x.dtype == jnp.float32
    out2 = ekf.predict(out, jnp.array([0.05, 2.0], jnp.float32), p16)
    assert out2.P.dtype == jnp.bfloat16
    out3 = ekf.append(out2, jnp.array([0.05, 2.0], jnp.float32), R,
                      jnp.array([1.0, 2.0], jnp.float32), 99.0, p16)
    assert out3.P.dtype == jnp.bfloat16

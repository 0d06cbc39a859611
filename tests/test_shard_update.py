"""Explicit-collective distributed update vs single-device batched update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched, ekf
from ekf_slam_tpu.parallel.mesh import make_mesh
from ekf_slam_tpu.parallel.shard_update import sharded_update_batch
from ekf_slam_tpu.state import FilterState, init_state

from test_batched import measurement_of

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def make_state(params, n_landmarks, seed=0):
    rng = np.random.default_rng(seed)
    st = init_state(params, pad_to_multiple_of=8)
    for k in range(n_landmarks):
        u = rng.uniform(-0.2, 0.2, 2)
        loc = rng.uniform(-3, 3, 2)
        R = np.diag(rng.uniform(0.01, 0.1, 2))
        st = ekf.predict(st, jnp.asarray(u), params)
        st = ekf.append(st, jnp.asarray(u), jnp.asarray(R),
                        jnp.asarray(loc), float(k + 1), params)
    return st


def test_shard_map_update_matches_single_device():
    params = EKFParams(capacity=8, ref_compat=False, dtype=jnp.float64)
    state = make_state(params, 4, seed=3)
    rng = np.random.default_rng(1)
    zs, Rs = [], []
    for slot in [0, 2, 1]:
        z = measurement_of(state, slot, noise=0.02, rng=rng)
        zs.append(z)
        Rs.append(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    zs = jnp.asarray(np.stack(zs))
    Rs = jnp.asarray(np.stack(Rs))
    slots = jnp.asarray([0, 2, 1])
    valid = jnp.ones((3,), bool)

    ref = batched.update_batch(state, zs, slots, Rs, valid, params)

    mesh = make_mesh()
    out = sharded_update_batch(state, zs, slots, Rs, valid, params, mesh)
    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.P), np.asarray(ref.P),
                               rtol=1e-8, atol=1e-11)


def test_shard_map_syrk_matches_gemm_and_is_bit_symmetric():
    """The distributed SYRK correction (systolic mirror exchange): same
    posterior as the sharded gemm form and the single-device update, and
    the output covariance is BIT-symmetric (each tile pair is written
    from one accumulator — the single-chip kernel's property carried
    onto the mesh)."""
    import dataclasses
    params = EKFParams(capacity=8, ref_compat=False, dtype=jnp.float64)
    state = make_state(params, 4, seed=7)
    rng = np.random.default_rng(4)
    zs, Rs = [], []
    for slot in [0, 3, 1, 2]:
        z = measurement_of(state, slot, noise=0.02, rng=rng)
        zs.append(z)
        Rs.append(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    zs = jnp.asarray(np.stack(zs))
    Rs = jnp.asarray(np.stack(Rs))
    slots = jnp.asarray([0, 3, 1, 2])
    valid = jnp.ones((4,), bool)

    mesh = make_mesh()
    p_syrk = dataclasses.replace(params, correction="syrk")
    out_s = sharded_update_batch(state, zs, slots, Rs, valid, p_syrk, mesh)
    out_g = sharded_update_batch(state, zs, slots, Rs, valid, params, mesh)
    ref = batched.update_batch(state, zs, slots, Rs, valid, params)

    np.testing.assert_allclose(np.asarray(out_s.x), np.asarray(ref.x),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out_s.P), np.asarray(out_g.P),
                               rtol=1e-8, atol=1e-11)
    P = np.asarray(out_s.P)
    assert np.array_equal(P, P.T)          # bit-symmetric


def test_sharded_session_routes_syrk():
    """ShardedSlamSession honors correction='syrk' on the shard_map path
    (no more silent downgrade) and still reverts it under gspmd."""
    import dataclasses
    from ekf_slam_tpu.parallel.sharded import ShardedSlamSession
    mesh = make_mesh()
    p = EKFParams(capacity=8, ref_compat=False, update_mode="batched",
                  correction="syrk", symmetrize=False)
    s_map = ShardedSlamSession(mesh=mesh, ekf_params=p,
                               update_path="shard_map")
    assert s_map.ekf_params.correction == "syrk"
    s_gspmd = ShardedSlamSession(mesh=mesh, ekf_params=p,
                                 update_path="gspmd")
    assert s_gspmd.ekf_params.correction == "gemm"


def test_sharded_sr_update_matches_andrews():
    """Distributed Andrews square-root update over a row-sharded general
    factor vs the single-device sr_update_andrews: same posterior factor
    Gram and mean at f64 (the round-4 lift of the sharded session's
    square-root rejection).  The factor carries noise-buffer columns and
    a landmark row pair straddling a device boundary."""
    import dataclasses
    from ekf_slam_tpu.models import srekf, srekf_fast
    from ekf_slam_tpu.parallel.shard_update import sr_update_sharded

    params = EKFParams(capacity=8, ref_compat=False, dtype=jnp.float64,
                       update_mode="srekf_fast", sr_noise_buffer=4)
    # D = 3+16+4 = 23 → pad to 24 = 8 devices × 3 rows; landmark slot 0's
    # pair is rows (3,4) — straddling the device-0/1 boundary at row 3? no:
    # rows_per=3 → boundaries at 3,6,...: pair (3,4) starts ON a boundary,
    # pair (5,6) straddles one.  Slots 0..3 cover both cases.
    base = make_state(dataclasses.replace(params, sr_noise_buffer=4), 4,
                      seed=11)
    D = base.dim
    Dtot = 24
    x = jnp.zeros((Dtot,), base.x.dtype).at[:D].set(base.x)
    P = jnp.zeros((Dtot, Dtot), base.P.dtype).at[:D, :D].set(base.P)
    sr = srekf.factor_from_state(base._replace(x=x, P=P))
    # deposit a noise column so the general-factor (non-triangular) path
    # is exercised
    sr = sr._replace(P=sr.P.at[:3, D].set(jnp.asarray([0.1, -0.2, 0.05])))

    rng = np.random.default_rng(6)
    zs, Rs = [], []
    for slot in [0, 1, 2, 3]:
        z = measurement_of(base, slot, noise=0.02, rng=rng)
        zs.append(z)
        Rs.append(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    zs = jnp.asarray(np.stack(zs))
    Rs = jnp.asarray(np.stack(Rs))
    slots = jnp.asarray([0, 1, 2, 3])
    valid = jnp.asarray([True, True, False, True])   # one masked lane

    ref = srekf_fast.sr_update_andrews(sr, zs, slots, Rs, valid, params)
    mesh = make_mesh()
    out = sr_update_sharded(sr, zs, slots, Rs, valid, params, mesh)

    np.testing.assert_allclose(np.asarray(out.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.P @ out.P.T),
                               np.asarray(ref.P @ ref.P.T),
                               rtol=1e-8, atol=1e-11)


def test_shard_map_update_masked_rows():
    params = EKFParams(capacity=8, ref_compat=False, dtype=jnp.float64)
    state = make_state(params, 3, seed=5)
    rng = np.random.default_rng(2)
    z = measurement_of(state, 1, noise=0.02, rng=rng)
    R = np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0])
    zs = jnp.asarray(np.stack([z, [9.0, 9.0, 7.0]]))
    Rs = jnp.asarray(np.stack([R, np.eye(2)]))
    slots = jnp.asarray([1, 0])
    valid = jnp.asarray([True, False])

    mesh = make_mesh()
    out = sharded_update_batch(state, zs, slots, Rs, valid, params, mesh)
    ref = batched.update_batch(state, zs, slots, Rs, valid, params)
    np.testing.assert_allclose(np.asarray(out.P), np.asarray(ref.P),
                               rtol=1e-8, atol=1e-11)


def test_shard_map_update_bf16_storage_matches_single_chip():
    """bf16 covariance storage on the sharded path (the tuned large-map
    combination): small algebra in f32, storage-dtype gathers — tracks
    the single-chip mixed-precision update within bf16 tolerance, and
    P stays stored bf16."""
    import dataclasses
    params = EKFParams(capacity=8, ref_compat=False, dtype=jnp.float32,
                       cov_dtype=jnp.bfloat16)
    state = make_state(dataclasses.replace(params, cov_dtype=None), 4,
                       seed=8)
    state = state._replace(P=state.P.astype(jnp.bfloat16))
    rng = np.random.default_rng(9)
    zs, Rs = [], []
    for slot in [0, 2, 3]:
        z = measurement_of(state, slot, noise=0.02, rng=rng)
        zs.append(z)
        Rs.append(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    zs = jnp.asarray(np.stack(zs), jnp.float32)
    Rs = jnp.asarray(np.stack(Rs), jnp.float32)
    slots = jnp.asarray([0, 2, 3])
    valid = jnp.ones((3,), bool)

    ref = batched.update_batch(state, zs, slots, Rs, valid, params)
    mesh = make_mesh()
    for corr in ("gemm", "syrk"):
        p = dataclasses.replace(params, correction=corr)
        out = sharded_update_batch(state, zs, slots, Rs, valid, p, mesh)
        assert out.P.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out.x), np.asarray(ref.x), rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(out.P, dtype=np.float32),
            np.asarray(ref.P, dtype=np.float32), rtol=5e-2, atol=5e-2)

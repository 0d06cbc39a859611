"""Multi-chip logic on the virtual 8-device CPU mesh (SURVEY.md §4.4).

Validates that (a) the sharded session produces the same numbers as the
single-device one, (b) P actually stays distributed as row tiles, and
(c) the padded state dimension divides the mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import EKFParams, RansacParams
from ekf_slam_tpu.parallel.mesh import make_mesh, row_sharding
from ekf_slam_tpu.parallel.sharded import ShardedSlamSession
from ekf_slam_tpu.session import SlamSession
from ekf_slam_tpu.state import init_state

from test_sim_session import SIM_RANSAC, make_traj

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_and_padding():
    mesh = make_mesh()
    assert mesh.shape["map"] == 8
    ep = EKFParams(capacity=16, dtype=jnp.float64)
    st = init_state(ep, pad_to_multiple_of=8 * mesh.shape["map"])
    assert st.dim % (8 * mesh.shape["map"]) == 0
    assert st.capacity == 16
    # landmarks property unaffected by padding
    assert st.landmarks.shape == (16, 2)


def test_sharded_matches_unsharded():
    traj, _ = make_traj(T=40)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    ref = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=5)
    c_ref, o_ref = ref.run(traj.odom, traj.ranges, traj.beam_angles)

    mesh = make_mesh()
    sh = ShardedSlamSession(mesh=mesh, ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5)
    c_sh, o_sh = sh.run(traj.odom, traj.ranges, traj.beam_angles)

    assert int(c_ref.filt.n_active) == int(c_sh.filt.n_active)
    d = 3 + 2 * int(c_ref.filt.n_active)
    np.testing.assert_allclose(np.asarray(c_sh.filt.x[:d]),
                               np.asarray(c_ref.filt.x[:d]),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(c_sh.filt.P[:d, :d]),
                               np.asarray(c_ref.filt.P[:d, :d]),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(o_sh.pose),
                               np.asarray(o_ref.pose), atol=1e-9)


def test_covariance_stays_sharded():
    """P must remain distributed row tiles after a step — no silent
    all-gather back to one device."""
    traj, _ = make_traj(T=3)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    mesh = make_mesh()
    sh = ShardedSlamSession(mesh=mesh, ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5)
    carry = sh.init_carry(first_odom=traj.odom[0])
    carry, _ = sh.step(carry, traj.odom[1], traj.ranges[1],
                       traj.beam_angles)
    P = carry.filt.P
    # sharded over 8 devices: each addressable shard holds D/8 rows
    shards = P.addressable_shards
    assert len(shards) == 8
    rows = {s.data.shape[0] for s in shards}
    assert rows == {P.shape[0] // 8}


def test_sharded_shard_map_path_matches_gspmd():
    """update_path='shard_map' (explicit psum/all_gather Schur combine,
    parallel/shard_update.py) must produce the same session results as the
    GSPMD path AND the unsharded batched session — and keep P distributed."""
    traj, _ = make_traj(T=20)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   update_mode="batched", dtype=jnp.float64)
    ref = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=5)
    c_ref, o_ref = ref.run(traj.odom, traj.ranges, traj.beam_angles)

    sh = ShardedSlamSession(mesh=make_mesh(), ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5,
                            update_path="shard_map")
    c_sh, o_sh = sh.run(traj.odom, traj.ranges, traj.beam_angles)

    assert int(c_sh.filt.n_active) == int(c_ref.filt.n_active)
    d = 3 + 2 * int(c_ref.filt.n_active)
    np.testing.assert_allclose(np.asarray(c_sh.filt.x[:d]),
                               np.asarray(c_ref.filt.x[:d]),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(c_sh.filt.P[:d, :d]),
                               np.asarray(c_ref.filt.P[:d, :d]),
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(o_sh.pose),
                               np.asarray(o_ref.pose), atol=1e-8)
    # still distributed row tiles
    shards = c_sh.filt.P.addressable_shards
    assert len(shards) == 8
    assert {s.data.shape[0] for s in shards} == {c_sh.filt.P.shape[0] // 8}


def test_sharded_rows_mode_composes():
    """pht_mode='rows' (whole-row gathers of a row-sharded P) under the
    sharded session: matches the unsharded rows-mode session and keeps P
    distributed — the combination utils/schedule.tuned_params produces
    for large maps."""
    traj, _ = make_traj(T=15)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   update_mode="batched", pht_mode="rows",
                   dtype=jnp.float64)
    ref = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=5)
    c0, _ = ref.run(traj.odom, traj.ranges, traj.beam_angles)
    sh = ShardedSlamSession(mesh=make_mesh(), ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5)
    c1, _ = sh.run(traj.odom, traj.ranges, traj.beam_angles)
    assert int(c1.filt.n_active) == int(c0.filt.n_active)
    d = 3 + 2 * int(c0.filt.n_active)
    np.testing.assert_allclose(np.asarray(c1.filt.x[:d]),
                               np.asarray(c0.filt.x[:d]),
                               rtol=1e-9, atol=1e-11)
    assert len(c1.filt.P.addressable_shards) == 8


def test_masked_writes_bit_match_slice_forms():
    """masked_writes=True (where-selected predict/append, the sharded
    session's local form) must be BIT-identical to the scatter/slice
    forms on identical inputs."""
    import dataclasses
    from ekf_slam_tpu.models import ekf
    from test_ekf_core import make_pair

    base = EKFParams(capacity=8, max_obs=4, ref_compat=False,
                     dtype=jnp.float64)
    masked = dataclasses.replace(base, masked_writes=True)
    state, _ = make_pair(3, seed=9)
    u = jnp.array([0.07, 4.0])

    a = ekf.predict(state, u, base)
    b = ekf.predict(state, u, masked)
    np.testing.assert_array_equal(np.asarray(a.P), np.asarray(b.P))
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))

    R2 = jnp.diag(jnp.array([0.2, 5.0]))
    loc = jnp.array([1.5, -0.5])
    aa = ekf.append(a, u, R2, loc, jnp.asarray(4.0), base)
    bb = ekf.append(b, u, R2, loc, jnp.asarray(4.0), masked)
    # the masked cross strip is a full-row contraction (padded jxr), so
    # its summation order differs from the 3-term slice dot — round-off
    # only, everything else bit-identical
    np.testing.assert_allclose(np.asarray(aa.P), np.asarray(bb.P),
                               rtol=1e-14, atol=1e-15)
    np.testing.assert_array_equal(np.asarray(aa.x), np.asarray(bb.x))
    assert int(bb.n_active) == int(aa.n_active) == 4


def test_sharded_rejects_bad_update_path():
    with pytest.raises(ValueError, match="update_path"):
        ShardedSlamSession(mesh=make_mesh(),
                           ekf_params=EKFParams(capacity=16),
                           update_path="magic")


def test_sharded_batched_mode_composes():
    """update_mode='batched' under covariance row-tiling: results match the
    unsharded batched session."""
    traj, _ = make_traj(T=20)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   update_mode="batched", dtype=jnp.float64)
    ref = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=5)
    c_ref, _ = ref.run(traj.odom, traj.ranges, traj.beam_angles)
    sh = ShardedSlamSession(mesh=make_mesh(), ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5)
    c_sh, _ = sh.run(traj.odom, traj.ranges, traj.beam_angles)
    d = 3 + 2 * int(c_ref.filt.n_active)
    assert int(c_sh.filt.n_active) == int(c_ref.filt.n_active)
    np.testing.assert_allclose(np.asarray(c_sh.filt.x[:d]),
                               np.asarray(c_ref.filt.x[:d]),
                               rtol=1e-8, atol=1e-10)


def test_sharded_rejects_unsupported_square_root_configs():
    """Round-4 state: the triangular QR srekf is still rejected (its
    pre-array QR is not row-shardable), with a pointer to the supported
    path; srekf_fast is rejected only under gspmd — the shard_map route
    runs it (test_sharded_srekf_fast_session_matches_unsharded)."""
    with pytest.raises(NotImplementedError, match="srekf_fast"):
        ShardedSlamSession(mesh=make_mesh(),
                           ekf_params=EKFParams(capacity=16,
                                                update_mode="srekf"))
    with pytest.raises(NotImplementedError, match="shard_map"):
        ShardedSlamSession(mesh=make_mesh(), update_path="gspmd",
                           ekf_params=EKFParams(capacity=16,
                                                update_mode="srekf_fast"))


def test_shard_map_rejects_incompatible_flags():
    # shard_map implements the batched joint update
    with pytest.raises(ValueError, match="batched"):
        ShardedSlamSession(
            mesh=make_mesh(), update_path="shard_map",
            ekf_params=EKFParams(capacity=16, update_mode="sequential"))
    # symmetrize would force a full O(D²/n) all-to-all per tick
    with pytest.raises(ValueError, match="symmetrize"):
        ShardedSlamSession(
            mesh=make_mesh(), update_path="shard_map",
            ekf_params=EKFParams(capacity=16, update_mode="batched",
                                 symmetrize=True))


def test_sharded_supports_guard_max_jump():
    """guard_max_jump is honored by the sharded step (same rollback guard
    as SlamSession) — previously a silently-ignored flag."""
    traj, _ = make_traj(T=15)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   update_mode="batched", guard_max_jump=5.0,
                   dtype=jnp.float64)
    ref = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=5)
    c0, _ = ref.run(traj.odom, traj.ranges, traj.beam_angles)
    sh = ShardedSlamSession(mesh=make_mesh(), ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5)
    c1, _ = sh.run(traj.odom, traj.ranges, traj.beam_angles)
    assert int(c1.filt.n_active) == int(c0.filt.n_active)
    d = 3 + 2 * int(c0.filt.n_active)
    np.testing.assert_allclose(np.asarray(c1.filt.x[:d]),
                               np.asarray(c0.filt.x[:d]),
                               rtol=1e-9, atol=1e-11)


def test_sharded_srekf_fast_session_matches_unsharded():
    """Round-4 lift: the sharded session runs the square-root filter
    (update_mode='srekf_fast', update_path='shard_map' — distributed
    Andrews update, parallel/shard_update.sr_update_sharded) and tracks
    the unsharded srekf_fast session; the carried factor reproduces the
    same covariance."""
    traj, _ = make_traj(T=30)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64, update_mode="srekf_fast",
                   sr_noise_buffer=8)
    ref = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=5)
    c_ref, o_ref = ref.run(traj.odom, traj.ranges, traj.beam_angles)

    sh = ShardedSlamSession(mesh=make_mesh(), ekf_params=ep,
                            ransac_params=SIM_RANSAC, seed=5,
                            update_path="shard_map")
    c_sh, o_sh = sh.run(traj.odom, traj.ranges, traj.beam_angles)

    assert int(c_ref.filt.n_active) == int(c_sh.filt.n_active) >= 1
    assert int(c_sh.sr_tick) == 30
    d = 3 + 2 * int(c_ref.filt.n_active)
    np.testing.assert_allclose(np.asarray(c_sh.filt.x[:d]),
                               np.asarray(c_ref.filt.x[:d]),
                               rtol=1e-8, atol=1e-10)
    P_sh = np.asarray(c_sh.filt.P @ c_sh.filt.P.T)[:d, :d]
    P_ref = np.asarray(c_ref.filt.P @ c_ref.filt.P.T)[:d, :d]
    np.testing.assert_allclose(P_sh, P_ref, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(o_sh.pose),
                               np.asarray(o_ref.pose), atol=1e-8)




def test_sharded_session_maintenance():
    """Maintenance on the sharded session (round 4): eviction + compaction
    under a row-sharded P matches the unsharded maintained session."""
    traj, _ = make_traj(T=30)
    kw = dict(ekf_params=EKFParams(capacity=16, max_obs=8,
                                   ref_compat=False, dtype=jnp.float64),
              ransac_params=SIM_RANSAC, seed=5)
    ref = SlamSession(maintain_max_trace=25.0, **kw)
    c_ref, o_ref = ref.run(traj.odom, traj.ranges, traj.beam_angles)

    sh = ShardedSlamSession(mesh=make_mesh(), maintain_max_trace=25.0,
                            **kw)
    c_sh, o_sh = sh.run(traj.odom, traj.ranges, traj.beam_angles)

    assert int(c_ref.filt.n_active) == int(c_sh.filt.n_active) >= 1
    d = 3 + 2 * int(c_ref.filt.n_active)
    np.testing.assert_allclose(np.asarray(c_sh.filt.P[:d, :d]),
                               np.asarray(c_ref.filt.P[:d, :d]),
                               rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(np.asarray(o_sh.pose),
                               np.asarray(o_ref.pose), atol=1e-9)

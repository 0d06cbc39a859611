"""Fleet (data-parallel) sessions: vmapped ticks, data-axis sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.parallel.mesh import make_mesh
from ekf_slam_tpu.parallel.multi import FleetSlamSession
from ekf_slam_tpu.session import SlamSession
from ekf_slam_tpu.sim import world as W

from test_sim_session import SIM_RANSAC, make_traj


def fleet_streams(n, T=30):
    trajs = [make_traj(T=T, seed=s)[0] for s in range(n)]
    odom = jnp.stack([t.odom for t in trajs], axis=1)      # [T,N,3]
    ranges = jnp.stack([t.ranges for t in trajs], axis=1)  # [T,N,B]
    return trajs, odom, ranges, trajs[0].beam_angles


def test_fleet_matches_individual_sessions():
    n = 3
    trajs, odom, ranges, beams = fleet_streams(n)
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    fleet = FleetSlamSession(n_sessions=n, ekf_params=ep,
                             ransac_params=SIM_RANSAC, seed=10)
    carry, outs = fleet.run(odom, ranges, beams)
    for i in range(n):
        solo = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC,
                           seed=10 + i)
        c_i, o_i = solo.run(trajs[i].odom, trajs[i].ranges, beams)
        np.testing.assert_allclose(np.asarray(carry.filt.x[i]),
                                   np.asarray(c_i.filt.x), atol=1e-11)
        assert int(carry.filt.n_active[i]) == int(c_i.filt.n_active)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_fleet_sharded_over_data_axis():
    n = 8
    trajs, odom, ranges, beams = fleet_streams(n, T=6)
    mesh = make_mesh(n_map=1, n_data=8)
    ep = EKFParams(capacity=8, max_obs=4, ref_compat=False,
                   dtype=jnp.float64)
    fleet = FleetSlamSession(n_sessions=n, ekf_params=ep,
                             ransac_params=SIM_RANSAC, mesh=mesh, seed=3)
    carry, outs = fleet.run(odom, ranges, beams)
    shards = carry.filt.P.addressable_shards
    assert len(shards) == 8
    assert {s.data.shape[0] for s in shards} == {1}  # one session per device
    assert np.all(np.isfinite(np.asarray(carry.filt.x)))

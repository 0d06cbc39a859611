"""Capacity-ceiling regime, scaled down for CI: in-place stepping.

Past ~20k landmarks a SECOND covariance buffer does not fit in HBM
(32k: P bf16 = 8.3 GB on a 16 GB chip — chip_r3b stage U, BASELINE.md
capacity-ceiling table), so the product path is ``SlamSession``'s
donated step: the carry is donated to the tick program and the SYRK
correction updates P through its input/output alias.  These tests pin
the two load-bearing properties at CI scale:

  1. donation changes nothing semantically (parity vs the undonated
     session, tick by tick);
  2. the compiled step program actually ALIASES a P-sized buffer
     (memory_analysis), i.e. the in-place regime is real, not assumed.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.session import SlamSession

from test_sim_session import SIM_RANSAC, make_traj


def _sessions(**kw):
    ep = EKFParams(capacity=16, max_obs=8, ref_compat=False,
                   dtype=jnp.float64)
    return (SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=4,
                        **kw))


def test_donated_step_matches_undonated():
    traj, _ = make_traj(T=25)
    plain = _sessions(donate_carry=False)
    dono = _sessions(donate_carry=True)
    assert dono.donate_carry is True and plain.donate_carry is False
    cp = plain.init_carry(first_odom=traj.odom[0])
    cd = dono.init_carry(first_odom=traj.odom[0])
    for t in range(25):
        cp, op = plain.step(cp, traj.odom[t], traj.ranges[t],
                            traj.beam_angles)
        # donated: the passed carry is consumed; keep only the new one
        cd, od = dono.step(cd, traj.odom[t], traj.ranges[t],
                           traj.beam_angles)
        np.testing.assert_allclose(np.asarray(od.pose),
                                   np.asarray(op.pose), atol=1e-12)
    assert int(cp.filt.n_active) == int(cd.filt.n_active) >= 1
    np.testing.assert_allclose(np.asarray(cd.filt.P),
                               np.asarray(cp.filt.P),
                               rtol=1e-12, atol=1e-14)


def test_donated_step_aliases_covariance_buffer():
    """The compiled donated step aliases at least P's bytes — the
    property that makes the 32k single-buffer regime work."""
    traj, _ = make_traj(T=2)
    sess = _sessions(donate_carry=True)
    carry = sess.init_carry(first_odom=traj.odom[0])
    lowered = jax.jit(sess._make_step(), donate_argnums=(0,)).lower(
        carry, jnp.asarray(traj.odom[1]), jnp.asarray(traj.ranges[1]),
        jnp.asarray(traj.beam_angles))
    ma = lowered.compile().memory_analysis()
    p_bytes = carry.filt.P.size * carry.filt.P.dtype.itemsize
    assert ma is not None and ma.alias_size_in_bytes >= p_bytes


def test_auto_donation_threshold():
    """donate_carry=None resolves by P size: off at CI scale, on once
    P alone is a 2 GB-class buffer (verified via the resolved flag on a
    LAZY session whose state is never materialized)."""
    small = _sessions()
    assert small.donate_carry is False
    # capacity 40000 → D ≈ 80k, f32 P ≈ 25 GB: auto-on.  Constructing
    # the session only builds jit wrappers, never the state itself.
    ep = EKFParams(capacity=40000, max_obs=8, ref_compat=False,
                   dtype=jnp.float32)
    big = SlamSession(ekf_params=ep, ransac_params=SIM_RANSAC, seed=0)
    assert big.donate_carry is True

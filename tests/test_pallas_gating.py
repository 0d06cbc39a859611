"""Fused Pallas gating kernel vs the XLA strip-based gate (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.ops.association import gate_costs
from ekf_slam_tpu.ops.pallas.gating import gate_costs_pallas, strips_from_state

from test_ekf_core import make_pair
from test_batched import measurement_of


def test_gating_kernel_matches_xla():
    params = EKFParams(capacity=8, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False, joseph=True,
                       dtype=jnp.float64)
    state, _ = make_pair(6, seed=21)
    # symmetrize P so the kernel's symmetric-Phi assumption is exact
    state = state._replace(P=0.5 * (state.P + state.P.T))
    rng = np.random.default_rng(3)
    zs, rdiag = [], []
    for slot in [0, 3, 5, 1]:
        z = measurement_of(state, slot, noise=0.05, rng=rng)
        zs.append(z)
        rdiag.append([abs(z[0]) * 0.1, abs(z[1]) * 5.0])
    zs = jnp.asarray(np.stack(zs))
    rdiag = jnp.asarray(np.asarray(rdiag))

    lm, sig, active, prr, prl, pll = strips_from_state(state)
    got = gate_costs_pallas(state.x[:3], prr, zs, rdiag, lm, sig, active,
                            prl, pll, params.s_cost, wrap_innovation=True,
                            interpret=True)
    got = np.asarray(got)

    for m in range(zs.shape[0]):
        R = jnp.diag(rdiag[m])
        pos, sigc = gate_costs(state, zs[m], R, params)
        want = np.asarray(pos + sigc)
        act = np.asarray(state.active)
        np.testing.assert_allclose(got[m][act], want[act], rtol=1e-6,
                                   atol=1e-8)
        assert np.all(np.isinf(got[m][~act]))


def test_gating_kernel_multi_tile_m():
    """M=300 spans two measurement tiles (TM=256) with a padded remainder —
    exercises the per-tile m index maps and padded-row masking that a
    single-tile test (M<=256) cannot reach."""
    M = 300
    params = EKFParams(capacity=8, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False, dtype=jnp.float64)
    state, _ = make_pair(6, seed=11)
    state = state._replace(P=0.5 * (state.P + state.P.T))
    rng = np.random.default_rng(7)
    slots = rng.integers(0, 6, M)
    zs, rdiag = [], []
    for slot in slots:
        z = measurement_of(state, int(slot), noise=0.05, rng=rng)
        zs.append(z)
        rdiag.append([abs(z[0]) * 0.1, abs(z[1]) * 5.0])
    zs = jnp.asarray(np.stack(zs))
    rdiag = jnp.asarray(np.asarray(rdiag))

    lm, sig, active, prr, prl, pll = strips_from_state(state)
    got = np.asarray(gate_costs_pallas(
        state.x[:3], prr, zs, rdiag, lm, sig, active, prl, pll,
        params.s_cost, wrap_innovation=True, interpret=True))
    assert got.shape == (M, state.capacity)

    act = np.asarray(state.active)
    for m in range(0, M, 37):          # sample across both tiles
        R = jnp.diag(rdiag[m])
        pos, sigc = gate_costs(state, zs[m], R, params)
        want = np.asarray(pos + sigc)
        np.testing.assert_allclose(got[m][act], want[act], rtol=1e-6,
                                   atol=1e-8)
        assert np.all(np.isinf(got[m][~act]))
    # the tile seam itself
    for m in (255, 256, 299):
        R = jnp.diag(rdiag[m])
        pos, sigc = gate_costs(state, zs[m], R, params)
        np.testing.assert_allclose(got[m][act],
                                   np.asarray(pos + sigc)[act],
                                   rtol=1e-6, atol=1e-8)


def test_gate_batch_pallas_flag_matches_xla():
    """use_pallas=True (interpret on CPU) must agree with the XLA gate."""
    from ekf_slam_tpu.ops.association import gate_batch
    params = EKFParams(capacity=8, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False, dtype=jnp.float64)
    state, _ = make_pair(4, seed=3)
    state = state._replace(P=0.5 * (state.P + state.P.T))
    rng = np.random.default_rng(0)
    zs, Rs = [], []
    for slot in [1, 0, 3]:
        z = measurement_of(state, slot, noise=0.02, rng=rng)
        zs.append(z)
        Rs.append(np.diag([abs(z[0]) * 0.1, abs(z[1]) * 5.0]))
    zs = jnp.asarray(np.stack(zs))
    Rs = jnp.asarray(np.stack(Rs))
    n1, s1 = gate_batch(state, zs, Rs, params, use_pallas=False)
    n2, s2 = gate_batch(state, zs, Rs, params, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

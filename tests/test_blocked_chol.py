"""chol_blocked: fp-exactness vs jnp.linalg.cholesky across shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ekf_slam_tpu.ops.blocked_chol import chol_blocked, chol_for_state


def _spd(d, seed=0, dtype=jnp.float64):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(d, 16 + d // 4)) / np.sqrt(d)
    return jnp.asarray(0.05 * np.eye(d) + A @ A.T, dtype)


@pytest.mark.parametrize("d,block", [(64, 512), (200, 64), (512, 128),
                                     (513, 128), (1000, 256)])
def test_matches_xla_cholesky(d, block):
    A = _spd(d, seed=d)
    L = chol_blocked(A, block=block)
    Lx = jnp.linalg.cholesky(A)
    # same math, blocked scheduling: agreement to tight fp tolerance
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lx),
                               rtol=1e-10, atol=1e-10)
    # strict upper triangle exactly zero
    assert float(jnp.abs(jnp.triu(L, 1)).max()) == 0.0


def test_reconstructs_input_f32():
    A = _spd(700, seed=3, dtype=jnp.float32)
    L = chol_blocked(A, block=256)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(A),
                               rtol=2e-4, atol=2e-4)


def test_chol_for_state_masks_inactive():
    # filter-shaped P: active leading block, exact zeros beyond
    d, n_act = 131, 20
    end = 3 + 2 * n_act
    A = np.zeros((d, d))
    A[:end, :end] = np.asarray(_spd(end, seed=9))
    L = chol_for_state(jnp.asarray(A), jnp.asarray(n_act), block=32)
    np.testing.assert_allclose(np.asarray(L @ L.T), A, rtol=1e-9,
                               atol=1e-9)
    assert float(jnp.abs(L[end:]).max()) == 0.0


def test_tri_inv_blocked_matches_trsm():
    from ekf_slam_tpu.ops.blocked_chol import tri_inv_blocked
    for d, block in [(64, 512), (300, 64), (1030, 256)]:
        L = np.asarray(jnp.linalg.cholesky(_spd(d, seed=d)))
        inv = tri_inv_blocked(jnp.asarray(L), block=block)
        np.testing.assert_allclose(np.asarray(inv @ L), np.eye(d),
                                   rtol=1e-9, atol=1e-9)
        assert float(jnp.abs(jnp.triu(inv, 1)).max()) == 0.0


def test_chol_blocked_large_block_recursion():
    A = _spd(1500, seed=42)
    L = chol_blocked(A, block=1024)      # recursive 1024-panel
    Lx = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lx),
                               rtol=1e-10, atol=1e-10)

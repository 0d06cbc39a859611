"""Debug-mode state validation (chex), and NaN-hunting helpers.

The reference's failure mode was silent numeric corruption watched on a
plot (SURVEY.md §4/§5).  In JAX's functional model the "sanitizer" story is
value-level: structural/dtype/shape assertions via chex plus finite-ness
checks that can run inside jit (jax.debug) or eagerly between steps.

Usage: wrap a session step during development::

    validate_state(carry.filt, params)        # eager, raises
    chex.assert_trees_all_finite(carry)       # whole-carry finiteness

or enable jax_debug_nans globally for hard failures at the producing op.
"""
from __future__ import annotations

import chex
import jax.numpy as jnp
import numpy as np

from ..config import EKFParams
from ..state import FilterState


def validate_state(state: FilterState, params: EKFParams,
                   check_values: bool = True) -> None:
    """Structural + (optionally) numeric invariants of a FilterState.

    Raises AssertionError on violation.  Eager-mode only (uses concrete
    values); inside jit use utils/faults.check_tick instead."""
    K = params.capacity
    D = state.x.shape[0]
    chex.assert_rank([state.x, state.sig, state.active], [1, 1, 1])
    chex.assert_rank(state.P, 2)
    chex.assert_shape(state.P, (D, D))
    chex.assert_shape(state.sig, (K,))
    chex.assert_shape(state.active, (K,))
    assert D >= 3 + 2 * K, (D, K)
    assert state.P.dtype == state.x.dtype

    if not check_values:
        return
    n = int(state.n_active)
    assert 0 <= n <= K, n
    active = np.asarray(state.active)
    assert active.sum() == n, (active.sum(), n)
    # active slots are a prefix (append fills in order)
    assert np.all(active[:n]) and not np.any(active[n:])
    chex.assert_tree_all_finite((state.x, state.P))
    d = 3 + 2 * n
    diag = np.asarray(jnp.diagonal(state.P))[:d]
    assert np.all(diag > -1e-5), diag.min()
    # inactive block must stay exactly zero (masked-write invariant)
    P = np.asarray(state.P)
    assert np.all(P[d:, :] == 0) and np.all(P[:, d:] == 0)
    assert np.all(np.asarray(state.x)[d:] == 0)


def assert_symmetric(P, tol: float = 1e-5) -> None:
    P = np.asarray(P)
    asym = np.abs(P - P.T).max()
    assert asym < tol, f"covariance asymmetry {asym:.2e} >= {tol:.0e}"

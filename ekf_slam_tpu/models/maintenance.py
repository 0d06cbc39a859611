"""Map lifecycle: landmark eviction, compaction, duplicate merging.

The reference's only map hygiene is the RANSAC candidate freshness decay
(RANSAC.m:321-331) — once a landmark enters the filter it lives forever
and the state grows without bound.  A fixed-capacity engine needs the
other half: evicting bad/duplicate landmarks and compacting the slot
table so capacity is reused.

Design: eviction is a PERMUTATION of the joint state.  Kept slots are
compacted to the front (preserving their relative order — the invariant
`active slots are exactly 0..n_active-1` that append/gate/srekf rely on),
dropped slots move to the tail and are zeroed.  x and P are permuted with
two gathers — O(D²) traffic, which is fine for an occasional maintenance
op (it costs about one update's P pass).  Everything is fixed-shape and
jittable; the drop decision is data (a boolean mask), so one compiled
program serves any eviction pattern.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import EKFParams
from ..state import FilterState


def _slot_permutation(drop: jnp.ndarray, n_active: jnp.ndarray
                      ) -> jnp.ndarray:
    """Slot permutation putting kept active slots first (stable), then
    dropped ones, then inactive padding — perm[new_slot] = old_slot."""
    K = drop.shape[0]
    slots = jnp.arange(K)
    active = slots < n_active
    # sort key: kept-active (0) < dropped-active (1) < inactive (2);
    # stable within classes by slot id
    klass = jnp.where(active & ~drop, 0, jnp.where(active & drop, 1, 2))
    return jnp.argsort(klass * K + slots)


def evict_landmarks(state: FilterState, drop: jnp.ndarray,
                    params: EKFParams) -> FilterState:
    """Remove the landmarks where ``drop[k]`` is True (inactive slots and
    out-of-range flags are ignored); surviving landmarks keep their full
    joint covariance structure, compacted to the leading slots.

    Evicting a landmark = marginalizing it out of a Gaussian = simply
    deleting its rows/columns (the Schur complement of a dropped block is
    exactly the remaining covariance), so this is lossless for the
    survivors."""
    K = state.capacity
    D = state.x.shape[0]
    drop = drop & (jnp.arange(K) < state.n_active)
    perm = _slot_permutation(drop, state.n_active)             # [K]

    n_kept = (state.n_active - jnp.sum(drop)).astype(state.n_active.dtype)
    new_slots = jnp.arange(K)
    keep_new = new_slots < n_kept                               # mask [K]

    # state-row permutation: pose rows fixed, slot k ↦ rows 3+2k, 3+2k+1;
    # padded tail rows (beyond 3+2K) stay in place.
    rowperm = jnp.arange(D)
    lmrows = 3 + 2 * perm                                       # [K]
    rowperm = rowperm.at[3 + 2 * new_slots].set(lmrows)
    rowperm = rowperm.at[4 + 2 * new_slots].set(lmrows + 1)

    x = state.x[rowperm]
    P = state.P[rowperm][:, rowperm]

    # zero out everything past the kept slots (evicted + stale data)
    rows_kept = jnp.arange(D) < 3 + 2 * n_kept
    x = jnp.where(rows_kept, x, 0.0).astype(state.x.dtype)
    P = jnp.where(rows_kept[:, None] & rows_kept[None, :], P,
                  0.0).astype(state.P.dtype)
    sig = jnp.where(keep_new, state.sig[perm], 0.0).astype(state.sig.dtype)
    return FilterState(x=x, P=P, sig=sig, active=keep_new,
                       n_active=n_kept)


def evict_landmarks_factored(state: FilterState, drop: jnp.ndarray,
                             params: EKFParams) -> FilterState:
    """``evict_landmarks`` for a square-root state (P field holds a
    factor S with P = S·Sᵀ — models/srekf.py, models/srekf_fast.py).

    Marginalization is even more natural on the factor: a submatrix of
    P is exactly the Gram of the corresponding ROW subset of S, so
    eviction permutes S's rows only (columns are an internal basis and
    never move).  The permuted factor is then recompressed
    (srekf_fast.sr_recompress): a lower-triangular S has entries in an
    evicted slot's columns from every later slot's rows, so the freed
    columns are NOT zero — recompression restores the
    fresh-slot-columns-are-zero invariant that the O(D) sr_append
    depends on, and returns a clean triangular factor (valid for both
    the srekf and srekf_fast modes)."""
    from .srekf_fast import sr_recompress

    K = state.capacity
    D = state.x.shape[0]
    drop = drop & (jnp.arange(K) < state.n_active)
    perm = _slot_permutation(drop, state.n_active)
    n_kept = (state.n_active - jnp.sum(drop)).astype(state.n_active.dtype)
    new_slots = jnp.arange(K)
    keep_new = new_slots < n_kept

    rowperm = jnp.arange(D)
    lmrows = 3 + 2 * perm
    rowperm = rowperm.at[3 + 2 * new_slots].set(lmrows)
    rowperm = rowperm.at[4 + 2 * new_slots].set(lmrows + 1)

    rows_kept = jnp.arange(D) < 3 + 2 * n_kept
    x = jnp.where(rows_kept, state.x[rowperm], 0.0).astype(state.x.dtype)
    S = jnp.where(rows_kept[:, None], state.P[rowperm],
                  0.0).astype(state.P.dtype)
    sig = jnp.where(keep_new, state.sig[perm], 0.0).astype(state.sig.dtype)
    st = FilterState(x=x, P=S, sig=sig, active=keep_new, n_active=n_kept)
    return sr_recompress(st)


def _slot_traces(state: FilterState, factored: bool) -> jnp.ndarray:
    """Per-slot 2×2 covariance traces [K] — from P's diagonal, or from
    the factor's row norms (diag(S·Sᵀ) = ‖S row‖²)."""
    K = state.capacity
    end = 3 + 2 * K
    diag = (jnp.sum(state.P * state.P, axis=1) if factored
            else jnp.diagonal(state.P))
    return diag[3:end:2] + diag[4:end:2]


def duplicate_mask(state: FilterState, radius: float,
                   factored: bool = False) -> jnp.ndarray:
    """Mark the worse of every active landmark pair closer than ``radius``.

    "Worse" = larger covariance trace (the later/noisier duplicate); among
    equals the higher slot is dropped, so the original observation
    survives.  Returns bool[K].

    Cost: the [K,K] proximity matrix — fine up to a few thousand
    landmarks; at 10k it is a 100 MB bool plane, so run duplicate checks
    occasionally (host-driven) rather than per tick at that scale."""
    K = state.capacity
    lm = state.landmarks                                        # [K,2]
    act = state.active
    d2 = jnp.sum((lm[:, None, :] - lm[None, :, :]) ** 2, -1)    # [K,K]
    close = (d2 < radius * radius) & act[:, None] & act[None, :]
    close = close & ~jnp.eye(K, dtype=bool)

    tr = _slot_traces(state, factored)                          # [K]
    # drop k iff some close j is strictly better, or equal with lower slot
    better = (tr[None, :] < tr[:, None]) | (
        (tr[None, :] == tr[:, None])
        & (jnp.arange(K)[None, :] < jnp.arange(K)[:, None]))
    return jnp.any(close & better, axis=1)


def prune_by_uncertainty(state: FilterState, max_trace: float,
                         factored: bool = False) -> jnp.ndarray:
    """Mark active landmarks whose 2×2 covariance trace exceeds
    ``max_trace`` (never converged / spurious).  Returns bool[K]."""
    return state.active & (_slot_traces(state, factored) > max_trace)


def maintain(state: FilterState, params: EKFParams,
             merge_radius: float = 0.0, max_trace: float = 0.0,
             factored: bool = False) -> Tuple[FilterState, jnp.ndarray]:
    """One maintenance pass: merge duplicates within ``merge_radius`` and
    prune landmarks above ``max_trace`` (0 disables either).  Returns
    (state, n_evicted).  ``factored=True``: the state carries a
    square-root factor (srekf / srekf_fast) — masks read the factor's
    row norms and eviction goes through the factor-space path."""
    drop = jnp.zeros((state.capacity,), bool)
    if merge_radius > 0:
        drop = drop | duplicate_mask(state, merge_radius, factored)
    if max_trace > 0:
        drop = drop | prune_by_uncertainty(state, max_trace, factored)
    n = jnp.sum(drop).astype(jnp.int32)
    evict = evict_landmarks_factored if factored else evict_landmarks
    # An all-False drop is an identity permutation: skip the whole pass
    # (for a factored state the evict ends in a full O(D³) sr_recompress —
    # without this guard a no-evict maintenance tick silently pays a
    # per-tick recompression; the dense path's two O(D²) gathers are
    # likewise wasted work).  lax.cond executes only the taken branch.
    return jax.lax.cond(n > 0, lambda s: evict(s, drop, params),
                        lambda s: s, state), n

"""Explicit-collective distributed batched update (shard_map + psum).

parallel/sharded.py lets GSPMD derive the collectives from sharding
constraints; this module spells the same algorithm out with ``shard_map``
so the communication pattern is explicit, auditable, and independently
benchmarkable.  With P row-tiled over the ``map`` axis (device d owns
``P[rows_d, :]``) and the dense observation model Hᵀ [D, 2M] replicated:

1. ``PHt_local = P_local @ Ht``                    — pure local MXU work;
2. ``S = Σ_d Ht[rows_d]ᵀ @ PHt_local + R``        — **psum**: the
   Schur-complement combine over ICI (each device contributes its row
   block's interaction; 2M×2M ≈ 1 MB);
3. solve + gain: replicated 2M×2M Cholesky, ``Kg_local = PHt_local·S⁻¹``;
4. ``dx = Σ_d Kg_local @ nu`` restricted to local rows — assembled with a
   second **psum** of masked row contributions (D floats);
5. ``P_local −= Kg_local @ PHtᵀ`` — needs PHtᵀ's columns for ALL rows:
   one **all_gather** of PHt over the map axis (D×2M), the only
   volume-bearing collective, riding ICI.

Per-batch communication: O(D·M) bytes regardless of device count — the
EKF analog of sequence-parallel attention's collective footprint.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import EKFParams
from ..models.batched import _innovation_blocks
from ..ops.angles import wrap_to_180
from ..state import FilterState


def build_dense_ht(state: FilterState, zs, slots, Rs, valid,
                   params: EKFParams):
    """Replicated observation-model pieces: dense Ht [D,2M], stacked
    innovation nu [2M], block-diag R [2M,2M] (identity in masked slots)."""
    x = state.x
    D = x.shape[0]
    M = zs.shape[0]
    dt = state.P.dtype

    zhat, A, B = _innovation_blocks(x, slots, params)
    vmask = valid.astype(dt)
    A = A * vmask[:, None, None]
    B = B * vmask[:, None, None]

    nu = zs[:, :2].astype(dt) - zhat
    if not params.ref_compat:
        nu = nu.at[:, 1].set(wrap_to_180(nu[:, 1]))
    nu = (nu * vmask[:, None]).reshape(2 * M)

    cols = 3 + 2 * slots
    midx = jnp.arange(M)
    Ht = jnp.zeros((D, 2 * M), dt)
    Ht = Ht.at[0:3, :].set(A.transpose(2, 0, 1).reshape(3, 2 * M))
    rowpair = cols[:, None] + jnp.arange(2)[None, :]
    colpair = 2 * midx[:, None] + jnp.arange(2)[None, :]
    Ht = Ht.at[rowpair[:, :, None], colpair[:, None, :]].add(
        B.transpose(0, 2, 1))

    Rblk = jnp.zeros((2 * M, 2 * M), dt)
    Rblk = Rblk.at[2 * midx, 2 * midx].set(
        jnp.where(valid, Rs[:, 0, 0].astype(dt), 1.0))
    Rblk = Rblk.at[2 * midx + 1, 2 * midx + 1].set(
        jnp.where(valid, Rs[:, 1, 1].astype(dt), 1.0))
    return Ht, nu, Rblk


def sharded_update_batch(state: FilterState, zs, slots, Rs, valid,
                         params: EKFParams, mesh: Mesh,
                         axis: str = "map") -> FilterState:
    """Distributed joint update with explicit collectives (see module doc).

    ``state.P`` must have D divisible by the mesh's map axis (use
    ``init_state(pad_to_multiple_of=...)``)."""
    Ht, nu, Rblk = build_dense_ht(state, zs, slots, Rs, valid, params)
    D = state.x.shape[0]
    n_dev = mesh.shape[axis]
    rows_per = D // n_dev
    dt = state.P.dtype

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(), P(), P()),
             out_specs=(P(axis, None), P()))
    def upd(P_local, Ht, nu, Rblk):
        d = jax.lax.axis_index(axis)
        r0 = jnp.asarray(d * rows_per, jnp.int32)
        zero = jnp.zeros((), jnp.int32)

        PHt_local = P_local @ Ht                             # [rows,2M]
        # Schur combine: each device contributes its row block
        Ht_rows = jax.lax.dynamic_slice(
            Ht, (r0, zero), (rows_per, Ht.shape[1]))         # [rows,2M]
        S = jax.lax.psum(Ht_rows.T @ PHt_local, axis)        # [2M,2M]
        S = S + Rblk

        chol = jax.scipy.linalg.cho_factor(S, lower=True)
        Kg_local = jax.scipy.linalg.cho_solve(chol, PHt_local.T).T

        # state correction: scatter local row contributions into [D]
        dx_local = Kg_local @ nu                             # [rows]
        dx = jnp.zeros((D,), dt)
        dx = jax.lax.dynamic_update_slice(dx, dx_local, (r0,))
        dx = jax.lax.psum(dx, axis)                          # [D] replicated

        # covariance correction needs PHtᵀ for ALL rows: one all_gather
        PHt_full = jax.lax.all_gather(PHt_local, axis, tiled=True)  # [D,2M]
        P_local = P_local - Kg_local @ PHt_full.T
        return P_local, dx

    P_new, dx = upd(state.P, Ht, nu, Rblk)
    x = state.x + dx
    if params.symmetrize:
        # NOTE: transposing a row-sharded D×D matrix is a full all-to-all
        # outside the audited collective set above — O(D²/n) bytes/device.
        # Prefer params.joseph/srekf for PSD control in sharded runs; this
        # stays for parity with the single-device flag.
        P_new = 0.5 * (P_new + P_new.T)
    return state._replace(x=x, P=P_new)


def measure_batched_shard_map(state: FilterState, obs, u, params: EKFParams,
                              mesh: Mesh, axis: str = "map") -> FilterState:
    """Measurement phase with the explicit-collective joint update.

    Mirrors models/batched.measure_batched (gate against the tick's prior
    state → ONE joint update → sequential masked appends) but routes the
    rank-2M update through ``sharded_update_batch`` so every collective is
    explicit (module doc).  Appends are O(D) dynamic-slice writes left to
    GSPMD.  Selected by ShardedSlamSession(update_path='shard_map')."""
    import jax
    from jax import lax

    from ..models import ekf
    from ..ops.association import gate_batch

    rc0 = jnp.asarray(params.rc[0], params.dtype)
    rc1 = jnp.asarray(params.rc[1], params.dtype)
    zs = jnp.stack([obs.rng, obs.bearing,
                    obs.index.astype(params.dtype)], axis=-1)
    Rs = jax.vmap(lambda z: jnp.diag(
        jnp.stack([z[0] * rc0, z[1] * rc1])))(zs)

    is_new, slots = gate_batch(state, zs, Rs, params)
    first = state.n_active == 0
    is_new = jnp.logical_or(is_new, first)

    upd_valid = obs.valid & ~is_new
    state = sharded_update_batch(state, zs, slots, Rs, upd_valid, params,
                                 mesh, axis=axis)

    def body(ii, s):
        def do(s):
            return ekf.append(s, u, Rs[ii], obs.loc[ii], zs[ii, 2], params)
        return lax.cond(obs.valid[ii] & is_new[ii], do, lambda s: s, s)
    return lax.fori_loop(0, zs.shape[0], body, state)

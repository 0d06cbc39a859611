"""Fault injection + failure detection / recovery.

The reference has no resilience story: its only guards are rosshutdown
before re-init (test_SLAM.m:5) and RANSAC freshness decay (RANSAC.m:321-331)
(SURVEY.md §5).  This module provides both halves of the one the engine
needs:

* **injection** (simulator side): drop whole scans, blank beam spans,
  corrupt odometry ticks — deterministic, key-driven, so failure tests are
  reproducible;
* **detection + recovery** (filter side): a jit-compatible health gate that
  rejects a tick's result if it produced non-finite state or collapsed
  covariance, rolling back to the pre-tick state (the device-side analog of
  restart-from-checkpoint; cross-process recovery composes this with
  utils/checkpointing).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..state import FilterState


# ---------------------------------------------------------------------------
# Injection (host/sim side)
# ---------------------------------------------------------------------------

def drop_scans(ranges: jnp.ndarray, key: jnp.ndarray, p_drop: float
               ) -> jnp.ndarray:
    """Blank entire scans with probability p_drop (NaN = no return,
    matching the sim's no-hit encoding)."""
    T = ranges.shape[0]
    drop = jax.random.bernoulli(key, p_drop, (T,))
    return jnp.where(drop[:, None], jnp.nan, ranges)


def blank_sectors(ranges: jnp.ndarray, key: jnp.ndarray, p_tick: float,
                  sector_frac: float = 0.25) -> jnp.ndarray:
    """Blank a contiguous beam sector (sensor occlusion) on random ticks."""
    T, B = ranges.shape
    k1, k2 = jax.random.split(key)
    hit = jax.random.bernoulli(k1, p_tick, (T,))
    start = jax.random.randint(k2, (T,), 0, B)
    width = int(B * sector_frac)
    idx = jnp.arange(B)[None, :]
    in_sector = ((idx - start[:, None]) % B) < width
    return jnp.where(hit[:, None] & in_sector, jnp.nan, ranges)


def corrupt_odometry(odom: jnp.ndarray, key: jnp.ndarray, p_tick: float,
                     magnitude: float = 5.0) -> jnp.ndarray:
    """Inject gross odometry outliers (wheel slip / encoder glitch)."""
    T = odom.shape[0]
    k1, k2 = jax.random.split(key)
    hit = jax.random.bernoulli(k1, p_tick, (T,))
    noise = jax.random.normal(k2, (T, 3)) * jnp.array(
        [magnitude, magnitude, 90.0])
    return jnp.where(hit[:, None], odom + noise, odom)


# ---------------------------------------------------------------------------
# Detection + rollback (device side)
# ---------------------------------------------------------------------------

class TickVerdict(NamedTuple):
    ok: jnp.ndarray          # bool
    finite: jnp.ndarray      # bool
    diag_ok: jnp.ndarray     # bool  covariance diagonal stayed positive
    jump_ok: jnp.ndarray     # bool  pose step below the plausibility bound


def check_tick(before: FilterState, after: FilterState,
               max_pose_jump: float = 1.0,
               factored: bool = False) -> TickVerdict:
    """Device-side sanity verdict for one tick's filter transition.

    ``factored``: the state's P field holds a Cholesky factor L
    (models/srekf.py) — variances are then the row norms of L (always ≥ 0,
    so the diag check reduces to finiteness of the row norms)."""
    finite = (jnp.all(jnp.isfinite(after.x))
              & jnp.all(jnp.isfinite(after.P)))
    D = after.dim
    idx = jnp.arange(D)
    active_dim = 3 + 2 * after.n_active
    diag = (jnp.sum(after.P * after.P, axis=1) if factored
            else jnp.diagonal(after.P))
    diag_ok = jnp.all(jnp.where(idx < active_dim, diag > -1e-6, True))
    jump = jnp.linalg.norm(after.x[:2] - before.x[:2])
    jump_ok = jump <= max_pose_jump
    return TickVerdict(ok=finite & diag_ok & jump_ok, finite=finite,
                       diag_ok=diag_ok, jump_ok=jump_ok)


def guarded(before: FilterState, after: FilterState,
            max_pose_jump: float = 1.0, factored: bool = False
            ) -> Tuple[FilterState, TickVerdict]:
    """Accept ``after`` only if the tick verdict passes; otherwise roll the
    filter back to ``before`` (the tick is treated as lost input)."""
    v = check_tick(before, after, max_pose_jump, factored=factored)
    out = jax.tree_util.tree_map(
        lambda a, b: jnp.where(v.ok, a, b), after, before)
    return out, v

"""Fixed-capacity observation batch — the filter-facing measurement type.

The reference passes a variable-length ``observed_LL`` matrix of rows
[range, bearing_deg, index] (RANSAC.m:275-284) plus an out-of-band table
lookup for the landmark's world position (EKF_SLAM_UC.m:113,123).  Under jit
both become one padded batch with a validity mask, and the loc ride along so
append never needs a host-side lookup.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class ObsBatch(NamedTuple):
    rng: jnp.ndarray      # f[M]   measured range
    bearing: jnp.ndarray  # f[M]   measured bearing, degrees (wrapTo360 domain)
    index: jnp.ndarray    # i32[M] extractor landmark index (signature)
    loc: jnp.ndarray      # f[M,2] world-frame landmark position (for append)
    valid: jnp.ndarray    # bool[M]
    #: optional per-observation measurement covariance [M,2,2] in
    #: (range m, bearing deg) coordinates, PROPAGATED from the
    #: extractor's line-fit uncertainty (ops/ransac._finalize_wall →
    #: extract): the perpendicular-foot landmark's error is strongly
    #: anisotropic — ~lever_arm x fitted-angle error along the wall
    #: line, ~centimeters across it — which no constant R can model.
    #: Consumed when EKFParams.noise_model='fit' (rc becomes the
    #: additive floor); None otherwise.
    R: jnp.ndarray = None

    @property
    def max_obs(self) -> int:
        return self.rng.shape[0]


def empty_obs(max_obs: int, dtype=jnp.float32) -> ObsBatch:
    return ObsBatch(
        rng=jnp.zeros((max_obs,), dtype),
        bearing=jnp.zeros((max_obs,), dtype),
        index=jnp.zeros((max_obs,), jnp.int32),
        loc=jnp.zeros((max_obs, 2), dtype),
        valid=jnp.zeros((max_obs,), bool),
    )


def obs_from_rows(rows, locs, max_obs: int, dtype=jnp.float32) -> ObsBatch:
    """Build a padded ObsBatch from host-side rows [range, bearing, index]
    and matching world locations (test/simulator convenience)."""
    rows = np.atleast_2d(np.asarray(rows, np.float64))
    locs = np.atleast_2d(np.asarray(locs, np.float64))
    n = 0 if rows.size == 0 else rows.shape[0]
    n = min(n, max_obs)
    out = empty_obs(max_obs, dtype)
    if n == 0:
        return out
    return ObsBatch(
        rng=out.rng.at[:n].set(jnp.asarray(rows[:n, 0], dtype)),
        bearing=out.bearing.at[:n].set(jnp.asarray(rows[:n, 1], dtype)),
        index=out.index.at[:n].set(jnp.asarray(rows[:n, 2], jnp.int32)),
        loc=out.loc.at[:n].set(jnp.asarray(locs[:n], dtype)),
        valid=out.valid.at[:n].set(True),
    )

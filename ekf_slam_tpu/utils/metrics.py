"""Structured per-step metrics and filter-health monitors.

The reference's only observability is live plotting (SURVEY.md §5) — no
timers, counters, or logs.  This module provides:

* device-side per-tick metrics (landmark count, observation count, gate
  accept rate, innovation NIS) computed inside the jitted step,
* host-side JSONL logging,
* covariance health checks (finite, symmetry drift, diagonal positivity) —
  the (I−KH)P form the reference uses (EKF_SLAM_UC.m:146) famously loses
  symmetry/PSD; these monitors quantify that drift.
"""
from __future__ import annotations

import json
import os
import time
from typing import IO, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..state import FilterState


class FilterHealth(NamedTuple):
    finite: jnp.ndarray       # bool  all of x and P finite
    asym: jnp.ndarray         # f     max |P - P^T| over active block
    min_diag: jnp.ndarray     # f     min diag(P) over active dims
    trace: jnp.ndarray        # f     tr(P) over active dims


def filter_health(state: FilterState) -> FilterHealth:
    """Cheap device-side health summary of the covariance."""
    D = state.dim
    idx = jnp.arange(D)
    active_dim = 3 + 2 * state.n_active
    m = (idx < active_dim).astype(state.P.dtype)
    Pm = state.P * m[:, None] * m[None, :]
    asym = jnp.max(jnp.abs(Pm - Pm.T))
    diag = jnp.diagonal(state.P)
    min_diag = jnp.min(jnp.where(idx < active_dim, diag, jnp.inf))
    finite = jnp.all(jnp.isfinite(state.x)) & jnp.all(jnp.isfinite(Pm))
    trace = jnp.sum(jnp.where(idx < active_dim, diag, 0.0))
    return FilterHealth(finite=finite, asym=asym, min_diag=min_diag,
                        trace=trace)


def nis(innovation: jnp.ndarray, phi_inv: jnp.ndarray) -> jnp.ndarray:
    """Normalized innovation squared — consistency statistic (should be
    ~chi^2(2) distributed when the filter is consistent)."""
    return innovation @ phi_inv @ innovation


class MetricsLogger:
    """Append-only JSONL metrics stream (host side)."""

    def __init__(self, path: Optional[str] = None, stream: Optional[IO] = None):
        if stream is None and path:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
        self._fh = stream if stream is not None else (
            open(path, "a") if path else None)
        self._t0 = time.perf_counter()

    def log(self, step: int, **fields) -> dict:
        rec = {"step": int(step),
               "t_wall": round(time.perf_counter() - self._t0, 6)}
        for k, v in fields.items():
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                v = np.asarray(v)
                v = v.item() if v.ndim == 0 else v.tolist()
            rec[k] = v
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh is not None:
            self._fh.close()

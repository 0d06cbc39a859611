"""Measured update-scheduling heuristics: the fast config for a map size.

The joint batched update's cost splits into an irreducible O(D²·M)
correction GEMM, an O(D·M) row gather (pht_mode='rows'), and quadratic
O(M²)-O(M³) innovation terms (S build, Cholesky+inverse, gain GEMM).
Their balance flips with D, and the best (batch, chunks, pht_mode) was
measured on a v5e chip (BASELINE.md round-2 tables):

* small maps (K ≤ ~2k): the solve dominates → dense P·Hᵀ (the row gather
  overhead loses), large batches, chunk-256 scheduling;
* large maps (K > ~2k): the GEMMs dominate → rows-mode P·Hᵀ (symmetry,
  no dense D²·2M GEMM), chunk-512 scheduling (quadratic terms cut G²×
  at constant correction flops).  Measured at 10k: 26.6k → 59.7k
  updates/s f32 (65.3k with bf16 P).

``recommended_schedule`` returns those defaults; bench.py and user code
share it so the tuned configuration is a product feature, not a
benchmark detail.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

from ..config import EKFParams


def recommended_schedule(capacity: int, batch: Optional[int] = None
                         ) -> dict:
    """(batch, update_chunks, pht_mode) measured-fastest for ``capacity``.

    ``batch``: override the observation batch size M; chunks then target
    the measured optimum chunk length (256 small-map / 512 large-map)."""
    if capacity <= 2000:
        m = batch or 2048
        return {"batch": m, "update_chunks": max(1, m // 256),
                "pht_mode": "dense"}
    m = batch or 2048
    return {"batch": m, "update_chunks": max(1, m // 512),
            "pht_mode": "rows"}


def tuned_params(params: EKFParams, batch: Optional[int] = None
                 ) -> EKFParams:
    """``params`` with the measured scheduling knobs applied."""
    s = recommended_schedule(params.capacity, batch)
    return dataclasses.replace(params, update_chunks=s["update_chunks"],
                               pht_mode=s["pht_mode"])

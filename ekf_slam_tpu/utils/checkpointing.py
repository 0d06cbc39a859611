"""Checkpoint / resume for SLAM sessions.

The reference keeps all state in MATLAB workspace objects that die with the
session (SURVEY.md §5).  Here the entire session — filter state, extractor
table, odometry anchor, RNG key — is one pytree (session.SessionCarry), so a
checkpoint is a single orbax save and resume is load-and-continue.  This is
also the substrate for elastic recovery: a restarted host re-joins from the
last snapshot and replays the tail of the stream.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the base image
    _HAS_ORBAX = False


def save_checkpoint(path: str, carry: Any, step: Optional[int] = None
                    ) -> str:
    """Snapshot a session carry; returns the checkpoint directory.

    Stored as an index-keyed flat-leaf dict so restoration order is
    independent of the carry's pytree node types (orbax restores plain
    dicts, which would otherwise reorder NamedTuple fields)."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:08d}")
    leaves = jax.tree_util.tree_leaves(carry)
    flat = {f"leaf_{i:05d}": np.asarray(l) for i, l in enumerate(leaves)}
    ocp.PyTreeCheckpointer().save(path, flat, force=True)
    return path


def load_checkpoint(path: str, template: Any) -> Any:
    """Restore a carry saved by save_checkpoint; ``template`` provides the
    pytree structure (e.g. ``session.init_carry()``)."""
    restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    flat_t, treedef = jax.tree_util.tree_flatten(template)
    flat_r = [restored[k] for k in sorted(restored)]
    if len(flat_r) != len(flat_t):
        raise ValueError(
            f"checkpoint has {len(flat_r)} leaves, template expects "
            f"{len(flat_t)} — incompatible config?")
    leaves = [
        jax.numpy.asarray(r, dtype=t.dtype).reshape(t.shape)
        for r, t in zip(flat_r, flat_t)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_step_dir(root: str) -> Optional[str]:
    """Most recent ``step_*`` checkpoint under root, or None."""
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None

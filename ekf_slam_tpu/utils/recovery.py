"""Elastic recovery: checkpointed sessions that survive being killed.

SURVEY.md §5 prescribes "heartbeat + checkpointed filter state per map
block so a restarted host rejoins from the last keyframe" — the reference
has no resilience story at all (its state dies with the MATLAB workspace,
test_SLAM.m:5).  This module composes the two existing halves into the
demonstrated behavior:

* ``run_with_checkpoints`` advances a session in fused on-device chunks
  and snapshots the FULL session carry (filter + extractor table +
  odometry anchor + RNG key — one pytree) after each chunk, optionally
  dying mid-run (``die_at_tick``) to simulate a host crash;
* ``resume_latest`` is what the restarted host runs: load the newest
  snapshot, replay the input stream from that tick, continue.  Because
  the carry is the session's entire dynamic state and the step is a pure
  function, the resumed trajectory is numerically identical to an
  uninterrupted run — asserted by tests/test_recovery.py.

The same snapshot files also cover cross-host elastic rejoin: a fleet
member's carry slice restores on any host (the carry has no device or
process identity in it).
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from . import checkpointing as ckpt


class HostCrash(RuntimeError):
    """Simulated host death (fault injection for recovery tests)."""


def run_with_checkpoints(session, odom, ranges, beam_angles, ckpt_dir: str,
                         every: int = 25, carry=None,
                         die_at_tick: Optional[int] = None,
                         start_tick: int = 0):
    """Run ``session`` over the stream, checkpointing every ``every`` ticks.

    The stream between checkpoints runs as ONE fused device program
    (session.run), so checkpointing costs one host transfer per ``every``
    ticks, not per tick.  ``die_at_tick`` raises HostCrash after the last
    checkpoint at or below that tick is written — simulating a host that
    dies mid-chunk, losing the un-checkpointed tail.

    Returns (final_carry, pose_history [T,3], next_tick)."""
    odom = jnp.asarray(odom)
    ranges = jnp.asarray(ranges)
    T = odom.shape[0]
    if carry is None:
        carry = session.init_carry(
            first_odom=odom[0] if start_tick == 0 else odom[start_tick - 1],
            n_beams=(ranges.shape[1]
                     if session.control_source in ("icp", "fused")
                     else None))
    if start_tick >= T:        # snapshot already covers the whole stream
        return carry, jnp.zeros((0, 3)), start_tick
    poses = []
    t = start_tick
    while t < T:
        t1 = min(t + every, T)
        if die_at_tick is not None and die_at_tick < t1:
            raise HostCrash(f"simulated crash at tick {die_at_tick} "
                            f"(last checkpoint: {t})")
        carry, outs = session.run(odom[t:t1], ranges[t:t1], beam_angles,
                                  carry=carry)
        poses.append(outs.pose)
        ckpt.save_checkpoint(ckpt_dir, carry, step=t1)
        t = t1
    return carry, jnp.concatenate(poses, axis=0), t


def drive_ticks(session, odom, ranges, beam_angles, ckpt_dir=None,
                every: int = 0, carry=None,
                die_at_tick: Optional[int] = None, start_tick: int = 0):
    """Tick-by-tick driver that is SAFE under ``donate_carry``.

    At the 20k/32k capacity ceiling the session donates its carry to the
    step program — the covariance updates in place and the input carry
    is CONSUMED (session.donate_carry), which is exactly the regime a
    long-running session needs recovery for, and exactly the regime
    where "snapshot whenever convenient" breaks: a consumed carry's
    buffers are gone.  This driver encodes the correct ordering: the
    snapshot (a host copy, checkpointing.save_checkpoint) is taken
    BEFORE the donating step call, so the host copy is independent of
    the buffer the step then consumes.

    Returns (final_carry, pose_history [T-start,3], next_tick);
    checkpoints every ``every`` ticks when ``ckpt_dir`` is given;
    ``die_at_tick`` raises HostCrash before that tick's step runs
    (fault injection — tests/test_recovery.py)."""
    import numpy as np

    odom = jnp.asarray(odom)
    ranges = jnp.asarray(ranges)
    T = odom.shape[0]
    if carry is None:
        carry = session.init_carry(
            first_odom=odom[0] if start_tick == 0 else odom[start_tick - 1],
            n_beams=(ranges.shape[1]
                     if session.control_source in ("icp", "fused")
                     else None))
    poses = []
    for t in range(start_tick, T):
        if ckpt_dir is not None and every and t > start_tick and (
                t % every == 0):
            # host copy FIRST — the step below consumes the carry
            ckpt.save_checkpoint(ckpt_dir, carry, step=t)
        if die_at_tick is not None and t == die_at_tick:
            raise HostCrash(f"simulated crash at tick {t}")
        carry, out = session.step(carry, odom[t], ranges[t], beam_angles)
        poses.append(np.asarray(out.pose))
    if ckpt_dir is not None:
        ckpt.save_checkpoint(ckpt_dir, carry, step=T)
    hist = (jnp.asarray(np.stack(poses)) if poses
            else jnp.zeros((0, 3)))
    return carry, hist, T


def resume_latest_ticks(session, odom, ranges, beam_angles, ckpt_dir: str,
                        every: int = 0) -> Tuple[Any, jnp.ndarray, int]:
    """Restart path for the tick-by-tick (donating) driver: load the
    newest snapshot, continue with drive_ticks."""
    latest = ckpt.latest_step_dir(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    start = int(os.path.basename(latest).split("_")[1])
    template = session.init_carry(
        first_odom=jnp.asarray(odom)[0],
        n_beams=(jnp.asarray(ranges).shape[1]
                 if session.control_source in ("icp", "fused") else None))
    carry = ckpt.load_checkpoint(latest, template)
    final, poses, t = drive_ticks(session, odom, ranges, beam_angles,
                                  ckpt_dir, every=every, carry=carry,
                                  start_tick=start)
    return final, poses, start


def resume_latest(session, odom, ranges, beam_angles, ckpt_dir: str,
                  every: int = 25) -> Tuple[Any, jnp.ndarray, int]:
    """Restart path: load the newest snapshot and replay the tail.

    ``session`` is a FRESH object (the restarted host's process); only the
    checkpoint directory and the replayable input stream carry state
    across the crash.  Returns (final_carry, pose_history_from_resume,
    resumed_from_tick)."""
    latest = ckpt.latest_step_dir(ckpt_dir)
    if latest is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    start = int(os.path.basename(latest).split("_")[1])
    template = session.init_carry(
        first_odom=jnp.asarray(odom)[0],
        n_beams=(jnp.asarray(ranges).shape[1]
                 if session.control_source in ("icp", "fused") else None))
    carry = ckpt.load_checkpoint(latest, template)
    final, poses, t = run_with_checkpoints(
        session, odom, ranges, beam_angles, ckpt_dir, every=every,
        carry=carry, start_tick=start)
    return final, poses, start

"""Round-4 frames/s ablation: where the ~0.24 ms/tick of the full
pipeline goes (the honest value-fetch frames number is ~2.2k frames/s =
~28 ms dispatch floor + T·per-tick-compute; this decomposes the
per-tick compute by running progressively larger prefixes of the tick).

Stages (bench._session_and_traj configuration: 1024 beams, cap 128):
  odom     — control extraction only (scan body overhead floor)
  predict  — + EKF predict
  extract  — + RANSAC extraction (scan→world, wall search, table)
  gate     — + association gate (no covariance update)
  full     — the real tick (predict+extract+measure)

Run:  nohup python -m experiments.chip_r4f > /tmp/chip_r4f.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from ekf_slam_tpu.ops.angles import angdiff_deg
from ekf_slam_tpu.ops.ransac import extract
from ekf_slam_tpu.ops.scan import scan_from_ranges

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "r4_chip.jsonl")


def log(rec):
    rec = dict(rec, t=round(time.time(), 1))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("[chip_r4f]", json.dumps(rec), flush=True)


def _fetch(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf).reshape(-1)[0])


def _time(run, *args, reps=3):
    _fetch(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(np.asarray(ts)))


def main():
    sess, traj, T = bench._session_and_traj()
    ep, rp = sess.ekf_params, sess.ransac_params
    odom = jnp.asarray(traj.odom, jnp.float32)
    rng = jnp.asarray(traj.ranges, jnp.float32)
    beams = jnp.asarray(traj.beam_angles, jnp.float32)
    carry0 = sess.init_carry(first_odom=odom[0])

    from ekf_slam_tpu.models import ekf
    from ekf_slam_tpu.models.batched import measure_batched
    from ekf_slam_tpu.ops.association import gate_batch

    def make_run(level):
        def step(carry, inp):
            o, r = inp
            dD = jnp.sqrt((o[0] - carry.old_odom[0]) ** 2
                          + (o[1] - carry.old_odom[1]) ** 2)
            dTh = angdiff_deg(carry.old_odom[2], o[2])
            u = jnp.stack([dD, dTh]).astype(ep.dtype)
            filt, table, key = carry.filt, carry.table, carry.key
            aux = u[0]            # per-level consumer so nothing is DCE'd
            if level >= 1:
                filt = ekf.predict(filt, u, ep)
            if level >= 2:
                key, sub = jax.random.split(key)
                scan = scan_from_ranges(r, beams)
                obs, table = extract(table, scan, filt.x, filt.n_active,
                                     sub, rp, ep.max_obs)
            if level >= 3:
                rc0 = jnp.asarray(ep.rc[0], ep.dtype)
                rc1 = jnp.asarray(ep.rc[1], ep.dtype)
                zs = jnp.stack([obs.rng, obs.bearing,
                                obs.index.astype(ep.dtype)], axis=-1)
                Rs = jax.vmap(lambda z: jnp.diag(
                    jnp.stack([z[0] * rc0, z[1] * rc1])))(zs)
                is_new, slots = gate_batch(filt, zs, Rs, ep)
                # materialized scan output so the gate isn't DCE'd
                aux = aux + jnp.sum(slots).astype(ep.dtype)
            if level >= 4:
                filt = measure_batched(filt, obs, u, ep)
            return (carry._replace(filt=filt, table=table, key=key,
                                   old_odom=o.astype(ep.dtype)),
                    (filt.x[0], aux))

        return jax.jit(lambda c: jax.lax.scan(step, c, (odom, rng)))

    names = ["odom", "predict", "extract", "gate", "full"]
    prev = 0.0
    for lv, name in enumerate(names):
        dt = _time(make_run(lv), carry0)
        log({"stage": "F", "level": name, "T": T,
             "ms_total": round(dt * 1e3, 2),
             "ms_per_tick": round(dt / T * 1e3, 4),
             "ms_per_tick_delta": round((dt - prev) / T * 1e3, 4)})
        prev = dt


if __name__ == "__main__":
    main()

"""Benchmark: EKF measurement-update throughput per chip.

Metric (BASELINE.json): updates/sec/chip at 1k (and optionally 10k)
landmarks — one "update" = ML data association (gate over all K landmarks,
Correspondence.m:49-87 equivalent) + a Kalman update against the joint
(3+2K)-dim covariance (EKF_SLAM_UC.m:125-146 equivalent).

Two scheduling modes are timed:
  * sequential — the reference's per-observation chain (one pass over P
    per observation), bit-parity semantics;
  * batched    — the joint rank-2M innovation update (models/batched.py),
    one pass over P per BATCH of observations: the TPU fast path and the
    headline number.

vs_baseline = TPU updates/sec over the NumPy oracle's updates/sec on this
host; the oracle performs the reference's dense per-landmark-loop algebra
(the reference itself publishes no numbers, SURVEY.md §6; north star is
>=10x per chip).

Prints ONE JSON line to stdout; details go to stderr.
Env: BENCH_K (default 1000), BENCH_BATCH (default 512), BENCH_FRAMES=1,
BENCH_COV_DTYPE=bf16 (bf16 covariance storage, f32 compute — halves the
P-streaming HBM bytes that bound throughput at 10k landmarks).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched, ekf
from ekf_slam_tpu.ops.association import gate
from ekf_slam_tpu.oracle.np_ekf import NumpyEKFSLAM
from ekf_slam_tpu.state import FilterState, init_state

K = int(os.environ.get("BENCH_K", "1000"))
BATCH = int(os.environ.get("BENCH_BATCH", "1024" if K <= 2000 else "512"))
# sequential update chunks per batch (gate once, update in G chunks of
# ~256 observations each): the (2M)^3 innovation solve dominates at small
# D, where chunk-256 scheduling measures ~3x over the single joint
# rank-2M update (experiments/prof_gate3.py); at 10k the extra P passes
# cost more than the solve saves, so the default stays joint.
CHUNKS = int(os.environ.get(
    "BENCH_CHUNKS", str(max(1, BATCH // 256)) if K <= 2000 else "1"))
COV_DTYPE = (jnp.bfloat16 if os.environ.get("BENCH_COV_DTYPE") == "bf16"
             else None)
N_SEQ = 256       # sequential updates per timed run (amortizes the floor)
# batched runs per timed run.  The axon tunnel costs ~25-31 ms of FIXED
# per-program-call dispatch latency regardless of program size (measured
# on a bare `v+1` program, experiments/prof_floor4.py), so the scan must
# be long enough to amortize it; at 10k landmarks each batch is ~14 ms
# (floor negligible) and a 32-iteration program has been seen to wedge
# the remote compiler.
N_BATCHES = 256 if K <= 2000 else 8
N_ORACLE = 2      # oracle updates to time (each is seconds at 1k)


def make_full_state(params: EKFParams, seed=0) -> FilterState:
    """State with all K slots active and a well-conditioned dense P.

    Built on-device (P is 1.6 GB at 10k landmarks — too big to stage as a
    host f64 array)."""
    rng = np.random.default_rng(seed)
    st = init_state(params)
    D = st.dim
    lm = rng.uniform(-40, 40, (K, 2))
    x = np.zeros(D, np.float64)
    x[3:3 + 2 * K] = lm.reshape(-1)

    @jax.jit
    def build_P(key):
        A = jax.random.normal(key, (D, 8), params.dtype) / jnp.sqrt(
            jnp.asarray(D, params.dtype))
        return (0.05 * jnp.eye(D, dtype=params.dtype)
                + 0.02 * (A @ A.T)).astype(params.cov_dt)

    return FilterState(
        x=jnp.asarray(x, params.dtype),
        P=build_P(jax.random.PRNGKey(seed)),
        sig=jnp.arange(1, K + 1, dtype=params.dtype),
        active=jnp.ones((K,), bool),
        n_active=jnp.asarray(K, jnp.int32),
    )


def make_measurements(state: FilterState, n: int, seed=1):
    """n observations, each the exact predicted measurement of a random
    landmark (so the ML gate associates and the update path runs)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(state.x, np.float64)
    idx = rng.integers(0, K, n)
    lm = x[3:3 + 2 * K].reshape(K, 2)[idx]
    delta = lm - x[:2]
    r = np.hypot(delta[:, 0], delta[:, 1])
    b = np.mod(np.rad2deg(np.arctan2(delta[:, 1], delta[:, 0])) - x[2], 360.0)
    return np.stack([r, b, (idx + 1).astype(np.float64)], axis=-1)


def _time(run, *args):
    out = run(*args)                      # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def sequential_updates_per_sec(params: EKFParams) -> float:
    state = make_full_state(params)
    zs = jnp.asarray(make_measurements(state, N_SEQ), params.dtype)
    rc0, rc1 = params.rc

    def one_update(st, z):
        R2 = jnp.diag(jnp.stack([z[0] * rc0, z[1] * rc1])).astype(
            params.dtype)
        is_new, slot, _ = gate(st, z, R2, params)
        return ekf.update(st, z, slot, R2, params), None

    run = jax.jit(lambda st, zs: jax.lax.scan(one_update, st, zs)[0])
    return N_SEQ / _time(run, state, zs)


def batched_updates_per_sec(params: EKFParams) -> float:
    state = make_full_state(params)
    zs_all = jnp.asarray(
        make_measurements(state, N_BATCHES * BATCH).reshape(
            N_BATCHES, BATCH, 3), params.dtype)
    rc0, rc1 = params.rc

    from ekf_slam_tpu.ops.association import gate_batch

    def one_batch(st, zs):
        Rs = jax.vmap(lambda z: jnp.diag(
            jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(params.dtype)
        is_new, slots = gate_batch(st, zs, Rs, params)
        valid = ~is_new
        return batched.update_chunked(st, zs, slots, Rs, valid,
                                      params), None

    run = jax.jit(lambda st, zb: jax.lax.scan(one_batch, st, zb)[0])
    return (N_BATCHES * BATCH) / _time(run, state, zs_all)


def oracle_updates_per_sec() -> float:
    """Dense-oracle throughput.  Above 2k landmarks the oracle is measured
    at 1k and scaled by its asymptotic cost (N·D² association + D³ update —
    running it directly would take hours per observation)."""
    if K > 2000:
        base = _oracle_at(1000)
        scale = ((K * (3 + 2 * K) ** 2 + (3 + 2 * K) ** 3)
                 / (1000 * 2003 ** 2 + 2003 ** 3))
        print(f"[bench] oracle extrapolated from 1k by 1/{scale:.0f}",
              file=sys.stderr)
        return base / scale
    return _oracle_at(K)


def _oracle_at(k: int) -> float:
    rng = np.random.default_rng(0)
    oracle = NumpyEKFSLAM(association="ml", s_cost=1e6, s_thresh=1e12)
    lm = rng.uniform(-40, 40, (k, 2))
    oracle.x = np.zeros(3 + 2 * k)
    oracle.x[3:] = lm.reshape(-1)
    D = len(oracle.x)
    A = rng.normal(0, 1, (D, 8)) / np.sqrt(D)
    oracle.P = 0.05 * np.eye(D) + 0.02 * (A @ A.T)
    oracle.s = np.arange(1, k + 1, dtype=float)

    idx = rng.integers(0, k, N_ORACLE)
    delta = lm[idx] - oracle.x[:2]
    r = np.hypot(delta[:, 0], delta[:, 1])
    b = np.mod(np.rad2deg(np.arctan2(delta[:, 1], delta[:, 0]))
               - oracle.x[2], 360.0)
    zs = np.stack([r, b, (idx + 1).astype(float)], axis=-1)

    t0 = time.perf_counter()
    for z in zs:
        R = np.diag([z[0] * 0.1, z[1] * 5.0])
        is_new, k = oracle.correspond(z, R)
        oracle.update(z, k if not is_new else int(z[2]) - 1, R)
    dt = time.perf_counter() - t0
    return N_ORACLE / dt


def frames_per_sec() -> float:
    """Full-pipeline session throughput: odometry → predict → RANSAC →
    gate → update, T ticks fused in one lax.scan (the runSlam tick,
    SLAM.m:70-144)."""
    from ekf_slam_tpu.config import RansacParams
    from ekf_slam_tpu.session import SlamSession
    from ekf_slam_tpu.sim import world as W
    from ekf_slam_tpu.config import SimConfig

    T = 128
    cfg = SimConfig(n_beams=1024, max_range=12.0)
    room = W.rectangle_room(4.0, 3.0)
    traj = W.simulate(room, W.circle_controls(T, 0.05, 3.0), cfg,
                      jax.random.PRNGKey(0))
    sess = SlamSession(
        ekf_params=EKFParams(capacity=128, max_obs=8, ref_compat=False,
                             update_mode="batched", dtype=jnp.float32),
        ransac_params=RansacParams(
            line_consensus=60, bearing_window_deg=15.0,
            wall_search_timeout=4, table_capacity=64, promote_count=5,
            ref_compat=False, n_hypotheses=64, dtype=jnp.float32),
        seed=1)
    odom = jnp.asarray(traj.odom, jnp.float32)
    rng = jnp.asarray(traj.ranges, jnp.float32)
    beams = jnp.asarray(traj.beam_angles, jnp.float32)
    carry = sess.init_carry(first_odom=odom[0])
    dt = _time(lambda: sess._run(carry, odom, rng, beams))
    return T / dt


def main():
    params = EKFParams(capacity=K, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False, dtype=jnp.float32,
                       cov_dtype=COV_DTYPE, update_chunks=CHUNKS)
    plat = jax.devices()[0].platform
    if os.environ.get("BENCH_FRAMES") == "1":
        fps = frames_per_sec()
        print(f"[bench] session frames/s (full pipeline, 1024 beams, "
              f"cap 128): {fps:.1f}", file=sys.stderr)
    bat = batched_updates_per_sec(params)
    print(f"[bench] batched (M={BATCH}): {bat:.1f} updates/s @ {K} "
          f"landmarks ({plat})", file=sys.stderr)
    seq = sequential_updates_per_sec(params)
    print(f"[bench] sequential: {seq:.1f} updates/s", file=sys.stderr)
    orc = oracle_updates_per_sec()
    print(f"[bench] numpy oracle: {orc:.3f} updates/s", file=sys.stderr)
    best = max(bat, seq)
    print(json.dumps({
        "metric": f"ekf_updates_per_sec_chip_{K}_landmarks",
        "value": round(best, 2),
        "unit": "updates/s",
        "vs_baseline": round(best / orc, 2),
    }))


if __name__ == "__main__":
    main()

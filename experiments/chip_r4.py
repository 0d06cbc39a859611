"""Round-4 chip measurements (v5e via the axon tunnel).

Stages (independent; results append to experiments/results/r4_chip.jsonl):

  C  chol_blocked vs XLA's jnp.linalg.cholesky at D=20480 f32 — the
     factorization wall (248 ms measured in round 3) that priced the
     triangular square-root option out of the 10k regime.
  P  strict-triangular SR update at 10k: gate + chunked Andrews +
     per-batch blocked re-triangularization (sr_update_panel), vs the
     amortized general-factor srekf_fast chain re-measured in the same
     invocation — the round-3 verdict's top item.
  R  sr_recompress A/B: blocked-chol route vs the old XLA-chol route.

Timing discipline: median of reps with a forced VALUE FETCH per rep
(block_until_ready returns early for scan programs on this tunnel —
BASELINE.md round-4 corrections); loop bodies vary per iteration so XLA
cannot fold the work.

Run:  nohup python -m experiments.chip_r4 > /tmp/chip_r4.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models.srekf import factor_from_state, sr_strips
from ekf_slam_tpu.models.srekf_fast import (sr_recompress,
                                            sr_update_chunked,
                                            sr_update_panel)
from ekf_slam_tpu.ops.association import gate_batch
from ekf_slam_tpu.ops.blocked_chol import chol_blocked

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "r4_chip.jsonl")


def log(rec):
    rec = dict(rec, t=round(time.time(), 1))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("[chip_r4]", json.dumps(rec), flush=True)


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


# ---------------------------------------------------------------------------
# Stage C: the Cholesky wall
# ---------------------------------------------------------------------------

def stage_c(D=20480, n_it=8):
    rng = np.random.default_rng(0)
    A_np = rng.normal(size=(D, 64)).astype(np.float32) / np.sqrt(D)
    A = jnp.asarray(A_np)
    spd = jax.jit(lambda a: 0.05 * jnp.eye(D, dtype=jnp.float32)
                  + a @ a.T)(A)
    jax.block_until_ready(spd)
    scales = jnp.linspace(1.0, 1.0 + 1e-6, n_it, dtype=jnp.float32)

    for name, chol in (("xla", jnp.linalg.cholesky),
                       ("blocked_512", lambda a: chol_blocked(a, 512)),
                       ("blocked_1024", lambda a: chol_blocked(a, 1024)),
                       ("blocked_2048", lambda a: chol_blocked(a, 2048))):
        @jax.jit
        def run(P, scales):
            def body(c, s):
                L = chol(P * s)
                return c + L[0, 0], None
            return jax.lax.scan(body, jnp.float32(0), scales)[0]
        try:
            dt = _time(run, spd, scales) / n_it
            log({"stage": "C", "impl": name, "D": D,
                 "seconds_per_chol": round(dt, 4),
                 "gemm_tflops_eff": round(D ** 3 / 3 / dt / 1e12, 1)})
        except Exception as e:  # tunnel compiles can die ugly
            log({"stage": "C", "impl": name, "error": repr(e)[:300]})


# ---------------------------------------------------------------------------
# Stage P: strict-triangular update at 10k
# ---------------------------------------------------------------------------

def make_sr_state(params, K, buf=64, pad_to=512):
    """Factor state with noise-buffer columns, total dim padded to the
    SYRK tile so the half-flop Gram kernel engages in sr_recompress."""
    st = bench.make_full_state(params, K)
    D = st.dim
    Dt = -(-(D + buf) // pad_to) * pad_to
    x = jnp.zeros((Dt,), st.x.dtype).at[:D].set(st.x)
    P = jnp.zeros((Dt, Dt), st.P.dtype).at[:D, :D].set(st.P)
    return factor_from_state(st._replace(x=x, P=P))


def stage_p(K=10000, schedules=((2048, 4), (4096, 8))):
    params0 = EKFParams(capacity=K, association="ml", s_cost=1e6,
                        s_thresh=1e12, ref_compat=False,
                        update_mode="srekf_fast", dtype=jnp.float32)
    state = make_sr_state(params0, K)
    jax.block_until_ready(state.P)
    log({"stage": "P", "note": "sr state built", "dim": state.dim})

    rc0, rc1 = params0.rc
    for mode, upd in (("panel_triangular", sr_update_panel),
                      ("srekf_fast", sr_update_chunked)):
        for M, G in schedules:
            params = dataclasses.replace(params0, update_chunks=G)
            n_batches = 4 if mode == "panel_triangular" else 8
            zs_all = jnp.asarray(
                bench.make_measurements(state, K, n_batches * M).reshape(
                    n_batches, M, 3), params.dtype)

            def one_batch(st, zs):
                Rs = jax.vmap(lambda z: jnp.diag(
                    jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(
                        params.dtype)
                strips = sr_strips(st.P, K, triangular=False)
                is_new, slots = gate_batch(st, zs, Rs, params,
                                           strips=strips)
                return upd(st, zs, slots, Rs, ~is_new, params), None

            run = jax.jit(
                lambda st, zb: jax.lax.scan(one_batch, st, zb)[0])
            try:
                dt = _time(run, state, zs_all, reps=2)
                log({"stage": "P", "mode": mode, "K": K, "M": M, "G": G,
                     "updates_per_sec": round(n_batches * M / dt, 1),
                     "sec_per_batch": round(dt / n_batches, 4)})
            except Exception as e:
                log({"stage": "P", "mode": mode, "M": M, "G": G,
                     "error": repr(e)[:300]})


# ---------------------------------------------------------------------------
# Stage R: recompress A/B (blocked vs XLA chol route)
# ---------------------------------------------------------------------------

def stage_r(K=10000):
    params = EKFParams(capacity=K, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False,
                       update_mode="srekf_fast", dtype=jnp.float32)
    state = make_sr_state(params, K)
    jax.block_until_ready(state.P)

    t_new = _time(jax.jit(sr_recompress), state)
    log({"stage": "R", "impl": "blocked", "K": K,
         "seconds": round(t_new, 3),
         "amortized_ms_per_tick_buf64": round(1e3 * t_new / 64, 2)})

    D = state.P.shape[0]

    @jax.jit
    def old_route(st):
        P = st.P @ st.P.T
        act = jnp.arange(D) < 3 + 2 * st.n_active
        aug = jnp.where(act, 0.0, 1.0).astype(P.dtype)
        L = jnp.linalg.cholesky(P + jnp.diag(aug))
        return st._replace(P=L * act[:, None].astype(P.dtype))

    t_old = _time(old_route, state)
    log({"stage": "R", "impl": "xla", "K": K, "seconds": round(t_old, 3),
         "speedup": round(t_old / t_new, 2)})


def stage_g(D=20480, R=None, n_it=8):
    """Isolated Gram: matmul S·Sᵀ vs the half-flop mirror kernel."""
    from ekf_slam_tpu.ops.pallas.kernels import syrk_gram_pallas, syrk_gram_ref
    R = D if R is None else R
    rng = np.random.default_rng(1)
    S = jnp.asarray(rng.normal(size=(D, R)).astype(np.float32))
    scales = jnp.linspace(1.0, 1.0 + 1e-6, n_it, dtype=jnp.float32)
    for name, gram in (("matmul", syrk_gram_ref),
                       ("mirror_512", lambda s: syrk_gram_pallas(s, 512))):
        @jax.jit
        def run(S, scales):
            def body(c, sc):
                G = gram(S * sc)
                # consume the WHOLE Gram: a single-element consumer lets
                # XLA DCE everything but one row-dot (first measurement
                # read 4400 "TFLOPS")
                return c + jnp.sum(G), None
            return jax.lax.scan(body, jnp.float32(0), scales)[0]
        try:
            dt = _time(run, S, scales) / n_it
            log({"stage": "G", "impl": name, "D": D, "R": R,
                 "seconds_per_gram": round(dt, 4),
                 "tflops_eff_dense": round(2 * D * D * R / dt / 1e12, 1)})
        except Exception as e:
            log({"stage": "G", "impl": name, "error": repr(e)[:300]})


def stage_w(D=20480, R=1024, n_it=16):
    """Isolated w_resident SYRK A/B at the promoted chunk rank (bf16):
    whole-W pinned in VMEM vs per-step W-tile DMA."""
    from ekf_slam_tpu.ops.pallas.kernels import syrk_downdate_pallas
    rng = np.random.default_rng(2)
    P = jnp.asarray((0.05 * np.eye(D)).astype(np.float32),
                    jnp.bfloat16)
    W = jnp.asarray(rng.normal(size=(D, R)).astype(np.float32) * 0.01,
                    jnp.bfloat16)
    scales = jnp.linspace(1.0, 1.0 + 1e-3, n_it, dtype=jnp.bfloat16)
    for name, wres in (("blocked", False), ("w_resident", True)):
        @jax.jit
        def run(P, W, scales):
            def body(c, sc):
                out = syrk_downdate_pallas(P, W * sc, tile=512,
                                           w_resident=wres)
                return c + out[0, 0].astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0), scales)[0]
        try:
            dt = _time(run, P, W, scales) / n_it
            log({"stage": "W", "impl": name, "D": D, "R": R,
                 "ms_per_downdate": round(dt * 1e3, 2)})
        except Exception as e:
            log({"stage": "W", "impl": name, "error": repr(e)[:300]})


def stage_v(capacity=1024, T=64):
    """Re-measure round-3 stage C (sharded-session n=1 overhead) with
    FETCH-based timing — the original used block_until_ready, which the
    round-4 corrections showed can return early for scan programs, so
    the ±1-2% overhead claims in SCALING.md §3 need re-validation."""
    from ekf_slam_tpu.config import RansacParams, SimConfig
    from ekf_slam_tpu.parallel.mesh import make_mesh
    from ekf_slam_tpu.parallel.sharded import ShardedSlamSession
    from ekf_slam_tpu.session import SlamSession
    from ekf_slam_tpu.sim import world as W

    cfg = SimConfig(n_beams=720, max_range=12.0)
    room = W.rectangle_room(4.0, 3.0)
    traj = W.simulate(room, W.circle_controls(T, 0.05, 3.0), cfg,
                      jax.random.PRNGKey(0))
    ep = EKFParams(capacity=capacity, max_obs=8, ref_compat=False,
                   update_mode="batched", dtype=jnp.float32)
    rp = RansacParams(line_consensus=60, bearing_window_deg=15.0,
                      wall_search_timeout=4, table_capacity=64,
                      promote_count=5, ref_compat=False, n_hypotheses=64,
                      dtype=jnp.float32)
    odom = jnp.asarray(traj.odom, jnp.float32)
    rng_r = jnp.asarray(traj.ranges, jnp.float32)
    beams = jnp.asarray(traj.beam_angles, jnp.float32)

    base = SlamSession(ekf_params=ep, ransac_params=rp, seed=1)
    carry = base.init_carry(first_odom=odom[0])
    dt0 = _time(lambda: base._run(carry, odom, rng_r, beams))
    log({"stage": "V", "config": f"unsharded cap{capacity}",
         "frames_per_sec": round(T / dt0, 1),
         "ms_per_tick": round(dt0 / T * 1e3, 3)})

    mesh = make_mesh(n_map=1)
    for path in ("gspmd", "shard_map"):
        sh = ShardedSlamSession(mesh=mesh, ekf_params=ep,
                                ransac_params=rp, seed=1,
                                update_path=path)
        sc = sh.init_carry(first_odom=odom[0])
        dt1 = _time(lambda: sh._run(sc, odom, rng_r, beams))
        log({"stage": "V", "config": f"sharded n=1 {path}",
             "frames_per_sec": round(T / dt1, 1),
             "overhead_vs_unsharded_pct": round(
                 100 * (dt1 / dt0 - 1), 1)})


if __name__ == "__main__":
    import sys
    stages = sys.argv[1] if len(sys.argv) > 1 else "CRP"
    if "C" in stages:
        stage_c()
    if "G" in stages:
        stage_g()
    if "R" in stages:
        stage_r()
    if "P" in stages:
        stage_p()
    if "W" in stages:
        stage_w()
    if "V" in stages:
        stage_v()

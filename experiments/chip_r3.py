"""Round-3 chip measurements (v5e via the axon tunnel).

Stages (each independent, results appended to
experiments/results/r3_chip.jsonl as they land — tunnel runs die ugly):

  A  srekf_fast at 10k landmarks: gate + chunked Andrews update loop,
     several (M, G) schedules + the recompress/predict amortization —
     the round-2 verdict's top item (a USABLE square-root filter at the
     north-star scale; the QR path measured 53 updates/s).
  C  sharded-session overhead on the real chip at n=1 (mesh machinery,
     masked_writes, sharding constraints — no collectives at n=1):
     unsharded vs gspmd vs shard_map, frames-style fused scan.

Run:  nohup python -m experiments.chip_r3 > /tmp/chip_r3.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from ekf_slam_tpu.config import EKFParams, RansacParams, SimConfig
from ekf_slam_tpu.models.srekf import factor_from_state, sr_strips
from ekf_slam_tpu.models.srekf_fast import sr_recompress, sr_update_chunked
from ekf_slam_tpu.ops.association import gate_batch

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "r3_chip.jsonl")


def log(rec):
    rec = dict(rec, t=round(time.time(), 1))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("[chip_r3]", json.dumps(rec), flush=True)


def _time(run, *args, reps=2):
    out = run(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# Stage A: srekf_fast at 10k
# ---------------------------------------------------------------------------

def make_sr_state(params, K, buf=64):
    st = bench.make_full_state(params, K)
    D = st.dim
    x = jnp.zeros((D + buf,), st.x.dtype).at[:D].set(st.x)
    P = jnp.zeros((D + buf, D + buf), st.P.dtype).at[:D, :D].set(st.P)
    return factor_from_state(st._replace(x=x, P=P))


def stage_a(K=10000, schedules=((1024, 2), (2048, 4), (4096, 8))):
    params0 = EKFParams(capacity=K, association="ml", s_cost=1e6,
                        s_thresh=1e12, ref_compat=False,
                        update_mode="srekf_fast", dtype=jnp.float32)
    state = make_sr_state(params0, K)
    jax.block_until_ready(state.P)
    log({"stage": "A", "note": "sr state built", "dim": state.dim})

    rc0, rc1 = params0.rc
    for M, G in schedules:
        params = dataclasses.replace(params0, update_chunks=G)
        n_batches = 8
        zs_all = jnp.asarray(
            bench.make_measurements(state, K, n_batches * M).reshape(
                n_batches, M, 3), params.dtype)

        def one_batch(st, zs):
            Rs = jax.vmap(lambda z: jnp.diag(
                jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(
                    params.dtype)
            strips = sr_strips(st.P, K, triangular=False)
            is_new, slots = gate_batch(st, zs, Rs, params, strips=strips)
            return sr_update_chunked(st, zs, slots, Rs, ~is_new,
                                     params), None

        run = jax.jit(lambda st, zb: jax.lax.scan(one_batch, st, zb)[0])
        dt = _time(run, state, zs_all)
        ups = n_batches * M / dt
        log({"stage": "A", "mode": "srekf_fast", "K": K, "M": M, "G": G,
             "updates_per_sec": round(ups, 1),
             "sec_per_batch": round(dt / n_batches, 4)})

    # recompress + predict amortization: one recompress per
    # sr_noise_buffer(=64) ticks
    rec = jax.jit(sr_recompress)
    t_rec = _time(rec, state)
    log({"stage": "A", "op": "sr_recompress", "K": K,
         "seconds": round(t_rec, 3),
         "amortized_ms_per_tick_buf64": round(1e3 * t_rec / 64, 2)})


# ---------------------------------------------------------------------------
# Stage C: sharded session overhead at n=1 on the chip
# ---------------------------------------------------------------------------

def stage_c(capacity=1024, T=64):
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
    rng = jnp.asarray(traj.ranges, jnp.float32)
    beams = jnp.asarray(traj.beam_angles, jnp.float32)

    base = SlamSession(ekf_params=ep, ransac_params=rp, seed=1)
    carry = base.init_carry(first_odom=odom[0])
    dt0 = _time(lambda: base._run(carry, odom, rng, beams))
    log({"stage": "C", "config": f"unsharded cap{capacity}",
         "frames_per_sec": round(T / dt0, 1)})

    mesh = make_mesh(n_map=1)
    for path in ("gspmd", "shard_map"):
        sh = ShardedSlamSession(mesh=mesh, ekf_params=ep,
                                ransac_params=rp, seed=1,
                                update_path=path)
        sc = sh.init_carry(first_odom=odom[0])
        dt1 = _time(lambda: sh._run(sc, odom, rng, beams))
        log({"stage": "C", "config": f"sharded n=1 {path} cap{capacity}",
             "frames_per_sec": round(T / dt1, 1),
             "overhead_vs_unsharded_pct": round(100 * (dt1 / dt0 - 1), 1)})


# ---------------------------------------------------------------------------
# Stage D: 10k rows-mode roofline decomposition (what the remaining
# 34.3−27 ms of non-correction time is spent on, VERDICT item 5)
# ---------------------------------------------------------------------------

def stage_d(K=10000, M=2048, G=4, cov="f32"):
    from ekf_slam_tpu.models.batched import hp_from_rows

    params = EKFParams(
        capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
        ref_compat=False, dtype=jnp.float32, pht_mode="rows",
        update_chunks=G,
        cov_dtype=jnp.bfloat16 if cov == "bf16" else None)
    state = bench.make_full_state(params, K)
    zs = jnp.asarray(bench.make_measurements(state, K, M), params.dtype)
    rc0, rc1 = params.rc
    Rs = jax.vmap(lambda z: jnp.diag(
        jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(params.dtype)
    m = M // G
    slots = jnp.clip(zs[:m, 2].astype(jnp.int32) - 1, 0, K - 1)
    valid = jnp.ones((m,), bool)
    ct = params.dtype
    N_IT = 16   # iterate each component inside one program (floor amortize)

    def timed_loop(name, body):
        # vary the operand through the loop so XLA cannot hoist the work
        def run(st):
            def it(c, _):
                return body(c), None
            return jax.lax.scan(it, st, None, length=N_IT)[0]
        f = jax.jit(run)
        dt = _time(f, state) / N_IT
        log({"stage": "D", "cov": cov, "K": K, "m_chunk": m,
             "component": name, "ms": round(1e3 * dt, 3)})
        return dt

    # (1) row gather alone: take 2m rows of P
    rows = 3 + 2 * slots
    rp = (rows[:, None] + jnp.arange(2)[None, :]).reshape(-1)

    def take_only(st):
        g = jnp.take(st.P, rp, axis=0).astype(ct)
        return st._replace(x=st.x.at[0].add(jnp.sum(g[0, :3]) * 1e-20))
    timed_loop("row_gather_take", take_only)

    # (2) HP build (gather + jacobian einsums + Ht scatter)
    def hp_build(st):
        HP, Ht, nu = hp_from_rows(st.P, st.x, zs[:m], slots, valid,
                                  params, ct)
        return st._replace(x=st.x.at[0].add(jnp.sum(HP[0, :3]) * 1e-20))
    timed_loop("hp_from_rows", hp_build)

    # (3) gate (strips + [M,K] costs) at full M
    def gate_only(st):
        is_new, sl = gate_batch(st, zs, Rs, params)
        return st._replace(x=st.x.at[0].add(jnp.sum(sl) * 1e-20))
    timed_loop("gate_full_batch", gate_only)

    # (4) one full chunk update (the whole chain at chunk size m)
    from ekf_slam_tpu.models.batched import update_batch

    def chunk_update(st):
        return update_batch(st, zs[:m], slots, Rs[:m], valid, params)
    t_chunk = timed_loop("chunk_update_full", chunk_update)

    # (5) correction GEMM alone at chunk size (the irreducible floor):
    # P - Kg @ HP with fixed [D,2m]/[2m,D] operands derived from P rows
    def corr_only(st):
        P = st.P
        Kg = jnp.take(P, rp, axis=0).astype(ct).T        # [D,2m] proxy
        HP = jnp.take(P, rp + 1, axis=0).astype(ct)      # [2m,D] proxy
        if P.dtype == jnp.bfloat16:
            upd = jnp.matmul(Kg.astype(jnp.bfloat16),
                             HP.astype(jnp.bfloat16),
                             preferred_element_type=ct)
        else:
            upd = Kg @ HP
        return st._replace(P=(P - upd).astype(P.dtype))
    t_corr = timed_loop("correction_gemm_only", corr_only)
    log({"stage": "D", "cov": cov, "K": K, "m_chunk": m,
         "component": "non_correction_overhead",
         "ms": round(1e3 * (t_chunk - t_corr), 3)})


# ---------------------------------------------------------------------------
# Stage H: beyond the 10k north star — single-chip capacity ceiling
# (20k/32k landmarks, bf16 P) + srekf_fast at 1k
# ---------------------------------------------------------------------------

def stage_h():
    from ekf_slam_tpu.models.batched import update_chunked

    # capacity scaling: the reference's rank-growing dense filter cannot
    # reach these at ANY speed; one v5e chip holds P up to ~32k bf16
    for K, M, G in ((20000, 4096, 8), (32000, 4096, 8)):
        try:
            params = EKFParams(
                capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
                ref_compat=False, dtype=jnp.float32, pht_mode="rows",
                update_chunks=G, cov_dtype=jnp.bfloat16)
            state = bench.make_full_state(params, K)
            jax.block_until_ready(state.P)
            rc0, rc1 = params.rc
            n_batches = 4
            zs_all = jnp.asarray(bench.make_measurements(
                state, K, n_batches * M).reshape(n_batches, M, 3),
                params.dtype)

            def one_batch(st, zsb):
                Rs = jax.vmap(lambda z: jnp.diag(
                    jnp.stack([z[0] * rc0, z[1] * rc1])))(zsb).astype(
                        params.dtype)
                is_new, sl = gate_batch(st, zsb, Rs, params)
                return update_chunked(st, zsb, sl, Rs, ~is_new,
                                      params), None

            run = jax.jit(lambda st, zb: jax.lax.scan(one_batch,
                                                      st, zb)[0])
            dt = _time(run, state, zs_all)
            log({"stage": "H", "K": K, "M": M, "G": G, "cov": "bf16",
                 "P_gb": round((3 + 2 * K) ** 2 * 2 / 1e9, 1),
                 "updates_per_sec": round(n_batches * M / dt, 1)})
            del state, zs_all
        except Exception as e:
            log({"stage": "H", "K": K, "error": repr(e)[:300]})

    # srekf_fast at 1k (the QR srekf measured 26.5k at M=256)
    try:
        K, M, G = 1000, 2048, 8
        params = EKFParams(
            capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
            ref_compat=False, update_mode="srekf_fast",
            update_chunks=G, dtype=jnp.float32)
        state = make_sr_state(params, K)
        rc0, rc1 = params.rc
        n_batches = 64
        zs_all = jnp.asarray(bench.make_measurements(
            state, K, n_batches * M).reshape(n_batches, M, 3),
            params.dtype)

        def one_batch(st, zsb):
            Rs = jax.vmap(lambda z: jnp.diag(
                jnp.stack([z[0] * rc0, z[1] * rc1])))(zsb).astype(
                    params.dtype)
            strips = sr_strips(st.P, K, triangular=False)
            is_new, sl = gate_batch(st, zsb, Rs, params, strips=strips)
            return sr_update_chunked(st, zsb, sl, Rs, ~is_new,
                                     params), None

        run = jax.jit(lambda st, zb: jax.lax.scan(one_batch, st, zb)[0])
        dt = _time(run, state, zs_all)
        log({"stage": "H", "mode": "srekf_fast", "K": K, "M": M, "G": G,
             "updates_per_sec": round(n_batches * M / dt, 1)})
    except Exception as e:
        log({"stage": "H", "mode": "srekf_fast_1k",
             "error": repr(e)[:300]})


# ---------------------------------------------------------------------------
# Stage G: row-gather showdown — XLA take vs the scalar-prefetch Pallas
# DMA pipeline (wire-or-retire, VERDICT item 5)
# ---------------------------------------------------------------------------

def _pad_rows(st, mult=128):
    """Pad the state dim to a multiple of ``mult`` (zero rows/cols), the
    layout the pallas pair gather needs (init_state pad_to_multiple_of
    equivalent for an already-built state)."""
    D = st.dim
    Dp = ((D + mult - 1) // mult) * mult
    x = jnp.zeros((Dp,), st.x.dtype).at[:D].set(st.x)
    P = jnp.zeros((Dp, Dp), st.P.dtype).at[:D, :D].set(st.P)
    return st._replace(x=x, P=P)


def stage_g(K=10000, M=2048, G=4):
    from ekf_slam_tpu.ops.pallas.kernels import pair_gather_pallas

    for cov in ("f32", "bf16"):
        params = EKFParams(
            capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
            ref_compat=False, dtype=jnp.float32, pht_mode="rows",
            update_chunks=G,
            cov_dtype=jnp.bfloat16 if cov == "bf16" else None)
        state = _pad_rows(bench.make_full_state(params, K))
        m = M // G
        zs = jnp.asarray(bench.make_measurements(state, K, M),
                         params.dtype)
        slots = jnp.clip(zs[:m, 2].astype(jnp.int32) - 1, 0, K - 1)
        rows = 3 + 2 * slots
        rp = (rows[:, None] + jnp.arange(2)[None, :]).reshape(-1)
        N_IT = 16

        # isolated gather: take vs pallas
        for name, fn in (("take", lambda P: jnp.take(P, rp, axis=0)),
                         ("pallas",
                          lambda P: pair_gather_pallas(P, rows))):
            def run(st):
                def it(c, _):
                    g = fn(c.P)
                    return c._replace(
                        x=c.x.at[0].add(jnp.sum(g[0, :3].astype(
                            jnp.float32)) * 1e-20)), None
                return jax.lax.scan(it, st, None, length=N_IT)[0]
            try:
                dt = _time(jax.jit(run), state) / N_IT
                gb = rp.shape[0] * state.P.shape[1] * state.P.dtype.itemsize
                log({"stage": "G", "cov": cov, "gather": name,
                     "ms": round(1e3 * dt, 3),
                     "GBps": round(gb / dt / 1e9, 1)})
            except Exception as e:
                log({"stage": "G", "cov": cov, "gather": name,
                     "error": repr(e)[:200]})

        # full gate+chunked-update throughput with each gather backend
        rc0, rc1 = params.rc
        n_batches = 8
        zs_all = jnp.asarray(bench.make_measurements(
            state, K, n_batches * M).reshape(n_batches, M, 3), params.dtype)
        for name in ("take", "pallas"):
            p = dataclasses.replace(params, rows_gather=name)

            def one_batch(st, zsb):
                Rs = jax.vmap(lambda z: jnp.diag(
                    jnp.stack([z[0] * rc0, z[1] * rc1])))(zsb).astype(
                        p.dtype)
                is_new, sl = gate_batch(st, zsb, Rs, p)
                from ekf_slam_tpu.models.batched import update_chunked
                return update_chunked(st, zsb, sl, Rs, ~is_new, p), None

            try:
                run = jax.jit(
                    lambda st, zb: jax.lax.scan(one_batch, st, zb)[0])
                dt = _time(run, state, zs_all)
                log({"stage": "G", "cov": cov, "chain": name, "M": M,
                     "G": G, "updates_per_sec":
                     round(n_batches * M / dt, 1)})
            except Exception as e:
                log({"stage": "G", "cov": cov, "chain": name,
                     "error": repr(e)[:200]})


def main():
    plat = jax.devices()[0].platform
    want = sys.argv[1] if len(sys.argv) > 1 else "AC"
    log({"stage": "start", "platform": plat, "stages": want})
    for s in want:
        try:
            if s == "A":
                stage_a()
            elif s == "C":
                stage_c()
            elif s == "D":
                stage_d(cov="f32")
                stage_d(cov="bf16")
            elif s == "G":
                stage_g()
            elif s == "H":
                stage_h()
        except Exception as e:  # keep later stages alive through tunnel rot
            log({"stage": s, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()

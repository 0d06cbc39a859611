"""Round-3 chip measurements, part 2: the SYRK symmetric-downdate
correction (ops/pallas/kernels.syrk_downdate, EKFParams.correction='syrk')
at the 10k north star.

The batched update's irreducible correction P ← P − Kg·HP equals the
symmetric downdate W·Wᵀ (W = PHᵀ·L⁻ᵀ); the Pallas kernel computes only
lower-triangle tiles and mirrors them — HALF the flops of the chain's
dominant GEMM (stage D measured that GEMM at 86% of the f32 matmul roof,
i.e. the chain was within ~15% of its ceiling WITHOUT an algorithmic
change; this is the algorithmic change).

Stages (append to experiments/results/r3_chip.jsonl):

  K  kernel microbench: XLA P − W·Wᵀ vs syrk_downdate at D=20480, R=1024
     (bf16 and f32) — the isolated halving.
  S  full chain (gate + chunked update) on a 512-padded 10k state:
     correction='gemm' vs 'syrk' across schedules.

Run:  nohup python -m experiments.chip_r3b > /tmp/chip_r3b.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp

import bench
from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models.batched import update_chunked
from ekf_slam_tpu.ops.association import gate_batch
from ekf_slam_tpu.ops.pallas.kernels import syrk_downdate_pallas

RESULTS = os.path.join(os.path.dirname(__file__), "results",
                       "r3_chip.jsonl")


def log(rec):
    rec = dict(rec, t=round(time.time(), 1))
    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print("[chip_r3b]", json.dumps(rec), flush=True)


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


def _pad(st, mult=512):
    D = st.dim
    Dp = ((D + mult - 1) // mult) * mult
    x = jnp.zeros((Dp,), st.x.dtype).at[:D].set(st.x)
    P = jnp.zeros((Dp, Dp), st.P.dtype).at[:D, :D].set(st.P)
    return st._replace(x=x, P=P)


# ---------------------------------------------------------------------------
# Stage K: isolated kernel, XLA dense GEMM vs Pallas SYRK
# ---------------------------------------------------------------------------

def _time_fetch(run, *args, reps=2):
    """Timing that forces FULL completion by fetching a value to host —
    jax.block_until_ready alone returned early for the stage-K programs
    on axon (first K run logged 0.01 ms for a 1.7-TFLOP loop)."""
    import numpy as np

    def done(out):
        return float(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    done(run(*args))                      # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        done(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def stage_k(D=20480, R=1024):
    # 64+ iterations: the ~28 ms dispatch floor is ±3.5 ms/iter at 8
    # (the first K run's ranking was valid but absolutes were floored)
    N_IT = 64
    variants = (
        ("xla_gemm", None),
        ("syrk_sym", dict(tile=512, mirror="sym")),
        ("syrk_mxu", dict(tile=512, mirror="mxu")),
        ("syrk_wres", dict(tile=512, mirror="mxu", w_resident=True)),
        # tile=1024 failed remote compile (Mosaic); vpu measured ≈ mxu
    )
    for cov in ("bf16", "f32"):
        dt_ = jnp.bfloat16 if cov == "bf16" else jnp.float32
        P0 = (0.05 * jnp.eye(D, dtype=jnp.float32)).astype(dt_)

        for name, kw in variants:
            if kw is None:
                def fn(P):
                    # W derived from P so the loop stays data-dependent;
                    # tiny scale keeps P finite over the loop
                    W = P[:, :R] * jnp.asarray(1e-3, P.dtype)
                    C = jnp.matmul(W, W.T,
                                   preferred_element_type=jnp.float32)
                    return (P.astype(jnp.float32) - C).astype(P.dtype)
            else:
                def fn(P, kw=kw):
                    W = P[:, :R] * jnp.asarray(1e-3, P.dtype)
                    return syrk_downdate_pallas(P, W, **kw)

            def run(P):
                def it(c, _):
                    return fn(c), None
                return jax.lax.scan(it, P, None, length=N_IT)[0]
            try:
                dt = _time_fetch(jax.jit(run), P0) / N_IT
                tf = 2 * D * D * R / dt / 1e12
                log({"stage": "K", "cov": cov, "kernel": name, "D": D,
                     "R": R, "ms": round(1e3 * dt, 2),
                     "dense_equiv_tflops": round(tf, 1)})
            except Exception as e:
                log({"stage": "K", "cov": cov, "kernel": name,
                     "error": repr(e)[:300]})


# ---------------------------------------------------------------------------
# Stage S: full 10k chain, gemm vs syrk corrections
# ---------------------------------------------------------------------------

SCHEDULES_FULL = (
    # (M, G, cov, correction)
    (4096, 8, "bf16", "gemm"),     # padded-state baseline
    (4096, 8, "bf16", "syrk"),
    (4096, 4, "bf16", "syrk"),     # chunk-1024: fewer, bigger downdates
    (8192, 8, "bf16", "syrk"),     # chunk-1024 at deeper gate amortize
    (2048, 4, "f32", "syrk"),      # the f32 default's syrk variant
)
SCHEDULES_SYRK = (                 # rerun set after the mxu-mirror fix
    (4096, 8, "bf16", "syrk"),
    (8192, 8, "bf16", "syrk"),
    (2048, 4, "f32", "syrk"),
)


def stage_s(K=10000, schedules=SCHEDULES_FULL):
    states = {}
    for M, G, cov, corr in schedules:
        try:
            params = EKFParams(
                capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
                ref_compat=False, dtype=jnp.float32, pht_mode="rows",
                update_chunks=G, correction=corr,
                cov_dtype=jnp.bfloat16 if cov == "bf16" else None)
            if cov not in states:
                states[cov] = _pad(bench.make_full_state(params, K))
            state = states[cov]
            rc0, rc1 = params.rc
            n_batches = 8
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
            log({"stage": "S", "K": K, "M": M, "G": G, "cov": cov,
                 "correction": corr, "D_padded": state.dim,
                 "updates_per_sec": round(n_batches * M / dt, 1)})
        except Exception as e:
            log({"stage": "S", "M": M, "G": G, "cov": cov,
                 "correction": corr, "error": repr(e)[:300]})


# ---------------------------------------------------------------------------
# Stage T: single-chip capacity ceiling beyond the 10k north star —
# 20k / 32k landmarks with the promoted schedule (rows + bf16 + syrk).
# The reference's rank-growing dense filter cannot reach these at ANY
# speed; one v5e chip holds P up to ~32k landmarks in bf16 (8.3 GB).
# ---------------------------------------------------------------------------

def stage_t(rows=((20000, 4096, 8, "syrk"), (32000, 4096, 8, "syrk"))):
    for K, M, G, corr in rows:
        try:
            params = EKFParams(
                capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
                ref_compat=False, dtype=jnp.float32, pht_mode="rows",
                update_chunks=G, correction=corr,
                cov_dtype=jnp.bfloat16)
            state = _pad(bench.make_full_state(params, K))
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
            log({"stage": "T", "K": K, "M": M, "G": G, "cov": "bf16",
                 "correction": corr, "D_padded": state.dim,
                 "P_gb": round(state.dim ** 2 * 2 / 1e9, 1),
                 "updates_per_sec": round(n_batches * M / dt, 1)})
            del state, zs_all
        except Exception as e:
            log({"stage": "T", "K": K, "error": repr(e)[:300]})


def stage_u(K=32000, M=4096, G=8):
    """32k landmarks: the single-chip ceiling.  P bf16 is 8.3 GB at
    D=64512 — bench.make_full_state's f32 eye (16.6 GB) and the GEMM
    correction's second D² buffer both blow the 16 GB HBM, so the state
    builds diagonally straight into bf16 (fused iota-select, ONE D²
    buffer) and the update must be the in-place SYRK (aliased P: no
    second D² temporary exists anywhere in the chain)."""
    import numpy as np
    try:
        params = EKFParams(
            capacity=K, association="ml", s_cost=1e6, s_thresh=1e12,
            ref_compat=False, dtype=jnp.float32, pht_mode="rows",
            update_chunks=G, correction="syrk", cov_dtype=jnp.bfloat16)
        D0 = params.dim
        Dp = -(-D0 // 512) * 512
        rng = np.random.default_rng(0)
        lm = rng.uniform(-40, 40, (K, 2))
        x = np.zeros(Dp, np.float64)
        x[3:3 + 2 * K] = lm.reshape(-1)

        from ekf_slam_tpu.state import FilterState
        x_j = jnp.asarray(x, params.dtype)
        sig = jnp.arange(1, K + 1, dtype=params.dtype)
        active = jnp.ones((K,), bool)

        # host-side copy of the state (tiny P) only to synthesize
        # gate-consistent measurements
        host_state = FilterState(x=x_j, P=jnp.zeros((2, 2)), sig=sig,
                                 active=active,
                                 n_active=jnp.asarray(K, jnp.int32))
        rc0, rc1 = params.rc
        n_batches = 4
        zs_all = jnp.asarray(bench.make_measurements(
            host_state, K, n_batches * M).reshape(n_batches, M, 3),
            params.dtype)

        def one_batch(st, zsb):
            Rs = jax.vmap(lambda z: jnp.diag(
                jnp.stack([z[0] * rc0, z[1] * rc1])))(zsb).astype(
                    params.dtype)
            is_new, sl = gate_batch(st, zsb, Rs, params)
            return update_chunked(st, zsb, sl, Rs, ~is_new, params), None

        @jax.jit
        def run(zb):
            # the 8.3 GB P is created INSIDE the program (fused
            # iota-select straight into bf16) and updated in place by the
            # aliased SYRK.  The batches are UNROLLED straight-line, not
            # lax.scan: a scan carry double-buffers P (two 8.3 GB
            # buffers = OOM), while SSA lets XLA chain the in-place
            # aliasing through consecutive pallas calls.
            ii = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (Dp, Dp), 1)
            P = jnp.where(ii == jj, jnp.bfloat16(0.05), jnp.bfloat16(0.0))
            st = FilterState(x=x_j, P=P, sig=sig, active=active,
                             n_active=jnp.asarray(K, jnp.int32))
            for b in range(n_batches):
                st, _ = one_batch(st, zb[b])
            return st.x                   # tiny output; P dies in-program

        dt = _time(run, zs_all)
        log({"stage": "U", "K": K, "M": M, "G": G, "cov": "bf16",
             "correction": "syrk", "D_padded": Dp,
             "P_gb": round(Dp * Dp * 2 / 1e9, 1),
             "updates_per_sec": round(n_batches * M / dt, 1)})
    except Exception as e:
        log({"stage": "U", "K": K, "error": repr(e)[:300]})


def main():
    import sys
    plat = jax.devices()[0].platform
    want = sys.argv[1] if len(sys.argv) > 1 else "KS"
    log({"stage": "start_r3b", "platform": plat, "stages": want})
    for s in want:
        try:
            if s == "K":
                stage_k()
            elif s == "S":
                stage_s()
            elif s == "Z":
                stage_s(schedules=SCHEDULES_SYRK)
            elif s == "T":
                stage_t()
            elif s == "U":          # 32k single-chip ceiling (in-program
                stage_u()           # diag-bf16 build + in-place SYRK)
        except Exception as e:
            log({"stage": s, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()

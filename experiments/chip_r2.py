"""Round-2 chip measurements (run on the real TPU via nohup, poll the log).

Stages, each independent and logged as one JSON line:
  pallas_1k / pallas_10k — gate+update chain, XLA vs Pallas kernels
                           (EKFParams.use_pallas) — wire-or-retire data;
  srekf_1k / srekf_10k   — square-root filter throughput (BASELINE rows);
  msweep_10k             — M=1024/2048 f32 + M=1024 bf16 at 10k.

Usage:  python -m experiments.chip_r2 [stage ...]   (default: all)
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import _params, _time, make_full_state, make_measurements


def log(obj):
    print(json.dumps(obj), flush=True)


def chain_updates_per_sec(K, batch, n_batches, chunks=1, use_pallas=False,
                          cov_dtype=None, mode="batched",
                          pht_mode="dense"):
    """Gate + joint update chain, n_batches fused in one lax.scan."""
    from ekf_slam_tpu.models import batched
    from ekf_slam_tpu.ops.association import gate_batch

    params = _params(K, chunks)
    params = dataclasses.replace(params, use_pallas=use_pallas,
                                 cov_dtype=cov_dtype, pht_mode=pht_mode)
    state = make_full_state(params, K)
    zs_all = jnp.asarray(
        make_measurements(state, K, n_batches * batch).reshape(
            n_batches, batch, 3), params.dtype)
    rc0, rc1 = params.rc

    if mode == "srekf":
        from ekf_slam_tpu.models.srekf import factor_from_state, \
            sr_update_batch
        state = factor_from_state(state)

        def one_batch(st, zs):
            Rs = jax.vmap(lambda z: jnp.diag(jnp.stack(
                [z[0] * rc0, z[1] * rc1])))(zs).astype(params.dtype)
            from ekf_slam_tpu.models.srekf import sr_strips
            strips = sr_strips(st.P, K)
            is_new, slots = gate_batch(st, zs, Rs, params, strips=strips)
            return sr_update_batch(st, zs, slots, Rs, ~is_new, params), None
    else:
        def one_batch(st, zs):
            Rs = jax.vmap(lambda z: jnp.diag(jnp.stack(
                [z[0] * rc0, z[1] * rc1])))(zs).astype(params.dtype)
            is_new, slots = gate_batch(st, zs, Rs, params,
                                       use_pallas=use_pallas)
            return batched.update_chunked(st, zs, slots, Rs, ~is_new,
                                          params), None

    run = jax.jit(lambda st, zb: jax.lax.scan(one_batch, st, zb)[0])
    dt = _time(run, state, zs_all)
    return (n_batches * batch) / dt, dt


def stage_pallas(K, batch, n_batches):
    for up in (False, True):
        t0 = time.time()
        ups, dt = chain_updates_per_sec(K, batch, n_batches,
                                        use_pallas=up)
        log({"stage": f"pallas_{K}", "use_pallas": up, "M": batch,
             "n_batches": n_batches, "updates_per_sec": round(ups, 1),
             "timed_s": round(dt, 4), "compile_s": round(time.time() - t0
                                                         - 2 * dt, 1)})


def stage_srekf(K, batch, n_batches):
    t0 = time.time()
    ups, dt = chain_updates_per_sec(K, batch, n_batches, mode="srekf")
    log({"stage": f"srekf_{K}", "M": batch, "n_batches": n_batches,
         "updates_per_sec": round(ups, 2), "timed_s": round(dt, 3),
         "compile_s": round(time.time() - t0 - 2 * dt, 1)})


def stage_msweep():
    for batch, cdt, tag in ((1024, None, "f32"), (2048, None, "f32"),
                            (1024, jnp.bfloat16, "bf16")):
        ups, dt = chain_updates_per_sec(10000, batch, 8, cov_dtype=cdt)
        log({"stage": "msweep_10k", "M": batch, "cov_dtype": tag,
             "updates_per_sec": round(ups, 1), "timed_s": round(dt, 3)})


def stage_rows():
    """pht_mode='rows' (symmetric row-gather P·Hᵀ) vs 'dense' at 10k —
    the compute-bound GEMM elimination (models/batched.hp_from_rows)."""
    for batch, cdt, pm, tag in (
            (512, None, "dense", "f32"), (512, None, "rows", "f32"),
            (1024, None, "rows", "f32"),
            (512, jnp.bfloat16, "rows", "bf16"),
            (1024, jnp.bfloat16, "rows", "bf16")):
        ups, dt = chain_updates_per_sec(10000, batch, 8, cov_dtype=cdt,
                                        pht_mode=pm)
        log({"stage": "rows_10k", "M": batch, "pht_mode": pm,
             "cov_dtype": tag, "updates_per_sec": round(ups, 1),
             "timed_s": round(dt, 3)})


def stage_rows_chunks():
    """rows × chunking interaction at 10k: chunking halves the quadratic
    S/solve/Kg terms while the correction-GEMM flops stay constant."""
    for batch, chunks, cdt, tag in ((1024, 2, None, "f32"),
                                    (1536, 1, None, "f32"),
                                    (1024, 2, jnp.bfloat16, "bf16")):
        ups, dt = chain_updates_per_sec(10000, batch, 8, chunks=chunks,
                                        cov_dtype=cdt, pht_mode="rows")
        log({"stage": "rows_chunks_10k", "M": batch, "chunks": chunks,
             "cov_dtype": tag, "updates_per_sec": round(ups, 1),
             "timed_s": round(dt, 3)})


def stage_rows_1k():
    for pm in ("dense", "rows"):
        ups, dt = chain_updates_per_sec(1000, 1024, 256, chunks=4,
                                        pht_mode=pm)
        log({"stage": "rows_1k", "M": 1024, "pht_mode": pm, "chunks": 4,
             "updates_per_sec": round(ups, 1), "timed_s": round(dt, 3)})


STAGES = {
    "pallas_1k": lambda: stage_pallas(1000, 512, 64),
    "pallas_10k": lambda: stage_pallas(10000, 512, 8),
    "srekf_1k": lambda: stage_srekf(1000, 256, 4),
    "srekf_10k": lambda: stage_srekf(10000, 64, 1),
    "msweep_10k": stage_msweep,
    "rows_10k": stage_rows,
    "rows_1k": stage_rows_1k,
    "rows_chunks_10k": stage_rows_chunks,
}


def main():
    names = sys.argv[1:] or list(STAGES)
    log({"stage": "env", "platform": jax.devices()[0].platform,
         "device": str(jax.devices()[0])})
    for name in names:
        try:
            t0 = time.time()
            STAGES[name]()
            log({"stage": name, "done_in_s": round(time.time() - t0, 1)})
        except Exception as e:  # keep later stages alive
            log({"stage": name, "error": repr(e)[:300]})


if __name__ == "__main__":
    main()

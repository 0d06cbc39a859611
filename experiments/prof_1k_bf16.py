"""1k-landmark chunked chain with bf16 covariance storage.

At 1k/M=1024/G=4 the per-chunk cost is dominated by the 2 P-streaming
passes (4 chunks x 2 x 16 MB); bf16 storage halves those bytes.  Measures
f32 vs bf16 with the floor amortized (NB=128).

Run:  nohup python -m experiments.prof_1k_bf16 > /tmp/prof6.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched
from ekf_slam_tpu.ops.association import gate_batch
from experiments.prof_gate2 import (make_full_state, make_measurements,
                                    timeit)


def say(msg):
    print(msg, file=sys.stderr, flush=True)


K = 1000
M = 1024
NB = 128


def main():
    say(f"platform: {jax.devices()[0].platform}")
    ct = jnp.float32

    for name, cov in [("f32", None), ("bf16", jnp.bfloat16)]:
        params = EKFParams(capacity=K, association="ml", s_cost=1e6,
                           s_thresh=1e12, ref_compat=False,
                           dtype=jnp.float32, cov_dtype=cov,
                           update_chunks=4)
        state = make_full_state(params, K)
        rc0, rc1 = params.rc
        zs_all = jnp.asarray(
            make_measurements(state, K, NB * M).reshape(NB, M, 3), ct)

        def body(st, zs):
            Rs = jax.vmap(lambda z: jnp.diag(
                jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(ct)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            return batched.update_chunked(st, zs, slots, Rs, valid,
                                          params), None

        run = jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])
        dt = timeit(run, state, zs_all)
        say(f"{name} chunked M={M} G=4 NB={NB}: {dt / NB * 1e3:7.3f} "
            f"ms/batch ({NB * M / dt:,.0f} up/s)")
    say("done")


if __name__ == "__main__":
    main()

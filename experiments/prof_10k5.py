"""Round-5 profiling: 10k-landmark chain, f32 vs bf16, floor-aware.

bf16 covariance storage measured only ~1.1x at 10k in round 1, while the
GEMM roofline predicts ~1.4-1.6x.  With the 25-31 ms per-call floor now
known (experiments/prof_floor4.py), re-measure with NB=16 and isolate the
PHt GEMM stage per dtype.

Run:  nohup python -m experiments.prof_10k5 > /tmp/prof5.log 2>&1 &
"""
from __future__ import annotations

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


K = 10000
M = 512


def main():
    say(f"platform: {jax.devices()[0].platform}")
    ct = jnp.float32

    def params_of(cov):
        return EKFParams(capacity=K, association="ml", s_cost=1e6,
                         s_thresh=1e12, ref_compat=False,
                         dtype=jnp.float32, cov_dtype=cov)

    def setup(cov):
        params = params_of(cov)
        state = make_full_state(params, K)
        rc0, rc1 = params.rc

        def rs_of(zs):
            return jax.vmap(lambda z: jnp.diag(
                jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(ct)

        return params, state, rs_of

    def zs_for(state, NB):
        return jnp.asarray(
            make_measurements(state, K, NB * M).reshape(NB, M, 3), ct)

    def scan_of(body):
        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    for name, cov in [("f32", None), ("bf16", jnp.bfloat16)]:
        params, state, rs_of = setup(cov)

        def body_full(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            return batched.update_batch(st, zs, slots, Rs, valid,
                                        params), None

        def body_pht(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            Ht, nu = batched.innovation_operator(
                st.x, zs, slots, valid, params, ct)
            if st.P.dtype == jnp.bfloat16:
                PHt = jnp.matmul(st.P, Ht.astype(jnp.bfloat16),
                                 preferred_element_type=ct)
            else:
                PHt = st.P @ Ht
            return st._replace(x=st.x + jnp.sum(PHt) * 1e-30), None

        NB = 16
        zb = zs_for(state, NB)
        dt = timeit(scan_of(body_full), state, zb)
        say(f"{name} full NB={NB}: {dt / NB * 1e3:7.3f} ms/batch "
            f"({NB * M / dt:,.0f} up/s)")
        NB2 = 8
        zb2 = zs_for(state, NB2)
        dt = timeit(scan_of(body_pht), state, zb2)
        say(f"{name} gate+PHt NB={NB2}: {dt / NB2 * 1e3:7.3f} ms/batch")
    say("done")


if __name__ == "__main__":
    main()

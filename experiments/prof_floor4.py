"""Round-4 profiling: separate the per-CALL dispatch floor from per-batch cost.

prof_gate3 found a noop scan body 'costs' 0.755 ms/batch at NB=32 — i.e. a
~24 ms fixed per-program-call overhead (axon tunnel dispatch/sync), NOT
per-iteration work.  This run fits F + NB*c by sweeping NB, checks whether
F depends on carry size, and measures the best chunked chains with the
floor amortized (large NB).

Run:  nohup python -m experiments.prof_floor4 > /tmp/prof4.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched
from ekf_slam_tpu.ops.association import gate_batch
from experiments.prof_gate2 import (make_full_state, make_measurements,
                                    timeit)


def say(msg):
    print(msg, file=sys.stderr, flush=True)


K = 1000


def main():
    say(f"platform: {jax.devices()[0].platform}")
    ct = jnp.float32
    params = EKFParams(capacity=K, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False, dtype=jnp.float32)
    state = make_full_state(params, K)
    rc0, rc1 = params.rc

    def rs_of(zs):
        return jax.vmap(lambda z: jnp.diag(
            jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(ct)

    def zs_for(M, NB):
        return jnp.asarray(
            make_measurements(state, K, NB * M).reshape(NB, M, 3), ct)

    def scan_of(body):
        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    def body_noop(st, zs):
        return st._replace(x=st.x + jnp.sum(zs) * 1e-30), None

    # one compiled noop scan, three NB values via shape -> three programs;
    # fit F and c from the totals.
    for NB in (8, 32, 128):
        dt = timeit(scan_of(body_noop), state, zs_for(512, NB))
        say(f"noop  NB={NB:3d}: total {dt * 1e3:7.2f} ms "
            f"({dt / NB * 1e3:6.3f} ms/iter)")

    # dispatch floor of a tiny program (no big carry)
    tiny = jax.jit(lambda v: v + 1.0)
    v = jnp.zeros((2003,), ct)
    dt = timeit(lambda x: tiny(x), v)
    say(f"tiny program call: {dt * 1e3:7.2f} ms")

    # small-carry noop (capacity 128): is F proportional to P size?
    p_small = EKFParams(capacity=128, association="ml", s_cost=1e6,
                        s_thresh=1e12, ref_compat=False, dtype=jnp.float32)
    st_small = make_full_state(
        dataclasses.replace(p_small), 128)
    zs_small = jnp.asarray(
        make_measurements(st_small, 128, 32 * 512).reshape(32, 512, 3), ct)
    dt = timeit(scan_of(body_noop), st_small, zs_small)
    say(f"noop small-P NB=32: total {dt * 1e3:7.2f} ms")

    # ---- amortized chunked chains ----------------------------------------
    def chain(G):
        p = dataclasses.replace(params, update_chunks=G)

        def body(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            return batched.update_chunked(st, zs, slots, Rs, valid, p), None
        return scan_of(body)

    for M, G, NB in [(4096, 16, 16), (4096, 8, 16), (8192, 32, 8),
                     (2048, 8, 32)]:
        dt = timeit(chain(G), state, zs_for(M, NB))
        say(f"chain M={M} G={G:2d} NB={NB:3d}: {dt / NB * 1e3:7.3f} ms/batch "
            f"({NB * M / dt:,.0f} up/s)")
    say("done")


if __name__ == "__main__":
    main()

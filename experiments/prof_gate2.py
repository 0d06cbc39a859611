"""Round-2 profiling: gate backends + chunked scheduling combos on TPU.

Builds on experiments/prof_update_1k.py findings at K=1000, M=512:
  gate 0.74 ms | +PHt 0.08 | +S 0.24 | +solve 0.32 | full ~1.8 ms
  chunked G=2: 1.40 ms/batch (364k up/s), linv_gemm solver ~15% faster.
This run measures the rewritten [M,K]-plane XLA gate, the 2-D vectorized
Pallas gate, and full-chain combos, then a 10k G=2 spot check.

Run:  nohup python -m experiments.prof_gate2 > /tmp/prof2.log 2>&1 &
"""
from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched
from ekf_slam_tpu.ops.association import gate_batch
from ekf_slam_tpu.state import FilterState, init_state


def say(msg):
    print(msg, file=sys.stderr, flush=True)


def make_full_state(params: EKFParams, K, seed=0) -> FilterState:
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


def make_measurements(state, K, n, seed=1):
    rng = np.random.default_rng(seed)
    x = np.asarray(state.x, np.float64)
    idx = rng.integers(0, K, n)
    lm = x[3:3 + 2 * K].reshape(K, 2)[idx]
    delta = lm - x[:2]
    r = np.hypot(delta[:, 0], delta[:, 1])
    b = np.mod(np.rad2deg(np.arctan2(delta[:, 1], delta[:, 0])) - x[2], 360.0)
    return np.stack([r, b, (idx + 1).astype(np.float64)], axis=-1)


def timeit(run, *args, reps=3):
    out = run(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    say(f"platform: {jax.devices()[0].platform}")
    ct = jnp.float32

    def bench_config(K, M, NB, combos):
        params = EKFParams(capacity=K, association="ml", s_cost=1e6,
                           s_thresh=1e12, ref_compat=False,
                           dtype=jnp.float32)
        state = make_full_state(params, K)
        zs_all = jnp.asarray(
            make_measurements(state, K, NB * M).reshape(NB, M, 3), ct)
        rc0, rc1 = params.rc

        def rs_of(zs):
            return jax.vmap(lambda z: jnp.diag(
                jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(ct)

        def gate_only(use_pallas):
            def body(st, zs):
                Rs = rs_of(zs)
                is_new, slots = gate_batch(st, zs, Rs, params,
                                           use_pallas=use_pallas)
                bump = jnp.sum(slots).astype(ct) * 1e-20
                return st._replace(x=st.x + bump), None
            return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

        def full(G, use_pallas):
            p = dataclasses.replace(params, update_chunks=G)

            def body(st, zs):
                Rs = rs_of(zs)
                is_new, slots = gate_batch(st, zs, Rs, params,
                                           use_pallas=use_pallas)
                valid = ~is_new
                return batched.update_chunked(st, zs, slots, Rs, valid,
                                              p), None
            return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

        for name, maker in combos:
            dt = timeit(maker(gate_only, full), state, zs_all)
            say(f"K={K} M={M} {name:24s}: {dt / NB * 1e3:7.3f} ms/batch "
                f"({NB * M / dt:,.0f} up/s)")

    combos_1k = [
        ("gate_xla", lambda g, f: g(False)),
        ("gate_pallas", lambda g, f: g(True)),
        ("full_G1_xla", lambda g, f: f(1, False)),
        ("full_G2_xla", lambda g, f: f(2, False)),
        ("full_G2_pallas", lambda g, f: f(2, True)),
        ("full_G4_pallas", lambda g, f: f(4, True)),
    ]
    bench_config(1000, 512, 32, combos_1k)

    combos_1k_m1024 = [
        ("full_G4_pallas", lambda g, f: f(4, True)),
        ("full_G4_xla", lambda g, f: f(4, False)),
    ]
    bench_config(1000, 1024, 16, combos_1k_m1024)

    combos_10k = [
        ("full_G2_xla", lambda g, f: f(2, False)),
    ]
    bench_config(10000, 512, 8, combos_10k)

    say("done")


if __name__ == "__main__":
    main()

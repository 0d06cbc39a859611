"""Profile the batched-update chain at K=1000 on the real chip.

The M=512 batch takes ~1.8 ms but its compute/memory roof is ~0.5 ms;
this script times cumulative prefixes of the chain (gate -> PHt -> S ->
solve -> full) to locate the overhead, then tries solver variants and
chunked scheduling.  One script = one TPU session (remote compiles are
minutes each; batch everything).

Run:  nohup python experiments/prof_update_1k.py > /tmp/prof1k.log 2>&1 &
"""
from __future__ import annotations

import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.models import batched
from ekf_slam_tpu.ops.association import gate_batch
from ekf_slam_tpu.state import FilterState, init_state

K = 1000
NB = 32


def say(msg):
    print(msg, file=sys.stderr, flush=True)


def make_full_state(params: EKFParams, seed=0) -> FilterState:
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
    params = EKFParams(capacity=K, association="ml", s_cost=1e6,
                       s_thresh=1e12, ref_compat=False, dtype=jnp.float32)
    state = make_full_state(params)
    rc0, rc1 = params.rc
    ct = jnp.float32

    def batch_inputs(M, nb=NB):
        zs = jnp.asarray(
            make_measurements(state, nb * M).reshape(nb, M, 3), ct)
        return zs

    def rs_of(zs):
        return jax.vmap(lambda z: jnp.diag(
            jnp.stack([z[0] * rc0, z[1] * rc1])))(zs).astype(ct)

    # ---- cumulative prefixes at M=512 ------------------------------------
    M = 512

    def prefix(stage):
        """stage in gate|pht|s|solve|full — scan body computing the chain up
        to `stage`; consumes the last tensor into x so nothing is DCE'd and
        x varies per iteration so nothing is hoisted."""
        def body(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            if stage == "gate":
                bump = jnp.sum(slots).astype(ct) * 1e-20
                return st._replace(x=st.x + bump), None
            Ht, nu = batched.innovation_operator(
                st.x, zs, slots, valid, params, ct)
            PHt = st.P @ Ht
            if stage == "pht":
                return st._replace(x=st.x + jnp.sum(PHt) * 1e-20), None
            S = Ht.T @ PHt + batched.noise_block(Rs, valid, ct)
            if stage == "s":
                return st._replace(x=st.x + jnp.sum(S) * 1e-20), None
            chol = jax.scipy.linalg.cho_factor(S, lower=True)
            Sinv = jax.scipy.linalg.cho_solve(
                chol, jnp.eye(2 * M, dtype=ct))
            if stage == "solve":
                return st._replace(x=st.x + jnp.sum(Sinv) * 1e-20), None
            Kg = PHt @ Sinv
            x = st.x + Kg @ nu
            P = st.P - Kg @ PHt.T
            P = 0.5 * (P + P.T)
            return st._replace(x=x, P=P), None

        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    zs512 = batch_inputs(M)
    for stage in ["gate", "pht", "s", "solve", "full"]:
        dt = timeit(prefix(stage), state, zs512)
        say(f"prefix[{stage:5s}] M=512: {dt / NB * 1e3:7.3f} ms/batch "
            f"({NB * M / dt:,.0f} up/s)")

    # ---- solver variants at M=512 ----------------------------------------
    def full_with_solver(solver, M):
        def body(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            Ht, nu = batched.innovation_operator(
                st.x, zs, slots, valid, params, ct)
            PHt = st.P @ Ht
            S = Ht.T @ PHt + batched.noise_block(Rs, valid, ct)
            if solver == "cho_eye":
                chol = jax.scipy.linalg.cho_factor(S, lower=True)
                Sinv = jax.scipy.linalg.cho_solve(
                    chol, jnp.eye(2 * M, dtype=ct))
                Kg = PHt @ Sinv
            elif solver == "lu_inv":
                Kg = PHt @ jnp.linalg.inv(S)
            elif solver == "linv_gemm":
                L = jnp.linalg.cholesky(S)
                Linv = jax.lax.linalg.triangular_solve(
                    L, jnp.eye(2 * M, dtype=ct), left_side=True, lower=True)
                Kg = PHt @ (Linv.T @ Linv)
            elif solver == "trsm_wide":
                chol = jax.scipy.linalg.cho_factor(S, lower=True)
                Kg = jax.scipy.linalg.cho_solve(chol, PHt.T).T
            x = st.x + Kg @ nu
            P = st.P - Kg @ PHt.T
            P = 0.5 * (P + P.T)
            return st._replace(x=x, P=P), None

        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    for solver in ["cho_eye", "lu_inv", "linv_gemm", "trsm_wide"]:
        dt = timeit(full_with_solver(solver, M), state, zs512)
        say(f"solver[{solver:9s}] M=512: {dt / NB * 1e3:7.3f} ms/batch "
            f"({NB * M / dt:,.0f} up/s)")

    # ---- chunked scheduling: gate once, update in G sequential chunks ----
    def chunked(G, M):
        m = M // G

        def body(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            for g in range(G):
                sl = slice(g * m, (g + 1) * m)
                st = batched.update_batch(
                    st, zs[sl], slots[sl], Rs[sl], valid[sl], params)
            return st, None

        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    for G in [2, 4]:
        dt = timeit(chunked(G, M), state, zs512)
        say(f"chunked[G={G}]   M=512: {dt / NB * 1e3:7.3f} ms/batch "
            f"({NB * M / dt:,.0f} up/s)")

    # ---- batch-size sweep with the current full path ----------------------
    def full(M):
        def body(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            return batched.update_batch(st, zs, slots, Rs, valid,
                                        params), None
        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    for M2, nb in [(1024, 16), (2048, 8)]:
        zsb = batch_inputs(M2, nb)
        dt = timeit(full(M2), state, zsb)
        say(f"full        M={M2}: {dt / nb * 1e3:7.3f} ms/batch "
            f"({nb * M2 / dt:,.0f} up/s)")

    say("done")


if __name__ == "__main__":
    main()

"""Round-3 profiling: locate the gate's fixed cost; big-batch chunked chains.

prof_gate2 findings (K=1k): gate costs 0.76 ms/batch for BOTH the XLA and
Pallas backends — so the cost is NOT the [M,K] cost-plane math.  Here:
stage isolation (strips, rs_of, phi) + gate scaling in M + full chains at
M=2048/4096 with proportional chunking (chunk size 256-512 held fixed).

Run:  nohup python -m experiments.prof_gate3 > /tmp/prof3.log 2>&1 &
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
from ekf_slam_tpu.ops.association import (_lm_diag_blocks, _phi_base,
                                          gate_batch)
from experiments.prof_gate2 import make_full_state, make_measurements, timeit


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

    NB = 32

    def scan_of(body):
        return jax.jit(lambda st, zb: jax.lax.scan(body, st, zb)[0])

    def run(name, body, M=512, nb=NB):
        dt = timeit(scan_of(body), state, zs_for(M, nb))
        say(f"{name:18s} M={M:5d}: {dt / nb * 1e3:7.3f} ms/batch "
            f"({nb * M / dt:,.0f} up/s)")

    # ---- stage isolation (each body nudges P so nothing hoists) ----------
    def pnudge(st, zs):
        b = jnp.sum(zs) * 1e-30
        return st._replace(P=st.P + b)

    def body_noop(st, zs):
        return st._replace(x=st.x + jnp.sum(zs) * 1e-30), None

    def body_pnudge(st, zs):
        return pnudge(st, zs), None

    def body_rs(st, zs):
        st = pnudge(st, zs)
        return st._replace(x=st.x + jnp.sum(rs_of(zs)) * 1e-30), None

    def body_strips(st, zs):
        st = pnudge(st, zs)
        P = st.P
        end = 3 + 2 * K
        Prr = P[:3, :3]
        Prl = P[:3, 3:end].reshape(3, K, 2).transpose(1, 0, 2)
        Pll = _lm_diag_blocks(P, K)
        b = (jnp.sum(Prr) + jnp.sum(Prl) + jnp.sum(Pll)) * 1e-30
        return st._replace(x=st.x + b), None

    def body_phi(st, zs):
        st = pnudge(st, zs)
        P, x = st.P, st.x
        end = 3 + 2 * K
        Prr = P[:3, :3]
        Prl = P[:3, 3:end].reshape(3, K, 2).transpose(1, 0, 2)
        Pll = _lm_diag_blocks(P, K)
        lm = st.landmarks
        delta = lm - x[:2]
        q = jnp.sum(delta * delta, axis=-1)
        q = jnp.where(q == 0, jnp.ones_like(q), q)
        sq = jnp.sqrt(q)
        dx, dy = delta[:, 0], delta[:, 1]
        zero = jnp.zeros_like(q)
        A = jnp.stack([
            jnp.stack([-sq * dx, -sq * dy, zero], axis=-1),
            jnp.stack([dy, -dx, -q], axis=-1),
        ], axis=1) / q[:, None, None]
        B = jnp.stack([
            jnp.stack([sq * dx, sq * dy], axis=-1),
            jnp.stack([-dy, dx], axis=-1),
        ], axis=1) / q[:, None, None]
        Phi0 = _phi_base(A, B, Prr, Prl, Pll)
        return st._replace(x=st.x + jnp.sum(Phi0) * 1e-30), None

    def body_gate(st, zs):
        st = pnudge(st, zs)
        Rs = rs_of(zs)
        is_new, slots = gate_batch(st, zs, Rs, params)
        return st._replace(x=st.x + jnp.sum(slots).astype(ct) * 1e-30), None

    run("noop", body_noop)
    run("pnudge", body_pnudge)
    run("rs_of", body_rs)
    run("strips", body_strips)
    run("phi", body_phi)
    run("gate_m64", body_gate, M=64)
    run("gate_m512", body_gate, M=512)
    run("gate_m2048", body_gate, M=2048, nb=8)

    # ---- big-batch chunked chains ----------------------------------------
    def chain(G):
        p = dataclasses.replace(params, update_chunks=G)

        def body(st, zs):
            Rs = rs_of(zs)
            is_new, slots = gate_batch(st, zs, Rs, params)
            valid = ~is_new
            return batched.update_chunked(st, zs, slots, Rs, valid, p), None
        return body

    run("chain_G8", chain(8), M=2048, nb=8)
    run("chain_G8", chain(8), M=4096, nb=4)
    run("chain_G16", chain(16), M=4096, nb=4)
    say("done")


if __name__ == "__main__":
    main()

"""Where is the small↔large schedule crossover?

recommended_schedule switches at capacity 2000 (dense/f32/M=8192 below,
rows/bf16/syrk/M=4096 above) but the boundary was inherited from the
1k/10k measurements, never probed in between.  This times BOTH
schedules at mid-size maps.

Run:  nohup python -m experiments.prof_midsize > /tmp/midsize.log 2>&1 &
"""
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import bench


def _fetch(out):
    return float(np.asarray(jax.tree_util.tree_leaves(out)[0]
                            ).reshape(-1)[0])


def _time(run, *args, reps=3):
    _fetch(run(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_ups(K, batch, chunks, pht, cov, corr, n_batches):
    params = dataclasses.replace(
        bench._params(K, chunks, cov), pht_mode=pht, correction=corr)
    state = bench.make_full_state(params, K)
    if corr == "syrk":
        D, Dp = state.dim, -(-state.dim // 512) * 512
        state = state._replace(
            x=jnp.zeros((Dp,), state.x.dtype).at[:D].set(state.x),
            P=jnp.zeros((Dp, Dp), state.P.dtype).at[:D, :D].set(state.P))
    zs_all = jnp.asarray(
        bench.make_measurements(state, K, n_batches * batch).reshape(
            n_batches, batch, 3), params.dtype)
    run = bench._batched_chain(params, state, zs_all)
    return n_batches * batch / _time(run, state, zs_all)


def main():
    for K in (2000, 3000, 4000, 6000):
        for name, cfg in (
                ("small-style", dict(batch=8192, chunks=32, pht="dense",
                                     cov=None, corr="gemm", n_batches=32)),
                ("large-style", dict(batch=4096, chunks=8, pht="rows",
                                     cov=jnp.bfloat16, corr="syrk",
                                     n_batches=16))):
            try:
                ups = chain_ups(K, **cfg)
                print(json.dumps({"K": K, "schedule": name,
                                  "updates_per_sec": round(ups, 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"K": K, "schedule": name,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()

"""Does XLA's row gather (pht_mode='rows' take) run faster on SORTED
indices?  Observation order inside a chunk is a free relabeling, so if
sorted-row gathers beat random ones, update_batch can sort per chunk.

Run:  nohup python -m experiments.prof_gather_sort > /tmp/gsort.log 2>&1 &
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

D = 20480
PAIRS = 512
N_IT = 64


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


def main():
    rng = np.random.default_rng(0)
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        P = jnp.asarray(rng.normal(size=(D, 64)).astype(np.float32))
        P = jax.jit(lambda a: (a @ a.T).astype(dt))(P)
        jax.block_until_ready(P)
        starts = rng.integers(0, D // 2 - 1, (N_IT, PAIRS)) * 2 + 3
        for mode in ("random", "sorted"):
            idx = np.sort(starts, axis=1) if mode == "sorted" else starts
            rp = (idx[:, :, None] + np.arange(2)[None, None, :]).reshape(
                N_IT, 2 * PAIRS)
            rp = jnp.asarray(rp, jnp.int32)

            @jax.jit
            def run(P, rp):
                def body(c, r):
                    rows = jnp.take(P, r, axis=0)
                    return c + jnp.sum(rows.astype(jnp.float32)), None
                return jax.lax.scan(body, jnp.float32(0), rp)[0]

            dtm = _time(run, P, rp) / N_IT
            bytes_useful = 2 * PAIRS * D * jnp.dtype(dt).itemsize
            print(json.dumps({
                "dtype": name, "mode": mode,
                "ms_per_gather": round(dtm * 1e3, 3),
                "useful_GBps": round(bytes_useful / dtm / 1e9, 1)}),
                flush=True)


if __name__ == "__main__":
    main()

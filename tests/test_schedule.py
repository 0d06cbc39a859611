"""Measured scheduling heuristics (utils/schedule.py)."""
import jax.numpy as jnp

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.utils.schedule import recommended_schedule, tuned_params


def test_recommended_schedule_regimes():
    small = recommended_schedule(1000)
    assert small["pht_mode"] == "dense"
    assert small["batch"] // small["update_chunks"] == 256
    assert small["cov_dtype"] is None
    big = recommended_schedule(10000)
    assert big["pht_mode"] == "rows"
    assert big["batch"] == 4096
    assert big["batch"] // big["update_chunks"] == 512
    assert big["cov_dtype"] == jnp.bfloat16      # best measured (65.3k up/s)
    assert big["correction"] == "syrk"           # chip: 71.6k vs 68.1k gemm
    assert small["correction"] == "gemm"         # solve-bound regime
    # batch override keeps the chunk-length target
    s = recommended_schedule(10000, batch=2048)
    assert s["update_chunks"] == 4


def test_tuned_params_applies_knobs():
    p = tuned_params(EKFParams(capacity=10000, dtype=jnp.float32))
    assert p.pht_mode == "rows" and p.update_chunks == 8
    assert p.cov_dt == jnp.bfloat16
    assert p.correction == "syrk"
    q = tuned_params(EKFParams(capacity=128))
    assert q.pht_mode == "dense" and q.update_chunks == 32
    assert q.capacity == 128 and q.cov_dtype is None
    assert q.correction == "gemm"


def test_tuned_params_cov_dtype_opt_out():
    p = tuned_params(EKFParams(capacity=10000, dtype=jnp.float32),
                     cov_dtype=None)
    assert p.pht_mode == "rows" and p.cov_dtype is None
    # syrk only pays with bf16 P (measured) — f32 opt-out reverts it
    assert p.correction == "gemm"


def test_tuned_params_square_root_modes():
    # srekf_fast gets the chunk scheduling but no dense-path knobs
    p = tuned_params(EKFParams(capacity=10000, update_mode="srekf_fast"))
    assert p.update_chunks == 8
    assert p.pht_mode == "dense" and p.cov_dtype is None
    # the QR srekf path has no applicable knobs (construction would
    # reject chunks > 1)
    q0 = EKFParams(capacity=128, update_mode="srekf")
    assert tuned_params(q0) == q0

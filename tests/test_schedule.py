"""Measured scheduling heuristics (utils/schedule.py)."""
import jax.numpy as jnp

from ekf_slam_tpu.config import EKFParams
from ekf_slam_tpu.utils.schedule import recommended_schedule, tuned_params


def test_recommended_schedule_regimes():
    small = recommended_schedule(1000)
    assert small["pht_mode"] == "dense"
    assert small["batch"] // small["update_chunks"] == 256
    big = recommended_schedule(10000)
    assert big["pht_mode"] == "rows"
    assert big["batch"] // big["update_chunks"] == 512
    # batch override keeps the chunk-length target
    s = recommended_schedule(10000, batch=4096)
    assert s["update_chunks"] == 8


def test_tuned_params_applies_knobs():
    p = tuned_params(EKFParams(capacity=10000, dtype=jnp.float32))
    assert p.pht_mode == "rows" and p.update_chunks == 4
    q = tuned_params(EKFParams(capacity=128))
    assert q.pht_mode == "dense" and q.update_chunks == 8
    assert q.capacity == 128

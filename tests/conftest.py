"""Test configuration: hermetic CPU backend with a virtual 8-device mesh.

The reference has no tests (SURVEY.md §4); this suite creates the
verification story: unit tests vs the NumPy oracle, trajectory-level ATE
tests on the simulator, and sharding tests on a virtual CPU mesh (standard
JAX pattern — multi-chip logic validated without a pod).
"""
import os

# Must be set before jax import: 8 virtual CPU devices for sharding tests.
# Forced (not setdefault): the outer environment pins JAX_PLATFORMS to the
# real TPU backend, which tests must not touch.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's site hook registers a TPU backend and pins
# jax_platforms via the config API (which beats env vars), so tests must
# override through the config API as well to stay hermetic on CPU.
jax.config.update("jax_platforms", "cpu")

# f64 so the TPU-path math can be compared against the f64 NumPy oracle
# tightly; production TPU runs use f32 (params.dtype).
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process compiler-state growth across the ~230-test run.

    Full-suite runs intermittently died with a segfault/abort INSIDE an
    XLA CPU compile late in the run (observed at 64-96% in three
    different tests, including once with nothing else on the host) —
    consistent with accumulated compiled-executable state, not with any
    single test.  Dropping the jit caches between modules keeps the live
    executable population bounded; modules rarely share programs, so the
    recompile cost is small."""
    yield
    jax.clear_caches()

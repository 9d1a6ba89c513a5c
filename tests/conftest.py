"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (SURVEY.md §4 test strategy).

This image's sitecustomize registers the axon TPU plugin at interpreter
startup and forces jax_platforms="axon,cpu" — setting JAX_PLATFORMS in the
environment is NOT enough. Overriding via jax.config after import works
because no backend client exists yet at conftest time."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PCSEQ_CACHE_DIR",
                   os.path.expanduser("~/.cache/pcseqlearning_tpu/jax_cache")),
)
# 0.1 s: on this 1-CPU box mid-size compiles dominate suite wall time and
# deserialization is ~10-50 ms — cache nearly everything
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

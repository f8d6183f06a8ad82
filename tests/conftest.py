"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware (the driver separately dry-runs the
mesh path via __graft_entry__.dryrun_multichip)."""

import os

# force CPU (the session env may point JAX at a tunnelled TPU): sharding
# tests need the 8-virtual-device CPU mesh, and op tests must be
# deterministic f32 oracles
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The session's TPU plugin registers itself eagerly at interpreter start
# (sitecustomize), so JAX_PLATFORMS alone cannot demote it — force the
# default platform explicitly.
jax.config.update("jax_platform_name", "cpu")

# Exact f32 matmuls for golden tests (JAX's default truncates to bf16-style
# precision even on CPU; production uses the bf16 policy deliberately).
jax.config.update("jax_default_matmul_precision", "float32")

# Persistent compilation cache — XLA compiles dominate test wall-clock on the
# single-core CI host; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)

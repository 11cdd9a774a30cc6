"""Test environment: force an 8-device virtual CPU mesh so sharding tests
(parallel/) run without TPU hardware, per the driver contract. Must run
before jax initializes a backend."""
import os

# Force CPU even when the ambient environment selects the TPU plugin
# (JAX_PLATFORMS=axon) — tests need the 8-device virtual mesh. The axon
# sitecustomize imports jax before pytest starts, so plain env vars are
# too late for jax.config; set both env (for subprocesses) and config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Small shapes for tests — keep device arrays tiny.
os.environ.setdefault("MRAG_EMBED_DIM", "256")
os.environ.setdefault("MRAG_INITIAL_CAPACITY", "1024")
os.environ.setdefault("MRAG_LEXICAL_BUCKETS", "2048")
# Hermetic data dir: default-path sqlite stores (queue/eval/telemetry/
# curator) must not leak across test runs or into ~/.mobius_rag_tpu.
import tempfile

os.environ["MRAG_DATA_DIR"] = tempfile.mkdtemp(prefix="mrag-tests-")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_num_cpu_devices", 8
)

import numpy as np
import pytest

# Persistent XLA compilation cache: the suite's wall time on 1-vCPU
# hosts is dominated by CPU-backend compiles; cache them across runs —
# but in a test-owned directory, not the serving cache (~/.cache/...):
# suite runs must not pollute serving state nor depend on it.
os.environ.setdefault(
    "MRAG_JIT_CACHE_DIR",
    os.path.join(tempfile.gettempdir(), "mrag-tests-jitcache"))
from mobius_rag_tpu.utils import jit_cache

jit_cache.enable_persistent_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)

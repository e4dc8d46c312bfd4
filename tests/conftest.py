"""Test harness: a REAL 8-device CPU mesh.

This box's sitecustomize (PYTHONPATH=/root/.axon_site) registers the axon
TPU PJRT plugin in every interpreter and forces JAX_PLATFORMS=axon — naive
"CPU" test runs actually dispatch through the TPU tunnel (~0.3 s/call,
bf16-default matmuls, 100 s remote compiles).  ``jax.config`` updates win
over the env var, so select the real CPU backend here, before any backend
initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: this box has ONE core and the SD1.5-width
# suites recompile identical graphs every run (tens of minutes).  Cache
# XLA executables across runs; harmless when cold.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_enable_xla_caches", "all")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

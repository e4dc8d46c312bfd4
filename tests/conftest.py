"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Multi-device behavior (pjit/psum/shard_map) is tested on CPU-simulated
devices — the standard JAX trick, chosen because the reference has no
distributed tests at all (SURVEY.md §4) and real multi-chip hardware is not
available here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# This box's XLA-CPU (oneDNN) defaults to low-precision matmuls (~bf16:
# 64x64 fp32 matmul error ~7e-2).  Numerical tests need real fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

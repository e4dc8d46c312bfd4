"""Mesh construction, sharding rules, and tiling math."""

import jax
import numpy as np
import pytest

from i2v_adapter_tpu.config import MeshConfig
from i2v_adapter_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    fsdp_spec,
    shard_params_fsdp,
)


def test_create_mesh_wildcard():
    mesh = create_mesh(MeshConfig(data=-1, fsdp=2))
    assert mesh.shape["data"] * mesh.shape["fsdp"] == len(jax.devices())
    assert mesh.shape["fsdp"] == 2


def test_create_mesh_validation():
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, fsdp=3))  # 9 != 8
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=-1, fsdp=-1))


def test_batch_sharding_shards_axis0():
    mesh = create_mesh(MeshConfig())
    sharding = batch_sharding(mesh, 3)
    x = np.zeros((8, 4, 4), np.float32)
    arr = jax.device_put(x, sharding)
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (1, 4, 4)


def test_fsdp_spec_rules():
    assert fsdp_spec((10,), 2) == jax.sharding.PartitionSpec()  # too small
    spec = fsdp_spec((1024, 1024), 2, min_size=0)
    assert "fsdp" in str(spec)
    # non-divisible axes stay replicated
    assert fsdp_spec((7, 13), 4, min_size=0) == jax.sharding.PartitionSpec()


def test_shard_params_fsdp_places_shards():
    mesh = create_mesh(MeshConfig(data=-1, fsdp=2))
    params = {"big": np.zeros((512, 512), np.float32),
              "small": np.zeros((8,), np.float32)}
    shardings = shard_params_fsdp(params, mesh, min_size=1024)
    placed = jax.device_put(params, shardings)
    assert placed["big"].addressable_shards[0].data.shape[0] in (256, 512)
    # small stays replicated
    assert placed["small"].addressable_shards[0].data.shape == (8,)


def test_temporal_windows():
    from i2v_adapter_tpu.pipelines.tiling import temporal_windows, window_weights

    ws = temporal_windows(64, 16, 12)
    assert ws[0] == (0, 16) and ws[-1] == (48, 64)
    covered = set()
    for s, e in ws:
        covered.update(range(s, e))
    assert covered == set(range(64))
    w = window_weights(16, 4)
    assert w[0] < 1.0 and w[7] == 1.0 and w[-1] < 1.0
    assert len(w) == 16
    # short clip: single window
    assert temporal_windows(8, 16, 12) == [(0, 8)]


def test_tiled_unet_call_identity_blend():
    """With a UNet that returns its input, tiled blending must reproduce
    the input exactly (weights sum to 1 everywhere)."""
    import jax.numpy as jnp

    from i2v_adapter_tpu.pipelines.tiling import tiled_unet_call

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 40, 2, 2, 3)).astype(np.float32)
    )

    def unet_apply(chunk, anchored):
        return chunk

    out = tiled_unet_call(unet_apply, x, window=16, stride=12)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-6)

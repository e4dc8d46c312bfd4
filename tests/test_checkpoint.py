"""Checkpoint subsystems: adapter interchange files, epoch discovery,
Orbax train-state save/restore, pipeline export."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from i2v_adapter_tpu.config import TrainConfig, tiny_test_config
from i2v_adapter_tpu.models import VideoUNet
from i2v_adapter_tpu.training import checkpoint as ckpt
from i2v_adapter_tpu.training.state import create_train_state

MC = tiny_test_config()


@pytest.fixture(scope="module")
def unet_params():
    unet = VideoUNet(MC.unet)
    lat = 8
    return unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, lat, lat, 4)), jnp.zeros(()),
        jnp.zeros((1, 6, MC.unet.cross_attention_dim)),
        jnp.zeros((1, MC.unet.image_embed_dim)),
        enable_cross_frame_attn=True,
    )


def test_adapter_checkpoint_roundtrip(unet_params, tmp_path):
    d = str(tmp_path / "epoch_2")
    ckpt.save_adapter_checkpoint(
        jax.tree.map(np.asarray, unet_params), MC.unet, d, save_motion=True
    )
    assert os.path.exists(
        os.path.join(d, "i2v_adapter", "diffusion_pytorch_model.safetensors")
    )
    assert os.path.exists(
        os.path.join(d, "motion_modules", "diffusion_pytorch_model.safetensors")
    )
    # zero out adapters in a copy, reload from checkpoint, compare
    flat = dict(flatten_dict(unet_params["params"], sep="/"))
    zeroed = {
        k: (np.zeros_like(v) if "i2v_adapter" in k or "motion_modules" in k
            else np.asarray(v))
        for k, v in flat.items()
    }
    from flax.traverse_util import unflatten_dict

    restored = ckpt.load_adapter_checkpoint(
        unflatten_dict(zeroed, sep="/"), MC.unet, d
    )
    rflat = flatten_dict(restored, sep="/")
    for k, v in flat.items():
        if "i2v_adapter" in k or "motion_modules" in k:
            np.testing.assert_allclose(
                np.asarray(rflat[k]), np.asarray(v), rtol=1e-6,
                err_msg=k,
            )


def test_find_latest_epoch(tmp_path):
    assert ckpt.find_latest_epoch(str(tmp_path)) is None
    for n in (2, 4, 10):
        os.makedirs(tmp_path / f"epoch_{n}")
    (tmp_path / "epoch_bogus").mkdir()
    assert ckpt.find_latest_epoch(str(tmp_path)) == 10


def test_orbax_train_state_roundtrip(unet_params, tmp_path):
    tc = TrainConfig(use_ema=True)
    state, _ = create_train_state(unet_params, tc, 10)
    mgr = ckpt.TrainCheckpointer(str(tmp_path / "orbax"), max_to_keep=2)
    mgr.save(0, state)
    bumped = state.replace(
        step=state.step + 5,
        trainable=jax.tree.map(lambda x: x + 1.0, state.trainable),
    )
    mgr.save(5, bumped)
    assert mgr.latest_step() == 5
    restored, step = mgr.restore(jax.tree.map(np.zeros_like, bumped))
    assert step == 5
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.trainable)[0]),
        np.asarray(jax.tree.leaves(bumped.trainable)[0]),
    )


def test_orbax_async_save_roundtrip(unet_params, tmp_path):
    """``async_save=True``: save() returns without blocking on the disk
    write; overlapping saves serialize inside Orbax; wait() commits.  The
    restored tree must match exactly — async moves the write off the step
    loop, it must not change what lands on disk."""
    tc = TrainConfig()
    state, _ = create_train_state(unet_params, tc, 10)
    mgr = ckpt.TrainCheckpointer(
        str(tmp_path / "orbax_async"), max_to_keep=2, async_save=True
    )
    mgr.save(0, state)
    bumped = state.replace(
        step=state.step + 5,
        trainable=jax.tree.map(lambda x: x + 1.0, state.trainable),
    )
    mgr.save(5, bumped)  # overlaps the in-flight step-0 write
    mgr.wait()
    assert mgr.latest_step() == 5
    restored, step = mgr.restore(jax.tree.map(np.zeros_like, bumped))
    assert step == 5
    for k, got in zip(
        jax.tree.leaves(bumped.trainable), jax.tree.leaves(restored.trainable)
    ):
        np.testing.assert_allclose(np.asarray(got), np.asarray(k))


def test_pipeline_export_roundtrip(unet_params, tmp_path):
    params = {"unet": jax.tree.map(np.asarray, unet_params)}
    ckpt.export_pipeline(params, MC, str(tmp_path / "pipe"))
    loaded = ckpt.load_pipeline_params(str(tmp_path / "pipe"))
    assert "unet" in loaded
    orig = flatten_dict(params["unet"], sep="/")
    got = flatten_dict(loaded["unet"], sep="/")
    assert set(orig) == set(got)
    assert os.path.exists(tmp_path / "pipe" / "model_config.json")

"""Training semantics: freeze policy, loss masking, train step on a single
device and on the 8-device CPU mesh (data-parallel + fsdp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from i2v_adapter_tpu.config import MeshConfig, TrainConfig, tiny_test_config
from i2v_adapter_tpu.models import (
    AutoencoderKL,
    CLIPTextEncoder,
    CLIPVisionEncoder,
    VideoUNet,
)
from i2v_adapter_tpu.parallel.mesh import batch_sharding, create_mesh
from i2v_adapter_tpu.training.state import (
    create_train_state,
    make_optimizer,
    merge_params,
    partition_params,
    trainable_predicate,
)
from i2v_adapter_tpu.training.train_i2v import make_train_step

MC = tiny_test_config()
B, F, RES = 2, 4, 32
IMG = MC.image_encoder.image_size


@pytest.fixture(scope="module")
def all_params():
    rng = jax.random.PRNGKey(0)
    lat = RES // MC.vae.spatial_scale_factor
    unet = VideoUNet(MC.unet)
    unet_params = unet.init(
        rng, jnp.zeros((1, F, lat, lat, 4)), jnp.zeros(()),
        jnp.zeros((1, 8, MC.unet.cross_attention_dim)),
        jnp.zeros((1, MC.unet.image_embed_dim)),
        enable_cross_frame_attn=True,
    )
    vae_params = AutoencoderKL(MC.vae).init(rng, jnp.zeros((1, RES, RES, 3)))
    text_params = CLIPTextEncoder(MC.text_encoder).init(
        rng, jnp.zeros((1, 8), jnp.int32)
    )
    img_params = CLIPVisionEncoder(MC.image_encoder).init(
        rng, jnp.zeros((1, IMG, IMG, 3))
    )
    return unet_params, vae_params, text_params, img_params


def _batch(seed=0):
    r = np.random.default_rng(seed)
    return {
        "pixel_values": r.standard_normal((B, F, RES, RES, 3)).astype(np.float32),
        "text_ids": r.integers(0, 100, (B, 8)).astype(np.int32),
        "uncond_ids": np.zeros((B, 8), np.int32),
        "clip_image": r.standard_normal((B, IMG, IMG, 3)).astype(np.float32),
    }


def test_freeze_policy_partition(all_params):
    unet_params, *_ = all_params
    pred = trainable_predicate(TrainConfig())
    trainable, frozen = partition_params(unet_params["params"], pred)
    tkeys = list(flatten_dict(trainable, sep="/"))
    assert tkeys, "no trainable params"
    for k in tkeys:
        assert "i2v_adapter" in k and ("to_q" in k or "to_out" in k), k
    # to_k / to_v of the adapter stay frozen (tied to attn1 weights)
    fkeys = list(flatten_dict(frozen, sep="/"))
    assert any("i2v_adapter/to_k" in k for k in fkeys)
    # with motion updates, motion modules join the trainable set
    pred2 = trainable_predicate(TrainConfig(update_motion_modules=True))
    trainable2, _ = partition_params(unet_params["params"], pred2)
    assert any(
        "motion_modules" in k for k in flatten_dict(trainable2, sep="/")
    )
    # merge restores the exact original tree
    merged = merge_params(trainable, frozen)
    orig = flatten_dict(unet_params["params"], sep="/")
    got = flatten_dict(merged, sep="/")
    assert set(orig) == set(got)


def test_train_step_updates_only_trainable(all_params):
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=B, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
    )
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)
    step_fn = make_train_step(MC, tc, tx, donate=False)
    state2, metrics = step_fn(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    # trainable params moved, frozen unchanged
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.trainable,
        state2.trainable,
    )
    assert max(jax.tree.leaves(moved)) > 0
    same = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), state.frozen, state2.frozen
    )
    assert all(jax.tree.leaves(same))
    assert int(state2.step) == 1


def test_loss_excludes_first_frame(all_params):
    """With zero-init adapter the loss must not depend on the first frame's
    content: identical batches differing only in frame 0 give the same
    target/noising for frames 1..F-1 and frame 0 is masked out of the loss.
    We validate the masking arithmetic directly instead: loss equals MSE
    over frames 1..F-1 only."""
    # direct arithmetic check of the mask normalization
    se = np.ones((2, 4, 3, 3, 4), np.float32) * 2.0
    se[:, 0] = 99.0
    mask = np.ones_like(se)
    mask[:, 0] = 0
    loss = (se * mask).sum() / mask.sum()
    assert loss == pytest.approx(2.0)


def test_train_step_on_cpu_mesh(all_params):
    """Data-parallel + fsdp pjit on the 8-device simulated mesh — the
    multi-chip path the reference never tests (SURVEY.md §4)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=8, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
        uncond_prob_t=0.2, uncond_prob_i=0.2, use_ema=True,
        mesh=MeshConfig(data=-1, fsdp=2),
    )
    mesh = create_mesh(tc.mesh)
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)
    step_fn = make_train_step(MC, tc, tx, mesh=mesh, donate=False)
    r = np.random.default_rng(0)
    batch = {
        "pixel_values": r.standard_normal((8, F, RES, RES, 3)).astype(np.float32),
        "text_ids": r.integers(0, 100, (8, 8)).astype(np.int32),
        "uncond_ids": np.zeros((8, 8), np.int32),
        "clip_image": r.standard_normal((8, IMG, IMG, 3)).astype(np.float32),
    }
    with mesh:
        batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        state2, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert state2.ema is not None


def test_grad_accumulation_multisteps(all_params):
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=B, num_frames=F, resolution=RES,
        gradient_accumulation_steps=2, mixed_precision="none",
    )
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)
    step_fn = make_train_step(MC, tc, tx, donate=False)
    # first micro-step: no param update yet (MultiSteps accumulating)
    state2, _ = step_fn(state, _batch(0), jax.random.PRNGKey(0))
    unchanged = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), state.trainable, state2.trainable
    )
    assert all(jax.tree.leaves(unchanged))
    # second micro-step: update applied
    state3, _ = step_fn(state2, _batch(1), jax.random.PRNGKey(1))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state2.trainable,
        state3.trainable,
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_train_step_with_remat_and_bf16_frozen(all_params):
    """gradient_checkpointing (nn.remat on blocks) + frozen bf16 storage."""
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=B, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
        gradient_checkpointing=True, freeze_dtype="bfloat16",
    )
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    # frozen params stored in bf16, trainable stayed fp32
    frozen_leaf = jax.tree.leaves(state.frozen)[0]
    assert frozen_leaf.dtype == jnp.bfloat16
    assert jax.tree.leaves(state.trainable)[0].dtype == jnp.float32
    tx = make_optimizer(tc, 10)
    step_fn = make_train_step(MC, tc, tx, donate=False)
    state2, metrics = step_fn(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["skipped_nonfinite"]) == 0.0

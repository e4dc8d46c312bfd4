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


def test_loss_excludes_first_frame():
    """The production loss (train_i2v.diffusion_loss — the exact function the
    train step calls) must be invariant to frame-0 prediction error: perturb
    pred[:, 0] and assert the loss doesn't move."""
    from i2v_adapter_tpu.schedulers import make_schedule
    from i2v_adapter_tpu.training.train_i2v import diffusion_loss

    schedule = make_schedule(MC.scheduler)
    r = np.random.default_rng(0)
    pred = jnp.asarray(r.standard_normal((2, 4, 3, 3, 4)), jnp.float32)
    target = jnp.asarray(r.standard_normal((2, 4, 3, 3, 4)), jnp.float32)
    t = jnp.asarray([5, 9])
    base = diffusion_loss(pred, target, t, schedule, None, True)
    perturbed = diffusion_loss(
        pred.at[:, 0].add(100.0), target, t, schedule, None, True
    )
    assert float(base) == pytest.approx(float(perturbed))
    # ... and perturbing a non-first frame must move it
    moved = diffusion_loss(
        pred.at[:, 1].add(100.0), target, t, schedule, None, True
    )
    assert abs(float(moved) - float(base)) > 1.0
    # normalization: constant error of 2.0 on frames 1..F-1 -> loss 4.0
    ones = jnp.ones((2, 4, 3, 3, 4), jnp.float32)
    assert float(
        diffusion_loss(2 * ones, jnp.zeros_like(ones), t, schedule, None, True)
    ) == pytest.approx(4.0)
    # t2i mode (no exclusion) averages everything
    assert float(
        diffusion_loss(2 * ones, jnp.zeros_like(ones), t, schedule, None, False)
    ) == pytest.approx(4.0)
    # SNR branch matches the reference: NO frame-0 masking (plain mean)
    snr_base = diffusion_loss(pred, target, t, schedule, 5.0, True)
    snr_pert = diffusion_loss(pred.at[:, 0].add(1.0), target, t, schedule, 5.0, True)
    assert abs(float(snr_pert) - float(snr_base)) > 0.0


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

    # baseline: same step single-device (replicated, no mesh)
    ref_step = make_train_step(MC, tc, tx, donate=False)
    r = np.random.default_rng(0)
    batch = {
        "pixel_values": r.standard_normal((8, F, RES, RES, 3)).astype(np.float32),
        "text_ids": r.integers(0, 100, (8, 8)).astype(np.int32),
        "uncond_ids": np.zeros((8, 8), np.int32),
        "clip_image": r.standard_normal((8, IMG, IMG, 3)).astype(np.float32),
    }
    ref_state, ref_metrics = ref_step(state, batch, jax.random.PRNGKey(0))

    # fsdp-sharded state: large leaves actually split over the fsdp axis
    from i2v_adapter_tpu.parallel.mesh import train_state_shardings

    shardings = train_state_shardings(state, mesh, min_size=1024)
    sharded_state = jax.device_put(state, shardings)
    split = [
        p for p in jax.tree.leaves(sharded_state.frozen)
        if p.addressable_shards[0].data.shape != p.shape
    ]
    assert split, "fsdp axis sharded nothing"

    step_fn = make_train_step(
        MC, tc, tx, mesh=mesh, donate=False, state_shardings=shardings
    )
    with mesh:
        dbatch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        state2, metrics = step_fn(sharded_state, dbatch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert state2.ema is not None
    # sharded step must agree with the replicated step
    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-4
    )
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.tree.map(np.asarray, state2.trainable), ref_state.trainable,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4
    # the updated state keeps its fsdp sharding (out_shardings pinned)
    still_split = [
        p for p in jax.tree.leaves(state2.frozen)
        if p.addressable_shards[0].data.shape != p.shape
    ]
    assert still_split


def test_train_step_frozen_replicated(all_params):
    """``fsdp_frozen='replicate'``: the no-gradient partitions (frozen UNet
    weights + encoder towers) stay fully replicated — deleting the per-use
    frozen-param all-gathers the compiled-graph audit measured at 15.2
    GB/device/step (BASELINE.md multi-chip table) — while the gradient-
    bearing state still ZeRO-shards, and the step's numerics are unchanged
    vs a single-device run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=8, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
        fsdp_frozen="replicate", mesh=MeshConfig(data=-1, fsdp=2),
    )
    mesh = create_mesh(tc.mesh)
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)

    ref_step = make_train_step(MC, tc, tx, donate=False)
    r = np.random.default_rng(3)
    batch = {
        "pixel_values": r.standard_normal((8, F, RES, RES, 3)).astype(np.float32),
        "text_ids": r.integers(0, 100, (8, 8)).astype(np.int32),
        "uncond_ids": np.zeros((8, 8), np.int32),
        "clip_image": r.standard_normal((8, IMG, IMG, 3)).astype(np.float32),
    }
    _, ref_metrics = ref_step(state, batch, jax.random.PRNGKey(0))

    from i2v_adapter_tpu.parallel.mesh import train_state_shardings

    shardings = train_state_shardings(
        state, mesh, min_size=256, frozen_replicated=True
    )
    sharded_state = jax.device_put(state, shardings)
    # every frozen/encoder leaf replicated (full shard shape) ...
    for sub in (sharded_state.frozen, sharded_state.vae,
                sharded_state.text_encoder, sharded_state.image_encoder):
        for p in jax.tree.leaves(sub):
            assert p.addressable_shards[0].data.shape == p.shape
    # ... while the gradient-bearing state still ZeRO-shards
    grad_bearing = list(jax.tree.leaves(sharded_state.trainable)) + list(
        jax.tree.leaves(sharded_state.opt_state)
    )
    assert any(
        p.addressable_shards[0].data.shape != p.shape for p in grad_bearing
    ), "replicate mode must still shard the trainable/opt state"

    step_fn = make_train_step(
        MC, tc, tx, mesh=mesh, donate=False, state_shardings=shardings
    )
    with mesh:
        dbatch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        state2, metrics = step_fn(sharded_state, dbatch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-4
    )
    # out_shardings keep the frozen partition replicated across steps
    for p in jax.tree.leaves(state2.frozen):
        assert p.addressable_shards[0].data.shape == p.shape


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


def test_adafactor_optimizer_state_is_factored(all_params):
    """optimizer='adafactor' runs a step and its second-moment state is
    factored (O(rows+cols)), unlike adamw's two param-sized moments —
    the 8-bit-Adam memory analogue (ref train_image_to_video.py:706-719)."""
    from i2v_adapter_tpu.config import OptimizerConfig

    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=B, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
        optimizer=OptimizerConfig(optimizer="adafactor"),
    )
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)
    step_fn = make_train_step(MC, tc, tx, donate=False)
    state2, metrics = step_fn(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.trainable,
        state2.trainable,
    )
    assert max(jax.tree.leaves(moved)) > 0
    # factoring check at production scale: a (256, 512) matrix's second
    # moment must be stored as row+col vectors, not a full matrix (the tiny
    # model's dims sit below adafactor's 128 min_dim_size_to_factor, so
    # measure factoring directly)
    import optax

    big = {"w": jnp.zeros((256, 512))}
    opt_state = make_optimizer(tc, 10).init(big)
    n_opt = sum(
        x.size for x in jax.tree.leaves(opt_state) if hasattr(x, "size")
    )
    assert n_opt < 256 * 512  # adamw stores 2 * 256*512


def test_train_step_sequence_parallel_matches_replicated(all_params):
    """Frame-axis sequence parallelism (seq mesh axis): a dp x sp sharded
    step must agree with the replicated step — XLA's inserted collectives
    (temporal attention, cross-frame K/V, motion GroupNorm stats) preserve
    the math."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 simulated devices")
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=4, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
        mesh=MeshConfig(data=-1, seq=2),
    )
    mesh = create_mesh(tc.mesh)
    assert mesh.shape["seq"] == 2 and mesh.shape["data"] == 4
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)

    ref_step = make_train_step(MC, tc, tx, donate=False)
    r = np.random.default_rng(1)
    batch = {
        "pixel_values": r.standard_normal((4, F, RES, RES, 3)).astype(np.float32),
        "text_ids": r.integers(0, 100, (4, 8)).astype(np.int32),
        "uncond_ids": np.zeros((4, 8), np.int32),
        "clip_image": r.standard_normal((4, IMG, IMG, 3)).astype(np.float32),
    }
    ref_state, ref_metrics = ref_step(state, batch, jax.random.PRNGKey(0))

    step_fn = make_train_step(MC, tc, tx, mesh=mesh, donate=False)
    with mesh:
        dbatch = {
            k: jax.device_put(
                v,
                batch_sharding(
                    mesh, v.ndim,
                    frame_axis=1 if k == "pixel_values" else None,
                ),
            )
            for k, v in batch.items()
        }
        # frames really are split over the seq axis
        pv = dbatch["pixel_values"]
        assert pv.addressable_shards[0].data.shape[1] == F // 2
        state2, metrics = step_fn(state, dbatch, jax.random.PRNGKey(0))
    assert float(metrics["loss"]) == pytest.approx(
        float(ref_metrics["loss"]), rel=1e-4
    )
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        jax.tree.map(np.asarray, state2.trainable), ref_state.trainable,
    )
    assert max(jax.tree.leaves(diffs)) < 1e-4


def test_train_step_sliced_vae_encode(all_params):
    """vae_encode_slice bounds encoder memory (512px enabler); the sliced
    step must train normally (finite loss, trainable params move)."""
    unet_params, vae_params, text_params, img_params = all_params
    tc = TrainConfig(
        train_batch_size=B, num_frames=F, resolution=RES,
        gradient_accumulation_steps=1, mixed_precision="none",
        vae_encode_slice=2,
    )
    state, _ = create_train_state(
        unet_params, tc, 10, vae_params, text_params, img_params
    )
    tx = make_optimizer(tc, 10)
    step_fn = make_train_step(MC, tc, tx, donate=False)
    state2, metrics = step_fn(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.trainable,
        state2.trainable,
    )
    assert max(jax.tree.leaves(moved)) > 0

"""Mesh-sharded inference: shard_map-wrapped Pallas kernels and tensor-
parallel rules, validated by sharded-vs-single-device equivalence on the
8-device CPU mesh (the standard JAX trick for testing SPMD without TPUs).

The reference has no multi-device inference at all
(/root/reference/src/pipelines/pipeline_i2v_adapter.py is single-GPU with
CPU offload); this is the 'beyond' capability that breaks the single-chip
latency roofline (BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from i2v_adapter_tpu.config import MeshConfig
from i2v_adapter_tpu.ops.attention import (
    dot_product_attention,
    temporal_attention,
)
from i2v_adapter_tpu.parallel.mesh import create_mesh
from i2v_adapter_tpu.parallel.spmd import (
    attention_spmd,
    current_attention_spmd,
    pipeline_param_shardings,
    tp_param_shardings,
)


@pytest.fixture(scope="module")
def mesh222():
    # data=2, tensor=2, seq=2 over the 8 simulated CPU devices
    return create_mesh(MeshConfig(data=2, fsdp=1, tensor=2, seq=2))


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_spmd_flash_self_attention_matches_plain(rng, mesh222):
    # 2 CFG clips x 4 frames flattened, spatial self-attention (kv_repeat=1)
    bf, n, h, d = 8, 64, 4, 8
    q, k, v = (_rand(rng, (bf, n, h, d)) for _ in range(3))
    ref = dot_product_attention(q, k, v, impl="pallas_interpret")
    with mesh222:
        with attention_spmd(mesh222):
            assert current_attention_spmd() is not None
            out = jax.jit(
                lambda q, k, v: dot_product_attention(
                    q, k, v, impl="pallas_interpret"
                )
            )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_spmd_flash_cross_frame_matches_plain(rng, mesh222):
    # cross-frame adapter site: K/V one entry per clip, kv_repeat=frames
    clips, frames, n, h, d = 2, 4, 32, 4, 8
    q = _rand(rng, (clips * frames, n, h, d))
    k = _rand(rng, (clips, n, h, d))
    v = _rand(rng, (clips, n, h, d))
    ref = dot_product_attention(
        q, k, v, kv_repeat=frames, impl="pallas_interpret"
    )
    with mesh222:
        with attention_spmd(mesh222):
            out = jax.jit(
                lambda q, k, v: dot_product_attention(
                    q, k, v, kv_repeat=frames, impl="pallas_interpret"
                )
            )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_spmd_flash_multiclip_kv_repeat_matches_plain(rng):
    """Training / batched-serving shape: MULTIPLE clips per clip-shard
    (k.shape[0] % clip_size == 0, frames unsharded) — the relaxation that
    lets the train step's cross-frame sites ride the shard_map kernel
    instead of degrading to XLA (one-clip-per-shard was an inference-only
    assumption)."""
    mesh = create_mesh(MeshConfig(data=8, fsdp=1, tensor=1, seq=1))
    clips, frames, n, h, d = 16, 2, 32, 4, 8
    q = _rand(rng, (clips * frames, n, h, d))
    k = _rand(rng, (clips, n, h, d))
    v = _rand(rng, (clips, n, h, d))
    ref = dot_product_attention(
        q, k, v, kv_repeat=frames, impl="pallas_interpret"
    )
    with mesh:
        with attention_spmd(mesh):
            out = jax.jit(
                lambda q, k, v: dot_product_attention(
                    q, k, v, kv_repeat=frames, impl="pallas_interpret"
                )
            )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_spmd_composite_clip_axes_matches_plain(rng):
    """The train step's SPMD context shards the batch over (data, fsdp)
    jointly (parallel.mesh.batch_sharding): both the kv_repeat=1 and the
    multi-clip cross-frame paths must be exact under a composite clip
    axis."""
    mesh = create_mesh(MeshConfig(data=2, fsdp=2, tensor=1, seq=2))
    bf, n, h, d = 16, 32, 4, 8
    q, k, v = (_rand(rng, (bf, n, h, d)) for _ in range(3))
    ref = dot_product_attention(q, k, v, impl="pallas_interpret")
    with mesh:
        with attention_spmd(mesh, clip_axis=("data", "fsdp")):
            ctx = current_attention_spmd()
            assert ctx.clip_axes == ("data", "fsdp")
            assert ctx.eval_parallelism == 8
            out = jax.jit(
                lambda q, k, v: dot_product_attention(
                    q, k, v, impl="pallas_interpret"
                )
            )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    # cross-frame with multiple clips per shard: seq-sharded frames make it
    # illegal (clip-major slabs would mix partial clips) -> must still be
    # exact via the XLA fallback; with seq=1 the shard_map path handles it
    clips, frames = 8, 2
    q2 = _rand(rng, (clips * frames, n, h, d))
    k2 = _rand(rng, (clips, n, h, d))
    v2 = _rand(rng, (clips, n, h, d))
    ref2 = dot_product_attention(
        q2, k2, v2, kv_repeat=frames, impl="pallas_interpret"
    )
    with mesh:
        with attention_spmd(mesh, clip_axis=("data", "fsdp")):
            out2 = jax.jit(
                lambda q, k, v: dot_product_attention(
                    q, k, v, kv_repeat=frames, impl="pallas_interpret"
                )
            )(q2, k2, v2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-5)


def test_spmd_temporal_matches_plain(rng, mesh222):
    b, f, s, c = 2, 4, 16, 16
    q, k, v = (_rand(rng, (b, f, s, c)) for _ in range(3))
    ref = temporal_attention(q, k, v, heads=2, impl="pallas_interpret")
    with mesh222:
        with attention_spmd(mesh222):
            out = jax.jit(
                lambda q, k, v: temporal_attention(
                    q, k, v, heads=2, impl="pallas_interpret"
                )
            )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_spmd_temporal_cs_matches_plain(rng, mesh222):
    """The channel-major temporal kernel through the seq-sharded SPMD
    wrapper (local query frames vs all-gathered K/V) == unsharded."""
    b, f, s, c = 2, 4, 16, 16
    q, k, v = (_rand(rng, (b, f, s, c)) for _ in range(3))
    ref = temporal_attention(q, k, v, heads=2, impl="pallas_cs_interpret")
    with mesh222:
        with attention_spmd(mesh222):
            out = jax.jit(
                lambda q, k, v: temporal_attention(
                    q, k, v, heads=2, impl="pallas_cs_interpret"
                )
            )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_spmd_fallback_on_unshardable_shapes(rng, mesh222):
    # batch of 3 clips is not divisible by the 4-way eval parallelism: the
    # dispatcher must fall back to the plain (replicated) call, still exact
    q, k, v = (_rand(rng, (3, 16, 2, 8)) for _ in range(3))
    ref = dot_product_attention(q, k, v, impl="pallas_interpret")
    with mesh222:
        with attention_spmd(mesh222):
            out = dot_product_attention(q, k, v, impl="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_tp_param_shardings_rules(mesh222):
    from jax.sharding import PartitionSpec as P

    params = {
        "params": {
            "attn1": {
                "to_q": {"kernel": jnp.zeros((16, 16))},
                "to_out": {"kernel": jnp.zeros((16, 16)),
                           "bias": jnp.zeros((16,))},
            },
            "ff": {"proj": {"kernel": jnp.zeros((16, 128))}},
            "conv": {"kernel": jnp.zeros((3, 3, 16, 16))},
        }
    }
    sh = tp_param_shardings(params, mesh222)
    p = sh["params"]
    assert p["attn1"]["to_q"]["kernel"].spec == P(None, "tensor")
    assert p["attn1"]["to_out"]["kernel"].spec == P("tensor", None)
    assert p["attn1"]["to_out"]["bias"].spec == P()
    # GEGLU proj deliberately unsharded (midpoint split)
    assert p["ff"]["proj"]["kernel"].spec == P()
    assert p["conv"]["kernel"].spec == P()


def test_pipeline_param_shardings_structure(mesh222):
    params = {
        "unet": {"params": {"to_q": {"kernel": jnp.zeros((16, 16))}}},
        "vae": {"params": {"conv": {"kernel": jnp.zeros((3, 3, 4, 4))}}},
    }
    sh = pipeline_param_shardings(params, mesh222)
    from jax.sharding import PartitionSpec as P

    assert sh["unet"]["params"]["to_q"]["kernel"].spec == P(None, "tensor")
    assert sh["vae"]["params"]["conv"]["kernel"].spec == P()


@pytest.fixture(scope="module")
def tiny_mesh_pipeline(tmp_path_factory):
    from i2v_adapter_tpu.config import PipelineConfig, tiny_test_config
    from i2v_adapter_tpu.models import (
        AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder, VideoUNet,
    )
    from i2v_adapter_tpu.pipelines.i2v_pipeline import I2VAdapterPipeline
    from i2v_adapter_tpu.utils.tokenizer import make_test_tokenizer

    mc = tiny_test_config()
    # exact convs: these tests assert mesh-vs-single-device equivalence at
    # tight tolerance; the serving-default int8 quantization would flip
    # buckets on shard_map reduce-order ulp diffs
    pc = PipelineConfig(
        num_frames=4, height=32, width=32, num_inference_steps=2,
        dtype="float32", blur_sigma=1.0, int8_conv=False,
    )
    tok = make_test_tokenizer(str(tmp_path_factory.mktemp("tok")))
    key = jax.random.PRNGKey(0)
    lat = 32 // mc.vae.spatial_scale_factor
    unet = VideoUNet(mc.unet)
    vae = AutoencoderKL(mc.vae)
    text_enc = CLIPTextEncoder(mc.text_encoder)
    img_enc = CLIPVisionEncoder(mc.image_encoder)
    s = mc.image_encoder.image_size
    params = {
        "unet": unet.init(
            key, jnp.zeros((1, 4, lat, lat, 4)), jnp.zeros(()),
            jnp.zeros((1, 16, mc.unet.cross_attention_dim)),
            jnp.zeros((1, mc.unet.image_embed_dim)),
            enable_cross_frame_attn=True,
        ),
        "vae": vae.init(key, jnp.zeros((1, 32, 32, 3))),
        "text_encoder": text_enc.init(key, jnp.zeros((1, 16), jnp.int32)),
        "image_encoder": img_enc.init(key, jnp.zeros((1, s, s, 3))),
    }
    return I2VAdapterPipeline(mc, params, tok, pc)


def test_pipeline_mesh_matches_single_device(tiny_mesh_pipeline, mesh222):
    """Full sampler equivalence: mesh-sharded (data x tensor x seq) output
    must match the single-device sampler bit-for-bit-close.  This is the
    multi-chip inference path the single-chip roofline requires
    (VERDICT r2 #1)."""
    img = (np.random.default_rng(2).random((32, 32, 3)) * 255).astype(np.uint8)
    pipe = tiny_mesh_pipeline
    ref = pipe("a cat", condition_image=img, seed=3, output_type="float")
    try:
        pipe.enable_mesh(mesh222)
        assert pipe.mesh is mesh222
        out = pipe("a cat", condition_image=img, seed=3, output_type="float")
    finally:
        pipe.disable_mesh()
    np.testing.assert_allclose(out, ref, atol=5e-4)
    # cache invalidated per mode; single-device still reproduces
    again = pipe("a cat", condition_image=img, seed=3, output_type="float")
    np.testing.assert_allclose(again, ref, atol=0)


def test_pipeline_mesh_stepwise_matches_single_device(tiny_mesh_pipeline, mesh222):
    """The stepwise dispatcher (one jit per denoise step — the config-5
    path) composes with the mesh: sharded stepwise output must match the
    single-device fused sampler."""
    img = (np.random.default_rng(7).random((32, 32, 3)) * 255).astype(np.uint8)
    pipe = tiny_mesh_pipeline
    ref = pipe("a dog", condition_image=img, seed=11, output_type="float",
               dispatch="scan")
    try:
        pipe.enable_mesh(mesh222)
        out = pipe("a dog", condition_image=img, seed=11, output_type="float",
                   dispatch="stepwise")
    finally:
        pipe.disable_mesh()
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_pipeline_mesh_envelope_scales(tiny_mesh_pipeline, mesh222):
    """The HBM envelope guard scales with the mesh's eval parallelism."""
    pipe = tiny_mesh_pipeline
    # tiny VAE has spatial_scale_factor 2 -> 128px = 4096 latent tokens;
    # 256 evals x 4096 tokens = 2x the single-chip budget but within the
    # 4x (data=2 x seq=2) mesh budget
    evals = 8 * 16 * 2  # batch 8, 16 frames, CFG
    with pytest.raises(ValueError):
        pipe._check_memory_envelope(evals, 128, 128, 8)
    try:
        pipe.enable_mesh(mesh222)
        pipe._check_memory_envelope(evals, 128, 128, 8)  # now passes
    finally:
        pipe.disable_mesh()


def test_spmd_conv3x3_matches_plain(rng, mesh222):
    """The Pallas conv through the (clip, frame)-sharded wrapper ==
    unsharded (weights replicated, eval axis split)."""
    from i2v_adapter_tpu.ops.conv3x3 import conv3x3_pallas
    from i2v_adapter_tpu.parallel.spmd import attention_spmd, spmd_conv3x3

    x = _rand(rng, (4, 8, 8, 128))
    k = _rand(rng, (3, 3, 128, 128)) / 20
    b = _rand(rng, (128,))
    ref = conv3x3_pallas(x, k, b, interpret=True)
    with mesh222:
        with attention_spmd(mesh222) as ctx:
            out = jax.jit(
                lambda x, k, b: spmd_conv3x3(
                    lambda hl, kl, bl: conv3x3_pallas(
                        hl, kl, bl, interpret=True
                    ),
                    x, k, b, ctx,
                )
            )(x, k, b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4
    )

"""Weight-converter tests.

Without diffusers in this environment, fidelity is checked two ways:
1. *structure*: converting a synthetic torch-layout state dict (built from
   shape rules) must produce exactly the param tree Flax init produces;
2. *numerics*: primitive layers (Linear/Conv/GroupNorm/LayerNorm/attention)
   are cross-checked against torch.nn in test_torch_parity.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from i2v_adapter_tpu.config import tiny_test_config
from i2v_adapter_tpu.models import AutoencoderKL, CLIPTextEncoder, CLIPVisionEncoder, VideoUNet
from i2v_adapter_tpu.utils import convert

CFG = tiny_test_config()


def _torch_layout_from_flax(flat_params, renames):
    """Build a synthetic torch state dict with the right shapes from a flax
    flat tree by inverting the converter's conventions."""
    sd = {}
    for key, val in flat_params.items():
        arr = np.asarray(val)
        sd[key] = arr
    return sd


def _unet_torch_sd(rng):
    """Random torch-layout SD-UNet + motion + ip state dicts matching the
    tiny config's shapes, built independently from the converter's rules."""
    cfg = CFG.unet
    sd, motion, ip = {}, {}, {"image_proj": {}, "ip_adapter": {}}

    def lin(name, i, o, bias=True, to=sd):
        to[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            to[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def conv(name, i, o, k=3, to=sd):
        to[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        to[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def norm(name, c, to=sd):
        to[f"{name}.weight"] = rng.standard_normal((c,)).astype(np.float32)
        to[f"{name}.bias"] = rng.standard_normal((c,)).astype(np.float32)

    def attn(name, dim, ctx=None, to=sd):
        ctx = ctx or dim
        lin(f"{name}.to_q", dim, dim, bias=False, to=to)
        lin(f"{name}.to_k", ctx, dim, bias=False, to=to)
        lin(f"{name}.to_v", ctx, dim, bias=False, to=to)
        lin(f"{name}.to_out.0", dim, dim, to=to)

    def tblock(name, dim, ctx, to=sd):
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{name}.{n}", dim, to=to)
        attn(f"{name}.attn1", dim, to=to)
        attn(f"{name}.attn2", dim, ctx, to=to)
        lin(f"{name}.ff.net.0.proj", dim, dim * 8, to=to)
        lin(f"{name}.ff.net.2", dim * 4, dim, to=to)

    def spatial(name, ch):
        norm(f"{name}.norm", ch)
        conv(f"{name}.proj_in", ch, ch, 1)
        tblock(f"{name}.transformer_blocks.0", ch, cfg.cross_attention_dim)
        conv(f"{name}.proj_out", ch, ch, 1)

    def temporal(name, ch):
        norm(f"{name}.norm", ch, to=motion)
        lin(f"{name}.proj_in", ch, ch, to=motion)
        tblock(f"{name}.transformer_blocks.0", ch, None, to=motion)
        lin(f"{name}.proj_out", ch, ch, to=motion)

    def resnet(name, ci, co):
        norm(f"{name}.norm1", ci)
        conv(f"{name}.conv1", ci, co)
        lin(f"{name}.time_emb_proj", cfg.time_embed_dim, co)
        norm(f"{name}.norm2", co)
        conv(f"{name}.conv2", co, co)
        if ci != co:
            conv(f"{name}.conv_shortcut", ci, co, 1)

    chans = cfg.block_out_channels
    conv("conv_in", cfg.in_channels, chans[0])
    lin("time_embedding.linear_1", chans[0], cfg.time_embed_dim)
    lin("time_embedding.linear_2", cfg.time_embed_dim, cfg.time_embed_dim)
    norm("conv_norm_out", chans[0])
    conv("conv_out", chans[0], cfg.out_channels)

    ci = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", ci if j == 0 else ch, ch)
            if cfg.down_block_has_attention[i]:
                spatial(f"down_blocks.{i}.attentions.{j}", ch)
            temporal(f"down_blocks.{i}.motion_modules.{j}.temporal_transformer", ch)
        if i < len(chans) - 1:
            conv(f"down_blocks.{i}.downsamplers.0.conv", ch, ch)
        ci = ch

    mid = chans[-1]
    resnet("mid_block.resnets.0", mid, mid)
    resnet("mid_block.resnets.1", mid, mid)
    spatial("mid_block.attentions.0", mid)
    temporal("mid_block.motion_modules.0.temporal_transformer", mid)

    rev = list(reversed(chans))
    prev_out = rev[0]
    for i, ch in enumerate(rev):
        input_ch = rev[min(i + 1, len(rev) - 1)]
        for j in range(cfg.layers_per_block + 1):
            res_skip = input_ch if j == cfg.layers_per_block else ch
            res_in = prev_out if j == 0 else ch
            resnet(f"up_blocks.{i}.resnets.{j}", res_in + res_skip, ch)
            if cfg.up_block_has_attention[i]:
                spatial(f"up_blocks.{i}.attentions.{j}", ch)
            temporal(f"up_blocks.{i}.motion_modules.{j}.temporal_transformer", ch)
        if i < len(rev) - 1:
            conv(f"up_blocks.{i}.upsamplers.0.conv", ch, ch)
        prev_out = ch

    # ip adapter
    d_img, d_txt = cfg.image_embed_dim, cfg.cross_attention_dim
    ip["image_proj"]["proj.weight"] = rng.standard_normal(
        (cfg.ip_num_tokens * d_txt, d_img)
    ).astype(np.float32)
    ip["image_proj"]["proj.bias"] = rng.standard_normal(
        (cfg.ip_num_tokens * d_txt,)
    ).astype(np.float32)
    ip["image_proj"]["norm.weight"] = rng.standard_normal((d_txt,)).astype(np.float32)
    ip["image_proj"]["norm.bias"] = rng.standard_normal((d_txt,)).astype(np.float32)
    key_id = 1
    for ch_list, has_list, layers in (
        (chans, cfg.down_block_has_attention, cfg.layers_per_block),
        (rev, cfg.up_block_has_attention, cfg.layers_per_block + 1),
    ):
        for i, ch in enumerate(ch_list):
            if not has_list[i]:
                continue
            for j in range(layers):
                ip["ip_adapter"][f"{key_id}.to_k_ip.weight"] = rng.standard_normal(
                    (ch, d_txt)
                ).astype(np.float32)
                ip["ip_adapter"][f"{key_id}.to_v_ip.weight"] = rng.standard_normal(
                    (ch, d_txt)
                ).astype(np.float32)
                key_id += 2
    ip["ip_adapter"][f"{key_id}.to_k_ip.weight"] = rng.standard_normal(
        (mid, d_txt)
    ).astype(np.float32)
    ip["ip_adapter"][f"{key_id}.to_v_ip.weight"] = rng.standard_normal(
        (mid, d_txt)
    ).astype(np.float32)
    return sd, motion, ip


def _tree_shapes(tree):
    return {k: np.asarray(v).shape for k, v in flatten_dict(tree, sep="/").items()}


def test_unet_convert_structure_matches_init(rng):
    sd, motion, ip = _unet_torch_sd(rng)
    converted = convert.convert_unet(sd, CFG.unet, motion, None, ip)

    unet = VideoUNet(CFG.unet)
    lat = 8
    init = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, lat, lat, 4)), jnp.zeros(()),
        jnp.zeros((1, 6, CFG.unet.cross_attention_dim)),
        jnp.zeros((1, CFG.unet.image_embed_dim)),
        enable_cross_frame_attn=True,
    )
    got, want = _tree_shapes(converted), _tree_shapes(init["params"])
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(want))[:8]}"
    )


def test_zero_init_adapter_values(rng):
    sd, motion, ip = _unet_torch_sd(rng)
    converted = convert.convert_unet(sd, CFG.unet, motion, None, ip)
    flat = flatten_dict(converted, sep="/")
    # adapter q/k/v copied from attn1; out zeroed
    site = "down_blocks_0/attentions_0/transformer_blocks_0"
    np.testing.assert_array_equal(
        flat[f"{site}/i2v_adapter/to_q/kernel"], flat[f"{site}/attn1/to_q/kernel"]
    )
    assert np.all(flat[f"{site}/i2v_adapter/to_out/kernel"] == 0)


def _plus_image_proj(rng, dim=16, hidden=24, n_q=4, depth=2, d_txt=None):
    """Original ip_adapter Resampler state-dict layout (IP-Adapter Plus)."""
    d_txt = d_txt or CFG.unet.cross_attention_dim
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    proj = {
        "latents": f32(1, n_q, dim),
        "proj_in.weight": f32(dim, hidden), "proj_in.bias": f32(dim),
        "proj_out.weight": f32(d_txt, dim), "proj_out.bias": f32(d_txt),
        "norm_out.weight": f32(d_txt), "norm_out.bias": f32(d_txt),
    }
    for i in range(depth):
        proj[f"layers.{i}.0.norm1.weight"] = f32(dim)
        proj[f"layers.{i}.0.norm1.bias"] = f32(dim)
        proj[f"layers.{i}.0.norm2.weight"] = f32(dim)
        proj[f"layers.{i}.0.norm2.bias"] = f32(dim)
        proj[f"layers.{i}.0.to_q.weight"] = f32(dim, dim)
        proj[f"layers.{i}.0.to_kv.weight"] = f32(2 * dim, dim)
        proj[f"layers.{i}.0.to_out.weight"] = f32(dim, dim)
        proj[f"layers.{i}.1.0.weight"] = f32(dim)
        proj[f"layers.{i}.1.0.bias"] = f32(dim)
        proj[f"layers.{i}.1.1.weight"] = f32(4 * dim, dim)
        proj[f"layers.{i}.1.3.weight"] = f32(dim, 4 * dim)
    return proj


def test_ip_adapter_variant_detection(rng):
    _, _, ip = _unet_torch_sd(rng)
    assert convert.detect_ip_adapter_variant(ip) == ("standard", 4)
    plus = {"image_proj": _plus_image_proj(rng), "ip_adapter": ip["ip_adapter"]}
    assert convert.detect_ip_adapter_variant(plus) == ("plus", 4)
    upd = convert.ip_config_updates(plus)
    assert upd == {
        "ip_variant": "plus", "ip_num_tokens": 4, "ip_resampler_dim": 16,
        "ip_resampler_depth": 2, "ip_hidden_dim": 24,
    }
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    ff = {"image_proj": {
        "proj.0.weight": f32(24, 24), "proj.0.bias": f32(24),
        "proj.2.weight": f32(16, 24), "proj.2.bias": f32(16),
        "proj.3.weight": f32(16), "proj.3.bias": f32(16),
    }, "ip_adapter": ip["ip_adapter"]}
    assert convert.detect_ip_adapter_variant(ff) == ("full_face", 257)
    assert convert.ip_config_updates(ff)["ip_hidden_dim"] == 24


def test_ip_adapter_plus_convert_and_forward(rng):
    """Synthesized Plus checkpoint -> convert -> structure matches init ->
    UNet forward over penultimate hidden states runs (VERDICT r1 #5)."""
    sd, motion, ip = _unet_torch_sd(rng)
    plus = {"image_proj": _plus_image_proj(rng), "ip_adapter": ip["ip_adapter"]}
    cfg = CFG.unet.replace(**convert.ip_config_updates(plus),
                           ip_resampler_heads=2)
    converted = convert.convert_unet(sd, cfg, motion, None, plus)

    unet = VideoUNet(cfg)
    lat, n_tok = 8, 5  # any token count of hidden states works
    args = (
        jnp.zeros((1, 2, lat, lat, 4)), jnp.zeros(()),
        jnp.zeros((1, 6, cfg.cross_attention_dim)),
        jnp.zeros((1, n_tok, cfg.ip_hidden_dim)),
    )
    init = unet.init(jax.random.PRNGKey(0), *args, enable_cross_frame_attn=True)
    got, want = _tree_shapes(converted), _tree_shapes(init["params"])
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(want))[:8]}"
    )
    out = unet.apply({"params": converted}, *args, enable_cross_frame_attn=True)
    assert out.shape == (1, 2, lat, lat, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ip_adapter_full_face_convert_and_forward(rng):
    sd, motion, ip = _unet_torch_sd(rng)
    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    d_txt = CFG.unet.cross_attention_dim
    ff = {"image_proj": {
        "proj.0.weight": f32(24, 24), "proj.0.bias": f32(24),
        "proj.2.weight": f32(d_txt, 24), "proj.2.bias": f32(d_txt),
        "proj.3.weight": f32(d_txt), "proj.3.bias": f32(d_txt),
    }, "ip_adapter": ip["ip_adapter"]}
    cfg = CFG.unet.replace(**convert.ip_config_updates(ff))
    converted = convert.convert_unet(sd, cfg, motion, None, ff)
    unet = VideoUNet(cfg)
    lat = 8
    args = (
        jnp.zeros((1, 2, lat, lat, 4)), jnp.zeros(()),
        jnp.zeros((1, 6, d_txt)),
        jnp.zeros((1, 257, cfg.ip_hidden_dim)),
    )
    out = unet.apply({"params": converted}, *args, enable_cross_frame_attn=True)
    assert out.shape == (1, 2, lat, lat, 4)
    assert np.all(np.isfinite(np.asarray(out)))


def test_adapter_extract_merge_roundtrip(rng):
    sd, motion, ip = _unet_torch_sd(rng)
    params = convert.convert_unet(sd, CFG.unet, motion, None, ip)
    adapter_sd = convert.extract_i2v_adapter(params, CFG.unet)
    assert adapter_sd, "no adapter keys extracted"
    # perturb, merge back, confirm values round-trip
    perturbed = {k: v + 1.0 for k, v in adapter_sd.items()}
    merged = convert.merge_i2v_adapter(params, perturbed, CFG.unet)
    flat = flatten_dict(merged, sep="/")
    orig = flatten_dict(params, sep="/")
    for k in flat:
        if "i2v_adapter" in k:
            np.testing.assert_allclose(flat[k], np.asarray(orig[k]) + 1.0, rtol=1e-6)
        else:
            np.testing.assert_array_equal(flat[k], orig[k])


def test_motion_extract_layout(rng):
    sd, motion, ip = _unet_torch_sd(rng)
    params = convert.convert_unet(sd, CFG.unet, motion, None, ip)
    out = convert.extract_motion_modules(params)
    # torch-layout keys round-trip against the synthetic motion dict
    assert set(out.keys()) == set(motion.keys()), (
        sorted(set(motion) - set(out))[:5], sorted(set(out) - set(motion))[:5]
    )
    for k in out:
        np.testing.assert_allclose(out[k], motion[k], rtol=1e-6)


def test_vae_convert_structure(rng):
    cfg = CFG.vae
    sd = {}

    def conv(name, i, o, k=3):
        sd[f"{name}.weight"] = rng.standard_normal((o, i, k, k)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = rng.standard_normal((c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((c,)).astype(np.float32)

    def lin(name, i, o):
        sd[f"{name}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        sd[f"{name}.bias"] = rng.standard_normal((o,)).astype(np.float32)

    def resnet(name, ci, co):
        norm(f"{name}.norm1", ci)
        conv(f"{name}.conv1", ci, co)
        norm(f"{name}.norm2", co)
        conv(f"{name}.conv2", co, co)
        if ci != co:
            conv(f"{name}.conv_shortcut", ci, co, 1)

    ch = cfg.block_out_channels
    conv("encoder.conv_in", 3, ch[0])
    ci = ch[0]
    for i, c in enumerate(ch):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", ci if j == 0 else c, c)
        if i < len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", c, c)
        ci = c
    m = ch[-1]
    resnet("encoder.mid_block.resnets.0", m, m)
    norm("encoder.mid_block.attentions.0.group_norm", m)
    for p in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"encoder.mid_block.attentions.0.{p}", m, m)
    resnet("encoder.mid_block.resnets.1", m, m)
    norm("encoder.conv_norm_out", m)
    conv("encoder.conv_out", m, 2 * cfg.latent_channels)

    conv("decoder.conv_in", cfg.latent_channels, m)
    resnet("decoder.mid_block.resnets.0", m, m)
    norm("decoder.mid_block.attentions.0.group_norm", m)
    for p in ("to_q", "to_k", "to_v", "to_out.0"):
        lin(f"decoder.mid_block.attentions.0.{p}", m, m)
    resnet("decoder.mid_block.resnets.1", m, m)
    rev = list(reversed(ch))
    ci = m
    for i, c in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", ci if j == 0 else c, c)
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", c, c)
        ci = c
    norm("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", rev[-1], cfg.out_channels)
    conv("quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
    conv("post_quant_conv", cfg.latent_channels, cfg.latent_channels, 1)

    converted = convert.convert_vae(sd, cfg)
    vae = AutoencoderKL(cfg)
    init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    got, want = _tree_shapes(converted), _tree_shapes(init["params"])
    assert got == want, (
        f"missing: {sorted(set(want) - set(got))[:8]} "
        f"extra: {sorted(set(got) - set(want))[:8]}"
    )


def test_clip_text_convert_structure(rng):
    cfg = CFG.text_encoder
    sd = {}
    p = "text_model."
    sd[f"{p}embeddings.token_embedding.weight"] = rng.standard_normal(
        (cfg.vocab_size, cfg.hidden_size)
    ).astype(np.float32)
    sd[f"{p}embeddings.position_embedding.weight"] = rng.standard_normal(
        (cfg.max_position_embeddings, cfg.hidden_size)
    ).astype(np.float32)
    for i in range(cfg.num_hidden_layers):
        base = f"{p}encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{base}.self_attn.{proj}.weight"] = rng.standard_normal(
                (cfg.hidden_size, cfg.hidden_size)
            ).astype(np.float32)
            sd[f"{base}.self_attn.{proj}.bias"] = rng.standard_normal(
                (cfg.hidden_size,)
            ).astype(np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{base}.{ln}.weight"] = np.ones(cfg.hidden_size, np.float32)
            sd[f"{base}.{ln}.bias"] = np.zeros(cfg.hidden_size, np.float32)
        sd[f"{base}.mlp.fc1.weight"] = rng.standard_normal(
            (cfg.intermediate_size, cfg.hidden_size)
        ).astype(np.float32)
        sd[f"{base}.mlp.fc1.bias"] = np.zeros(cfg.intermediate_size, np.float32)
        sd[f"{base}.mlp.fc2.weight"] = rng.standard_normal(
            (cfg.hidden_size, cfg.intermediate_size)
        ).astype(np.float32)
        sd[f"{base}.mlp.fc2.bias"] = np.zeros(cfg.hidden_size, np.float32)
    sd[f"{p}final_layer_norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    sd[f"{p}final_layer_norm.bias"] = np.zeros(cfg.hidden_size, np.float32)

    converted = convert.convert_clip_text(sd, cfg)
    enc = CLIPTextEncoder(cfg)
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    assert _tree_shapes(converted) == _tree_shapes(init["params"])

"""Synthetic torch-layout checkpoints for the tiny test config.

Builds state dicts with the exact shapes/keys of SD1.5-style checkpoints
(independently from the converter's rules) and can write a full
``from_pretrained``-able directory: unet/ vae/ text_encoder/ image_encoder/
motion_adapter/ ip_adapter/ tokenizer/.
"""

import json
import os

import numpy as np

from i2v_adapter_tpu.config import I2VModelConfig, tiny_test_config

CFG: I2VModelConfig = tiny_test_config()


def make_unet_sd(rng, cfg=None):
    """(unet_sd, motion_sd, ip_sd) for the tiny UNet config."""
    cfg = cfg or CFG.unet
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


def make_vae_sd(rng, cfg=None):
    cfg = cfg or CFG.vae
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
    return sd


def _clip_layers(rng, sd, prefix, hidden, inter, layers):
    for i in range(layers):
        base = f"{prefix}.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{base}.self_attn.{proj}.weight"] = rng.standard_normal(
                (hidden, hidden)
            ).astype(np.float32)
            sd[f"{base}.self_attn.{proj}.bias"] = rng.standard_normal(
                (hidden,)
            ).astype(np.float32)
        for ln in ("layer_norm1", "layer_norm2"):
            sd[f"{base}.{ln}.weight"] = np.ones(hidden, np.float32)
            sd[f"{base}.{ln}.bias"] = np.zeros(hidden, np.float32)
        sd[f"{base}.mlp.fc1.weight"] = rng.standard_normal(
            (inter, hidden)
        ).astype(np.float32)
        sd[f"{base}.mlp.fc1.bias"] = np.zeros(inter, np.float32)
        sd[f"{base}.mlp.fc2.weight"] = rng.standard_normal(
            (hidden, inter)
        ).astype(np.float32)
        sd[f"{base}.mlp.fc2.bias"] = np.zeros(hidden, np.float32)


def make_clip_text_sd(rng, cfg=None, vocab_size=None):
    cfg = cfg or CFG.text_encoder
    vocab = vocab_size or cfg.vocab_size
    sd = {}
    p = "text_model."
    sd[f"{p}embeddings.token_embedding.weight"] = rng.standard_normal(
        (vocab, cfg.hidden_size)
    ).astype(np.float32) * 0.02
    sd[f"{p}embeddings.position_embedding.weight"] = rng.standard_normal(
        (cfg.max_position_embeddings, cfg.hidden_size)
    ).astype(np.float32) * 0.01
    _clip_layers(rng, sd, f"{p}encoder", cfg.hidden_size, cfg.intermediate_size,
                 cfg.num_hidden_layers)
    sd[f"{p}final_layer_norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    sd[f"{p}final_layer_norm.bias"] = np.zeros(cfg.hidden_size, np.float32)
    return sd


def make_clip_vision_sd(rng, cfg=None):
    cfg = cfg or CFG.image_encoder
    sd = {}
    p = "vision_model."
    sd[f"{p}embeddings.patch_embedding.weight"] = rng.standard_normal(
        (cfg.hidden_size, 3, cfg.patch_size, cfg.patch_size)
    ).astype(np.float32) * 0.02
    sd[f"{p}embeddings.class_embedding"] = rng.standard_normal(
        (cfg.hidden_size,)
    ).astype(np.float32) * 0.02
    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    sd[f"{p}embeddings.position_embedding.weight"] = rng.standard_normal(
        (n_patches + 1, cfg.hidden_size)
    ).astype(np.float32) * 0.01
    for ln in ("pre_layrnorm", "post_layernorm"):
        sd[f"{p}{ln}.weight"] = np.ones(cfg.hidden_size, np.float32)
        sd[f"{p}{ln}.bias"] = np.zeros(cfg.hidden_size, np.float32)
    _clip_layers(rng, sd, f"{p}encoder", cfg.hidden_size, cfg.intermediate_size,
                 cfg.num_hidden_layers)
    sd["visual_projection.weight"] = rng.standard_normal(
        (cfg.projection_dim, cfg.hidden_size)
    ).astype(np.float32) * 0.02
    return sd


def write_pretrained_dir(root: str, rng, model_config=None) -> str:
    """Write a complete from_pretrained-able checkpoint directory."""
    from safetensors.numpy import save_file

    from i2v_adapter_tpu.utils.tokenizer import make_test_tokenizer

    cfg = model_config or CFG
    unet_sd, motion_sd, ip_sd = make_unet_sd(rng, cfg.unet)
    parts = {
        "unet": unet_sd,
        "motion_adapter": motion_sd,
        "vae": make_vae_sd(rng, cfg.vae),
        "text_encoder": make_clip_text_sd(rng, cfg.text_encoder),
        "image_encoder": make_clip_vision_sd(rng, cfg.image_encoder),
    }
    for name, sd in parts.items():
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        save_file(
            {k: np.ascontiguousarray(v) for k, v in sd.items()},
            os.path.join(d, "diffusion_pytorch_model.safetensors"),
        )
    # IP-Adapter .bin is a nested dict -> save via torch
    import torch

    ip_dir = os.path.join(root, "ip_adapter")
    os.makedirs(ip_dir, exist_ok=True)
    torch.save(
        {
            "image_proj": {k: torch.from_numpy(v) for k, v in ip_sd["image_proj"].items()},
            "ip_adapter": {k: torch.from_numpy(v) for k, v in ip_sd["ip_adapter"].items()},
        },
        os.path.join(ip_dir, "ip-adapter.bin"),
    )
    tok_dir = os.path.join(root, "tokenizer")
    os.makedirs(tok_dir, exist_ok=True)
    make_test_tokenizer(tok_dir)
    with open(os.path.join(root, "model_config.json"), "w") as f:
        json.dump(cfg.to_dict(), f)
    return root

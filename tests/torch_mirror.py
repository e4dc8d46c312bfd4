"""Pure-torch golden mirror of the reference forward math.

Composite-level parity oracle (VERDICT r1 #2): the environment has torch but
no diffusers, so these functions transcribe the *semantics* of the reference
stack — diffusers ResnetBlock2D / Transformer2DModel /
TransformerTemporalModel as instantiated by
/root/reference/src/models/unet_motion_cross_frame_attn.py, and the
I2V-Adapter block routing of /root/reference/src/modules/i2v_adapter.py:
420-565 — directly as torch.nn.functional calls over torch-layout state
dicts (the same flat dicts fed to utils/convert).  NCHW activations,
fp32, no modules/classes: every function is (state_dict, prefix, inputs) ->
output, so a parity failure pinpoints the exact composite.

This is TEST CODE ONLY — the framework never imports it.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, key):
    return torch.from_numpy(np.asarray(sd[key])).float()


def linear(sd, p, x):
    b = _t(sd, f"{p}.bias") if f"{p}.bias" in sd else None
    return F.linear(x, _t(sd, f"{p}.weight"), b)


def conv(sd, p, x, stride=1, padding=1):
    b = _t(sd, f"{p}.bias") if f"{p}.bias" in sd else None
    return F.conv2d(x, _t(sd, f"{p}.weight"), b, stride=stride, padding=padding)


def group_norm(sd, p, x, groups, eps):
    return F.group_norm(x, groups, _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), eps)


def layer_norm(sd, p, x, eps=1e-5):
    return F.layer_norm(
        x, x.shape[-1:], _t(sd, f"{p}.weight"), _t(sd, f"{p}.bias"), eps
    )


def attention(sd, p, x, ctx=None, heads=1, out_name="to_out.0"):
    """diffusers Attention with AttnProcessor2_0 (torch SDPA)."""
    ctx = x if ctx is None else ctx
    b, n, _ = x.shape
    q = linear(sd, f"{p}.to_q", x)
    k = linear(sd, f"{p}.to_k", ctx)
    v = linear(sd, f"{p}.to_v", ctx)
    d = q.shape[-1] // heads
    q = q.reshape(b, n, heads, d).transpose(1, 2)
    k = k.reshape(b, -1, heads, d).transpose(1, 2)
    v = v.reshape(b, -1, heads, d).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, n, heads * d)
    return linear(sd, f"{p}.{out_name}", o)


def geglu_ff(sd, p, x):
    h = linear(sd, f"{p}.net.0.proj", x)
    value, gate = h.chunk(2, dim=-1)
    return linear(sd, f"{p}.net.2", value * F.gelu(gate))


def i2v_transformer_block(
    sd, p, x, ctx, heads, *,
    adapter_sd=None, adapter_p=None,
    num_frames=1, cross_frame=False,
    ip_kv=None, ip_num_tokens=0, ip_scale=1.0,
):
    """I2VAdapterTransformerBlock forward (reference i2v_adapter.py:420-565,
    layer_norm variant): norm1 -> attn1 (+ cross-frame adapter ADDED to the
    attn1 output), norm2 -> attn2 (text + optional IP branch), norm3 -> FF.

    x: (B*F, N, C) clip-major frame-minor.  ctx: (B*F, L[+ip], C_ctx).
    ip_kv: (to_k_ip_weight, to_v_ip_weight) numpy arrays for this site."""
    norm_h = layer_norm(sd, f"{p}.norm1", x)
    attn_out = attention(sd, f"{p}.attn1", norm_h, heads=heads)
    if cross_frame:
        bf = x.shape[0]
        assert bf % num_frames == 0
        first = norm_h[0:bf:num_frames]  # (B, N, C), reference :484
        first = first.repeat_interleave(num_frames, dim=0)  # :485
        asd = adapter_sd if adapter_sd is not None else sd
        ap = adapter_p if adapter_p is not None else f"{p}.i2v_adapter"
        attn_out = attn_out + attention(
            asd, ap, norm_h, ctx=first, heads=heads
        )  # :487-494
    x = x + attn_out

    norm_h = layer_norm(sd, f"{p}.norm2", x)
    if ip_num_tokens > 0:
        # IPAdapterAttnProcessor2_0: separate K/V over the trailing image
        # tokens, scale-added BEFORE the shared to_out projection (reference
        # unet_motion_cross_frame_attn.py:1262-1281)
        text_ctx = ctx[:, : ctx.shape[1] - ip_num_tokens]
        ip_ctx = ctx[:, ctx.shape[1] - ip_num_tokens :]
        k_ip_w, v_ip_w = ip_kv
        b, n, _ = norm_h.shape
        q = linear(sd, f"{p}.attn2.to_q", norm_h)
        d = q.shape[-1] // heads
        q = q.reshape(b, n, heads, d).transpose(1, 2)

        def heads_attn(k, v):
            kh = k.reshape(b, -1, heads, d).transpose(1, 2)
            vh = v.reshape(b, -1, heads, d).transpose(1, 2)
            o = F.scaled_dot_product_attention(q, kh, vh)
            return o.transpose(1, 2).reshape(b, n, heads * d)

        o_text = heads_attn(
            linear(sd, f"{p}.attn2.to_k", text_ctx),
            linear(sd, f"{p}.attn2.to_v", text_ctx),
        )
        o_ip = heads_attn(
            F.linear(ip_ctx, torch.from_numpy(np.asarray(k_ip_w)).float()),
            F.linear(ip_ctx, torch.from_numpy(np.asarray(v_ip_w)).float()),
        )
        out = linear(sd, f"{p}.attn2.to_out.0", o_text + ip_scale * o_ip)
    else:
        out = attention(sd, f"{p}.attn2", norm_h, ctx=ctx, heads=heads)
    x = x + out

    norm_h = layer_norm(sd, f"{p}.norm3", x)
    return x + geglu_ff(sd, f"{p}.ff", norm_h)


def spatial_transformer(
    sd, p, x, ctx, heads, *, num_layers=1, groups=32, **block_kw
):
    """Transformer2DModel (conv projections): GroupNorm(eps 1e-6) -> conv1x1
    proj_in -> (B, HW, C) blocks -> conv1x1 proj_out + residual."""
    b, c, h, w = x.shape
    residual = x
    y = group_norm(sd, f"{p}.norm", x, groups, 1e-6)
    y = conv(sd, f"{p}.proj_in", y, padding=0)
    inner = y.shape[1]
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, inner)
    for k in range(num_layers):
        y = i2v_transformer_block(
            sd, f"{p}.transformer_blocks.{k}", y, ctx, heads, **block_kw
        )
    y = y.reshape(b, h, w, inner).permute(0, 3, 1, 2)
    y = conv(sd, f"{p}.proj_out", y, padding=0)
    return y + residual


def motion_pe(f, dim):
    """diffusers SinusoidalPositionalEmbedding (interleaved sin/cos)."""
    position = torch.arange(f).unsqueeze(1).float()
    div = torch.exp(
        torch.arange(0, dim, 2).float() * (-math.log(10000.0) / dim)
    )
    pe = torch.zeros(f, dim)
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe


def temporal_transformer(
    sd, p, x, num_frames, heads, *, groups=32, num_layers=1
):
    """TransformerTemporalModel as the motion module (reference
    unet_motion_cross_frame_attn.py:232-244): GroupNorm over (B,C,F,H,W),
    Linear proj_in, blocks with double self-attention + interleaved pe,
    Linear proj_out, residual.  x: (B*F, C, H, W)."""
    bf, c, h, w = x.shape
    b = bf // num_frames
    residual = x
    y = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
    y = group_norm(sd, f"{p}.norm", y, groups, 1e-6)
    y = y.permute(0, 3, 4, 2, 1).reshape(b * h * w, num_frames, c)
    y = linear(sd, f"{p}.proj_in", y)
    inner = y.shape[-1]
    pe = motion_pe(num_frames, inner)[None]
    for i in range(num_layers):
        bp = f"{p}.transformer_blocks.{i}"
        norm_h = layer_norm(sd, f"{bp}.norm1", y) + pe
        y = y + attention(sd, f"{bp}.attn1", norm_h, heads=heads)
        norm_h = layer_norm(sd, f"{bp}.norm2", y) + pe
        y = y + attention(sd, f"{bp}.attn2", norm_h, heads=heads)
        norm_h = layer_norm(sd, f"{bp}.norm3", y)
        y = y + geglu_ff(sd, f"{bp}.ff", norm_h)
    y = linear(sd, f"{p}.proj_out", y)
    y = y.reshape(b, h, w, num_frames, c).permute(0, 3, 4, 1, 2)
    return y.reshape(bf, c, h, w) + residual


def resnet_block(sd, p, x, temb=None, groups=32, eps=1e-5):
    """diffusers ResnetBlock2D with timestep injection (reference :202-215)."""
    h = group_norm(sd, f"{p}.norm1", x, groups, eps)
    h = F.silu(h)
    h = conv(sd, f"{p}.conv1", h)
    if temb is not None and f"{p}.time_emb_proj.weight" in sd:
        t = linear(sd, f"{p}.time_emb_proj", F.silu(temb))
        h = h + t[:, :, None, None]
    h = group_norm(sd, f"{p}.norm2", h, groups, eps)
    h = F.silu(h)
    h = conv(sd, f"{p}.conv2", h)
    if f"{p}.conv_shortcut.weight" in sd:
        x = conv(sd, f"{p}.conv_shortcut", x, padding=0)
    return x + h


def timestep_embedding(timesteps, dim):
    """diffusers Timesteps: flip_sin_to_cos=True, freq_shift=0."""
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half).float() / half
    freqs = torch.exp(exponent)[None] * timesteps.float()[:, None]
    return torch.cat([torch.cos(freqs), torch.sin(freqs)], dim=-1)


def image_projection(sd, image_embeds, num_tokens, cross_dim):
    """Standard 4-token IP-Adapter head (ImageProjection)."""
    b = image_embeds.shape[0]
    x = linear(sd, "proj", image_embeds).reshape(b, num_tokens, cross_dim)
    return F.layer_norm(
        x, (cross_dim,), _t(sd, "norm.weight"), _t(sd, "norm.bias"), 1e-5
    )


def video_unet(
    cfg, sd, motion_sd, ip_sd, sample, timestep, text_states, image_embeds,
    *, cross_frame=True, adapter_sd=None,
):
    """Full UNetMotionCrossFrameAttnModel forward (reference :1289-1451).

    sample: (B, F, C, H, W) torch; text_states (B, L, C_txt);
    image_embeds (B, D_img).  Returns (B, F, C_out, H, W)."""
    b, f, c, h, w = sample.shape
    ts = torch.full((b,), float(timestep)) if np.ndim(timestep) == 0 else timestep
    temb = timestep_embedding(ts, cfg.block_out_channels[0])
    temb = linear(sd, "time_embedding.linear_1", temb)
    temb = F.silu(temb)
    temb = linear(sd, "time_embedding.linear_2", temb)
    temb = temb.repeat_interleave(f, dim=0)

    ctx = text_states
    ip_num = 0
    ip_sites = None
    if ip_sd is not None and cfg.use_ip_adapter:
        ip_num = cfg.ip_num_tokens
        tokens = image_projection(
            ip_sd["image_proj"], image_embeds, ip_num, cfg.cross_attention_dim
        )
        ctx = torch.cat([ctx, tokens], dim=1)
        # site -> (k_ip, v_ip) using the converter's key ordering
        from i2v_adapter_tpu.utils.convert import _ip_site_order

        ip_sites = {}
        key_id = 1
        for site in _ip_site_order(cfg):
            ip_sites[site] = (
                ip_sd["ip_adapter"][f"{key_id}.to_k_ip.weight"],
                ip_sd["ip_adapter"][f"{key_id}.to_v_ip.weight"],
            )
            key_id += 2
    ctx = ctx.repeat_interleave(f, dim=0)

    def spatial_kw(site):
        return dict(
            num_layers=cfg.transformer_layers_per_block,
            groups=cfg.norm_num_groups,
            num_frames=f, cross_frame=cross_frame and cfg.use_i2v_adapter,
            ip_num_tokens=ip_num,
            ip_kv=ip_sites[site] if ip_sites else None,
            ip_scale=cfg.ip_scale,
            adapter_sd=adapter_sd,
        )

    x = sample.reshape(b * f, c, h, w)
    x = conv(sd, "conv_in", x)
    heads = cfg.num_attention_heads
    mheads = cfg.motion_num_attention_heads
    n = len(cfg.block_out_channels)
    L = cfg.layers_per_block

    skips = [x]
    for i in range(n):
        for j in range(L):
            x = resnet_block(
                sd, f"down_blocks.{i}.resnets.{j}", x, temb,
                cfg.norm_num_groups, cfg.norm_eps,
            )
            if cfg.down_block_has_attention[i]:
                site = f"down_blocks_{i}/attentions_{j}/transformer_blocks_0"
                x = spatial_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", x, ctx, heads,
                    **spatial_kw(site),
                )
            if cfg.use_motion_modules:
                x = temporal_transformer(
                    motion_sd,
                    f"down_blocks.{i}.motion_modules.{j}.temporal_transformer",
                    x, f, mheads, groups=cfg.norm_num_groups,
                )
            skips.append(x)
        if i < n - 1:
            x = conv(sd, f"down_blocks.{i}.downsamplers.0.conv", x, stride=2)
            skips.append(x)

    # mid: resnet -> [attn -> motion -> resnet]
    x = resnet_block(sd, "mid_block.resnets.0", x, temb,
                     cfg.norm_num_groups, cfg.norm_eps)
    x = spatial_transformer(
        sd, "mid_block.attentions.0", x, ctx, heads,
        **spatial_kw("mid_block/attentions_0/transformer_blocks_0"),
    )
    if cfg.use_motion_modules and cfg.use_motion_mid_block:
        x = temporal_transformer(
            motion_sd, "mid_block.motion_modules.0.temporal_transformer",
            x, f, mheads, groups=cfg.norm_num_groups,
        )
    x = resnet_block(sd, "mid_block.resnets.1", x, temb,
                     cfg.norm_num_groups, cfg.norm_eps)

    for i in range(n):
        for j in range(L + 1):
            skip = skips.pop()
            x = torch.cat([x, skip], dim=1)
            x = resnet_block(
                sd, f"up_blocks.{i}.resnets.{j}", x, temb,
                cfg.norm_num_groups, cfg.norm_eps,
            )
            if cfg.up_block_has_attention[i]:
                site = f"up_blocks_{i}/attentions_{j}/transformer_blocks_0"
                x = spatial_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", x, ctx, heads,
                    **spatial_kw(site),
                )
            if cfg.use_motion_modules:
                x = temporal_transformer(
                    motion_sd,
                    f"up_blocks.{i}.motion_modules.{j}.temporal_transformer",
                    x, f, mheads, groups=cfg.norm_num_groups,
                )
        if i < n - 1:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = conv(sd, f"up_blocks.{i}.upsamplers.0.conv", x)

    x = group_norm(sd, "conv_norm_out", x, cfg.norm_num_groups, cfg.norm_eps)
    x = F.silu(x)
    x = conv(sd, "conv_out", x)
    return x.reshape(b, f, cfg.out_channels, h, w)


# ---------------------------------------------------------------------------
# VAE mirror (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------


def vae_attention(sd, p, x, groups):
    b, c, h, w = x.shape
    residual = x
    y = group_norm(sd, f"{p}.group_norm", x, groups, 1e-6)
    y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
    q = linear(sd, f"{p}.to_q", y)
    k = linear(sd, f"{p}.to_k", y)
    v = linear(sd, f"{p}.to_v", y)
    o = F.scaled_dot_product_attention(
        q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
    ).squeeze(1)
    y = linear(sd, f"{p}.to_out.0", o)
    return residual + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


def vae_encoder(cfg, sd, x):
    """x: (B, 3, H, W) -> moments (B, 2*latent, h, w) after quant_conv."""
    y = conv(sd, "encoder.conv_in", x)
    n = len(cfg.block_out_channels)
    for i, c in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            y = resnet_block(
                sd, f"encoder.down_blocks.{i}.resnets.{j}", y,
                groups=cfg.norm_num_groups, eps=1e-6,
            )
        if i < n - 1:
            y = F.pad(y, (0, 1, 0, 1))
            y = conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", y,
                     stride=2, padding=0)
    y = resnet_block(sd, "encoder.mid_block.resnets.0", y,
                     groups=cfg.norm_num_groups, eps=1e-6)
    y = vae_attention(sd, "encoder.mid_block.attentions.0", y,
                      cfg.norm_num_groups)
    y = resnet_block(sd, "encoder.mid_block.resnets.1", y,
                     groups=cfg.norm_num_groups, eps=1e-6)
    y = group_norm(sd, "encoder.conv_norm_out", y, cfg.norm_num_groups, 1e-6)
    y = F.silu(y)
    y = conv(sd, "encoder.conv_out", y)
    return conv(sd, "quant_conv", y, padding=0)


def vae_decoder(cfg, sd, z):
    """z: (B, latent, h, w) -> (B, 3, H, W)."""
    y = conv(sd, "post_quant_conv", z, padding=0)
    y = conv(sd, "decoder.conv_in", y)
    y = resnet_block(sd, "decoder.mid_block.resnets.0", y,
                     groups=cfg.norm_num_groups, eps=1e-6)
    y = vae_attention(sd, "decoder.mid_block.attentions.0", y,
                      cfg.norm_num_groups)
    y = resnet_block(sd, "decoder.mid_block.resnets.1", y,
                     groups=cfg.norm_num_groups, eps=1e-6)
    rev = list(reversed(cfg.block_out_channels))
    for i, c in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            y = resnet_block(
                sd, f"decoder.up_blocks.{i}.resnets.{j}", y,
                groups=cfg.norm_num_groups, eps=1e-6,
            )
        if i < len(rev) - 1:
            y = F.interpolate(y, scale_factor=2.0, mode="nearest")
            y = conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", y)
    y = group_norm(sd, "decoder.conv_norm_out", y, cfg.norm_num_groups, 1e-6)
    y = F.silu(y)
    return conv(sd, "decoder.conv_out", y)


# ---------------------------------------------------------------------------
# IP-Adapter Plus resampler mirror (original ip_adapter Resampler math)
# ---------------------------------------------------------------------------


def resampler(proj_sd, hidden_states, heads):
    """IP-Adapter Plus Resampler: latents attend to [proj_in(x) ∥ latents]
    through depth perceiver layers, then proj_out + norm_out."""
    lat = _t(proj_sd, "latents")  # (1, n_q, dim)
    b = hidden_states.shape[0]
    lat = lat.expand(b, -1, -1)
    x = linear(proj_sd, "proj_in", hidden_states)
    depth = len({k.split(".")[1] for k in proj_sd if k.startswith("layers.")})
    dim = lat.shape[-1]
    d = dim // heads
    for i in range(depth):
        p = f"layers.{i}.0"
        xn = layer_norm(proj_sd, f"{p}.norm1", x)
        ln = layer_norm(proj_sd, f"{p}.norm2", lat)
        q = linear(proj_sd, f"{p}.to_q", ln)
        kv_in = torch.cat([xn, ln], dim=-2)
        kv = linear(proj_sd, f"{p}.to_kv", kv_in)
        k, v = kv.chunk(2, dim=-1)
        m, n = q.shape[1], k.shape[1]
        q = q.reshape(b, m, heads, d).transpose(1, 2)
        k = k.reshape(b, n, heads, d).transpose(1, 2)
        v = v.reshape(b, n, heads, d).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, m, dim)
        lat = lat + linear(proj_sd, f"{p}.to_out", o)
        h = layer_norm(proj_sd, f"layers.{i}.1.0", lat)
        h = linear(proj_sd, f"layers.{i}.1.1", h)
        h = F.gelu(h)
        h = linear(proj_sd, f"layers.{i}.1.3", h)
        lat = lat + h
    lat = linear(proj_sd, "proj_out", lat)
    return F.layer_norm(
        lat, lat.shape[-1:], _t(proj_sd, "norm_out.weight"),
        _t(proj_sd, "norm_out.bias"), 1e-5,
    )

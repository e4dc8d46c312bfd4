"""The motion + cross-frame-attention video UNet.

TPU-native equivalent of the reference ``UNetMotionCrossFrameAttnModel``
(/root/reference/src/models/unet_motion_cross_frame_attn.py:696-1451):
SD1.5 spatial blocks hosting the I2V-Adapter cross-frame attention, the
IP-Adapter image branch, and AnimateDiff temporal motion modules.

Design departures from the reference (deliberate, TPU-first):

* NHWC activations; frames flattened into the batch as (B*F, H, W, C) with
  clips major and frames minor (same ordering as the reference's
  ``(b f) c h w``).
* One Flax module tree instead of diffusers block-type-string dispatch; the
  per-depth booleans in ``VideoUNetConfig`` select spatial-attention blocks.
* ``enable_cross_frame_attn`` / ``num_frames`` are trace-static, so jit
  produces straight-line XLA with no data-dependent control flow.
* Rematerialization (``config.remat``) wraps each block for training-time
  activation checkpointing — the analogue of the reference's
  ``enable_gradient_checkpointing`` (:283-310).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2v_adapter_tpu.config import VideoUNetConfig
from i2v_adapter_tpu.models.attention import SpatialTransformer
from i2v_adapter_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)
from i2v_adapter_tpu.models.temporal import TemporalTransformer


class ImageProjection(nn.Module):
    """IP-Adapter image-projection head: image_embeds (B, D_img) -> N pseudo
    text tokens (B, N, C_text).  Reference installs it as ``encoder_hid_proj``
    (/root/reference/src/models/unet_motion_cross_frame_attn.py:1283-1287)."""

    num_tokens: int
    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        b = image_embeds.shape[0]
        x = nn.Dense(
            self.num_tokens * self.cross_attention_dim, dtype=self.dtype, name="proj"
        )(image_embeds)
        x = x.reshape(b, self.num_tokens, self.cross_attention_dim)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class PerceiverAttention(nn.Module):
    """One IP-Adapter-Plus resampler attention layer: latents query the
    concatenation of image features and latents (the original ip_adapter
    ``PerceiverAttention`` math the reference loads through diffusers'
    converter, unet_motion_cross_frame_attn.py:1283-1287)."""

    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        dim = latents.shape[-1]
        d = dim // self.heads
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(dtype=self.dtype, name="norm2")(latents)
        q = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(2 * dim, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        b, m, _ = q.shape
        n = k.shape[1]
        qh = q.reshape(b, m, self.heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhmd,bhnd->bhmn", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(d).astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhmn,bhnd->bhmd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, m, dim)
        return nn.Dense(dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class IPAdapterPlusResampler(nn.Module):
    """IP-Adapter Plus projection head: learned query latents resampled
    against the penultimate CLIP-vision hidden states through ``depth``
    perceiver layers (detected by the reference via the ``latents`` key,
    unet_motion_cross_frame_attn.py:1235-1239)."""

    num_queries: int
    dim: int
    depth: int
    heads: int
    cross_attention_dim: int
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        b = hidden_states.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(1.0), (self.num_queries, self.dim)
        )
        lat = jnp.broadcast_to(
            latents.astype(self.dtype)[None], (b, self.num_queries, self.dim)
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            hidden_states.astype(self.dtype)
        )
        for i in range(self.depth):
            lat = PerceiverAttention(
                heads=self.heads, dtype=self.dtype, name=f"layers_{i}_attn"
            )(x, lat) + lat
            # FeedForward: LayerNorm -> Linear(4x, no bias) -> GELU -> Linear
            h = nn.LayerNorm(dtype=self.dtype, name=f"layers_{i}_ff_norm")(lat)
            h = nn.Dense(
                self.dim * self.ff_mult, use_bias=False, dtype=self.dtype,
                name=f"layers_{i}_ff_in",
            )(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(
                self.dim, use_bias=False, dtype=self.dtype,
                name=f"layers_{i}_ff_out",
            )(h)
            lat = lat + h
        lat = nn.Dense(
            self.cross_attention_dim, dtype=self.dtype, name="proj_out"
        )(lat)
        return nn.LayerNorm(dtype=self.dtype, name="norm_out")(lat)


class IPAdapterFullFaceProjection(nn.Module):
    """IP-Adapter full-face head: tokenwise MLP over the 257 penultimate
    hidden-state tokens (Linear -> GELU -> Linear -> LayerNorm; detected by
    the reference via ``proj.3.weight``, :1233-1235)."""

    cross_attention_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray) -> jnp.ndarray:
        in_dim = hidden_states.shape[-1]
        x = nn.Dense(in_dim, dtype=self.dtype, name="proj_0")(
            hidden_states.astype(self.dtype)
        )
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.cross_attention_dim, dtype=self.dtype, name="proj_2")(x)
        return nn.LayerNorm(dtype=self.dtype, name="proj_3")(x)


class DownBlock(nn.Module):
    """Down block: [resnet (+ spatial transformer) + motion] x L, optional
    downsample.  Covers both CrossFrameAttnDownBlockMotion and
    DownBlockMotion (reference :164-340)."""

    config: VideoUNetConfig
    out_channels: int
    num_layers: int
    has_attention: bool
    add_downsample: bool
    # static per-trace call context (attributes, not call kwargs, so
    # nn.remat doesn't turn them into tracers)
    enable_cross_frame_attn: bool = False
    num_frames: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
    ):
        cfg = self.config
        enable_cross_frame_attn = self.enable_cross_frame_attn
        num_frames = self.num_frames
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                out_channels=self.out_channels, groups=cfg.norm_num_groups,
                eps=cfg.norm_eps, int8=cfg.int8_conv, conv_impl=cfg.conv_impl, dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.has_attention:
                x = SpatialTransformer(
                    heads=cfg.num_attention_heads,
                    dim_head=self.out_channels // cfg.num_attention_heads,
                    num_layers=cfg.transformer_layers_per_block,
                    use_linear_projection=cfg.use_linear_projection,
                    use_i2v_adapter=cfg.use_i2v_adapter,
                    ip_num_tokens=cfg.ip_num_tokens if cfg.use_ip_adapter else 0,
                    ip_scale=cfg.ip_scale, gelu_tanh=cfg.fast_gelu,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    attn_impl="auto" if cfg.flash_attention else "xla",
                    static_max=cfg.flash_static_max,
                    name=f"attentions_{i}",
                )(
                    x, encoder_hidden_states,
                    enable_cross_frame_attn=enable_cross_frame_attn,
                    num_frames=num_frames,
                )
            if cfg.use_motion_modules:
                x = TemporalTransformer(
                    heads=cfg.motion_num_attention_heads,
                    dim_head=self.out_channels // cfg.motion_num_attention_heads,
                    max_seq_length=cfg.motion_max_seq_length,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    gelu_tanh=cfg.fast_gelu,
                    attn_impl="auto" if cfg.flash_attention else "xla",
                    name=f"motion_modules_{i}",
                )(x, num_frames=num_frames)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, int8=cfg.int8_conv, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UpBlock(nn.Module):
    """Up block with skip-concat resnets (reference :342-529); FreeU skip
    re-weighting applied on the two coarsest stages when configured
    (reference :453-476)."""

    config: VideoUNetConfig
    out_channels: int
    num_layers: int
    has_attention: bool
    add_upsample: bool
    stage: int = 0
    enable_cross_frame_attn: bool = False
    num_frames: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Tuple[jnp.ndarray, ...],
        temb: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
    ):
        cfg = self.config
        enable_cross_frame_attn = self.enable_cross_frame_attn
        num_frames = self.num_frames
        for i in range(self.num_layers):
            skip = skips[-(i + 1)]
            if cfg.freeu is not None:
                from i2v_adapter_tpu.ops.freeu import FreeUParams, apply_freeu

                x, skip = apply_freeu(
                    self.stage, x, skip, FreeUParams(*cfg.freeu)
                )
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(
                out_channels=self.out_channels, groups=cfg.norm_num_groups,
                eps=cfg.norm_eps, int8=cfg.int8_conv, conv_impl=cfg.conv_impl, dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            if self.has_attention:
                x = SpatialTransformer(
                    heads=cfg.num_attention_heads,
                    dim_head=self.out_channels // cfg.num_attention_heads,
                    num_layers=cfg.transformer_layers_per_block,
                    use_linear_projection=cfg.use_linear_projection,
                    use_i2v_adapter=cfg.use_i2v_adapter,
                    ip_num_tokens=cfg.ip_num_tokens if cfg.use_ip_adapter else 0,
                    ip_scale=cfg.ip_scale, gelu_tanh=cfg.fast_gelu,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    attn_impl="auto" if cfg.flash_attention else "xla",
                    static_max=cfg.flash_static_max,
                    name=f"attentions_{i}",
                )(
                    x, encoder_hidden_states,
                    enable_cross_frame_attn=enable_cross_frame_attn,
                    num_frames=num_frames,
                )
            if cfg.use_motion_modules:
                x = TemporalTransformer(
                    heads=cfg.motion_num_attention_heads,
                    dim_head=self.out_channels // cfg.motion_num_attention_heads,
                    max_seq_length=cfg.motion_max_seq_length,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    gelu_tanh=cfg.fast_gelu,
                    attn_impl="auto" if cfg.flash_attention else "xla",
                    name=f"motion_modules_{i}",
                )(x, num_frames=num_frames)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, int8=cfg.int8_conv, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    """Mid block: resnet -> [spatial attn -> motion -> resnet] x L
    (reference UNetMidBlockCrossFrameAttnMotion, :531-694)."""

    config: VideoUNetConfig
    channels: int
    num_layers: int = 1
    enable_cross_frame_attn: bool = False
    num_frames: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
    ):
        cfg = self.config
        enable_cross_frame_attn = self.enable_cross_frame_attn
        num_frames = self.num_frames
        x = ResnetBlock2D(
            out_channels=self.channels, groups=cfg.norm_num_groups,
            eps=cfg.norm_eps, int8=cfg.int8_conv, conv_impl=cfg.conv_impl, dtype=self.dtype, name="resnets_0",
        )(x, temb)
        for i in range(self.num_layers):
            x = SpatialTransformer(
                heads=cfg.num_attention_heads,
                dim_head=self.channels // cfg.num_attention_heads,
                num_layers=cfg.transformer_layers_per_block,
                use_linear_projection=cfg.use_linear_projection,
                use_i2v_adapter=cfg.use_i2v_adapter,
                ip_num_tokens=cfg.ip_num_tokens if cfg.use_ip_adapter else 0,
                ip_scale=cfg.ip_scale, gelu_tanh=cfg.fast_gelu,
                groups=cfg.norm_num_groups, dtype=self.dtype,
                attn_impl="auto" if cfg.flash_attention else "xla",
                static_max=cfg.flash_static_max,
                name=f"attentions_{i}",
            )(
                x, encoder_hidden_states,
                enable_cross_frame_attn=enable_cross_frame_attn,
                num_frames=num_frames,
            )
            if cfg.use_motion_modules and cfg.use_motion_mid_block:
                x = TemporalTransformer(
                    heads=cfg.motion_num_attention_heads,
                    dim_head=self.channels // cfg.motion_num_attention_heads,
                    max_seq_length=cfg.motion_max_seq_length,
                    groups=cfg.norm_num_groups, dtype=self.dtype,
                    gelu_tanh=cfg.fast_gelu,
                    attn_impl="auto" if cfg.flash_attention else "xla",
                    name=f"motion_modules_{i}",
                )(x, num_frames=num_frames)
            x = ResnetBlock2D(
                out_channels=self.channels, groups=cfg.norm_num_groups,
                eps=cfg.norm_eps, int8=cfg.int8_conv, conv_impl=cfg.conv_impl, dtype=self.dtype, name=f"resnets_{i + 1}",
            )(x, temb)
        return x


class VideoUNet(nn.Module):
    """Full video UNet.  Forward mirrors reference :1289-1451.

    Inputs:
      sample:  (B, F, H, W, C_in) noisy latents
      timestep: scalar or (B,)
      encoder_hidden_states: (B, L, C_text) CLIP text states
      image_embeds: (B, D_img) CLIP image embedding for IP-Adapter, optional
    Returns (B, F, H, W, C_out) prediction.
    """

    config: VideoUNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timestep: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,
        image_embeds: Optional[jnp.ndarray] = None,
        *,
        enable_cross_frame_attn: bool = False,
        return_encoder: bool = False,
        cached_encoder=None,
    ) -> jnp.ndarray:
        """``return_encoder=True`` additionally returns the down-path
        output ``(x, skips)``; ``cached_encoder=(x, skips)`` skips
        conv_in + the down path and reuses those features (the time
        tower, IP tokens, mid and up paths run fresh at the current
        timestep) — the encoder-propagation approximation of
        "Faster Diffusion" (arXiv:2312.09608), used by the pipeline's
        opt-in ``encoder_cache`` serving mode."""
        cfg = self.config
        b, f, h, w, c = sample.shape

        # 1. time embedding, broadcast per frame (clip-major order).
        ts = jnp.broadcast_to(jnp.asarray(timestep, dtype=jnp.float32).reshape(-1), (b,))
        t_emb = timestep_embedding(ts, cfg.block_out_channels[0])
        emb = TimestepEmbedding(
            cfg.time_embed_dim, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))
        emb = jnp.repeat(emb, f, axis=0)  # (B*F, time_embed_dim)

        # 2. IP-Adapter image tokens appended to text tokens.  The head is
        # selected by the detected checkpoint variant (reference :1231-1239):
        # 'standard' consumes the projected embedding (B, D); 'plus' and
        # 'full_face' consume penultimate hidden states (B, N, D_hidden).
        if cfg.use_ip_adapter:
            if image_embeds is None:
                raise ValueError("image_embeds required when use_ip_adapter")
            if cfg.ip_variant == "plus":
                image_tokens = IPAdapterPlusResampler(
                    num_queries=cfg.ip_num_tokens,
                    dim=cfg.ip_resampler_dim,
                    depth=cfg.ip_resampler_depth,
                    heads=cfg.ip_resampler_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    dtype=self.dtype, name="encoder_hid_proj",
                )(image_embeds.astype(self.dtype))
            elif cfg.ip_variant == "full_face":
                image_tokens = IPAdapterFullFaceProjection(
                    cross_attention_dim=cfg.cross_attention_dim,
                    dtype=self.dtype, name="encoder_hid_proj",
                )(image_embeds.astype(self.dtype))
            else:
                image_tokens = ImageProjection(
                    num_tokens=cfg.ip_num_tokens,
                    cross_attention_dim=cfg.cross_attention_dim,
                    dtype=self.dtype, name="encoder_hid_proj",
                )(image_embeds.astype(self.dtype))
            encoder_hidden_states = jnp.concatenate(
                [encoder_hidden_states.astype(self.dtype), image_tokens], axis=1
            )
        ctx = jnp.repeat(encoder_hidden_states.astype(self.dtype), f, axis=0)

        # 3. flatten frames into batch; conv_in (skipped entirely when the
        # down path comes from ``cached_encoder``).
        if cached_encoder is None:
            x = sample.reshape(b * f, h, w, c).astype(self.dtype)
            x = nn.Conv(
                cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                name="conv_in",
            )(x)
        else:
            x = None

        block_ctx = dict(
            enable_cross_frame_attn=enable_cross_frame_attn, num_frames=f
        )

        # 4. down path.
        n_blocks = cfg.num_blocks
        if cached_encoder is not None:
            x, skips = cached_encoder
            skips = list(skips)
        else:
            skips = [x]
            for i in range(n_blocks):
                block_cls = DownBlock
                if cfg.remat:
                    block_cls = nn.remat(DownBlock, prevent_cse=False)
                x, block_skips = block_cls(
                    config=cfg,
                    out_channels=cfg.block_out_channels[i],
                    num_layers=cfg.layers_per_block,
                    has_attention=cfg.down_block_has_attention[i],
                    add_downsample=i < n_blocks - 1,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                    **block_ctx,
                )(x, emb, ctx)
                skips.extend(block_skips)
        encoder_features = (x, tuple(skips))

        # 5. mid.
        mid_cls = nn.remat(MidBlock, prevent_cse=False) if cfg.remat else MidBlock
        x = mid_cls(
            config=cfg, channels=cfg.block_out_channels[-1], dtype=self.dtype,
            name="mid_block", **block_ctx,
        )(x, emb, ctx)

        # 6. up path.
        reversed_channels = tuple(reversed(cfg.block_out_channels))
        for i in range(n_blocks):
            num_layers = cfg.layers_per_block + 1
            block_skips = tuple(skips[-num_layers:])
            skips = skips[:-num_layers]
            up_cls = nn.remat(UpBlock, prevent_cse=False) if cfg.remat else UpBlock
            x = up_cls(
                config=cfg,
                out_channels=reversed_channels[i],
                num_layers=num_layers,
                has_attention=cfg.up_block_has_attention[i],
                add_upsample=i < n_blocks - 1,
                stage=i,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
                **block_ctx,
            )(x, block_skips, emb, ctx)

        # 7. output head.
        from i2v_adapter_tpu.models.layers import group_norm

        x = group_norm(
            cfg.norm_num_groups, cfg.norm_eps, self.dtype, "conv_norm_out"
        )(x)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        out = x.reshape(b, f, h, w, cfg.out_channels)
        if return_encoder:
            return out, encoder_features
        return out

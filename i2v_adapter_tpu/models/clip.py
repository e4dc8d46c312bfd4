"""CLIP text and vision encoders in Flax.

The reference uses HF ``CLIPTextModel`` (SD1.5 text conditioning) and
``CLIPVisionModelWithProjection`` (IP-Adapter image embedding); see
/root/reference/src/train_image_to_video.py:816-824 and
/root/reference/src/pipelines/pipeline_i2v_adapter.py:323-345.  Re-built
here (transformers' Flax classes were dropped upstream, and the framework
should stand alone): a standard pre-LN transformer with quick-GELU, causal
masking for text, class-token pooling + linear projection for vision.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from i2v_adapter_tpu.config import CLIPTextConfig, CLIPVisionConfig


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


_ACTS = {"quick_gelu": quick_gelu, "gelu": lambda x: nn.gelu(x, approximate=False)}


class CLIPAttention(nn.Module):
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, n, c = x.shape
        d = c // self.heads
        dense = lambda name: nn.Dense(c, dtype=self.dtype, name=name)
        q = dense("q_proj")(x).reshape(b, n, self.heads, d)
        k = dense("k_proj")(x).reshape(b, n, self.heads, d)
        v = dense("v_proj")(x).reshape(b, n, self.heads, d)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(d))
        if mask is not None:
            scores = scores + mask
        probs = nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return dense("out_proj")(out.reshape(b, n, c))


class CLIPMLP(nn.Module):
    intermediate_size: int
    hidden_act: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        h = _ACTS[self.hidden_act](h)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)


class CLIPEncoderLayer(nn.Module):
    heads: int
    intermediate_size: int
    hidden_act: str
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.heads, dtype=self.dtype, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        x = x + CLIPMLP(
            self.intermediate_size, self.hidden_act, dtype=self.dtype, name="mlp"
        )(h)
        return x


class CLIPTextEncoder(nn.Module):
    """Returns the final-LN hidden states (B, L, C) — what SD conditions on.

    ``clip_skip`` > 0 returns the hidden states clip_skip layers before the
    end, after the final LayerNorm (diffusers encode_prompt semantics).
    """

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, clip_skip: int = 0) -> jnp.ndarray:
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        x = tok + pos[None, :n].astype(self.dtype)

        causal = jnp.triu(jnp.full((n, n), -1e9, dtype=jnp.float32), k=1)
        mask = causal[None, None]

        num_layers = cfg.num_hidden_layers - clip_skip
        for i in range(cfg.num_hidden_layers):
            if i >= num_layers:
                break
            x = CLIPEncoderLayer(
                cfg.num_attention_heads, cfg.intermediate_size, cfg.hidden_act,
                eps=cfg.layer_norm_eps, dtype=self.dtype, name=f"layers_{i}",
            )(x, mask)
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="final_layer_norm"
        )(x)


class CLIPVisionEncoder(nn.Module):
    """Returns the projected image embedding (B, projection_dim) — the
    ``image_embeds`` the IP-Adapter consumes. ``output_hidden_state=True``
    additionally returns the penultimate hidden states (IP-Adapter-Plus)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, output_hidden_state: bool = False):
        cfg = self.config
        b, h, w, c = pixel_values.shape
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        n_patches = patches.shape[1] * patches.shape[2]
        patches = patches.reshape(b, n_patches, cfg.hidden_size)

        class_embed = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        cls = jnp.broadcast_to(
            class_embed.astype(self.dtype), (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, patches], axis=1)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (n_patches + 1, cfg.hidden_size),
        )
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm"
        )(x)

        penultimate = None
        for i in range(cfg.num_hidden_layers):
            if i == cfg.num_hidden_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(
                cfg.num_attention_heads, cfg.intermediate_size, cfg.hidden_act,
                eps=cfg.layer_norm_eps, dtype=self.dtype, name=f"layers_{i}",
            )(x)

        pooled = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(x[:, 0])
        image_embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        if output_hidden_state:
            return image_embeds, penultimate
        return image_embeds

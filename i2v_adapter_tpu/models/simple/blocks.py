"""Primitives for the from-scratch Video-LDM-style model zoo.

Functional equivalents of the reference's educational modules
(/root/reference/src/modules/attention.py, resnet.py, util.py — SURVEY.md
§2.3): GroupNorm-GELU ResBlocks with timestep injection, a 3-D temporal
ResBlock variant, factorized spatial/temporal attention blended by a learned
``AlphaBlender``, and the sinusoidal embedding helper.  NHWC / NTHWC layouts.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from i2v_adapter_tpu.ops.attention import dot_product_attention


def positional_emb(positions: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[sin | cos] sinusoidal embedding (reference util.py:4-8 layout)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = positions.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class AlphaBlender(nn.Module):
    """Learned (or fixed) sigmoid mix of spatial and temporal branches
    (reference util.py:10-71).  ``image_only`` forces the spatial branch."""

    alpha: float = 0.5
    learned: bool = True

    @nn.compact
    def __call__(
        self,
        spatial: jnp.ndarray,
        temporal: jnp.ndarray,
        image_only: bool = False,
    ) -> jnp.ndarray:
        if self.learned:
            mix_factor = self.param(
                "mix_factor", nn.initializers.constant(self.alpha), (1,)
            )
            alpha = nn.sigmoid(mix_factor)[0]
        else:
            alpha = jnp.asarray(self.alpha)
        if image_only:
            alpha = jnp.asarray(1.0)
        alpha = alpha.astype(spatial.dtype)
        return alpha * spatial + (1.0 - alpha) * temporal


class BasicAttention(nn.Module):
    """q/k/v linear + fused attention + out projection
    (reference attention.py:26-62)."""

    heads: int
    dim_head: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        c = x.shape[-1]
        d = self.dim_head or c // self.heads
        inner = self.heads * d
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, name="to_v")(ctx)
        split = lambda t: t.reshape(t.shape[0], t.shape[1], self.heads, d)
        out = dot_product_attention(split(q), split(k), split(v))
        out = out.reshape(x.shape[0], x.shape[1], inner)
        return nn.Dense(c, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """Self-attn (+ optional cross-attn) + MLP with pre-LN
    (reference attention.py:64-77)."""

    heads: int
    use_cross: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        x = x + BasicAttention(self.heads, name="self_attn")(
            nn.LayerNorm(name="norm1")(x)
        )
        if self.use_cross:
            if context is None:
                raise ValueError("context required for cross attention")
            x = x + BasicAttention(self.heads, name="cross_attn")(
                nn.LayerNorm(name="norm2")(x), context
            )
        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(x.shape[-1] * 4, name="mlp_in")(h)
        h = nn.gelu(h)
        return x + nn.Dense(x.shape[-1], name="mlp_out")(h)


class VideoTransformer(nn.Module):
    """Factorized spatial->temporal attention with frame-position MLP
    embedding, AlphaBlender merge + residual (reference attention.py:79-131).

    Input (B*T, H, W, C) with ``num_frames`` static; image_only skips
    the temporal branch's contribution via the blender.
    """

    heads: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, num_frames: int, image_only: bool = False
    ) -> jnp.ndarray:
        bt, h, w, c = x.shape
        b = bt // num_frames
        residual = x

        tokens = x.reshape(bt, h * w, c)
        spatial = BasicTransformerBlock(self.heads, name="spatial")(tokens)

        # frame-position embedding lifted by a 2-layer MLP
        pos = positional_emb(jnp.arange(num_frames), c)
        pos = nn.Dense(c * 4, name="pos_mlp_in")(pos)
        pos = nn.silu(pos)
        pos = nn.Dense(c, name="pos_mlp_out")(pos)

        t_tokens = spatial.reshape(b, num_frames, h * w, c)
        t_tokens = jnp.swapaxes(t_tokens, 1, 2).reshape(b * h * w, num_frames, c)
        t_tokens = t_tokens + pos[None].astype(t_tokens.dtype)
        temporal = BasicTransformerBlock(self.heads, name="temporal")(t_tokens)
        temporal = temporal.reshape(b, h * w, num_frames, c)
        temporal = jnp.swapaxes(temporal, 1, 2).reshape(bt, h * w, c)

        merged = AlphaBlender(name="blender")(spatial, temporal, image_only)
        return merged.reshape(bt, h, w, c) + residual


class ResBlock(nn.Module):
    """GroupNorm-GELU double conv with timestep-MLP injection
    (reference resnet.py:20-72). 2-D (NHWC) or 3-D (NTHWC) via ``dims``."""

    out_channels: int
    dims: int = 2
    groups: int = 8
    kernel: Optional[tuple] = None

    @staticmethod
    def _groups(groups: int, channels: int) -> int:
        g = min(groups, channels)
        while channels % g:
            g -= 1
        return g

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None):
        c = x.shape[-1]
        k = self.kernel or ((3, 3) if self.dims == 2 else (3, 3, 3))
        h = nn.GroupNorm(num_groups=self._groups(self.groups, c), name="norm1")(x)
        h = nn.gelu(h)
        h = nn.Conv(self.out_channels, k, padding="SAME", name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, name="temb_proj")(nn.gelu(temb))
            t = t.reshape(t.shape[:1] + (1,) * (x.ndim - 2) + (self.out_channels,))
            h = h + t
        h = nn.GroupNorm(
            num_groups=self._groups(self.groups, self.out_channels), name="norm2"
        )(h)
        h = nn.gelu(h)
        h = nn.Conv(self.out_channels, k, padding="SAME", name="conv2")(h)
        if c != self.out_channels:
            x = nn.Conv(self.out_channels, (1,) * self.dims, name="shortcut")(x)
        return x + h


class VideoResBlock(nn.Module):
    """Spatial ResBlock + temporal [3,1,1] 3-D ResBlock blended by
    AlphaBlender (reference resnet.py:74-118).  Input (B*T, H, W, C)."""

    out_channels: int
    groups: int = 8

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        *,
        num_frames: int,
        image_only: bool = False,
    ):
        bt = x.shape[0]
        b = bt // num_frames
        spatial = ResBlock(
            self.out_channels, dims=2, groups=self.groups, name="spatial"
        )(x, temb)

        vid = spatial.reshape((b, num_frames) + spatial.shape[1:])
        t3 = temb.reshape(b, num_frames, -1)[:, 0] if temb is not None else None
        temporal = ResBlock(
            self.out_channels, dims=3, groups=self.groups,
            kernel=(3, 1, 1), name="time_stack",
        )(vid, t3)
        temporal = temporal.reshape(spatial.shape)

        return AlphaBlender(name="blender")(spatial, temporal, image_only)

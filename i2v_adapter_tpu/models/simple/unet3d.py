"""From-scratch video UNet (reference src/models/unet3d.py:8-198).

Same skeleton as SimpleUNet with VideoResBlock / VideoTransformer and an
``image_only`` switch enabling joint image+video training.  Input frames are
flattened into the batch: (B, T, H, W, C) -> (B*T, H, W, C).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from i2v_adapter_tpu.models.simple.blocks import (
    BasicTransformerBlock,
    VideoResBlock,
    VideoTransformer,
    positional_emb,
)


class SimpleUNet3D(nn.Module):
    widths: Tuple[int, ...] = (64, 128, 256)
    attention_levels: Tuple[bool, ...] = (False, True, True)
    heads: int = 4
    context_dim: Optional[int] = None
    out_channels: int = 4

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, T, H, W, C)
        timestep: jnp.ndarray,  # (B,)
        context: Optional[jnp.ndarray] = None,  # (B, L, D)
        *,
        image_only: bool = False,
    ) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        x = x.reshape(b * t, h, w, c)
        temb = positional_emb(timestep, self.widths[0])
        temb = nn.Dense(self.widths[0] * 4, name="temb_in")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.widths[0] * 4, name="temb_out")(temb)
        temb = jnp.repeat(temb, t, axis=0)
        ctx = jnp.repeat(context, t, axis=0) if context is not None else None
        use_cross = ctx is not None

        def cross(hid, name):
            bb, hh, ww, cc = hid.shape
            tokens = hid.reshape(bb, hh * ww, cc)
            tokens = BasicTransformerBlock(
                self.heads, use_cross=True, name=name
            )(tokens, ctx)
            return tokens.reshape(bb, hh, ww, cc)

        kw = dict(num_frames=t, image_only=image_only)

        x = nn.Conv(self.widths[0], (3, 3), padding=1, name="conv_in")(x)
        skips = [x]
        for i, width in enumerate(self.widths):
            x = VideoResBlock(width, name=f"down_{i}_res")(x, temb, **kw)
            if self.attention_levels[i]:
                x = VideoTransformer(self.heads, name=f"down_{i}_attn")(x, **kw)
                if use_cross:
                    x = cross(x, f"down_{i}_cross")
            skips.append(x)
            if i < len(self.widths) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = VideoResBlock(self.widths[-1], name="mid_res1")(x, temb, **kw)
        x = VideoTransformer(self.heads, name="mid_attn")(x, **kw)
        if use_cross:
            x = cross(x, "mid_cross")
        x = VideoResBlock(self.widths[-1], name="mid_res2")(x, temb, **kw)

        for i, width in reversed(list(enumerate(self.widths))):
            if i < len(self.widths) - 1:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = VideoResBlock(width, name=f"up_{i}_res")(x, temb, **kw)
            if self.attention_levels[i]:
                x = VideoTransformer(self.heads, name=f"up_{i}_attn")(x, **kw)
                if use_cross:
                    x = cross(x, f"up_{i}_cross")

        x = nn.GroupNorm(num_groups=8, name="norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)
        return x.reshape(b, t, h, w, self.out_channels)

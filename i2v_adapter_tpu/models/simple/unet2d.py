"""From-scratch 2-D latent UNet (reference src/models/unet.py:8-185).

Down/Up blocks of ResBlock + BasicTransformerBlock with MaxPool/Upsample
resampling; widths and attention levels configurable.  Used by the
latent-image conditional trainer (§2.3).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from i2v_adapter_tpu.models.simple.blocks import (
    BasicTransformerBlock,
    ResBlock,
    positional_emb,
)


class SimpleUNet(nn.Module):
    widths: Tuple[int, ...] = (64, 128, 256)
    attention_levels: Tuple[bool, ...] = (False, True, True)
    heads: int = 4
    context_dim: Optional[int] = None
    out_channels: int = 4

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, C)
        timestep: jnp.ndarray,  # (B,)
        context: Optional[jnp.ndarray] = None,  # (B, L, D)
    ) -> jnp.ndarray:
        temb = positional_emb(timestep, self.widths[0])
        temb = nn.Dense(self.widths[0] * 4, name="temb_in")(temb)
        temb = nn.silu(temb)
        temb = nn.Dense(self.widths[0] * 4, name="temb_out")(temb)
        use_cross = context is not None

        def attn(h, i, name):
            b, hh, ww, c = h.shape
            tokens = h.reshape(b, hh * ww, c)
            tokens = BasicTransformerBlock(
                self.heads, use_cross=use_cross, name=name
            )(tokens, context)
            return tokens.reshape(b, hh, ww, c)

        x = nn.Conv(self.widths[0], (3, 3), padding=1, name="conv_in")(x)
        skips = [x]
        for i, w in enumerate(self.widths):
            x = ResBlock(w, name=f"down_{i}_res")(x, temb)
            if self.attention_levels[i]:
                x = attn(x, i, f"down_{i}_attn")
            skips.append(x)
            if i < len(self.widths) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = ResBlock(self.widths[-1], name="mid_res1")(x, temb)
        x = attn(x, -1, "mid_attn")
        x = ResBlock(self.widths[-1], name="mid_res2")(x, temb)

        for i, w in reversed(list(enumerate(self.widths))):
            if i < len(self.widths) - 1:
                b, hh, ww, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResBlock(w, name=f"up_{i}_res")(x, temb)
            if self.attention_levels[i]:
                x = attn(x, i, f"up_{i}_attn")

        x = nn.GroupNorm(num_groups=8, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)

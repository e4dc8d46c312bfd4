"""Fixed-size DDPM UNet ("dome" variant).

Capability-parity with the reference's third from-scratch UNet
(/root/reference/src/models/unet_dome.py:1-155) — a compact 64-channel
DDPM UNet with hardcoded attention resolutions, kept there as a reference
implementation (imported by nothing).  Re-designed TPU-first: NHWC
layout, channels-last LayerNorm tokens for the attention blocks, and a
replicated-frequency sinusoidal time encoding matching the reference's
``pos_encoding`` (sin block then cos block, frequencies repeated across
each half — distinct from the diffusers ``Timesteps`` convention used by
the flagship model).

Structure (reference lines in parens):
  inc DoubleConv(3→64)                      (:102)
  down1(64→128)+sa, down2(128→256)+sa, down3(256→256)+sa   (:103-109)
  bottleneck DoubleConv 256→512→512→256     (:111-113)
  up1(512→128)+sa, up2(256→64)+sa, up3(128→64)+sa          (:115-120)
  outc 1x1 conv → c_out                     (:121)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def dome_time_encoding(t: jnp.ndarray, channels: int) -> jnp.ndarray:
    """Reference ``pos_encoding`` (/root/reference/src/models/unet_dome.py:123-130):
    t broadcast against channels//2 inverse frequencies; [sin half ∥ cos half]."""
    inv_freq = 1.0 / (
        10000 ** (jnp.arange(0, channels, 2, dtype=jnp.float32) / channels)
    )
    ang = t.astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class DoubleConv(nn.Module):
    """conv3x3 → GroupNorm(1) → GELU → conv3x3 → GroupNorm(1); optional
    gelu(x + f(x)) residual form (reference :28-46)."""

    out_channels: int
    mid_channels: int = 0
    residual: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.mid_channels or self.out_channels
        h = nn.Conv(mid, (3, 3), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="norm1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(
            self.out_channels, (3, 3), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(h)
        h = nn.GroupNorm(num_groups=1, dtype=self.dtype, name="norm2")(h)
        if self.residual:
            return nn.gelu(x + h, approximate=False)
        return h


class DomeSelfAttention(nn.Module):
    """Token self-attention + pre-LN MLP at one spatial resolution
    (reference SelfAttention, :5-25): 4 heads, LN→MHA residual, LN→FF
    residual.  NHWC in/out; tokens are (B, H·W, C)."""

    channels: int
    heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        ln = nn.LayerNorm(dtype=self.dtype, name="ln")(tokens)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype, name="mha",
        )(ln, ln)
        tokens = tokens + attn
        ff = nn.LayerNorm(dtype=self.dtype, name="ff_ln")(tokens)
        ff = nn.Dense(c, dtype=self.dtype, name="ff_1")(ff)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dense(c, dtype=self.dtype, name="ff_2")(ff)
        tokens = tokens + ff
        return tokens.reshape(b, h, w, c)


class DomeDown(nn.Module):
    """maxpool/2 → residual DoubleConv → DoubleConv, + SiLU-MLP time
    embedding broadcast over space (reference Down, :49-70)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[-1]
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = DoubleConv(c_in, residual=True, dtype=self.dtype, name="res")(x)
        x = DoubleConv(self.out_channels, dtype=self.dtype, name="proj")(x)
        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="emb")(
            nn.silu(temb)
        )
        return x + emb[:, None, None, :]


class DomeUp(nn.Module):
    """bilinear 2x upsample → skip concat → residual DoubleConv →
    DoubleConv(mid=in/2), + time embedding (reference Up, :73-95)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skip: jnp.ndarray, temb: jnp.ndarray
    ) -> jnp.ndarray:
        b, h, w, _ = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, x.shape[-1]), "bilinear")
        x = jnp.concatenate([skip, x], axis=-1)
        c_in = x.shape[-1]
        x = DoubleConv(c_in, residual=True, dtype=self.dtype, name="res")(x)
        x = DoubleConv(
            self.out_channels, mid_channels=c_in // 2, dtype=self.dtype,
            name="proj",
        )(x)
        emb = nn.Dense(self.out_channels, dtype=self.dtype, name="emb")(
            nn.silu(temb)
        )
        return x + emb[:, None, None, :]


class SimpleUNetDome(nn.Module):
    """The fixed-topology DDPM UNet (reference UNet, :98-155).  Input
    (B, 64, 64, c_in) NHWC + integer timesteps; output same shape with
    ``c_out`` channels."""

    c_out: int = 3
    time_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        temb = dome_time_encoding(t, self.time_dim).astype(self.dtype)

        x1 = DoubleConv(64, dtype=self.dtype, name="inc")(x)
        x2 = DomeDown(128, dtype=self.dtype, name="down1")(x1, temb)
        x2 = DomeSelfAttention(128, dtype=self.dtype, name="sa1")(x2)
        x3 = DomeDown(256, dtype=self.dtype, name="down2")(x2, temb)
        x3 = DomeSelfAttention(256, dtype=self.dtype, name="sa2")(x3)
        x4 = DomeDown(256, dtype=self.dtype, name="down3")(x3, temb)
        x4 = DomeSelfAttention(256, dtype=self.dtype, name="sa3")(x4)

        x4 = DoubleConv(512, dtype=self.dtype, name="bot1")(x4)
        x4 = DoubleConv(512, dtype=self.dtype, name="bot2")(x4)
        x4 = DoubleConv(256, dtype=self.dtype, name="bot3")(x4)

        x = DomeUp(128, dtype=self.dtype, name="up1")(x4, x3, temb)
        x = DomeSelfAttention(128, dtype=self.dtype, name="sa4")(x)
        x = DomeUp(64, dtype=self.dtype, name="up2")(x, x2, temb)
        x = DomeSelfAttention(64, dtype=self.dtype, name="sa5")(x)
        x = DomeUp(64, dtype=self.dtype, name="up3")(x, x1, temb)
        x = DomeSelfAttention(64, dtype=self.dtype, name="sa6")(x)
        return nn.Conv(self.c_out, (1, 1), dtype=self.dtype, name="outc")(x)

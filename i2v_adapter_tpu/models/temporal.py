"""AnimateDiff-style temporal motion module.

Equivalent of diffusers ``TransformerTemporalModel`` as instantiated by the
reference (/root/reference/src/models/unet_motion_cross_frame_attn.py:232-244):
GroupNorm over (C, F·H·W) per clip → linear proj_in → N transformer blocks
with *double self-attention* and interleaved-sinusoidal positional
embeddings capped at ``max_seq_length`` → linear proj_out → residual.

TPU-first layout: activations stay (B, F, S, C) end to end — the torch
stack's (B·H·W, F, C) permutation costs two full HBM transposes per motion
site; here the frame-axis contraction is an einsum
(ops.attention.temporal_attention) whose layout change XLA folds into the
batched matmuls.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from i2v_adapter_tpu.models.attention import FeedForward
from i2v_adapter_tpu.ops.attention import temporal_attention


def sinusoidal_positional_embedding(seq_len: int, dim: int) -> jnp.ndarray:
    """Interleaved sin/cos (diffusers ``SinusoidalPositionalEmbedding``)."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((seq_len, dim), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class TemporalSelfAttention(nn.Module):
    """Frame-axis MHA on (B, F, S, C) with diffusers projection naming."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        from i2v_adapter_tpu.models.attention import (
            _fuse_qkv_enabled,
            _ProjKernel,
        )

        if _fuse_qkv_enabled():
            c = x.shape[-1]
            w = jnp.concatenate(
                [
                    _ProjKernel(inner, name=n)(c)
                    for n in ("to_q", "to_k", "to_v")
                ],
                axis=1,
            ).astype(self.dtype)
            q, k, v = jnp.split(x.astype(self.dtype) @ w, 3, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(x)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(x)
        out = temporal_attention(q, k, v, heads=self.heads, impl=self.attn_impl)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class TemporalBlock(nn.Module):
    """Transformer block with two self-attentions (double_self_attention=True,
    the AnimateDiff motion-module configuration) and GEGLU FF.
    Input (B, F, S, C)."""

    dim: int
    heads: int
    dim_head: int
    max_seq_length: int = 32
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    gelu_tanh: bool = False
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = x.shape[1]
        if f > self.max_seq_length:
            raise ValueError(
                f"num_frames {f} exceeds motion positional-embedding cap "
                f"{self.max_seq_length}"
            )
        pe = sinusoidal_positional_embedding(f, self.dim).astype(x.dtype)
        pe = pe[None, :, None, :]  # (1, F, 1, C)

        from i2v_adapter_tpu.models.layers import layer_norm

        ln = lambda name: layer_norm(self.norm_eps, self.dtype, name)
        norm_h = ln("norm1")(x) + pe
        x = x + TemporalSelfAttention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn1",
        )(norm_h)

        norm_h = ln("norm2")(x) + pe
        x = x + TemporalSelfAttention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            attn_impl=self.attn_impl, name="attn2",
        )(norm_h)

        norm_h = ln("norm3")(x)
        x = x + FeedForward(
            dim=self.dim, dtype=self.dtype, gelu_tanh=self.gelu_tanh, name="ff"
        )(norm_h)
        return x


class TemporalTransformer(nn.Module):
    """Motion module applied to (B*F, H, W, C) activations."""

    heads: int
    dim_head: int
    num_layers: int = 1
    max_seq_length: int = 32
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"  # 'xla' disables the custom Pallas kernels
    gelu_tanh: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, num_frames: int) -> jnp.ndarray:
        bf, h, w, c = x.shape
        if bf % num_frames != 0:
            raise ValueError(f"batch {bf} not divisible by frames {num_frames}")
        b = bf // num_frames
        inner = self.heads * self.dim_head
        residual = x

        # GroupNorm over channels jointly across (F, H, W) per clip — the
        # reference norms the (B, C, F, H, W) tensor, coupling frames.
        tokens = x.reshape(b, num_frames * h * w, c)
        from i2v_adapter_tpu.models.layers import group_norm

        tokens = group_norm(self.groups, 1e-6, self.dtype, "norm")(tokens)

        tokens = tokens.reshape(b, num_frames, h * w, c)  # (B, F, S, C)

        # Mesh layout: pin the WHOLE module to token-sharded (S over seq,
        # frames local — Ulysses-style sequence parallelism).  proj_in/out,
        # LayerNorms, FF and both frame-axis attentions are then fully
        # local; the reshard from the surrounding frame-sharded eval layout
        # is one all-to-all pair per module instead of per-site K/V
        # all-gathers (measured 4.77 GB/device/step -> the all-to-all pair
        # moves (s-1)/s of the LOCAL shard only).  No-ops off-mesh.
        from i2v_adapter_tpu.parallel.spmd import (
            temporal_frame_constraint,
            temporal_token_constraint,
        )

        tokens = temporal_token_constraint(tokens)
        tokens = nn.Dense(inner, dtype=self.dtype, name="proj_in")(tokens)

        for i in range(self.num_layers):
            tokens = TemporalBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                max_seq_length=self.max_seq_length, dtype=self.dtype,
                gelu_tanh=self.gelu_tanh, attn_impl=self.attn_impl,
                name=f"transformer_blocks_{i}",
            )(tokens)

        tokens = nn.Dense(c, dtype=self.dtype, name="proj_out")(tokens)
        tokens = temporal_frame_constraint(tokens)
        return tokens.reshape(bf, h, w, c) + residual

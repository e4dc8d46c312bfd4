"""Normalization with MXU-friendly statistics.

XLA lowers GroupNorm stats over NHWC tensors to segmented lane reductions
(channels live on the 128-lane axis; a 32-group/320-channel GroupNorm needs
10-lane segment sums), which profiled at ~5 ms for a (32, 64, 64, 320) tensor
on v5e — 25x over its memory bound.  Computing the same sums as one-hot
matmuls moves the reduction onto the MXU where it is ~free, and leaves only
a single fused elementwise apply pass.

These are drop-in functional equivalents of ``nn.GroupNorm`` /
``nn.LayerNorm`` statistics (fp32 stats, biased variance, same epsilon
semantics); modules keep flax parameter names so checkpoints are unaffected.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def group_norm_stats_matmul(x: jnp.ndarray, num_groups: int):
    """Per-(batch, group) mean/var of ``x`` (B, ..., C) via one-hot matmuls.

    Returns (mean, var) with shape (B, num_groups), fp32.
    """
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.reshape(b, -1, c).astype(jnp.float32)
    n = xf.shape[1] * (c // num_groups)
    onehot = (
        jnp.arange(c)[:, None] // (c // num_groups)
        == jnp.arange(num_groups)[None, :]
    ).astype(jnp.float32)  # (C, G)
    # sum over tokens first (cheap tree reduce), then group-sum by matmul
    tok_sum = jnp.sum(xf, axis=1)  # (B, C)
    tok_sq = jnp.sum(xf * xf, axis=1)  # (B, C)
    mean = (tok_sum @ onehot) / n
    sq = (tok_sq @ onehot) / n
    return mean, sq - mean * mean


def group_norm_apply(
    x: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
) -> jnp.ndarray:
    """Normalize with per-(batch, group) stats; one elementwise pass."""
    b = x.shape[0]
    c = x.shape[-1]
    rstd = (var + eps) ** -0.5  # (B, G)
    # expand group stats to channels: (B, G) -> (B, C)
    reps = c // num_groups
    mean_c = jnp.repeat(mean, reps, axis=-1)
    rstd_c = jnp.repeat(rstd, reps, axis=-1)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    y = (x.astype(jnp.float32) - mean_c.reshape(shape)) * rstd_c.reshape(shape)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def layer_norm_stats_matmul(x: jnp.ndarray):
    """Per-token mean / mean-of-squares over the channel axis via a dot with
    a ones vector (keeps the reduction off the lane-segment path)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    ones = jnp.ones((c, 1), jnp.float32)
    mean = (xf @ ones)[..., 0] / c
    sq = ((xf * xf) @ ones)[..., 0] / c
    return mean, sq - mean * mean


class LayerNormMM(nn.Module):
    """nn.LayerNorm drop-in (same param names: scale/bias) with matmul
    statistics over the last axis."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean, var = layer_norm_stats_matmul(x)
        y = (x.astype(jnp.float32) - mean[..., None]) * (
            (var + self.epsilon) ** -0.5
        )[..., None]
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)


class GroupNormMM(nn.Module):
    """nn.GroupNorm drop-in (same param names: scale/bias) with matmul
    statistics.  Channels-last input of any rank >= 2."""

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean, var = group_norm_stats_matmul(x, self.num_groups)
        return group_norm_apply(
            x, mean, var, scale, bias, self.num_groups, self.epsilon
        )

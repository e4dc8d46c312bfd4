"""Primitive Flax layers for the SD1.5-shaped UNet and VAE.

NHWC layout throughout — the native TPU convolution layout — instead of the
reference's NCHW.  Submodule names intentionally mirror the torch state-dict
keys (norm1/conv1/time_emb_proj/...) so the weight converter
(utils/convert.py) is a mechanical key mapping.

Reference semantics: diffusers ``ResnetBlock2D``/``Downsample2D``/
``Upsample2D``/``Timesteps``/``TimestepEmbedding`` as instantiated by
/root/reference/src/models/unet_motion_cross_frame_attn.py:202-261,754-770.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def group_norm(num_groups: int, epsilon: float, dtype, name: str) -> nn.Module:
    """GroupNorm used by every model in the hot path.

    ``I2V_GROUPNORM=mm`` selects the matmul-stats implementation
    (ops/norms.py::GroupNormMM) — identical params/semantics to
    ``nn.GroupNorm`` (equality-tested), with per-group statistics as one-hot
    matmuls on the MXU instead of segmented lane reductions.  Measured on
    v5e at the 512px UNet: standalone nn.GroupNorm lowers pathologically
    (27 ms for one (32,64,64,320) call vs 0.2 ms memory-bound for MM), but
    INSIDE the full UNet step the two tie (566.9 vs 566.2 ms/step A/B) —
    XLA fuses in-context norms into neighboring convs.  nn.GroupNorm stays
    the default; the knob matters for graphs where the fusion doesn't fire."""
    import os

    if os.environ.get("I2V_GROUPNORM") == "mm":
        from i2v_adapter_tpu.ops.norms import GroupNormMM

        return GroupNormMM(
            num_groups=num_groups, epsilon=epsilon, dtype=dtype, name=name
        )
    return nn.GroupNorm(
        num_groups=num_groups, epsilon=epsilon, dtype=dtype, name=name
    )


def layer_norm(epsilon: float, dtype, name: str) -> nn.Module:
    """LayerNorm used by the transformer hot paths (spatial + temporal).

    ``I2V_LAYERNORM=mm`` selects the matmul-stats implementation
    (ops/norms.py::LayerNormMM, same scale/bias params): nn.LayerNorm
    reduces over the channel (lane) axis, the same segmented lane-reduce
    lowering the GroupNorm docstring above describes.  Knob for in-context
    A/B; nn.LayerNorm stays the default pending a measured win."""
    import os

    if os.environ.get("I2V_LAYERNORM") == "mm":
        from i2v_adapter_tpu.ops.norms import LayerNormMM

        return LayerNormMM(epsilon=epsilon, dtype=dtype, name=name)
    return nn.LayerNorm(epsilon=epsilon, dtype=dtype, name=name)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` semantics; the
    SD1.5 UNet uses flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer SiLU MLP lifting the sinusoidal embedding to time_embed_dim."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


class _ConvWeights(nn.Module):
    """Conv params declared under the SAME path as ``nn.Conv(name=...)``
    (``<name>/{kernel,bias}``) but returned raw, so alternate conv
    lowerings (the int8 path) keep an identical param tree."""

    features: int
    kernel_size: tuple = (3, 3)

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _NormParams(nn.Module):
    """GroupNorm params declared under the SAME path as
    ``nn.GroupNorm(name=...)`` (``<name>/{scale,bias}``) but returned raw
    for the fused gn_silu_conv3x3 lowering — the param tree is
    impl-independent."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        return scale, bias


def _fold_gn_affine(h, groups: int, eps: float, gamma, beta):
    """(B, C) fp32 a/s with silu(h*a + s) == silu(GroupNorm(h))."""
    from i2v_adapter_tpu.ops.norms import group_norm_stats_matmul

    mean, var = group_norm_stats_matmul(h, groups)
    rstd = (var + eps) ** -0.5
    reps = h.shape[-1] // groups
    a = jnp.repeat(rstd, reps, axis=-1) * gamma[None].astype(jnp.float32)
    s = beta[None].astype(jnp.float32) - jnp.repeat(
        mean, reps, axis=-1
    ) * a
    return a, s


def int8_conv(
    x: jnp.ndarray, kernel, bias, strides=(1, 1), padding="SAME"
) -> jnp.ndarray:
    """Conv in int8: dynamic per-tensor activation scale + per-output-
    channel weight scales, int32 accumulation, fp32 dequant.  Serving-mode
    numerics (quantization error ~1e-2 relative); round-2 measured the raw
    int8 conv 1.34x over bf16 on v5e while int8 matmul gained nothing.
    ``strides``/``padding`` cover the stride-2 downsample and the
    pre-padded VALID VAE-encoder variants."""
    f32 = jnp.float32
    ws = jnp.max(jnp.abs(kernel.astype(f32)), axis=(0, 1, 2)) / 127.0
    wq = jnp.round(kernel.astype(f32) / ws).astype(jnp.int8)
    xs = jnp.maximum(jnp.max(jnp.abs(x.astype(f32))), 1e-12) / 127.0
    xq = jnp.round(x.astype(f32) / xs).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (y.astype(f32) * (xs * ws) + bias.astype(f32)).astype(x.dtype)


def _int8_conv_enabled() -> bool:
    import os

    return os.environ.get("I2V_INT8_CONV", "0") == "1"


def _pallas_conv_enabled() -> bool:
    """conv_impl='auto' gate.  Default OFF: the fused Pallas conv measured
    slower in-context than XLA's conv emitter on v5e (512px step 384.5 vs
    356.8 ms, convs-only 72.4 vs 44.9 — BASELINE.md ledger).  Set
    I2V_PALLAS_CONV=1 to A/B it on TPU; conv_impl='pallas' forces it
    (interpret-mode off-TPU, which tests use)."""
    import os

    if os.environ.get("I2V_PALLAS_CONV", "0") != "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv x2 with timestep injection and 1x1 shortcut."""

    out_channels: int
    use_time_emb: bool = True
    groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # serving-mode int8 3x3 convs (see VideoUNetConfig.int8_conv); the
    # I2V_INT8_CONV env var remains as an A/B override for profiling tools
    int8: bool = False
    # 'auto' resolves to XLA (the Pallas conv measured slower in-context,
    # see VideoUNetConfig.conv_impl); 'pallas' forces the fused
    # GN+SiLU+conv kernel (ops/conv3x3.py); I2V_PALLAS_CONV=1 turns it
    # on under 'auto' for on-chip A/Bs.
    conv_impl: str = "auto"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        in_channels = x.shape[-1]
        use_int8 = self.int8 or _int8_conv_enabled()

        def conv3(name, h):
            if use_int8:
                k, b = _ConvWeights(self.out_channels, name=name)(h.shape[-1])
                return int8_conv(h, k, b)
            return nn.Conv(
                self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                name=name,
            )(h)

        def norm_silu_conv(norm_name, conv_name, h):
            """GroupNorm -> SiLU -> 3x3 conv, as ONE Pallas kernel on the
            fast path: the GN affine folds into per-(batch, channel)
            vectors and x is read once (the unfused pallas conv measured
            21 ms/step WORSE in-context because the GN-apply + SiLU that
            XLA had fused into the conv became standalone HBM passes)."""
            pallas_ok = not use_int8 and (
                self.conv_impl == "pallas"
                or (self.conv_impl == "auto" and _pallas_conv_enabled())
            )
            if pallas_ok:
                from i2v_adapter_tpu.ops.conv3x3 import (
                    _gn_silu_conv3x3_ref,
                    conv3x3_supported,
                    gn_silu_conv3x3,
                )
                from i2v_adapter_tpu.ops.norms import group_norm_stats_matmul

                c = h.shape[-1]
                # params under the same flax paths as nn.GroupNorm/nn.Conv
                gamma, beta = _NormParams(name=norm_name)(c)
                k, b = _ConvWeights(self.out_channels, name=conv_name)(c)
                kc = k.astype(self.dtype)
                if self.conv_impl == "pallas" or conv3x3_supported(h, kc):
                    a, s = _fold_gn_affine(
                        h, self.groups, self.eps, gamma, beta
                    )
                    interp = jax.default_backend() != "tpu"
                    from i2v_adapter_tpu.parallel.spmd import (
                        current_attention_spmd,
                        spmd_gn_silu_conv3x3,
                    )

                    ctx = current_attention_spmd()
                    if ctx is not None:
                        out = spmd_gn_silu_conv3x3(
                            lambda hl, al, sl, kl, bl: gn_silu_conv3x3(
                                hl, al, sl, kl, bl, interp
                            ),
                            h, a, s, kc, b, ctx,
                        )
                        if out is not None:
                            return out
                        return _gn_silu_conv3x3_ref(h, a, s, kc, b)
                    return gn_silu_conv3x3(h, a, s, kc, b, interp)
                return _gn_silu_conv3x3_ref(
                    h,
                    *_fold_gn_affine(
                        h, self.groups, self.eps, gamma, beta
                    ),
                    kc, b,
                )
            h = group_norm(self.groups, self.eps, self.dtype, norm_name)(h)
            h = nn.silu(h)
            return conv3(conv_name, h)

        h = norm_silu_conv("norm1", "conv1", x)
        if self.use_time_emb:
            if temb is None:
                raise ValueError("temb required")
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = norm_silu_conv("norm2", "conv2", h)
        if in_channels != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv.  ``asymmetric_pad`` reproduces the VAE encoder's
    (0,1,0,1) padding; the UNet uses symmetric padding 1."""

    out_channels: int
    asymmetric_pad: bool = False
    int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = 1
        if self.int8 or _int8_conv_enabled():
            k, b = _ConvWeights(self.out_channels, name="conv")(x.shape[-1])
            lax_pad = "VALID" if pad == "VALID" else ((1, 1), (1, 1))
            return int8_conv(x, k, b, strides=(2, 2), padding=lax_pad)
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=pad,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor 2x upsample + 3x3 conv."""

    out_channels: int
    int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.int8 or _int8_conv_enabled():
            k, bias = _ConvWeights(self.out_channels, name="conv")(c)
            return int8_conv(x, k, bias)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
        )(x)

"""Attention modules: projections in Flax, fused math in ops.attention.

Covers the reference's three spatial attention roles per transformer block
(/root/reference/src/modules/i2v_adapter.py:420-565):

* ``attn1``      — spatial self-attention over each frame's tokens
* ``i2v_adapter``— the novel cross-frame attention: queries from every frame,
  K/V from the clip's first frame, output *added* to attn1's
* ``attn2``      — text cross-attention, optionally with the IP-Adapter
  branch (separate K/V over the trailing image tokens, scale-added — the
  ``IPAdapterAttnProcessor`` semantics referenced at
  /root/reference/src/models/unet_motion_cross_frame_attn.py:1262-1281)

plus the GEGLU feed-forward and the shared transformer block.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from i2v_adapter_tpu.ops.attention import dot_product_attention


class _ProjKernel(nn.Module):
    """Bias-free projection kernel declared under the SAME param path as
    ``nn.Dense(name=...)`` (``<name>/kernel``, lecun-normal init) but
    returned as a weight so call sites can concatenate several projections
    into one matmul (I2V_FUSE_QKV): 3x (N,320)@(320,320) -> (N,320)@(320,960).

    Measured on v5e (512px UNet step, round 3): 407.2 vs 388.6 ms — the
    runtime kernel concat + wide matmul LOSES to XLA's scheduling of the
    three narrow dots, so the knob defaults off; kept (identical param
    tree, equivalence-tested) for hardware where the trade differs."""

    features: int

    @nn.compact
    def __call__(self, in_features: int) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )


def _fuse_qkv_enabled() -> bool:
    import os

    return os.environ.get("I2V_FUSE_QKV", "0") == "1"


class Attention(nn.Module):
    """Multi-head attention with the diffusers projection layout
    (to_q/to_k/to_v without bias, to_out with bias)."""

    heads: int
    dim_head: int
    out_dim: Optional[int] = None  # defaults to heads * dim_head
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # pallas static-offset softmax (VideoUNetConfig.flash_static_max);
    # None falls back to the env-var default inside ops.attention.
    static_max: Optional[float] = None
    # IP-Adapter branch: extra K/V projections applied to the trailing
    # ``ip_num_tokens`` tokens of encoder_hidden_states.
    ip_num_tokens: int = 0
    ip_scale: float = 1.0

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, Nq, C)
        encoder_hidden_states: Optional[jnp.ndarray] = None,  # (Bkv, Nk, Ck)
        kv_repeat: int = 1,
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        out_dim = self.out_dim or inner
        ctx = (
            hidden_states if encoder_hidden_states is None else encoder_hidden_states
        )

        if self.ip_num_tokens > 0:
            text_ctx = ctx[:, : ctx.shape[1] - self.ip_num_tokens]
            ip_ctx = ctx[:, ctx.shape[1] - self.ip_num_tokens :]
        else:
            text_ctx, ip_ctx = ctx, None

        if _fuse_qkv_enabled():
            cq = hidden_states.shape[-1]
            ck = text_ctx.shape[-1]
            wq = _ProjKernel(inner, name="to_q")(cq)
            wk = _ProjKernel(inner, name="to_k")(ck)
            wv = _ProjKernel(inner, name="to_v")(ck)
            if encoder_hidden_states is None and ip_ctx is None:
                # self-attention: one (N, C) @ (C, 3*inner) matmul
                qkv = hidden_states.astype(self.dtype) @ jnp.concatenate(
                    [wq, wk, wv], axis=1
                ).astype(self.dtype)
                q, k, v = jnp.split(qkv, 3, axis=-1)
            else:
                q = hidden_states.astype(self.dtype) @ wq.astype(self.dtype)
                kv = text_ctx.astype(self.dtype) @ jnp.concatenate(
                    [wk, wv], axis=1
                ).astype(self.dtype)
                k, v = jnp.split(kv, 2, axis=-1)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(
                hidden_states
            )
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(
                text_ctx
            )
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(
                text_ctx
            )

        bq, nq, _ = q.shape
        split = lambda x: x.reshape(x.shape[0], x.shape[1], self.heads, self.dim_head)
        out = dot_product_attention(
            split(q), split(k), split(v), kv_repeat=kv_repeat,
            impl=self.attn_impl, static_max=self.static_max,
        )
        out = out.reshape(bq, nq, inner)

        if ip_ctx is not None:
            k_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(
                ip_ctx
            )
            v_ip = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(
                ip_ctx
            )
            ip_out = dot_product_attention(
                split(q), split(k_ip), split(v_ip), kv_repeat=kv_repeat,
                impl=self.attn_impl, static_max=self.static_max,
            )
            out = out + self.ip_scale * ip_out.reshape(bq, nq, inner)

        return nn.Dense(out_dim, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers ``FeedForward`` with activation 'geglu'):
    proj to 2*4*dim, split, gelu-gate, project back.

    ``gelu_tanh`` swaps the erf gelu for the tanh approximation — the
    deviation (~1e-3 relative) is below bf16 resolution, and the erf
    lowering dominates the FF epilogue fusion on the VPU (full UNet step
    459 -> 432 ms measured with tanh at 512px).  ``VideoUNetConfig.fast_gelu``
    threads it; primitives default to exact for fp32 torch parity."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    gelu_tanh: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=self.gelu_tanh)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class TransformerBlock(nn.Module):
    """Spatial transformer block with the I2V-Adapter cross-frame attention.

    Forward order matches /root/reference/src/modules/i2v_adapter.py:420-565
    (layer_norm variant): norm1→attn1 (+adapter), norm2→attn2, norm3→FF, each
    residual.
    """

    dim: int
    heads: int
    dim_head: int
    use_i2v_adapter: bool = True
    ip_num_tokens: int = 0
    ip_scale: float = 1.0
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    static_max: Optional[float] = None
    gelu_tanh: bool = False

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B*F, N, C), clip-major frame-minor
        encoder_hidden_states: jnp.ndarray,  # (B*F, Ltext[+Lip], Ctext)
        *,
        enable_cross_frame_attn: bool = False,
        num_frames: int = 1,
    ) -> jnp.ndarray:
        from i2v_adapter_tpu.models.layers import layer_norm

        ln = lambda name: layer_norm(self.norm_eps, self.dtype, name)

        norm_h = ln("norm1")(hidden_states)
        attn_out = Attention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            attn_impl=self.attn_impl, static_max=self.static_max, name="attn1",
        )(norm_h)

        if self.use_i2v_adapter:
            adapter = Attention(
                heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
                attn_impl=self.attn_impl, static_max=self.static_max,
                name="i2v_adapter",
            )
            if enable_cross_frame_attn:
                bf = hidden_states.shape[0]
                if bf % num_frames != 0:
                    raise ValueError(
                        f"batch {bf} not divisible by frames {num_frames}"
                    )
                # First frame of each clip as K/V context; the broadcast
                # over frames happens inside the fused kernel (kv_repeat).
                # Reshape-then-slice (not a strided slice) so on a mesh the
                # frame-sharded eval axis splits cleanly into (clip, frame)
                # and GSPMD moves only the (B, S, C) slice — a strided
                # slice of the sharded eval dim made it all-gather the FULL
                # hidden state per site (measured on the v5e-8 graph);
                # first_frame_constraint pins the slice clip-sharded.
                from i2v_adapter_tpu.parallel.spmd import (
                    first_frame_constraint,
                )

                b = bf // num_frames
                first_frame = norm_h.reshape(
                    (b, num_frames) + norm_h.shape[1:]
                )[:, 0]
                first_frame = first_frame_constraint(first_frame)
                adapter_out = adapter(
                    norm_h, encoder_hidden_states=first_frame,
                    kv_repeat=num_frames,
                )
                attn_out = attn_out + adapter_out
            elif self.is_initializing():
                # materialize adapter params even when the cross-frame path
                # is disabled at init time (single init serves both modes)
                adapter(norm_h[:1], encoder_hidden_states=norm_h[:1])

        hidden_states = hidden_states + attn_out

        norm_h = ln("norm2")(hidden_states)
        attn_out = Attention(
            heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
            attn_impl=self.attn_impl, static_max=self.static_max,
            ip_num_tokens=self.ip_num_tokens,
            ip_scale=self.ip_scale, name="attn2",
        )(norm_h, encoder_hidden_states=encoder_hidden_states)
        hidden_states = hidden_states + attn_out

        norm_h = ln("norm3")(hidden_states)
        hidden_states = hidden_states + FeedForward(
            dim=self.dim, dtype=self.dtype, gelu_tanh=self.gelu_tanh, name="ff"
        )(norm_h)
        return hidden_states


class SpatialTransformer(nn.Module):
    """diffusers ``Transformer2DModel`` equivalent hosting TransformerBlocks
    (reference I2VAdapterTransformer2DModel,
    /root/reference/src/modules/i2v_adapter.py:95-354).  NHWC in/out."""

    heads: int
    dim_head: int
    num_layers: int = 1
    use_linear_projection: bool = False
    use_i2v_adapter: bool = True
    ip_num_tokens: int = 0
    ip_scale: float = 1.0
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    static_max: Optional[float] = None
    gelu_tanh: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B*F, H, W, C)
        encoder_hidden_states: jnp.ndarray,
        *,
        enable_cross_frame_attn: bool = False,
        num_frames: int = 1,
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        residual = x
        from i2v_adapter_tpu.models.layers import group_norm

        x = group_norm(self.groups, 1e-6, self.dtype, "norm")(x)
        if self.use_linear_projection:
            x = x.reshape(b, h * w, c)
            x = nn.Dense(inner, dtype=self.dtype, name="proj_in")(x)
        else:
            x = nn.Conv(inner, (1, 1), dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, inner)

        for i in range(self.num_layers):
            x = TransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                use_i2v_adapter=self.use_i2v_adapter,
                ip_num_tokens=self.ip_num_tokens, ip_scale=self.ip_scale,
                dtype=self.dtype, attn_impl=self.attn_impl,
                static_max=self.static_max, gelu_tanh=self.gelu_tanh,
                name=f"transformer_blocks_{i}",
            )(
                x, encoder_hidden_states,
                enable_cross_frame_attn=enable_cross_frame_attn,
                num_frames=num_frames,
            )

        if self.use_linear_projection:
            x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
            x = x.reshape(b, h, w, c)
        else:
            x = x.reshape(b, h, w, inner)
            x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual

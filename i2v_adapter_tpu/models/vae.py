"""SD AutoencoderKL in Flax (NHWC).

Equivalent of diffusers ``AutoencoderKL`` as the reference uses it for
latent encode/decode (/root/reference/src/pipelines/pipeline_i2v_adapter.py:
625-627,300-320; /root/reference/src/train_image_to_video.py:790-792).

TPU-first extras beyond the reference's memory workarounds (VAE slicing /
tiling, reference :123-153): ``decode_sliced`` micro-batches frames, and
``decode_tiled`` splits large frames spatially with overlap-blend — both pure
functions that compose with ``jax.jit`` and sharding.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from i2v_adapter_tpu.config import VAEConfig
from i2v_adapter_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    Upsample2D,
    group_norm,
)


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens (mid-block)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = group_norm(self.groups, 1e-6, self.dtype, "group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores / jnp.sqrt(jnp.float32(c)), axis=-1)
        y = jnp.einsum(
            "bqk,bkc->bqc", probs.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        y = nn.Dense(c, dtype=self.dtype, name="to_out")(y)
        return residual + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock2D(
                    out_channels=ch, use_time_emb=False, groups=cfg.norm_num_groups,
                    eps=1e-6, dtype=self.dtype, name=f"down_{i}_resnets_{j}",
                )(x)
            if i < n - 1:
                # VAE encoder uses asymmetric (0,1,0,1) padding.
                x = Downsample2D(
                    ch, asymmetric_pad=True, dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(
            out_channels=ch, use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, dtype=self.dtype, name="mid_resnets_0",
        )(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_attn")(x)
        x = ResnetBlock2D(
            out_channels=ch, use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, dtype=self.dtype, name="mid_resnets_1",
        )(x)
        x = group_norm(
            cfg.norm_num_groups, 1e-6, self.dtype, "conv_norm_out"
        )(x)
        x = nn.silu(x)
        # 2*latent moments, then the separate quant conv.
        x = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype,
            name="conv_out",
        )(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        ch = reversed_ch[0]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock2D(
            out_channels=ch, use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, int8=cfg.int8_decode, dtype=self.dtype, name="mid_resnets_0",
        )(x)
        x = VAEAttention(ch, groups=cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_attn")(x)
        x = ResnetBlock2D(
            out_channels=ch, use_time_emb=False, groups=cfg.norm_num_groups,
            eps=1e-6, int8=cfg.int8_decode, dtype=self.dtype, name="mid_resnets_1",
        )(x)
        n = len(reversed_ch)
        for i, ch in enumerate(reversed_ch):
            # decoder blocks have layers_per_block + 1 resnets
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock2D(
                    out_channels=ch, use_time_emb=False, groups=cfg.norm_num_groups,
                    eps=1e-6, int8=cfg.int8_decode, dtype=self.dtype, name=f"up_{i}_resnets_{j}",
                )(x)
            if i < n - 1:
                x = Upsample2D(ch, int8=cfg.int8_decode, dtype=self.dtype,
                               name=f"up_{i}_upsample")(x)
        x = group_norm(
            cfg.norm_num_groups, 1e-6, self.dtype, "conv_norm_out"
        )(x)
        x = nn.silu(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(x)
        return x


class AutoencoderKL(nn.Module):
    """encode -> (mean, logvar) moments; decode(z) -> image. NHWC."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        """Latent sample (or mean when rng is None), NOT yet scaled by
        scaling_factor — callers multiply, matching the reference call sites."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray, rng=None) -> jnp.ndarray:
        return self.decode(self.encode(x, rng))


def decode_sliced(apply_fn, params, z: jnp.ndarray, slice_size: int = 1):
    """Decode (N, h, w, c) latents ``slice_size`` frames at a time via
    lax.map — bounded peak memory, the reference's ``enable_vae_slicing``
    analogue but jit-compatible."""
    n = z.shape[0]
    if n % slice_size != 0:
        raise ValueError(f"{n} frames not divisible by slice {slice_size}")
    zs = z.reshape((n // slice_size, slice_size) + z.shape[1:])
    out = jax.lax.map(lambda zz: apply_fn(params, zz), zs)
    return out.reshape((n,) + out.shape[2:])


def decode_sharded(apply_fn, params, z: jnp.ndarray, mesh):
    """Frame-parallel VAE decode over a device mesh: frames sharded on the
    (data, fsdp) axes, decoder params replicated.  The 64-frame/768px
    equivalent the reference lacks (its VAE strategies are single-device
    slicing/tiling — SURVEY.md §2.5).

    This is the standalone eager-mode entry point; the mesh-sharded sampler
    wires the same frame-parallel decode INSIDE its jitted graph via a
    sharding constraint (pipelines/i2v_pipeline.py ``shard_flat`` — frames
    over the (data, seq) axes), so ``enable_mesh`` serving gets it
    automatically."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from i2v_adapter_tpu.parallel.mesh import DATA_AXIS, FSDP_AXIS

    spec = NamedSharding(mesh, P((DATA_AXIS, FSDP_AXIS), None, None, None))
    z = jax.device_put(z, spec)
    f = jax.jit(apply_fn, out_shardings=spec)
    return f(params, z)


def decode_tiled(
    apply_fn,
    params,
    z: jnp.ndarray,
    tile_latent_size: int = 64,
    overlap: float = 0.25,
):
    """Spatially tiled decode with linear blending in the overlap region —
    the ``enable_vae_tiling`` analogue for 768px+ frames, static-shaped."""
    n, h, w, c = z.shape
    stride = int(tile_latent_size * (1 - overlap))
    if h <= tile_latent_size and w <= tile_latent_size:
        return apply_fn(params, z)

    rows = []
    for i in range(0, max(h - int(tile_latent_size * overlap), 1), stride):
        row = []
        for j in range(0, max(w - int(tile_latent_size * overlap), 1), stride):
            tile = z[:, i : i + tile_latent_size, j : j + tile_latent_size, :]
            row.append(apply_fn(params, tile))
        rows.append(row)

    scale = rows[0][0].shape[1] // min(tile_latent_size, h)
    blend = int(tile_latent_size * overlap) * scale

    def blend_v(a, b):
        if blend == 0:
            return jnp.concatenate([a, b], axis=1)
        alpha = jnp.linspace(0, 1, blend).reshape(1, blend, 1, 1).astype(a.dtype)
        mixed = a[:, -blend:] * (1 - alpha) + b[:, :blend] * alpha
        return jnp.concatenate([a[:, :-blend], mixed, b[:, blend:]], axis=1)

    def blend_h(a, b):
        if blend == 0:
            return jnp.concatenate([a, b], axis=2)
        alpha = jnp.linspace(0, 1, blend).reshape(1, 1, blend, 1).astype(a.dtype)
        mixed = a[:, :, -blend:] * (1 - alpha) + b[:, :, :blend] * alpha
        return jnp.concatenate([a[:, :, :-blend], mixed, b[:, :, blend:]], axis=2)

    row_images = []
    for row in rows:
        acc = row[0]
        for t in row[1:]:
            acc = blend_h(acc, t)
        row_images.append(acc)
    image = row_images[0]
    for r in row_images[1:]:
        image = blend_v(image, r)
    return image

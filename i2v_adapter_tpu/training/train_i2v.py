"""Adapter / motion-module training step (data-parallel over a TPU mesh).

Implements the full training semantics of the reference's main driver
(/root/reference/src/train_image_to_video.py:782-899) and the legacy
driver's extra behaviors (train_i2v_adapter.py:69-121):

* VAE-encode frames, scale by scaling_factor
* noise with ``noise[:, 0] = 0`` (first frame scaled-but-noiseless), or
  ``first_frame_mode='exact'`` which restores the clean first frame
* optional offset noise / input perturbation
* per-video uniform timestep
* CFG condition dropout (text -> empty-prompt embedding; image -> zeroed
  image embeds AND zeroed first-frame latent)
* epsilon / v-prediction targets; masked MSE excluding frame 0, or
  SNR-gamma-weighted loss
* grads only w.r.t. the trainable partition (adapter to_q/to_out
  [+ motion modules]); AdamW, clipping, accumulation, EMA

The whole step is one pjit-compiled function: batch sharded over the
``data`` mesh axis, params replicated (or fsdp-sharded), gradient psum
inserted by XLA — the reference's DDP/NCCL all-reduce without a line of
communication code (SURVEY.md §5.8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from i2v_adapter_tpu.config import I2VModelConfig, TrainConfig
from i2v_adapter_tpu.models import (
    AutoencoderKL,
    CLIPTextEncoder,
    CLIPVisionEncoder,
    VideoUNet,
)
from i2v_adapter_tpu.schedulers import add_noise, compute_snr, get_velocity, make_schedule
from i2v_adapter_tpu.training.state import TrainState, ema_update, merge_params

_DTYPES = {"none": jnp.float32, "float32": jnp.float32, "bfloat16": jnp.bfloat16}


def diffusion_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    timesteps: jnp.ndarray,
    schedule,
    snr_gamma: Optional[float],
    exclude_first_frame: bool,
) -> jnp.ndarray:
    """Training loss on (B, F, ...) predictions: masked MSE excluding frame 0
    (reference train_image_to_video.py:848-856) or the SNR-γ-weighted variant
    (:858-872).  Exposed at module level so the masking semantics are
    directly testable against the production path."""
    se = (pred - target) ** 2
    if snr_gamma is None:
        if not exclude_first_frame:
            return jnp.mean(se)
        mask = jnp.ones_like(se).at[:, 0].set(0.0)
        return jnp.sum(se * mask) / jnp.sum(mask)
    # the reference's SNR-γ branch does NOT mask frame 0 (plain mean over
    # all dims, train_image_to_video.py:870-872) — matched exactly
    snr = compute_snr(schedule, timesteps)
    if schedule.prediction_type == "v_prediction":
        snr = snr + 1.0
    weights = jnp.minimum(snr, snr_gamma) / snr
    per_video = jnp.mean(se, axis=tuple(range(1, se.ndim)))
    return jnp.mean(per_video * weights)


def make_train_step(
    model_config: I2VModelConfig,
    train_config: TrainConfig,
    tx,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    state_shardings=None,
):
    """Build the jitted train step.

    Returns ``step_fn(state, batch, rng) -> (state, metrics)`` where batch is
    a dict of host arrays:
      pixel_values: (B, F, H, W, 3) in [-1, 1]
      text_ids:     (B, L) int32 (prompt tokens)
      uncond_ids:   (B, L) int32 (empty-prompt tokens, for CFG dropout)
      clip_image:   (B, S, S, 3) CLIP-preprocessed first frame

    ``state_shardings`` (a TrainState-shaped tree of NamedShardings from
    ``parallel.mesh.train_state_shardings``) pins the state's in/out
    shardings so fsdp-sharded params/optimizer state stay sharded across
    steps — the applied ZeRO analogue."""
    dtype = _DTYPES[train_config.mixed_precision]
    ucfg = model_config.unet.replace(remat=train_config.gradient_checkpointing)
    unet = VideoUNet(ucfg, dtype=dtype)
    vae = AutoencoderKL(model_config.vae, dtype=dtype)
    text_encoder = CLIPTextEncoder(model_config.text_encoder, dtype=dtype)
    image_encoder = (
        CLIPVisionEncoder(model_config.image_encoder, dtype=dtype)
        if model_config.unet.use_ip_adapter
        else None
    )
    scheduler_cfg = model_config.scheduler
    if train_config.prediction_type is not None:
        scheduler_cfg = scheduler_cfg.replace(
            prediction_type=train_config.prediction_type
        )
    schedule = make_schedule(scheduler_cfg)
    tc = train_config

    is_t2i = tc.train_mode == "t2i"

    def loss_fn(trainable, state: TrainState, batch, rng):
        rng_t, rng_noise, rng_off, rng_pert, rng_vae, rng_drop = jax.random.split(
            rng, 6
        )
        pixels = batch["pixel_values"]
        if is_t2i and pixels.ndim == 4:
            pixels = pixels[:, None]  # single frames -> F=1 clips
        b, f = pixels.shape[:2]

        # ---- frozen encoders (no grad flows into them) ----
        flat_pixels = pixels.reshape((b * f,) + pixels.shape[2:]).astype(dtype)
        slice_n = tc.vae_encode_slice
        if slice_n > 0 and flat_pixels.shape[0] % slice_n == 0:
            # sliced encode (reference tools/encode_video.py:73-88 pattern):
            # at 512px x 16 frames the full-batch encoder peaks ~4.3 GB of
            # features — lax.map bounds it to slice_n frames at a time
            chunks = flat_pixels.reshape(
                (flat_pixels.shape[0] // slice_n, slice_n)
                + flat_pixels.shape[1:]
            )
            keys = jax.random.split(rng_vae, chunks.shape[0])
            latents = jax.lax.map(
                lambda args: vae.apply(
                    state.vae, args[0], args[1], method=vae.encode
                ),
                (chunks, keys),
            )
            latents = latents.reshape((b * f,) + latents.shape[2:])
            latents = latents * model_config.vae.scaling_factor
        else:
            latents = (
                vae.apply(state.vae, flat_pixels, rng_vae, method=vae.encode)
                * model_config.vae.scaling_factor
            )
        latents = latents.reshape((b, f) + latents.shape[1:]).astype(jnp.float32)

        # ---- CFG condition dropout (train_i2v_adapter.py:69-92) ----
        p_t, p_i, p_ti = tc.uncond_prob_t, tc.uncond_prob_i, tc.uncond_prob_ti
        u = jax.random.uniform(rng_drop, (b,))
        drop_text = u < (p_t + p_ti)
        drop_image = (u >= p_t) & (u < p_t + p_i + p_ti)

        ids = jnp.where(drop_text[:, None], batch["uncond_ids"], batch["text_ids"])
        text_states = text_encoder.apply(state.text_encoder, ids)

        if image_encoder is not None:
            if model_config.unet.ip_variant == "standard":
                image_embeds = image_encoder.apply(
                    state.image_encoder, batch["clip_image"].astype(dtype)
                )
                drop_b = drop_image[:, None]
            else:
                # plus/full_face heads consume penultimate hidden states
                _, image_embeds = image_encoder.apply(
                    state.image_encoder, batch["clip_image"].astype(dtype),
                    output_hidden_state=True,
                )
                drop_b = drop_image[:, None, None]
            image_embeds = jnp.where(
                drop_b, jnp.zeros_like(image_embeds), image_embeds
            )
        else:
            image_embeds = None
        if not is_t2i:
            latents = latents.at[:, 0].multiply(
                (~drop_image).astype(latents.dtype)[:, None, None, None]
            )

        # ---- noising (train_image_to_video.py:795-813) ----
        noise = jax.random.normal(rng_noise, latents.shape, dtype=jnp.float32)
        if not is_t2i:
            noise = noise.at[:, 0].set(0.0)
        if tc.noise_offset > 0:
            offset = jax.random.normal(
                rng_off, (b, f, 1, 1, latents.shape[-1]), dtype=jnp.float32
            )
            noise = noise + tc.noise_offset * offset
        t_lo = 1 if tc.first_frame_mode == "exact" else 0
        timesteps = jax.random.randint(
            rng_t, (b,), t_lo, schedule.num_train_timesteps
        )
        if tc.input_perturbation > 0:
            new_noise = noise + tc.input_perturbation * jax.random.normal(
                rng_pert, noise.shape, dtype=jnp.float32
            )
            noisy = add_noise(schedule, latents, new_noise, timesteps)
        else:
            noisy = add_noise(schedule, latents, noise, timesteps)
        if tc.first_frame_mode == "exact" and not is_t2i:
            # legacy driver restores the clean first frame after noising
            noisy = noisy.at[:, 0].set(latents[:, 0])

        if schedule.prediction_type == "epsilon":
            target = noise
        elif schedule.prediction_type == "v_prediction":
            target = get_velocity(schedule, latents, noise, timesteps)
        else:
            raise ValueError(schedule.prediction_type)

        # ---- UNet forward with merged params ----
        params = {"params": merge_params(trainable, state.frozen)}
        pred = unet.apply(
            params,
            noisy.astype(dtype),
            timesteps,
            text_states,
            image_embeds,
            enable_cross_frame_attn=not is_t2i,
        ).astype(jnp.float32)

        # ---- loss (masked MSE / SNR-gamma), frame 0 excluded for i2v ----
        return diffusion_loss(
            pred, target, timesteps, schedule, tc.snr_gamma,
            exclude_first_frame=not is_t2i,
        )

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.trainable, state, batch, rng
        )
        grad_norm = optax_global_norm(grads)
        # Non-finite guard: a bad batch (NaN/Inf loss or grads, e.g. a
        # corrupted decode or fp16-style overflow) skips the update instead
        # of poisoning params — fault tolerance the reference lacks
        # (SURVEY.md §5.3).
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        grads = jax.tree.map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        updates = jax.tree.map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), updates
        )
        trainable = jax.tree.map(lambda p, u: p + u, state.trainable, updates)
        ema = (
            ema_update(state.ema, trainable, tc.ema_decay)
            if state.ema is not None
            else None
        )
        state = state.replace(
            step=state.step + 1,
            trainable=trainable,
            opt_state=opt_state,
            ema=ema,
        )
        return state, {
            "loss": loss,
            "grad_norm": grad_norm,
            "skipped_nonfinite": (~ok).astype(jnp.float32),
        }

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)

    # ---- data-parallel pjit: batch sharded on (data, fsdp), params/opt
    # state fsdp-sharded when state_shardings is given (ZeRO analogue),
    # else replicated/resolved from current placement.  pixel_values'
    # frame dim additionally shards over the ``seq`` axis (sequence
    # parallelism): conv/spatial work stays frame-local; XLA inserts the
    # collectives for temporal attention / cross-frame K/V / motion
    # GroupNorm stats.  batch_sharding is the single source of truth for
    # these specs — driver.put() and __graft_entry__ use the same call ----
    from i2v_adapter_tpu.parallel.mesh import (
        DATA_AXIS, FSDP_AXIS, batch_sharding,
    )
    from i2v_adapter_tpu.parallel.spmd import attention_spmd

    # Pallas kernels (flash fwd/bwd, temporal cs) cannot be auto-partitioned
    # by GSPMD — on a real multi-chip mesh a bare pallas_call whose operands
    # are sharded is a hard Mosaic error (found by the v5e-8 topology AOT
    # audit; the CPU-sim mesh can't catch it because CPU dispatch never
    # selects the kernels).  Trace the step under the SPMD context so the
    # attention dispatchers route through shard_map with the batch sharded
    # over (data, fsdp) and frames over seq, mirroring batch_sharding; sites
    # whose shapes don't meet the shard_map layout constraints degrade to
    # the partitionable XLA lowerings instead of crashing.
    inner_step = train_step

    def train_step(state, batch, rng):  # noqa: F811 - deliberate wrap
        with attention_spmd(mesh, clip_axis=(DATA_AXIS, FSDP_AXIS)):
            return inner_step(state, batch, rng)

    batch_shardings = {
        # t2i pixel_values are (B,H,W,3): no frame dim
        "pixel_values": batch_sharding(
            mesh, 4 if is_t2i else 5, frame_axis=None if is_t2i else 1
        ),
        "text_ids": batch_sharding(mesh, 2),
        "uncond_ids": batch_sharding(mesh, 2),
        "clip_image": batch_sharding(mesh, 4),
    }
    in_shardings = (state_shardings, batch_shardings, NamedSharding(mesh, P()))
    out_shardings = (
        (state_shardings, NamedSharding(mesh, P()))
        if state_shardings is not None
        else None
    )
    return jax.jit(
        train_step, in_shardings=in_shardings, out_shardings=out_shardings,
        donate_argnums=donate_argnums,
    )


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))

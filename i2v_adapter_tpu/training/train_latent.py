"""From-scratch latent-diffusion trainers for the simple model zoo.

Equivalents of the reference's hand-rolled trainers
(/root/reference/src/train_image_latent_cond.py,
train_video_latent_cond.py): linear-beta DDPM schedule, closed-form
q-sample, CFG text dropout, full ancestral sampling loop with CFG, epoch
checkpointing.  Here the schedule comes from the shared functional
schedulers (``beta_schedule='linear'`` matching their hand-rolled betas) and
the sampler is a jitted ``lax.scan``.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from i2v_adapter_tpu.config import SchedulerConfig
from i2v_adapter_tpu.models.simple import SimpleUNet, SimpleUNet3D
from i2v_adapter_tpu.schedulers import add_noise, ddpm_step, make_schedule

logger = logging.getLogger(__name__)

# the reference's hand-rolled schedule (train_image_latent_cond.py:39-47)
LATENT_SCHEDULE = SchedulerConfig(
    num_train_timesteps=1000,
    beta_start=1e-4,
    beta_end=0.02,
    beta_schedule="linear",
    clip_sample=False,
)


def make_latent_train_step(
    model,
    schedule_config: SchedulerConfig = LATENT_SCHEDULE,
    learning_rate: float = 1e-4,
    uncond_prob: float = 0.1,
    is_video: bool = False,
    image_only: bool = False,
):
    """Returns (init_fn, step_fn, tx). Batch: latents (B,[T,]H,W,C) in
    [-1,1]; text_embeds (B,L,D) optional pre-encoded CLIP context.

    ``is_video`` targets a SimpleUNet3D; ``image_only`` is the reference's
    joint image+video switch (train_video_latent_cond.py:128-169): single
    frames run through the video UNet with the temporal branches forced off
    (AlphaBlender α=1).  Image batches (B, H, W, C) are lifted to T=1 clips."""
    schedule = make_schedule(schedule_config)
    tx = optax.adamw(learning_rate)

    def lift(latents):
        if is_video and latents.ndim == 4:
            return latents[:, None]  # (B, H, W, C) -> (B, 1, H, W, C)
        return latents

    def apply_model(p, noisy, t, context):
        if is_video:
            return model.apply(p, noisy, t, context, image_only=image_only)
        return model.apply(p, noisy, t, context)

    def init_fn(rng, sample_batch):
        latents = lift(jnp.asarray(sample_batch["latents"][:1]))
        ctx = sample_batch.get("text_embeds")
        ctx = jnp.asarray(ctx[:1]) if ctx is not None else None
        if is_video:
            params = model.init(
                rng, latents, jnp.zeros((1,)), ctx, image_only=image_only
            )
        else:
            params = model.init(rng, latents, jnp.zeros((1,)), ctx)
        return params, tx.init(params)

    def step_fn(params, opt_state, batch, rng):
        rng_t, rng_noise, rng_drop = jax.random.split(rng, 3)
        latents = lift(batch["latents"])
        b = latents.shape[0]
        ctx = batch.get("text_embeds")

        def loss_fn(p):
            t = jax.random.randint(rng_t, (b,), 0, schedule.num_train_timesteps)
            noise = jax.random.normal(rng_noise, latents.shape)
            noisy = add_noise(schedule, latents, noise, t)
            context = ctx
            if context is not None and uncond_prob > 0:
                drop = jax.random.uniform(rng_drop, (b,)) < uncond_prob
                context = jnp.where(
                    drop[:, None, None], jnp.zeros_like(context), context
                )
            pred = apply_model(p, noisy, t, context)
            return jnp.mean((pred - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, jax.jit(step_fn), tx


def sample_latents(
    model,
    params,
    shape,
    rng,
    context: Optional[jnp.ndarray] = None,
    guidance_scale: float = 7.5,
    schedule_config: SchedulerConfig = LATENT_SCHEDULE,
):
    """Full ancestral DDPM sampling with CFG (reference
    train_image_latent_cond.py:55-101) as one jitted scan."""
    schedule = make_schedule(schedule_config)
    n = schedule.num_train_timesteps
    use_cfg = context is not None and guidance_scale > 1.0

    def step(carry, t):
        x, key = carry
        key, nkey = jax.random.split(key)
        if use_cfg:
            xin = jnp.concatenate([x, x])
            ctx = jnp.concatenate([jnp.zeros_like(context), context])
            eps = model.apply(params, xin, jnp.full((xin.shape[0],), t), ctx)
            eps_u, eps_c = jnp.split(eps, 2)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        else:
            eps = model.apply(params, x, jnp.full((x.shape[0],), t), context)
        noise = jax.random.normal(nkey, x.shape)
        x = ddpm_step(schedule, eps, jnp.full((x.shape[0],), t), x, noise)
        return (x, key), None

    rng, init_key = jax.random.split(rng)
    x0 = jax.random.normal(init_key, shape)
    (x, _), _ = jax.lax.scan(
        step, (x0, rng), jnp.arange(n - 1, -1, -1)
    )
    return x


def save_simple_checkpoint(params, path: str) -> None:
    from flax.traverse_util import flatten_dict
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(
        {k: np.asarray(v) for k, v in flatten_dict(params, sep="/").items()}, path
    )


def load_simple_checkpoint(path: str) -> dict:
    from flax.traverse_util import unflatten_dict
    from safetensors.numpy import load_file

    return unflatten_dict(load_file(path), sep="/")


def make_video_latent_train_step(model, image_only: bool = False, **kwargs):
    """Video-latent trainer on a SimpleUNet3D with the reference's joint
    image+video ``image_only`` switch (train_video_latent_cond.py:128-169):
    image_only=True trains the same video UNet on single frames with the
    temporal branches forced off."""
    return make_latent_train_step(
        model, is_video=True, image_only=image_only, **kwargs
    )


__all__ = [
    "LATENT_SCHEDULE",
    "make_latent_train_step",
    "make_video_latent_train_step",
    "sample_latents",
    "save_simple_checkpoint",
    "load_simple_checkpoint",
    "SimpleUNet",
    "SimpleUNet3D",
]

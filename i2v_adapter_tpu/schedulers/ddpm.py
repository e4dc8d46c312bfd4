"""Functional ancestral DDPM step (diffusers ``DDPMScheduler.step`` semantics).

Used by the from-scratch latent trainers' samplers (the reference hand-rolls
the same math at /root/reference/src/train_image_latent_cond.py:55-101) and
available as an alternative sampler for the main pipeline.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from i2v_adapter_tpu.schedulers.schedule import NoiseSchedule, predict_x0_and_eps


def ddpm_step(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    sample: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One ancestral x_t -> x_{t-1} update with fixed_small variance."""
    t = jnp.asarray(timestep)
    alpha_prod_t = schedule.alphas_cumprod[t]
    alpha_prod_prev = jnp.where(
        t > 0, schedule.alphas_cumprod[jnp.maximum(t - 1, 0)], jnp.asarray(1.0)
    )
    shape = t.shape + (1,) * (sample.ndim - jnp.ndim(t))
    alpha_prod_t = alpha_prod_t.reshape(shape).astype(jnp.float32)
    alpha_prod_prev = alpha_prod_prev.reshape(shape).astype(jnp.float32)
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_prev = 1.0 - alpha_prod_prev
    current_alpha = alpha_prod_t / alpha_prod_prev
    current_beta = 1.0 - current_alpha

    sample32 = sample.astype(jnp.float32)
    x0, _ = predict_x0_and_eps(
        schedule, model_output.astype(jnp.float32), sample32, alpha_prod_t
    )

    # mu_t coefficients (DDPM eq. 7)
    x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
    xt_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
    mean = x0_coeff * x0 + xt_coeff * sample32

    variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, min=1e-20)
    if noise is None:
        noise = jnp.zeros_like(sample32)
    add = jnp.where(
        (t > 0).reshape(shape), jnp.sqrt(variance) * noise.astype(jnp.float32), 0.0
    )
    return (mean + add).astype(sample.dtype)

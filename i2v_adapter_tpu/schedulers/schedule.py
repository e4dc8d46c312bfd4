"""Noise schedule as data + pure functions.

The reference delegates to stateful diffusers ``DDPMScheduler``/
``DDIMScheduler`` objects.  TPU-first, the schedule is a small pytree of
precomputed arrays plus pure functions that can be traced under ``jit`` and
``lax.scan`` without host round-trips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from i2v_adapter_tpu.config import SchedulerConfig


class NoiseSchedule(NamedTuple):
    """Precomputed diffusion schedule arrays (all length num_train_timesteps)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    # final_alpha_cumprod used by DDIM when stepping past timestep 0
    # (alphas_cumprod[0] when set_alpha_to_one=False, else 1.0).
    final_alpha_cumprod: jnp.ndarray
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool
    clip_sample_range: float


def make_schedule(config: SchedulerConfig) -> NoiseSchedule:
    n = config.num_train_timesteps
    # float64 on host for the cumulative product, then cast: matches the
    # numpy-precision tables diffusers builds.
    if config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(config.beta_start**0.5, config.beta_end**0.5, n, dtype=np.float64)
            ** 2
        )
    elif config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, n, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta_schedule: {config.beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = np.float64(1.0) if config.set_alpha_to_one else alphas_cumprod[0]
    return NoiseSchedule(
        betas=jnp.asarray(betas, dtype=jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        num_train_timesteps=n,
        prediction_type=config.prediction_type,
        clip_sample=config.clip_sample,
        clip_sample_range=config.clip_sample_range,
    )


def _broadcast(coeff: jnp.ndarray, target_ndim: int) -> jnp.ndarray:
    """Right-pad a (batch,) coefficient with singleton axes."""
    return coeff.reshape(coeff.shape + (1,) * (target_ndim - coeff.ndim))


def add_noise(
    schedule: NoiseSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(abar_t) x_0 + sqrt(1 - abar_t) eps.

    ``timesteps`` has shape (batch,) and broadcasts over remaining axes, so a
    per-video timestep applies to every frame — the reference's training
    semantics (/root/reference/src/train_image_to_video.py:805-813).  With
    ``noise[:, 0] = 0`` the first frame comes out as sqrt(abar_t) x_0, the
    invariant documented by
    /root/reference/test/test_first_frame_pertubation.py:17-39.
    """
    abar = schedule.alphas_cumprod[timesteps].astype(sample.dtype)
    sqrt_abar = _broadcast(jnp.sqrt(abar), sample.ndim)
    sqrt_one_minus = _broadcast(jnp.sqrt(1.0 - abar), sample.ndim)
    return sqrt_abar * sample + sqrt_one_minus * noise


def get_velocity(
    schedule: NoiseSchedule,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
) -> jnp.ndarray:
    """v-prediction target: sqrt(abar) eps - sqrt(1-abar) x_0."""
    abar = schedule.alphas_cumprod[timesteps].astype(sample.dtype)
    sqrt_abar = _broadcast(jnp.sqrt(abar), sample.ndim)
    sqrt_one_minus = _broadcast(jnp.sqrt(1.0 - abar), sample.ndim)
    return sqrt_abar * noise - sqrt_one_minus * sample


def compute_snr(schedule: NoiseSchedule, timesteps: jnp.ndarray) -> jnp.ndarray:
    """Signal-to-noise ratio abar / (1 - abar), for SNR-gamma loss weighting
    (reference /root/reference/src/train_image_to_video.py:858-872)."""
    abar = schedule.alphas_cumprod[timesteps]
    return abar / (1.0 - abar)


def predict_x0_and_eps(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
    alpha_prod_t: jnp.ndarray,
):
    """Recover (x0_hat, eps_hat) from a model output under the configured
    prediction type. ``alpha_prod_t`` broadcasts against ``sample``."""
    beta_prod_t = 1.0 - alpha_prod_t
    sqrt_a = jnp.sqrt(alpha_prod_t)
    sqrt_b = jnp.sqrt(beta_prod_t)
    if schedule.prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sqrt_b * eps) / sqrt_a
    elif schedule.prediction_type == "v_prediction":
        x0 = sqrt_a * sample - sqrt_b * model_output
        eps = sqrt_a * model_output + sqrt_b * sample
    elif schedule.prediction_type == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_b
    else:
        raise ValueError(f"unknown prediction_type: {schedule.prediction_type}")
    if schedule.clip_sample:
        r = schedule.clip_sample_range
        x0 = jnp.clip(x0, -r, r)
        # eps must stay consistent with the clipped x0.
        eps = (sample - sqrt_a * x0) / sqrt_b
    return x0, eps

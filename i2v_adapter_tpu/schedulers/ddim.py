"""Functional DDIM sampler.

Matches diffusers ``DDIMScheduler`` (v0.24) semantics with the reference's
construction flags: ``clip_sample=False, timestep_spacing='linspace',
steps_offset=1`` (/root/reference/src/pipelines/pipeline_i2v_adapter.py:751-757).
Timestep selection happens on the host with numpy (static shapes); the step
itself is a pure jittable function suitable for ``lax.scan``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from i2v_adapter_tpu.config import SchedulerConfig
from i2v_adapter_tpu.schedulers.schedule import NoiseSchedule, predict_x0_and_eps


def ddim_timesteps(config: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending inference timesteps (host-side, static)."""
    n = config.num_train_timesteps
    if num_inference_steps > n:
        raise ValueError(f"num_inference_steps {num_inference_steps} > {n}")
    if config.timestep_spacing == "linspace":
        ts = (
            np.linspace(0, n - 1, num_inference_steps)
            .round()[::-1]
            .copy()
            .astype(np.int64)
        )
    elif config.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].copy()
        ts = ts.astype(np.int64) + config.steps_offset
    elif config.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        ts = np.round(np.arange(n, 0, -step_ratio)).astype(np.int64) - 1
    else:
        raise ValueError(f"unknown timestep_spacing: {config.timestep_spacing}")
    return ts


def truncate_timesteps(
    timesteps: np.ndarray, num_inference_steps: int, strength: float
) -> np.ndarray:
    """Drop the leading (1-strength) fraction of the schedule.

    The image-to-video pipeline starts denoising from t ~= strength*T on the
    similarity prior rather than from pure noise
    (/root/reference/src/pipelines/pipeline_i2v_adapter.py:529-536).
    """
    init_timestep = min(int(num_inference_steps * strength), num_inference_steps)
    t_start = max(num_inference_steps - init_timestep, 0)
    return timesteps[t_start:]


def ddim_step(
    schedule: NoiseSchedule,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One x_t -> x_{t-dt} DDIM update.

    ``prev_timestep`` is passed explicitly (it equals
    ``t - num_train_timesteps // num_inference_steps`` and is precomputed
    alongside the timestep array) so the function stays shape-static inside
    ``lax.scan``.  Negative ``prev_timestep`` selects final_alpha_cumprod.
    """
    alpha_prod_t = schedule.alphas_cumprod[timestep]
    alpha_prod_prev = jnp.where(
        prev_timestep >= 0,
        schedule.alphas_cumprod[jnp.maximum(prev_timestep, 0)],
        schedule.final_alpha_cumprod,
    )
    # broadcast over trailing sample axes; timestep may be scalar or (batch,)
    shape = timestep.shape + (1,) * (sample.ndim - jnp.ndim(timestep))
    alpha_prod_t = alpha_prod_t.reshape(shape).astype(jnp.float32)
    alpha_prod_prev = alpha_prod_prev.reshape(shape).astype(jnp.float32)

    sample32 = sample.astype(jnp.float32)
    x0, eps = predict_x0_and_eps(
        schedule, model_output.astype(jnp.float32), sample32, alpha_prod_t
    )

    beta_prod_prev = 1.0 - alpha_prod_prev
    if eta > 0.0:
        beta_prod_t = 1.0 - alpha_prod_t
        variance = (beta_prod_prev / beta_prod_t) * (
            1.0 - alpha_prod_t / alpha_prod_prev
        )
        std = eta * jnp.sqrt(variance)
    else:
        variance = jnp.zeros_like(alpha_prod_prev)
        std = jnp.zeros_like(alpha_prod_prev)

    dir_xt = jnp.sqrt(beta_prod_prev - std**2) * eps
    prev_sample = jnp.sqrt(alpha_prod_prev) * x0 + dir_xt
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev_sample = prev_sample + std * noise.astype(jnp.float32)
    return prev_sample.astype(sample.dtype)


def ddim_schedule_arrays(
    config: SchedulerConfig, num_inference_steps: int, strength: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """(timesteps, prev_timesteps) for a possibly truncated DDIM run."""
    ts = ddim_timesteps(config, num_inference_steps)
    ts = truncate_timesteps(ts, num_inference_steps, strength)
    prev = ts - config.num_train_timesteps // num_inference_steps
    return ts, prev

from i2v_adapter_tpu.schedulers.schedule import (
    NoiseSchedule,
    make_schedule,
    add_noise,
    get_velocity,
    compute_snr,
)
from i2v_adapter_tpu.schedulers.ddim import (
    ddim_timesteps,
    truncate_timesteps,
    ddim_step,
)
from i2v_adapter_tpu.schedulers.ddpm import ddpm_step

__all__ = [
    "NoiseSchedule",
    "make_schedule",
    "add_noise",
    "get_velocity",
    "compute_snr",
    "ddim_timesteps",
    "truncate_timesteps",
    "ddim_step",
    "ddpm_step",
]

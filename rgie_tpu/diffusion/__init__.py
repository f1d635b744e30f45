"""Diffusion backend: schedulers, UNet, VAE, text encoders, pipeline."""

from rgie_tpu.diffusion.schedulers import (
    DiffusionSchedule,
    add_noise,
    ddim_inverse_step,
    ddim_step,
    dpm_init_state,
    dpm_step,
    inverse_timesteps,
    make_schedule,
)

from genpercept_tpu.diffusion.schedulers import (
    GENPERCEPT_SCHEDULER,
    SchedulerConfig,
    SchedulerState,
    make_scheduler,
    add_noise,
    get_velocity,
    ddim_step,
    ddpm_step,
    leading_timesteps,
)

__all__ = [
    "GENPERCEPT_SCHEDULER",
    "SchedulerConfig",
    "SchedulerState",
    "make_scheduler",
    "add_noise",
    "get_velocity",
    "ddim_step",
    "ddpm_step",
    "leading_timesteps",
]

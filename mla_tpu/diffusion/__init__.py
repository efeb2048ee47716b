from mla_tpu.diffusion.gaussian import (
    Schedule,
    create_schedule,
    ddim_sample_loop,
    ddpm_sample_loop,
    get_named_beta_schedule,
    pred_xstart_from_eps,
    q_sample,
    space_timesteps,
)

__all__ = [
    "Schedule",
    "create_schedule",
    "ddim_sample_loop",
    "ddpm_sample_loop",
    "get_named_beta_schedule",
    "pred_xstart_from_eps",
    "q_sample",
    "space_timesteps",
]

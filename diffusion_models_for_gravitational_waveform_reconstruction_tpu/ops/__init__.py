from .schedules import (  # noqa: F401
    DiffusionSchedule,
    cosine_beta_schedule,
    linear_beta_schedule,
    make_schedule,
    snr_from_alpha_bar,
    t_for_target_snr,
    build_t_schedule,
    cfg_weight,
    cfg_weight_schedule,
    cfg_combination_coeffs,
)
from .diffusion import (  # noqa: F401
    q_sample,
    q_sample_with_eps,
    eps_to_x0,
    x0_to_eps,
    element_loss,
    masked_loss,
    sample_timesteps_uniform,
    sample_timesteps_stratified,
    repeat_for_t_multi,
)

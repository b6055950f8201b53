from .schedules import (
    DiffusionSchedule,
    DDIMSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    make_strength_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_schedule,
    make_ddim_schedule,
    extract,
)
from .gaussian import (
    q_sample,
    predict_start_from_noise,
    q_posterior,
    p_losses,
    get_loss,
    ddpm_p_sample_loop,
)
from .video import audio_windows, make_video_pipeline, progressive_video_sample
from .plms import plms_sample
from .dpm_solver import (
    DPMSolverSchedule,
    VPContinuous,
    dpm_solver_sample,
    dpm_solver_sample_adaptive,
    dpm_solver_sample_suite,
    make_dpm_schedule,
    make_vp_continuous,
)
from .ddim import (
    cfg_eps_fn,
    p_sample_ddim,
    ddim_sample,
    ddim_sample_with_intermediates,
    ddim_invert,
    ddim_reverse_from,
    latent_manipulation,
    stochastic_encode,
)

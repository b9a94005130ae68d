from guided_attention_tpu.schedulers.ddim import DDIMSchedule, make_ddim_schedule, ddim_step, renoise  # noqa: F401

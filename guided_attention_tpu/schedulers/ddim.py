"""DDIM scheduler as pure functions over a precomputed schedule pytree.

TPU-native replacement for diffusers' stateful DDIMScheduler as used by the
reference (reference pipeline_guided_attention.py:883-890, 1027-1029,
1046-1053). All per-run quantities — timesteps, alphas_cumprod gathers,
sigmas, the re-noise blend factors — are precomputed into arrays indexed by
step so the denoising loop can be a single `lax.scan`.

Stable Diffusion scheduler config (v1.x and v2.1-base share it):
  beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
  num_train_timesteps=1000, steps_offset=1, clip_sample=False,
  set_alpha_to_one=False, prediction_type="epsilon".
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DDIMSchedule:
    """Precomputed per-step schedule for one generation run.

    All arrays are length ``num_inference_steps`` and indexed by the loop
    step i (i=0 is the noisiest timestep).
    """

    timesteps: jnp.ndarray  # i32[S] — training timesteps, descending
    alpha_prod: jnp.ndarray  # f32[S] — alphas_cumprod[t_i]
    alpha_prod_prev: jnp.ndarray  # f32[S] — alphas_cumprod[t_i - dt] (or final)
    sigmas: jnp.ndarray  # f32[S] — sqrt((1-a)/a) at t_i (pipeline:887)
    # re-noise blend Bt = a_t / a_{t-dt}; gated to 1 (no-op) when the
    # previous timestep would be <= 0 (pipeline:1048-1053)
    renoise_beta: jnp.ndarray  # f32[S]
    init_noise_sigma: float = struct.field(pytree_node=False, default=1.0)
    num_train_timesteps: int = struct.field(pytree_node=False, default=1000)
    prediction_type: str = struct.field(pytree_node=False, default="epsilon")


def make_ddim_schedule(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    steps_offset: int = 1,
    set_alpha_to_one: bool = False,
    prediction_type: str = "epsilon",
) -> DDIMSchedule:
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unsupported beta_schedule {beta_schedule!r}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    final_alpha = 1.0 if set_alpha_to_one else alphas_cumprod[0]

    step_ratio = num_train_timesteps // num_inference_steps
    timesteps = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
    timesteps = timesteps + steps_offset

    a_t = alphas_cumprod[timesteps]
    prev_t = timesteps - step_ratio
    a_prev = np.where(prev_t >= 0, alphas_cumprod[np.clip(prev_t, 0, None)], final_alpha)
    sigmas = np.sqrt((1.0 - a_t) / a_t)
    # re-noise: only valid when the previous (noisier-ward) timestep > 0
    beta_rn = np.where(prev_t > 0, a_t / np.where(prev_t > 0, a_prev, 1.0), 1.0)

    return DDIMSchedule(
        timesteps=jnp.asarray(timesteps, jnp.int32),
        alpha_prod=jnp.asarray(a_t, jnp.float32),
        alpha_prod_prev=jnp.asarray(a_prev, jnp.float32),
        sigmas=jnp.asarray(sigmas, jnp.float32),
        renoise_beta=jnp.asarray(beta_rn, jnp.float32),
        init_noise_sigma=1.0,
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )


def ddim_step(
    sched: DDIMSchedule,
    i: jnp.ndarray,
    noise_pred: jnp.ndarray,
    sample: jnp.ndarray,
    eta: float = 0.0,
    key: Optional[jax.Array] = None,
):
    """One DDIM update x_t -> x_{t-1}.

    Returns (prev_sample, pred_original_sample). ``i`` is the loop step index
    (traced). Matches diffusers DDIMScheduler.step with clip_sample=False.
    ``eta`` is a trace-time constant (the reference threads it from
    prepare_extra_step_kwargs into scheduler.step, reference
    pipeline_guided_attention.py:906, 1027-1029); eta=0 compiles to the
    deterministic update with no noise branch at all. For eta>0 the variance
    term is diffusers' _get_variance:
      var = (1-a_prev)/(1-a_t) * (1 - a_t/a_prev),  std = eta*sqrt(var)
      prev = sqrt(a_prev)*x0 + sqrt(1-a_prev-std^2)*eps + std*noise(key)
    """
    a_t = sched.alpha_prod[i]
    a_prev = sched.alpha_prod_prev[i]
    b_t = 1.0 - a_t
    x0 = (sample - jnp.sqrt(b_t) * noise_pred) / jnp.sqrt(a_t)
    if eta > 0.0:
        if key is None:
            raise ValueError("ddim_step with eta > 0 requires a PRNG key")
        variance = (1.0 - a_prev) / b_t * (1.0 - a_t / a_prev)
        std = eta * jnp.sqrt(variance)
        direction = jnp.sqrt(jnp.maximum(1.0 - a_prev - std**2, 0.0)) * noise_pred
        noise = jax.random.normal(key, sample.shape, jnp.float32)
        prev = jnp.sqrt(a_prev) * x0 + direction + std * noise
    else:
        direction = jnp.sqrt(1.0 - a_prev) * noise_pred
        prev = jnp.sqrt(a_prev) * x0 + direction
    return prev, x0


def renoise(
    sched: DDIMSchedule, i: jnp.ndarray, latents: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Re-add noise to return x_{t-1} to noise level t ("time travel",
    reference pipeline:1046-1053): x <- sqrt(Bt)*x + sqrt(1-Bt)*eps,
    Bt = a_t / a_{t-dt}; identity when the previous timestep <= 0."""
    beta = sched.renoise_beta[i]
    eps = jax.random.normal(key, latents.shape, jnp.float32)
    x = latents.astype(jnp.float32)
    out = jnp.sqrt(beta) * x + jnp.sqrt(jnp.maximum(1.0 - beta, 0.0)) * eps
    return out.astype(latents.dtype)

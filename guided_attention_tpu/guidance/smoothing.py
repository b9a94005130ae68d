"""Gaussian smoothing of token attention maps.

TPU-native depthwise convolution via ``lax.conv_general_dilated`` replacing
the reference's torch ``F.conv2d`` module (reference
utils/gaussian_smoothing.py:8-71). Note the reference's kernel formula is
``exp(-((x - m) / (2*sigma))**2)`` — i.e. an effective std of sqrt(2)*sigma,
not the textbook gaussian — and we reproduce it exactly (reference
utils/gaussian_smoothing.py:39-40) so that smoothed maps match.

Applied with reflect padding 1 as in the reference's call site (reference
pipeline_guided_attention.py:251-254).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel(kernel_size: int = 3, sigma: float = 0.5, dim: int = 2) -> np.ndarray:
    """Separable product kernel with the reference's formula, normalized to 1."""
    axes = []
    for _ in range(dim):
        grid = np.arange(kernel_size, dtype=np.float64)
        mean = (kernel_size - 1) / 2.0
        axes.append(
            1.0 / (sigma * np.sqrt(2.0 * np.pi)) * np.exp(-(((grid - mean) / (2.0 * sigma)) ** 2))
        )
    kernel = axes[0]
    for a in axes[1:]:
        kernel = np.multiply.outer(kernel, a)
    kernel = kernel / kernel.sum()
    return kernel.astype(np.float32)


def smooth_maps(
    maps: jax.Array,
    kernel_size: int = 3,
    sigma: float = 0.5,
) -> jax.Array:
    """Depthwise-smooth a stack of 2-D maps.

    Args:
      maps: [..., H, W] array; every leading axis is treated as a channel.
    Returns:
      Same shape, each HxW map blurred with reflect-pad ``(kernel_size-1)//2``.
    """
    k = jnp.asarray(gaussian_kernel(kernel_size, sigma, dim=2), maps.dtype)
    pad = (kernel_size - 1) // 2
    orig_shape = maps.shape
    h, w = orig_shape[-2:]
    x = maps.reshape((-1, 1, h, w))  # NCHW with C=1 (depthwise via batch fold)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x,
        k[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(orig_shape)


def average_smooth_maps(maps: jax.Array, kernel_size: int = 3) -> jax.Array:
    """Depthwise box (average) filter — the reference defines an
    AverageSmoothing module it never calls (reference
    utils/gaussian_smoothing.py:74-119, VALID padding, kernel = ones/size^2);
    kept for API completeness. [..., H, W] -> [..., H-k+1, W-k+1]."""
    k = jnp.full((kernel_size, kernel_size), 1.0 / (kernel_size * kernel_size), maps.dtype)
    h, w = maps.shape[-2:]
    x = maps.reshape((-1, 1, h, w))
    out = jax.lax.conv_general_dilated(
        x,
        k[None, None, :, :],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(maps.shape[:-2] + out.shape[-2:])

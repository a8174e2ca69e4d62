"""Grayscale morphology for semantic postprocessing.

Equivalent of ``SemanticSmoothing`` (engine/layers/semantic.py:260-293):
``tf.nn.erosion2d`` / ``tf.nn.dilation2d`` with an all-zero kernel reduce to
windowed min / max, which map onto XLA ``reduce_window`` (VPU-friendly, no
Pallas needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _window_dims(x_ndim: int, kernel_size: int):
    dims = [1] * x_ndim
    strides = [1] * x_ndim
    # spatial dims are the two before the channel axis: [..., H, W, C]
    dims[-3] = kernel_size
    dims[-2] = kernel_size
    return tuple(dims), tuple(strides)


def erode(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Windowed min over kernel_size x kernel_size, SAME padding."""
    dims, strides = _window_dims(x.ndim, kernel_size)
    return jax.lax.reduce_window(x, jnp.inf, jax.lax.min, dims, strides, 'SAME')


def dilate(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Windowed max over kernel_size x kernel_size, SAME padding."""
    dims, strides = _window_dims(x.ndim, kernel_size)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strides, 'SAME')


def semantic_smoothing(x: jnp.ndarray, kernel_size: int,
                       weight: float = 1.0) -> jnp.ndarray:
    """Erosion -> dilation denoise + confidence weight (semantic.py:270-285).

    ``kernel_size`` and ``weight`` are static; channels are smoothed
    independently (the reference applies the layer per-channel after a
    ``tf.split`` at retinamasklab.py:619-627).
    """
    x = x.astype(jnp.float32)
    if kernel_size > 0:
        x = dilate(erode(x, kernel_size), kernel_size)
    return x * jnp.float32(weight)

"""RoI crop-and-resize as MXU-friendly interpolation matmuls.

Static-shape re-design of the reference's mask-branch crop path:
``PyramidRoiAlign`` (engine/layers/instance.py:77-147) routed dynamic
per-level box subsets through ``tf.image.crop_and_resize`` and re-batched
with MoldBatch. Here every box is cropped with fixed slots and the bilinear
sampling is expressed as two small per-box matmuls (``W_y @ fmap @ W_x^T``)
— differentiable (gradients flow into the feature map through the matmuls),
static, and mapped onto the TPU MXU instead of scattered gathers.

Sampling grid matches ``tf.image.crop_and_resize`` exactly:
  in_y(i) = y1 * (H-1) + i * (y2-y1) * (H-1) / (crop_h - 1)   (crop_h > 1)
with extrapolation_value = 0 outside [0, H-1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_weights(lo: jnp.ndarray, hi: jnp.ndarray, crop: int,
                    size: int) -> jnp.ndarray:
    """Per-box interpolation matrix [K, crop, size].

    ``lo``/``hi`` are the normalized box edges [K]. Weight rows are the
    bilinear hat function centred on each sample position, zeroed where the
    position falls outside the source extent (TF extrapolation semantics).
    """
    scale = jnp.float32(size - 1)
    if crop > 1:
        steps = jnp.arange(crop, dtype=jnp.float32) / (crop - 1)   # [crop]
        pos = (lo[:, None] + (hi - lo)[:, None] * steps[None, :]) * scale
    else:
        pos = (0.5 * (lo + hi))[:, None] * scale                   # [K, 1]
    inside = (pos >= 0.0) & (pos <= scale)
    grid = jnp.arange(size, dtype=jnp.float32)                     # [size]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid))     # [K, crop, size]
    return w * inside[..., None]


def crop_and_resize(fmap: jnp.ndarray, boxes_yxyx: jnp.ndarray,
                    crop_size=(14, 14)) -> jnp.ndarray:
    """Crop ``[K]`` boxes out of one image's feature map.

    Args:
      fmap: [H, W, C] source feature map.
      boxes_yxyx: [K, 4] boxes normalized to [0, 1] (y1, x1, y2, x2).
      crop_size: static (crop_h, crop_w).
    Returns:
      [K, crop_h, crop_w, C] crops (zeros outside the image).
    """
    h, w = fmap.shape[0], fmap.shape[1]
    ch, cw = crop_size
    boxes_yxyx = boxes_yxyx.astype(jnp.float32)
    wy = _sample_weights(boxes_yxyx[:, 0], boxes_yxyx[:, 2], ch, h)
    wx = _sample_weights(boxes_yxyx[:, 1], boxes_yxyx[:, 3], cw, w)
    if fmap.dtype == jnp.bfloat16:
        # bf16 compute mode: interpolate in the feature dtype at default
        # precision — the f32/HIGHEST matmuls cost 3.03 ms vs 1.32 ms at
        # the dense level-0 shape (benchmarks/profile_mask_branch.py) and
        # the surrounding head already computes in bf16
        rows = jnp.einsum('kih,hwc->kiwc', wy.astype(jnp.bfloat16), fmap)
        return jnp.einsum('kjw,kiwc->kijc', wx.astype(jnp.bfloat16), rows)
    fmap = fmap.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    rows = jnp.einsum('kih,hwc->kiwc', wy, fmap, precision=hi)
    return jnp.einsum('kjw,kiwc->kijc', wx, rows, precision=hi)


def crop_and_resize_indexed(fmaps: jnp.ndarray, boxes_yxyx: jnp.ndarray,
                            box_indices: jnp.ndarray,
                            crop_size=(14, 14)) -> jnp.ndarray:
    """tf.image.crop_and_resize with explicit per-box source indices.

    Args:
      fmaps: [N, H, W, C] stack of source images.
      boxes_yxyx: [K, 4] normalized boxes.
      box_indices: [K] int index into ``fmaps`` per box.
    Returns:
      [K, crop_h, crop_w, C].
    """
    gathered = fmaps[box_indices]                   # [K, H, W, C]
    h, w = fmaps.shape[1], fmaps.shape[2]
    ch, cw = crop_size
    boxes_yxyx = boxes_yxyx.astype(jnp.float32)
    wy = _sample_weights(boxes_yxyx[:, 0], boxes_yxyx[:, 2], ch, h)
    wx = _sample_weights(boxes_yxyx[:, 1], boxes_yxyx[:, 3], cw, w)
    hi = jax.lax.Precision.HIGHEST
    rows = jnp.einsum('kih,khwc->kiwc', wy, gathered.astype(jnp.float32),
                      precision=hi)
    return jnp.einsum('kjw,kiwc->kijc', wx, rows, precision=hi)


def batched_crop_and_resize(fmaps: jnp.ndarray, boxes_yxyx: jnp.ndarray,
                            crop_size=(14, 14)) -> jnp.ndarray:
    """vmap of :func:`crop_and_resize`: [B,H,W,C] x [B,K,4] -> [B,K,ch,cw,C]."""
    return jax.vmap(lambda f, b: crop_and_resize(f, b, crop_size))(
        fmaps, boxes_yxyx)

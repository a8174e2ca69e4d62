"""In-graph visualization: segmentation/instance overlays + box borders.

Pure-JAX equivalents of the serving drawing layers (misc.py:404-503):
  * draw_segmentation — per-class alpha-blended color overlay;
  * draw_instance — per-class union of pasted instance masks, then blended;
  * draw_boxes — 1-px white box borders (tf.image.draw_bounding_boxes
    equivalent) computed from iota grids, no loops.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def draw_segmentation(images: jnp.ndarray, seg: jnp.ndarray,
                      colors: Sequence[Sequence[int]],
                      alpha: float = 0.3) -> jnp.ndarray:
    """images [B,H,W,3] x seg [B,H,W,C] (0/1) -> uint8 overlay."""
    images = images.astype(jnp.float32)
    colors = jnp.asarray(colors, jnp.float32)            # [C, 3]
    color_map = jnp.einsum('bhwc,cd->bhwd', seg.astype(jnp.float32), colors)
    vis = jnp.clip(images + color_map * alpha, 0, 255)
    return vis.astype(jnp.uint8)


def draw_instance(images: jnp.ndarray, det_boxes: jnp.ndarray,
                  padded_masks: jnp.ndarray,
                  colors: Sequence[Sequence[int]],
                  alpha: float = 0.3) -> jnp.ndarray:
    """Union per class of padded full-frame masks, then blend.

    det_boxes [B,K,6] (class at 4, -1 padding); padded_masks [B,K,H,W].
    """
    num_classes = len(colors)
    cls = det_boxes[..., 4].astype(jnp.int32)            # [B, K]
    onehot = jax.nn.one_hot(cls, num_classes, axis=-1)   # [B, K, C]
    stacked = jnp.einsum('bkhw,bkc->bhwc',
                         (padded_masks > 0.5).astype(jnp.float32), onehot)
    class_masks = (stacked > 0.5).astype(jnp.float32)
    return draw_segmentation(images, class_masks, colors, alpha)


def draw_boxes(images: jnp.ndarray, det_boxes: jnp.ndarray) -> jnp.ndarray:
    """1-px white borders for each valid box (draw_bounding_boxes)."""
    b, h, w = images.shape[0], images.shape[1], images.shape[2]
    boxes = jnp.maximum(det_boxes[..., :4].astype(jnp.float32), 0.0)
    cx, cy, bw, bh = (boxes[..., 0], boxes[..., 1],
                      boxes[..., 2], boxes[..., 3])
    x1, x2 = cx - bw / 2, cx + bw / 2
    y1, y2 = cy - bh / 2, cy + bh / 2
    ys = jnp.arange(h, dtype=jnp.float32)[None, None, :]     # [1,1,H]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]     # [1,1,W]
    in_y = (ys >= y1[..., None]) & (ys <= y2[..., None])     # [B,K,H]
    in_x = (xs >= x1[..., None]) & (xs <= x2[..., None])     # [B,K,W]
    on_y_edge = (jnp.abs(ys - y1[..., None]) < 1.0) | \
                (jnp.abs(ys - y2[..., None]) < 1.0)
    on_x_edge = (jnp.abs(xs - x1[..., None]) < 1.0) | \
                (jnp.abs(xs - x2[..., None]) < 1.0)
    valid = (det_boxes[..., 2] > 0)[..., None, None]         # [B,K,1,1]
    border = ((on_y_edge[..., :, None] & in_x[..., None, :]) |
              (in_y[..., :, None] & on_x_edge[..., None, :])) & valid
    border = jnp.any(border, axis=1)                         # [B,H,W]
    vis = jnp.where(border[..., None], 255.0,
                    images.astype(jnp.float32))
    return jnp.clip(vis, 0, 255).astype(jnp.uint8)

"""Box coordinate ops: encode/decode, conversion, pairwise IoU.

Pure-functional JAX equivalents of the reference layers
``RestoreBoxes`` (engine/layers/detection.py:309-344),
``NormalizeBoxes`` (detection.py:347-375) and
``CalculateIOU`` (detection.py:378-422), plus the inverse encoding used by
``AssignBoxes`` (detection.py:666-676).

All boxes are (cx, cy, w, h) in pixel units unless stated otherwise.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-5


def decode_boxes(loc_pred: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    """SSD-style decode: deltas + priors -> (cx, cy, w, h).

    ``cx = dcx * pw + pcx``, ``w = exp(dw) * pw`` (detection.py:332-341).
    Shapes broadcast: loc_pred [..., N, 4], priors [N, 4] or [..., N, 4].
    """
    loc_pred = loc_pred.astype(jnp.float32)
    priors = priors.astype(jnp.float32)
    cx = loc_pred[..., 0] * priors[..., 2] + priors[..., 0]
    cy = loc_pred[..., 1] * priors[..., 3] + priors[..., 1]
    w = jnp.exp(loc_pred[..., 2]) * priors[..., 2]
    h = jnp.exp(loc_pred[..., 3]) * priors[..., 3]
    return jnp.stack([cx, cy, w, h], axis=-1)


def encode_boxes(gt_boxes: jnp.ndarray, priors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`decode_boxes` (AssignBoxes targets, detection.py:673-676)."""
    gt = gt_boxes.astype(jnp.float32)
    pr = priors.astype(jnp.float32)
    dcx = (gt[..., 0] - pr[..., 0]) / pr[..., 2]
    dcy = (gt[..., 1] - pr[..., 1]) / pr[..., 3]
    dw = jnp.log(gt[..., 2] / pr[..., 2])
    dh = jnp.log(gt[..., 3] / pr[..., 3])
    return jnp.stack([dcx, dcy, dw, dh], axis=-1)


def cxcywh_to_yxyx(boxes: jnp.ndarray, image_hw=None) -> jnp.ndarray:
    """(cx, cy, w, h) -> (y1, x1, y2, x2), optionally normalized by image size.

    Matches ``NormalizeBoxes`` (detection.py:360-375); with ``image_hw=None``
    no normalization is applied (shape defaults to ones in the reference).
    """
    boxes = boxes.astype(jnp.float32)
    cx, cy, w, h = (boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3])
    if image_hw is None:
        ih = iw = 1.0
    else:
        ih = jnp.asarray(image_hw[0], jnp.float32)
        iw = jnp.asarray(image_hw[1], jnp.float32)
    x1 = (cx - w / 2.0) / iw
    y1 = (cy - h / 2.0) / ih
    x2 = (cx + w / 2.0) / iw
    y2 = (cy + h / 2.0) / ih
    return jnp.stack([y1, x1, y2, x2], axis=-1)


def pairwise_iou(a_boxes: jnp.ndarray, b_boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix [Na, Nb] between two (cx, cy, w, h) box sets.

    Matches ``CalculateIOU`` (detection.py:391-422) including its
    ``union + 1e-5`` denominator.
    """
    a = a_boxes.astype(jnp.float32)
    b = b_boxes.astype(jnp.float32)
    a_area = a[..., :, 2] * a[..., :, 3]                      # [Na]
    b_area = b[..., :, 2] * b[..., :, 3]                      # [Nb]
    areas = a_area[..., :, None] + b_area[..., None, :]       # [Na, Nb]

    a_yxyx = cxcywh_to_yxyx(a)
    b_yxyx = cxcywh_to_yxyx(b)
    ay1, ax1, ay2, ax2 = jnp.split(a_yxyx[..., :, None, :], 4, axis=-1)
    by1, bx1, by2, bx2 = jnp.split(b_yxyx[..., None, :, :], 4, axis=-1)

    in_h = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
    in_w = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
    intersection = (in_h * in_w)[..., 0]
    union = areas - intersection
    return intersection / (union + EPS)


def iou_yxyx(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for corner-format (y1, x1, y2, x2) boxes.

    Uses the exact-union form (no epsilon) matching
    ``tf.image.non_max_suppression``'s internal IoU so NMS keep decisions are
    bit-compatible.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a_area = (a[..., :, 2] - a[..., :, 0]) * (a[..., :, 3] - a[..., :, 1])
    b_area = (b[..., :, 2] - b[..., :, 0]) * (b[..., :, 3] - b[..., :, 1])
    ay1, ax1, ay2, ax2 = jnp.split(a[..., :, None, :], 4, axis=-1)
    by1, bx1, by2, bx2 = jnp.split(b[..., None, :, :], 4, axis=-1)
    in_h = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1))
    in_w = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1))
    inter = (in_h * in_w)[..., 0]
    union = a_area[..., :, None] + b_area[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)

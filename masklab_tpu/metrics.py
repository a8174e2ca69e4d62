"""Train-time in-graph metrics.

Pure-function equivalents of engine/metrics.py:
  * class_binary_iou — per-class thresholded IoU (metrics.py:70-105)
  * detection_iou_metric — precision/recall/F1 of proposals vs gt at IoU 0.5
    (metrics.py:109-169), vectorized per image instead of the reference's
    cross-batch flattened IoU + diagonal gather.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .ops.boxes import pairwise_iou

EPS = 1e-7


def confusion_matrix_metric(cls_true, cls_pred, mask, threshold=0.3):
    """Anchor-classification precision/recall/accuracy/F1.

    Port of ``ConfusionMatrixMetric`` (metrics.py:11-69) — defined but
    unused in the reference's graphs; provided for completeness.
    cls_true/cls_pred [B,N,C]; mask [B,N,1] (1 neg, 0 pos, -1 ignore).
    """
    num_classes = cls_pred.shape[-1]
    ct = cls_true.reshape(-1, num_classes)
    cp = cls_pred.reshape(-1, num_classes)
    m = mask.reshape(-1)
    pos_mask = (m == 0.0)
    ignore = (m != -1.0).astype(jnp.float32)

    y_true = jnp.where(pos_mask, jnp.argmax(ct, axis=1), num_classes)
    conf = jnp.max(cp, axis=1)
    y_pred = jnp.where(conf > threshold, jnp.argmax(cp, axis=1),
                       num_classes)
    correct = y_true == y_pred
    predicted_pos = y_pred < num_classes
    tp = jnp.sum((correct & predicted_pos) * ignore)
    fp = jnp.sum((~correct & predicted_pos) * ignore)
    fn = jnp.sum((~correct & ~predicted_pos) * ignore)
    tn = jnp.sum((correct & ~predicted_pos) * ignore)
    precision = tp / (tp + fp + EPS)
    recall = tp / (tp + fn + EPS)
    accuracy = (tp + tn) / (tp + tn + fp + fn + EPS)
    f1 = 2 * precision * recall / (precision + recall + EPS)
    return precision, recall, accuracy, f1


def class_binary_iou(seg_true, seg_pred, threshold=0.5):
    """Per-class binary IoU -> [B, C] (1.0 where union is empty)."""
    t = (seg_true > threshold).astype(jnp.float32)
    p = (seg_pred > threshold).astype(jnp.float32)
    inter = jnp.sum(t * p, axis=(1, 2))
    union = jnp.sum(t, axis=(1, 2)) + jnp.sum(p, axis=(1, 2)) - inter
    return jnp.where(union > 0, inter / union, jnp.ones_like(union))


def detection_iou_metric(proposed_boxes, gt_boxes) -> Tuple[jnp.ndarray,
                                                            jnp.ndarray,
                                                            jnp.ndarray]:
    """Precision / recall / F1 at IoU 0.5 -> three [B] arrays.

    proposed_boxes [B,K,6] and gt_boxes [B,G,6], -1-padded.
    """
    def per_image(prop, gt):
        prop_valid = prop[:, 0] != -1.0
        gt_valid = gt[:, 0] != -1.0
        iou = pairwise_iou(prop[:, :4], gt[:, :4])
        iou = iou * prop_valid[:, None] * gt_valid[None, :]
        num_pos = jnp.sum((jnp.max(iou, axis=1) > 0.5).astype(jnp.float32))
        num_true = jnp.sum((jnp.max(iou, axis=0) > 0.5).astype(jnp.float32))
        num_pred = jnp.sum(prop_valid.astype(jnp.float32))
        num_gt = jnp.sum(gt_valid.astype(jnp.float32))
        precision = num_pos / (num_pred + EPS)
        recall = num_true / (num_gt + EPS)
        f1 = 2 * precision * recall / (precision + recall + EPS)
        return precision, recall, f1

    return jax.vmap(per_image)(proposed_boxes.astype(jnp.float32),
                               gt_boxes.astype(jnp.float32))

"""Static-shape class-aware two-stage NMS.

XLA re-design of the reference's ``DetectionProposal``
(engine/layers/detection.py:435-578): the TF version filters anchors with
``tf.where``, runs ``tf.image.non_max_suppression`` per (image, class) under
``tf.map_fn``, then a cross-class "post NMS" per image, and re-batches with
``MoldBatch``. None of that is expressible with static shapes, so here:

  1. per class, the top ``candidates_per_class`` anchors by score form a
     fixed-slot candidate pool (the reference considered *all* anchors above
     ``min_confidence``; a static top-k pool is the XLA equivalent and is
     lossless whenever the pool is larger than the number of anchors above
     threshold);
  2. greedy NMS runs as a fixed-length ``lax.fori_loop`` over sorted
     candidates with a suppression mask (identical keep semantics to
     ``tf.image.non_max_suppression``: strict ``iou > threshold`` suppresses,
     ties broken by lower index);
  3. survivors of all classes are merged, sorted by confidence, and a second
     greedy pass with ``post_iou_threshold`` yields the final fixed
     ``[max_outputs, 6]`` slots, padded with -1 like the reference's
     MoldBatch output (misc.py:257).

Outputs are (cx, cy, w, h, class_id, confidence) rows sorted by descending
confidence, matching the reference's final ordering.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import cxcywh_to_yxyx, iou_yxyx

NEG = jnp.float32(-1.0)


def nms_keep_mask_sequential(boxes_yxyx: jnp.ndarray, valid: jnp.ndarray,
                             iou_threshold: float,
                             max_outputs: int) -> jnp.ndarray:
    """Reference greedy NMS as a K-step sequential loop (kept for testing
    — see :func:`nms_keep_mask` for the production fixpoint form)."""
    k = boxes_yxyx.shape[0]
    iou = iou_yxyx(boxes_yxyx, boxes_yxyx)                    # [K, K]
    later = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])  # j strictly after i
    suppress_from = (iou > iou_threshold) & later              # [K, K]

    def body(i, carry):
        suppressed, kept, count = carry
        can_keep = valid[i] & (~suppressed[i]) & (count < max_outputs)
        kept = kept.at[i].set(can_keep)
        suppressed = suppressed | (can_keep & suppress_from[i])
        count = count + can_keep.astype(jnp.int32)
        return suppressed, kept, count

    suppressed0 = jnp.zeros((k,), jnp.bool_)
    kept0 = jnp.zeros((k,), jnp.bool_)
    _, kept, _ = jax.lax.fori_loop(0, k, body,
                                   (suppressed0, kept0, jnp.int32(0)))
    return kept


def nms_keep_mask(boxes_yxyx: jnp.ndarray, valid: jnp.ndarray,
                  iou_threshold: float, max_outputs: int) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes as an MXU matvec fixpoint.

    The K-step sequential loop is the TPU bottleneck (each tiny iteration
    costs microseconds of loop overhead). Greedy keep is the unique
    fixpoint of the antitone map

        f(keep)[i] = valid[i] and not exists j<i: keep[j] and iou[j,i] > t,

    and iterating ``g = f(f(keep))`` from keep = valid sandwiches the
    greedy solution from above and below (even iterates >= greedy >= odd
    iterates), converging exactly in O(longest suppression chain)
    iterations — single digits on real data. Each f is one [K, K] x [K]
    matvec on the MXU instead of K loop steps. The ``max_outputs`` cap is
    applied afterwards (keeping the first ``max_outputs`` kept boxes equals
    capped greedy, since suppression only ever flows from kept boxes).
    """
    k = boxes_yxyx.shape[0]
    iou = iou_yxyx(boxes_yxyx, boxes_yxyx)
    later = (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])
    # suppress[j, i]: earlier kept j kills i
    sup = ((iou > iou_threshold) & later).astype(jnp.float32)  # [K, K]
    valid_f = valid.astype(jnp.float32)

    def f(keep):
        hit = jnp.einsum('ji,j->i', sup, keep,
                         precision=jax.lax.Precision.HIGHEST)
        return valid_f * (hit < 0.5)

    def cond(carry):
        even, odd, it = carry
        return jnp.logical_and(jnp.any(even != odd), it < k)

    def body(carry):
        even, odd, it = carry
        odd = f(even)
        even = f(odd)
        return even, odd, it + 1

    even0 = valid_f
    odd0 = f(even0)
    even1 = f(odd0)
    even, odd, _ = jax.lax.while_loop(cond, body,
                                      (even1, odd0, jnp.int32(0)))
    kept = even > 0.5
    # cap: first max_outputs kept (in score order) survive
    rank = jnp.cumsum(kept.astype(jnp.int32))
    return kept & (rank <= max_outputs)


@partial(jax.jit, static_argnames=(
    'min_confidence', 'nms_iou_threshold', 'post_iou_threshold',
    'max_outputs', 'candidates_per_class'))
def class_aware_nms(cls_pred: jnp.ndarray, boxes: jnp.ndarray,
                    min_confidence: float = 0.05,
                    nms_iou_threshold: float = 0.4,
                    post_iou_threshold: float = 0.65,
                    max_outputs: int = 100,
                    candidates_per_class: int = 256) -> jnp.ndarray:
    """Single-image class-aware two-stage NMS.

    Args:
      cls_pred: [N, C] per-anchor per-class sigmoid confidences.
      boxes: [N, 4] decoded (cx, cy, w, h) boxes (one set for all classes).
    Returns:
      [max_outputs, 6] rows (cx, cy, w, h, class, conf), -1-padded.
    """
    n, num_classes = cls_pred.shape
    kc = min(candidates_per_class, n)
    boxes = boxes.astype(jnp.float32)
    cls_pred = cls_pred.astype(jnp.float32)
    boxes_yxyx = cxcywh_to_yxyx(boxes)                         # pixel coords

    def per_class(scores_c):
        valid = scores_c >= min_confidence
        masked = jnp.where(valid, scores_c, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, kc)        # sorted desc
        top_boxes = boxes_yxyx[top_idx]
        top_valid = top_scores >= min_confidence
        kept = nms_keep_mask(top_boxes, top_valid,
                             nms_iou_threshold, max_outputs)
        return top_idx, jnp.where(kept, top_scores, -1.0)

    # [C, Kc] survivors of stage-1 per-class NMS
    cand_idx, cand_scores = jax.vmap(per_class)(cls_pred.T)
    class_ids = jnp.broadcast_to(jnp.arange(num_classes)[:, None],
                                 cand_idx.shape)

    flat_scores = cand_scores.reshape(-1)
    flat_idx = cand_idx.reshape(-1)
    flat_class = class_ids.reshape(-1)

    # stage 2: cross-class post-NMS over all survivors
    k2 = min(flat_scores.shape[0], num_classes * max_outputs)
    s2_scores, order = jax.lax.top_k(flat_scores, k2)
    s2_anchor = flat_idx[order]
    s2_class = flat_class[order]
    s2_boxes_yxyx = boxes_yxyx[s2_anchor]
    s2_valid = s2_scores >= min_confidence
    kept2 = nms_keep_mask(s2_boxes_yxyx, s2_valid,
                          post_iou_threshold, max_outputs)

    # compact kept rows (already score-sorted) into the fixed output slots
    final_scores = jnp.where(kept2, s2_scores, -jnp.inf)
    out_scores, out_sel = jax.lax.top_k(final_scores, max_outputs)
    out_valid = jnp.isfinite(out_scores)
    out_boxes = boxes[s2_anchor[out_sel]]
    out_class = s2_class[out_sel].astype(jnp.float32)

    pad = lambda v: jnp.where(out_valid, v, NEG)
    result = jnp.stack([
        pad(out_boxes[:, 0]), pad(out_boxes[:, 1]),
        pad(out_boxes[:, 2]), pad(out_boxes[:, 3]),
        pad(out_class), pad(jnp.where(out_valid, out_scores, NEG)),
    ], axis=-1)
    # stop_gradient mirrors the reference (detection.py:567)
    return jax.lax.stop_gradient(result)


def batched_class_aware_nms(cls_pred: jnp.ndarray, boxes: jnp.ndarray,
                            **kwargs) -> jnp.ndarray:
    """vmap of :func:`class_aware_nms` over the batch axis -> [B, K, 6]."""
    return jax.vmap(lambda c, b: class_aware_nms(c, b, **kwargs))(
        cls_pred, boxes)

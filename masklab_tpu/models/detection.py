"""Detection path: FPN, classification/box heads, train-time assignment.

Flax / pure-JAX re-design of engine/layers/detection.py:
  * ``FeaturePyramid`` (detection.py:30-74): top-down FPN — 1x1 lateral +
    align-corners upsample-add + per-level 3x3 output conv (no norm/act,
    matching the reference);
  * ``ClassificationSubNet`` / ``BoxRegressionSubNet`` (detection.py:89-228):
    per-level head stacks (separate weights per level) of
    depth x [SE? -> Conv/MobileSepConv -> GroupNorm], a final 3x3 conv —
    sigmoid + focal bias init -log((1-.01)/.01) for cls — and reshape to
    [B, sum(HWA), C] / [B, sum(HWA), 4] concatenated in ascending-stride
    order (aligning 1:1 with the prior grid);
  * ``assign_boxes`` (detection.py:589-697): IoU >= 0.5 matching with the
    best-anchor-per-gt forced match and the 0.4 <= IoU < 0.5 ignore band.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.layers import GroupNorm, HeadBlock, normal_init
from ..ops.boxes import encode_boxes, pairwise_iou
from ..ops.resize import resize_like


class FeaturePyramid(nn.Module):
    """Top-down FPN over ascending-stride inputs; outputs same order."""
    num_features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        outputs = []
        prev = None
        # iterate high->low stride (reversed), like the reference
        for idx, head in enumerate(inputs[::-1]):
            lateral = nn.Conv(self.num_features, (1, 1), padding='SAME',
                              dtype=self.dtype, name=f'lateral_{idx}')(head)
            if prev is not None:
                lateral = lateral + resize_like(prev, lateral)
            prev = lateral
            outputs.append(nn.Conv(self.num_features, (3, 3), padding='SAME',
                                   dtype=self.dtype,
                                   name=f'output_{idx}')(lateral))
        return outputs[::-1]


class ClassificationSubNet(nn.Module):
    num_blocks: int
    num_classes: int
    num_depth: int = 4
    num_features: int = 256
    num_priors: int = 9
    use_separable_conv: bool = False
    expand_ratio: float = 4.0
    use_squeeze_excite: bool = False
    squeeze_ratio: float = 16.0
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        if len(inputs) != self.num_blocks:
            raise ValueError(f'{len(inputs)} feature levels != '
                             f'num_blocks={self.num_blocks}')
        heads = []
        for idx, head in enumerate(inputs):
            x = HeadBlock(self.num_depth, self.num_features,
                          self.use_separable_conv, self.expand_ratio,
                          self.use_squeeze_excite, self.squeeze_ratio,
                          self.groups, self.dtype, name=f'block_{idx}')(head)
            x = nn.Conv(self.num_priors * self.num_classes, (3, 3),
                        padding='SAME', kernel_init=normal_init(0.01),
                        bias_init=nn.initializers.constant(
                            -float(np.log((1 - 0.01) / 0.01))),
                        dtype=self.dtype, name=f'output_{idx}')(x)
            x = nn.sigmoid(x)
            b = x.shape[0]
            heads.append(x.reshape(b, -1, self.num_classes))
        return jnp.concatenate(heads, axis=1)


class BoxRegressionSubNet(nn.Module):
    num_blocks: int
    num_depth: int = 4
    num_features: int = 256
    num_priors: int = 9
    use_separable_conv: bool = False
    expand_ratio: float = 4.0
    use_squeeze_excite: bool = False
    squeeze_ratio: float = 16.0
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]):
        if len(inputs) != self.num_blocks:
            raise ValueError(f'{len(inputs)} feature levels != '
                             f'num_blocks={self.num_blocks}')
        heads = []
        for idx, head in enumerate(inputs):
            x = HeadBlock(self.num_depth, self.num_features,
                          self.use_separable_conv, self.expand_ratio,
                          self.use_squeeze_excite, self.squeeze_ratio,
                          self.groups, self.dtype, name=f'block_{idx}')(head)
            x = nn.Conv(self.num_priors * 4, (3, 3), padding='SAME',
                        kernel_init=normal_init(0.01), dtype=self.dtype,
                        name=f'output_{idx}')(x)
            b = x.shape[0]
            heads.append(x.reshape(b, -1, 4))
        return jnp.concatenate(heads, axis=1)


def assign_boxes(gt_boxes: jnp.ndarray, priors: jnp.ndarray,
                 num_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                            jnp.ndarray]:
    """Per-image anchor target assignment (vectorized AssignBoxes).

    Args:
      gt_boxes: [G, 6] (cx, cy, w, h, class, conf), -1-padded rows.
      priors: [N, 4] anchor grid.
    Returns:
      cls_true [N, C] one-hot, loc_true [N, 4] encoded deltas,
      assign_mask [N, 1] with 1=negative, 0=positive, -1=ignore.

    Matching semantics follow detection.py:616-690 with one documented
    deviation: when several gts match one anchor at IoU >= 0.5 the anchor
    takes the *highest-IoU* gt (the reference's duplicate-scatter order was
    nondeterministic); the 0.4 <= IoU < 0.5 ignore band overrides positives
    exactly as the reference's scatter does.
    """
    gt = gt_boxes.astype(jnp.float32)
    valid_gt = gt[:, 0] != -1.0                         # [G]
    iou = pairwise_iou(gt[:, :4], priors)               # [G, N]
    iou = iou * valid_gt[:, None].astype(jnp.float32)

    # per-anchor threshold matching
    best_gt_per_anchor = jnp.argmax(iou, axis=0)        # [N]
    best_iou_per_anchor = jnp.max(iou, axis=0)          # [N]
    anchor_matched = best_iou_per_anchor >= 0.5

    # forced best-anchor-per-gt match (conf > 0 rows only)
    best_anchor_per_gt = jnp.argmax(iou, axis=1)        # [G]
    force = gt[:, 5] > 0.0
    g = gt.shape[0]
    # last-wins on duplicate anchors approximated by max gt index
    forced_gt = jnp.full((priors.shape[0],), -1, jnp.int32)
    forced_gt = forced_gt.at[best_anchor_per_gt].max(
        jnp.where(force, jnp.arange(g), -1).astype(jnp.int32))

    chosen_gt = jnp.where(forced_gt >= 0, forced_gt,
                          best_gt_per_anchor.astype(jnp.int32))
    assigned = anchor_matched | (forced_gt >= 0)

    # One-hot row-select instead of gather: `gt[chosen_gt]` ([G,6] table
    # gathered by N anchor indices) lowers to one serial scalar gather per
    # column on TPU (~0.93 ms each at N=20460 — fusion.58-62 in the train
    # trace, 26% of the step). The [N,G]x[G,6] matmul is bit-exact for
    # finite rows (exactly one weight is 1.0, the rest contribute 0*x=0)
    # and rides the MXU in ~tens of microseconds.
    select = jax.nn.one_hot(chosen_gt, g, dtype=jnp.float32)   # [N, G]
    chosen_rows = select @ gt                                  # [N, 6]
    labels = chosen_rows[:, 4].astype(jnp.int32)
    cls_idx = jnp.where(assigned, labels, num_classes)
    cls_full = jax.nn.one_hot(cls_idx, num_classes + 1)
    cls_true = cls_full[:, :num_classes]

    assign_mask = cls_full[:, num_classes]              # 1 = background
    # ignore band (overrides positives, as in the reference scatter)
    in_band = jnp.any((iou < 0.5) & (iou >= 0.4), axis=0)
    assign_mask = jnp.where(in_band, -1.0, assign_mask)

    loc_true = encode_boxes(chosen_rows[:, :4], priors)
    loc_true = jnp.where(assigned[:, None], loc_true, 0.0)
    loc_true = jnp.nan_to_num(loc_true, nan=0.0, posinf=0.0, neginf=0.0)
    return cls_true, loc_true, assign_mask[:, None]


def batched_assign_boxes(gt_boxes: jnp.ndarray, priors: jnp.ndarray,
                         num_classes: int):
    """vmap over batch: gt [B,G,6] x priors [N,4]."""
    return jax.vmap(lambda g: assign_boxes(g, priors, num_classes))(gt_boxes)

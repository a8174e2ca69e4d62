"""Instance-mask branch: level routing, pyramid RoI-align, mask head,
train-time mask target assignment.

Flax / pure-JAX re-design of engine/layers/instance.py:
  * ``mask_distribute`` (instance.py:32-74): FPN-level routing
    k = floor(log2(sqrt(w*h) / base_size)) clipped to [0, max_k];
  * ``pyramid_roi_align`` (instance.py:77-147): the reference partitioned
    boxes per level with dynamic shapes and re-batched via MoldBatch; here
    every box is cropped from *every* routed level with fixed slots and the
    result selected by its level id — static shapes, identical values;
  * ``MaskSubNet`` (instance.py:158-240): per-level weight stacks of
    depth x [SE? -> Conv -> GN], a 2x2-stride-2 transposed conv, and a 1x1
    per-class sigmoid output; applied to all boxes per level then selected;
  * ``assign_masks`` (instance.py:296-386): IoU >= 0.5 class-consistent
    matching, gt-mask crops written as class-id-valued targets;
  * ``trim_instances`` (instance.py:250-285): per-box predicted-class
    channel selection (fixed slots instead of gather + MoldBatch).
"""
from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import HeadBlock, normal_init
from ..ops.boxes import cxcywh_to_yxyx, pairwise_iou
from ..ops.roi_align import (batched_crop_and_resize, crop_and_resize,
                             crop_and_resize_indexed)

EPS = 1e-7


def mask_distribute(boxes: jnp.ndarray, max_k: int = 2,
                    base_size: float = 36.0) -> jnp.ndarray:
    """Route each box to a pyramid level -> int level ids [..., K].

    ``boxes`` [..., K, >=4] rows (cx, cy, w, h, ...); padded rows
    (cx == -1) map to level -1.
    """
    w, h = boxes[..., 2], boxes[..., 3]
    size = jnp.sqrt(jnp.maximum(w * h, 0.0))
    delta_k = jnp.log((size + EPS) / (base_size + EPS)) / jnp.log(2.0)
    k = jnp.clip(jnp.floor(delta_k), 0, max_k)
    return jnp.where(boxes[..., 0] == -1.0, -1.0, k).astype(jnp.int32)


def pyramid_roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                      levels: jnp.ndarray, image_hw: Tuple[int, int],
                      crop_size=(14, 14)) -> List[jnp.ndarray]:
    """Crop every box from every level -> list of [B, K, ch, cw, C].

    The caller selects per-box crops with ``levels``; keeping the per-level
    stack explicit lets the per-level mask head weights apply first
    (matching the reference's per-level MaskSubNet blocks) before selection.
    Box coordinates are normalized by the *image* size, exactly like
    PyramidRoiAlign -> NormalizeBoxes(shape=image) (instance.py:115-116).
    """
    norm = cxcywh_to_yxyx(boxes[..., :4], image_hw)       # [B, K, 4]
    crops = []
    for fmap in features:
        crops.append(jax.vmap(
            lambda f, b: crop_and_resize(f, b, crop_size))(fmap, norm))
    return crops


class _PixelShuffleUp(nn.Module):
    """``nn.ConvTranspose((2, 2), strides=(2, 2), 'SAME')`` in PACKED form.

    Kernel 2x2 / stride 2 is non-overlapping, so every output pixel is one
    [C_in] x [C_in, F] matvec: out[2i+dy, 2j+dx, f] =
    x[i, j] . kernel[1-dy, 1-dx, :, f] + bias (orientation pinned by
    tests/test_fused_mask_head.py against nn.ConvTranspose). Computing it
    as one einsum that KEEPS the [B, h, w, 2, 2, F] packed layout lets the
    relu + 1x1 output conv that follow run before any spatial relayout —
    the old lowering materialized the [N, 2h, 2w, F] upsampled tensor
    through HBM twice (ConvTranspose out + relu out) for F=256 channels,
    when only the `num_classes`-channel FINAL tensor needs that layout.

    Param names/shapes are identical to nn.ConvTranspose (kernel
    [2, 2, C_in, F], bias [F]) — checkpoints and the reference h5
    import/export converters are unaffected.
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param('kernel', normal_init(0.01),
                            (2, 2, c_in, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel[::-1, ::-1].astype(self.dtype)
        y = jnp.einsum('bhwc,yxcf->bhwyxf', x.astype(self.dtype), k)
        return y + bias.astype(self.dtype)        # [B, h, w, 2, 2, F]


class _LevelMaskHead(nn.Module):
    """One pyramid level's mask head: [N,h,w,C] -> [N,2h,2w,classes]."""
    num_classes: int
    num_depth: int
    num_features: int
    use_separable_conv: bool
    expand_ratio: float
    use_squeeze_excite: bool
    squeeze_ratio: float
    groups: int
    dtype: Any

    @nn.compact
    def __call__(self, x):
        x = HeadBlock(self.num_depth, self.num_features,
                      self.use_separable_conv, self.expand_ratio,
                      self.use_squeeze_excite, self.squeeze_ratio,
                      self.groups, self.dtype, name='block')(x)
        # upsample + relu + 1x1 sigmoid output, all in the packed
        # pixel-shuffle layout; only the tiny num_classes-channel result
        # pays the depth-to-space relayout (see _PixelShuffleUp)
        y = _PixelShuffleUp(self.num_features, self.dtype,
                            name='upsample')(x)   # [N, h, w, 2, 2, F]
        y = nn.relu(y)
        n, h, w = y.shape[0], y.shape[1], y.shape[2]
        y = y.reshape(n, h, w * 4, self.num_features)
        y = nn.Conv(self.num_classes, (1, 1), kernel_init=normal_init(0.01),
                    dtype=self.dtype, name='output')(y)
        y = nn.sigmoid(y)
        y = y.reshape(n, h, w, 2, 2, self.num_classes)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, 2 * h, 2 * w, self.num_classes)


class MaskSubNet(nn.Module):
    """Per-level mask heads; returns per-level mask stacks.

    When ``levels`` is given, a pyramid level with zero routed boxes skips
    its head via ``nn.cond`` (XLA executes one branch): the cheap branch
    runs the head on a single box (keeping the lifted variable access
    identical across branches) and returns zeros — exactly what
    ``select_by_level`` would pick from an unused level anyway. Road
    scenes rarely populate every level, so this trims the
    crop-all+select design's redundant compute at run time.
    """
    num_blocks: int
    num_classes: int
    num_depth: int = 4
    num_features: int = 256
    use_separable_conv: bool = False
    expand_ratio: float = 4.0
    use_squeeze_excite: bool = False
    squeeze_ratio: float = 16.0
    groups: int = 16
    dtype: Any = jnp.float32

    def setup(self):
        self.heads = [
            _LevelMaskHead(self.num_classes, self.num_depth,
                           self.num_features, self.use_separable_conv,
                           self.expand_ratio, self.use_squeeze_excite,
                           self.squeeze_ratio, self.groups, self.dtype,
                           name=f'level_{i}')
            for i in range(self.num_blocks)]

    def __call__(self, level_crops: Sequence[jnp.ndarray],
                 levels: jnp.ndarray = None):
        """level_crops: per-level [B, K, h, w, C] -> per-level
        [B, K, 2h, 2w, num_classes]; levels [B, K] enables level skipping."""
        outs = []
        for idx, crop in enumerate(level_crops):
            b, k = crop.shape[0], crop.shape[1]
            out_hw = (crop.shape[2] * 2, crop.shape[3] * 2)

            def full(mdl, c, idx=idx, b=b, k=k):
                y = mdl.heads[idx](c.reshape((b * k,) + c.shape[2:]))
                return y.reshape((b, k) + y.shape[1:])

            if levels is None or self.is_initializing():
                outs.append(full(self, crop))
                continue

            def cheap(mdl, c, idx=idx, b=b, k=k, out_hw=out_hw):
                # touch the same params on one box; contribute zeros
                y = mdl.heads[idx](c.reshape((b * k,) + c.shape[2:])[:1])
                zeros = jnp.zeros((b, k) + out_hw + (self.num_classes,),
                                  y.dtype)
                return zeros + (y * 0.0).reshape(-1)[0]

            has_boxes = jnp.any(levels == idx)
            outs.append(nn.cond(has_boxes, full, cheap, self, crop))
        return outs

    def compact(self, features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                levels: jnp.ndarray, image_hw: Tuple[int, int],
                crop_size: Tuple[int, int],
                capacity_fractions: Sequence[float] = (0.25, 0.5, 1.0)
                ) -> jnp.ndarray:
        """Capacity-bucketed crop+head: exact, dense-regime-fast.

        The crop-all+select design (``__call__`` + ``select_by_level``) runs
        every level's head over ALL K boxes — (max_k+1)x redundant when the
        levels are populated. Here each level gathers only its own boxes
        (per image, sorted level-first) into the smallest static capacity
        bucket that fits the batch's worst-case count, runs its head on that
        compacted slice, and scatter-adds the results back to the original
        slots. Values are identical to select_by_level for every regime
        (capacities include K, so nothing ever overflows); XLA compiles one
        branch per bucket and ``lax.switch`` picks at run time.

        Replaces the dynamic per-level partition + MoldBatch re-batch of the
        reference (engine/layers/instance.py:109-139) with static shapes.
        """
        b, k = levels.shape
        ch, cw = crop_size
        norm = cxcywh_to_yxyx(boxes[..., :4].astype(jnp.float32), image_hw)
        caps = sorted({max(1, int(math.ceil(k * f)))
                       for f in capacity_fractions} | {k})
        out_shape = (b, k, ch * 2, cw * 2, self.num_classes)

        if self.is_initializing():
            # initialize every head over the full capacity, no control flow
            total = jnp.zeros(out_shape, jnp.float32)
            for idx, fmap in enumerate(features):
                crops = batched_crop_and_resize(fmap, norm, crop_size)
                y = self.heads[idx](crops.reshape((b * k,) + crops.shape[2:]))
                total = total + y.reshape((b, k) + y.shape[1:]).astype(
                    jnp.float32)
            return total * 0.0

        total = jnp.zeros(out_shape, jnp.float32)
        caps_arr = jnp.asarray(caps, jnp.int32)
        for idx, fmap in enumerate(features):
            is_l = levels == idx                              # [B, K]
            # stable sort puts this level's boxes first per image, keeping
            # their original relative order
            order = jnp.argsort(jnp.where(is_l, 0, 1), axis=1,
                                stable=True)                  # [B, K]
            counts = jnp.sum(is_l, axis=1)                    # [B]
            bucket = jnp.searchsorted(caps_arr, jnp.max(counts),
                                      side='left')

            def make_branch(c, idx=idx):
                def branch(mdl, fmap, norm, order, counts):
                    sel = order[:, :c]                        # [B, c]
                    sel_boxes = jnp.take_along_axis(
                        norm, sel[..., None], axis=1)         # [B, c, 4]
                    crops = batched_crop_and_resize(fmap, sel_boxes,
                                                    crop_size)
                    y = mdl.heads[idx](
                        crops.reshape((b * c,) + crops.shape[2:]))
                    y = y.reshape((b, c) + y.shape[1:])
                    # slots past this image's count hold other levels' boxes
                    valid = (jnp.arange(c)[None, :]
                             < counts[:, None])               # [B, c]
                    y = y * valid[..., None, None, None].astype(y.dtype)
                    # scatter the compacted results back to their original
                    # slots as a one-hot permutation matmul — scatter-add
                    # serializes on TPU, the einsum rides the MXU.
                    # IMPORTANT: run it in the HEAD's dtype (pre-f32-cast):
                    # bf16 operands are exact at default precision (each
                    # output is one bf16 value accumulated in f32, which
                    # round-trips exactly) and ride the fast single-pass
                    # MXU path; f32 operands need HIGHEST (the default
                    # rounds them through bf16, perturbing the routed
                    # logits). A prior revision cast y to f32 BEFORE the
                    # dtype test, making the fast branch dead code.
                    onehot = (sel[:, :, None]
                              == jnp.arange(k)[None, None, :])  # [B, c, K]
                    prec = (None if y.dtype == jnp.bfloat16
                            else jax.lax.Precision.HIGHEST)
                    routed = jnp.einsum('bcj,bchwd->bjhwd',
                                        onehot.astype(y.dtype), y,
                                        precision=prec)
                    return routed.astype(jnp.float32)
                return branch

            # remat each branch: the VJP of a multi-branch switch unifies
            # the residual pytree ACROSS branches, so without remat the
            # executed branch must materialize zero-filled residuals for
            # every other rung (sum over all capacities of ~20 conv/GN
            # saved tensors — measured 16.3 ms/step of pure broadcasts in
            # the b4@256 train step, ~49% of the step). Under remat the
            # residuals collapse to the branch INPUTS, which are identical
            # for all rungs; the backward switch recomputes the one small
            # executed branch instead. prevent_cse=False is safe: the
            # recompute lives inside the backward cond's own computation,
            # where XLA cannot CSE it against the forward.
            branches = [nn.remat(make_branch(c), prevent_cse=False)
                        for c in caps]
            total = total + nn.switch(bucket, branches,
                                      self, fmap, norm, order, counts)
        return total


def select_by_level(per_level: Sequence[jnp.ndarray],
                    levels: jnp.ndarray) -> jnp.ndarray:
    """Pick each box's tensor from its routed level.

    per_level: list of [B, K, ...]; levels [B, K] int (-1 = invalid, which
    selects zeros).
    """
    stacked = jnp.stack(per_level, axis=0)               # [L, B, K, ...]
    num_levels = stacked.shape[0]
    onehot = jax.nn.one_hot(levels, num_levels, axis=0)  # [L, B, K]
    extra = (1,) * (stacked.ndim - 3)
    return jnp.sum(stacked * onehot.reshape(onehot.shape + extra), axis=0)


def assign_masks(roi_boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                 gt_masks: jnp.ndarray, mask_hw: Tuple[int, int],
                 num_classes: int,
                 match_iou_threshold: float = 0.5) -> jnp.ndarray:
    """Build class-id-valued mask targets -> [B, R, mh, mw] int32.

    roi_boxes [B,R,6], gt_boxes [B,G,6], gt_masks [B,G,H,W] (0/1 with -1
    padding). Matches AssignMasks (instance.py:328-379): IoU of same-class
    valid pairs, argmax-gt crop via crop_and_resize on the gt mask,
    class-id where the crop > 0.5 else num_classes.
    """
    image_hw = gt_masks.shape[2:4]

    def per_image(rois, gts, masks):
        iou = pairwise_iou(gts[:, :4], rois[:, :4])       # [G, R]
        valid = ((gts[:, None, 5] != -1.0) &
                 (rois[None, :, 5] != -1.0)).astype(jnp.float32)
        same_class = (gts[:, None, 4] == rois[None, :, 4]).astype(jnp.float32)
        iou = iou * valid * same_class
        matched = jnp.max(iou, axis=0) >= match_iou_threshold   # [R]
        gt_idx = jnp.argmax(iou, axis=0)                        # [R]
        norm = cxcywh_to_yxyx(rois[:, :4], image_hw)
        crops = crop_and_resize_indexed(
            masks[..., None].astype(jnp.float32), norm, gt_idx,
            mask_hw)[..., 0]                                   # [R, mh, mw]
        cls = jnp.where(matched, gts[gt_idx, 4], float(num_classes))
        target = jnp.where(crops > 0.5, cls[:, None, None],
                           float(num_classes))
        return target.astype(jnp.int32)

    return jax.vmap(per_image)(roi_boxes.astype(jnp.float32),
                               gt_boxes.astype(jnp.float32),
                               gt_masks)


def trim_instances(roi_boxes: jnp.ndarray,
                   roi_masks: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select each box's predicted-class mask channel.

    roi_boxes [B,R,6] (class at index 4, -1 padding); roi_masks
    [B,R,h,w,C]. Returns (boxes [B,R,6], masks [B,R,h,w]) where invalid
    rows keep -1 padding, matching TrimInstances + MoldBatch output.
    """
    num_classes = roi_masks.shape[-1]
    cls = roi_boxes[..., 4]
    valid = cls != -1.0
    ch = jnp.clip(cls.astype(jnp.int32), 0, num_classes - 1)
    masks = jnp.take_along_axis(
        roi_masks, ch[:, :, None, None, None], axis=-1)[..., 0]
    masks = jnp.where(valid[:, :, None, None], masks, -1.0)
    return roi_boxes, masks

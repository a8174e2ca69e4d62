"""MaskLab: joint RetinaMask detection/instance + DeepLab V3+ semantic model.

Flax re-design of the graph assembly in engine/retinamasklab.py:
  * ``MaskLab`` owns the shared backbone, FPN, cls/loc heads, per-level mask
    heads, ASPP and decoder — one parameter set serving both the trainer and
    inference forward passes (construct_masklab_networks, :201-220);
  * ``__call__`` is the inference path (:420-495): raw heads + NMS proposals
    with detection-config thresholds + routed mask branch + semantic head;
  * ``trainer_outputs`` is the trainer path (:223-395): same heads, but the
    instance branch runs on gt boxes concatenated with proposals from the
    *loss-config* NMS thresholds (:313-321 — note the trainer deliberately
    uses looser thresholds than inference, a reference behavior we keep).

The prior grid is generated at trace time from the static image shape
(replacing the runtime PriorLayer) and returned alongside predictions.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfiguration
from ..nn.backbone import BackboneNetwork, grid_padding
from ..ops.nms import batched_class_aware_nms
from ..ops.boxes import decode_boxes
from ..prior import generate_priors, priors_from_config
from .detection import BoxRegressionSubNet, ClassificationSubNet, FeaturePyramid
from .fused_mask_head import FusedMaskSubNet, select_crops_by_level
from .instance import (MaskSubNet, mask_distribute, pyramid_roi_align,
                       select_by_level)
from .semantic import ASPPNetwork, SegmentationSubNet


class MaskLab(nn.Module):
    config: ModelConfiguration

    def setup(self):
        cfg = self.config
        dtype = (jnp.bfloat16 if cfg.compute.compute_dtype == 'bfloat16'
                 else jnp.float32)
        self.dtype = dtype
        num_det_classes = len(cfg.dataset.instance_labels)
        num_seg_classes = len(cfg.dataset.semantic_labels)
        strides = [2 ** int(n[-1]) for n in cfg.backbone.backbone_outputs]
        if strides != sorted(strides):
            # priors are stride-sorted (pandas groupby semantics,
            # detection.py:260-262); head outputs concatenate in
            # backbone_outputs order — they must agree or cls/loc rows
            # misalign with anchors
            raise ValueError(
                'backbone_outputs must be in ascending-stride order, got '
                f'{cfg.backbone.backbone_outputs}')
        # raw_heads concatenates FPN outputs FIRST and non-FPN endpoints
        # after (the reference's FPN + P6/P7-passthrough layout); a
        # non-FPN output with a stride below any FPN input would
        # interleave out of the priors' stride order and silently
        # misalign every cls/loc row with its anchor (round-4 review)
        fpn_strides = [2 ** int(n[-1]) for n in cfg.backbone.backbone_outputs
                       if n in cfg.detection.feature_pyramid_inputs]
        other_strides = [2 ** int(n[-1])
                         for n in cfg.backbone.backbone_outputs
                         if n not in cfg.detection.feature_pyramid_inputs]
        if fpn_strides and other_strides \
                and min(other_strides) < max(fpn_strides):
            raise ValueError(
                'every backbone output outside feature_pyramid_inputs must '
                'have a higher stride than the FPN inputs (the head '
                'feature order is FPN outputs then extras); got outputs '
                f'{cfg.backbone.backbone_outputs} with FPN inputs '
                f'{cfg.detection.feature_pyramid_inputs}')
        self.prior = priors_from_config(cfg)
        backbone_cls = BackboneNetwork
        if cfg.compute.remat_backbone:
            # recompute backbone activations in the backward pass
            # (jax.checkpoint) — HBM for FLOPs, per SURVEY.md §7
            backbone_cls = nn.remat(BackboneNetwork, static_argnums=(2,))
        self.backbone = backbone_cls(
            backbone_type=cfg.backbone.backbone_type,
            backbone_outputs=tuple(cfg.backbone.backbone_outputs),
            num_features=cfg.backbone.num_features, dtype=dtype)
        self.fpn = FeaturePyramid(num_features=cfg.detection.num_features,
                                  dtype=dtype)
        det = cfg.detection
        common = dict(num_depth=det.num_depth,
                      num_features=det.num_features,
                      num_priors=len(self.prior),
                      use_separable_conv=det.use_separable_conv,
                      expand_ratio=det.expand_ratio,
                      squeeze_ratio=det.squeeze_ratio,
                      groups=det.groups, dtype=dtype)
        num_outputs = len(cfg.backbone.backbone_outputs)
        self.cls_subnet = ClassificationSubNet(
            num_blocks=num_outputs, num_classes=num_det_classes,
            use_squeeze_excite=det.use_squeeze_excite, **common)
        # reference quirk kept: loc head's use_squeeze_excite is wired from
        # use_separable_conv (retinamasklab.py:95)
        self.loc_subnet = BoxRegressionSubNet(
            num_blocks=num_outputs,
            use_squeeze_excite=det.use_separable_conv, **common)
        ins = cfg.instance
        self.use_fused_mask_head = (
            cfg.compute.fused_mask_head and not ins.use_separable_conv
            and not ins.use_squeeze_excite)
        if self.use_fused_mask_head:
            self.mask_subnet = FusedMaskSubNet(
                num_levels=ins.max_k + 1, num_classes=num_det_classes,
                num_depth=ins.num_depth, num_features=ins.num_features,
                groups=ins.groups, dtype=dtype)
        else:
            self.mask_subnet = MaskSubNet(
                num_blocks=ins.max_k + 1, num_classes=num_det_classes,
                num_depth=ins.num_depth, num_features=ins.num_features,
                use_separable_conv=ins.use_separable_conv,
                # reference quirk kept: expand_ratio wired from
                # use_separable_conv (retinamasklab.py:139)
                expand_ratio=float(ins.use_separable_conv),
                use_squeeze_excite=ins.use_squeeze_excite,
                squeeze_ratio=ins.squeeze_ratio, groups=ins.groups,
                dtype=dtype)
        sem = cfg.semantic
        self.aspp = ASPPNetwork(num_features=sem.num_aspp_features,
                                atrous_rate=tuple(sem.atrous_rate),
                                groups=sem.atrous_groups, dtype=dtype)
        self.seg_subnet = SegmentationSubNet(
            num_classes=num_seg_classes, num_depth=sem.num_depth,
            num_features=sem.num_features,
            num_skip_features=sem.num_skip_features,
            use_separable_conv=sem.use_separable_conv,
            expand_ratio=float(sem.use_separable_conv),  # quirk, :179
            use_squeeze_excite=sem.use_squeeze_excite,
            squeeze_ratio=sem.squeeze_ratio, groups=sem.groups, dtype=dtype)

    # ---- shared sub-paths ----

    def raw_heads(self, images: jnp.ndarray, train: bool = False) -> Dict:
        """Backbone -> FPN -> cls/loc heads + ASPP/decoder + priors."""
        cfg = self.config
        images = images.astype(jnp.float32)
        endpoints = self.backbone(images, train)  # positional: remat
        # static_argnums counts (module, images, train)
        fpn_names = [n for n in cfg.backbone.backbone_outputs
                     if n in cfg.detection.feature_pyramid_inputs]
        other_names = [n for n in cfg.backbone.backbone_outputs
                       if n not in cfg.detection.feature_pyramid_inputs]
        fpn_outputs = self.fpn([endpoints[n] for n in fpn_names])
        features = fpn_outputs + [endpoints[n] for n in other_names]
        cls_pred = self.cls_subnet(features).astype(jnp.float32)
        loc_pred = self.loc_subnet(features).astype(jnp.float32)

        aspp_out = self.aspp(endpoints[cfg.semantic.aspp_input_name])
        seg_pred = self.seg_subnet(
            aspp_out, endpoints[cfg.semantic.skip_input_name])
        seg_pred = seg_pred.astype(jnp.float32)

        h, w = images.shape[1], images.shape[2]
        priors = jnp.asarray(generate_priors(
            h, w, self.prior,
            padding=grid_padding(cfg.backbone.backbone_type)))
        return dict(cls_pred=cls_pred, loc_pred=loc_pred, features=features,
                    seg_pred=seg_pred, priors=priors,
                    image_hw=(h, w))

    def mask_branch(self, features, boxes: jnp.ndarray, image_hw) -> jnp.ndarray:
        """Route boxes to levels, crop, run per-level mask heads, select.

        boxes [B, K, >=6] -> masks [B, K, 2*ch, 2*cw, num_det_classes].
        """
        cfg = self.config.instance
        levels = mask_distribute(boxes, cfg.max_k, cfg.base_size)
        if (self.config.compute.mask_compaction
                and not self.use_fused_mask_head):
            return self.mask_subnet.compact(
                features[:cfg.max_k + 1], boxes, levels, image_hw,
                tuple(cfg.crop_size),
                tuple(self.config.compute.mask_capacity_fractions))
        crops = pyramid_roi_align(features[:cfg.max_k + 1], boxes, levels,
                                  image_hw, tuple(cfg.crop_size))
        if self.use_fused_mask_head:
            own_crops = select_crops_by_level(crops, levels)
            return self.mask_subnet(own_crops, levels)
        per_level_masks = self.mask_subnet(crops, levels)
        return select_by_level(per_level_masks, levels)

    # ---- forward passes ----

    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        """Inference path: raw heads -> detection-config NMS -> masks."""
        cfg = self.config
        out = self.raw_heads(images, train=train)
        restored = decode_boxes(out['loc_pred'], out['priors'])
        det = cfg.detection
        proposals = batched_class_aware_nms(
            out['cls_pred'], restored,
            min_confidence=det.min_confidence,
            nms_iou_threshold=det.nms_iou_threshold,
            post_iou_threshold=det.post_iou_threshold,
            max_outputs=det.nms_max_output_size,
            candidates_per_class=cfg.compute.nms_candidates_per_class,
            scores_bf16_exact=self.dtype == jnp.bfloat16)
        roi_masks = self.mask_branch(out['features'], proposals,
                                     out['image_hw'])
        return dict(cls_pred=out['cls_pred'], loc_pred=out['loc_pred'],
                    roi_boxes=proposals, roi_masks=roi_masks,
                    seg_pred=out['seg_pred'], priors=out['priors'])

    def trainer_outputs(self, images: jnp.ndarray,
                        gt_boxes: jnp.ndarray, train: bool = True) -> Dict:
        """Trainer path: loss-config NMS proposals + gt boxes feed the mask
        branch (retinamasklab.py:313-327)."""
        cfg = self.config
        out = self.raw_heads(images, train=train)
        restored = decode_boxes(out['loc_pred'], out['priors'])
        loss_cfg = cfg.loss
        proposals = batched_class_aware_nms(
            out['cls_pred'], restored,
            min_confidence=loss_cfg.min_confidence,
            nms_iou_threshold=loss_cfg.nms_iou_threshold,
            post_iou_threshold=loss_cfg.post_iou_threshold,
            max_outputs=loss_cfg.nms_max_output_size,
            # the loss-config floor (~0.05) passes far more anchors than
            # detection thresholds, so the trainer pool is its own knob
            candidates_per_class=(cfg.compute.nms_candidates_per_class_train
                                  or cfg.compute.nms_candidates_per_class),
            scores_bf16_exact=self.dtype == jnp.bfloat16)
        chosen = jnp.concatenate(
            [gt_boxes.astype(jnp.float32), proposals], axis=1)
        roi_masks = self.mask_branch(out['features'], chosen,
                                     out['image_hw'])
        # metric-branch proposals use detection-config thresholds (:294-300)
        det = cfg.detection
        metric_proposals = batched_class_aware_nms(
            out['cls_pred'], restored,
            min_confidence=det.min_confidence,
            nms_iou_threshold=det.nms_iou_threshold,
            post_iou_threshold=det.post_iou_threshold,
            max_outputs=det.nms_max_output_size,
            candidates_per_class=cfg.compute.nms_candidates_per_class,
            scores_bf16_exact=self.dtype == jnp.bfloat16)
        out.update(roi_boxes=chosen, roi_masks=roi_masks,
                   metric_proposals=metric_proposals)
        return out


def build_masklab(config: Optional[ModelConfiguration] = None) -> MaskLab:
    return MaskLab(config=config or ModelConfiguration())

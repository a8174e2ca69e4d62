"""End-to-end model forward passes (small shapes, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu import ModelConfiguration
from masklab_tpu.models import (assign_boxes, assign_masks, assign_seg,
                                build_masklab, mask_distribute,
                                trim_instances)
from masklab_tpu.losses import (BoxLossState, box_loss, class_loss,
                                mask_loss, seg_loss)
from masklab_tpu.metrics import class_binary_iou, detection_iou_metric
from masklab_tpu.prior import generate_priors, priors_from_config


def small_config(backbone='mobilenet'):
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = backbone
    cfg.backbone.num_features = 32
    cfg.detection.num_features = 32
    cfg.detection.num_depth = 1
    cfg.detection.nms_max_output_size = 8
    cfg.instance.num_features = 32
    cfg.instance.num_depth = 1
    cfg.instance.crop_size = (7, 7)
    cfg.semantic.num_aspp_features = 32
    cfg.semantic.num_features = 32
    cfg.semantic.num_depth = 1
    cfg.loss.nms_max_output_size = 8
    cfg.compute.nms_candidates_per_class = 16
    return cfg


@pytest.fixture(scope='module')
def model_and_params():
    cfg = small_config()
    model = build_masklab(cfg)
    images = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    return cfg, model, variables


def test_inference_forward_shapes(model_and_params):
    cfg, model, variables = model_and_params
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3) * 255, jnp.float32)
    out = model.apply(variables, images)
    n_classes = len(cfg.dataset.instance_labels)
    prior = priors_from_config(cfg)
    priors = generate_priors(128, 128, prior, padding='valid')
    assert out['cls_pred'].shape == (1, priors.shape[0], n_classes)
    assert out['loc_pred'].shape == (1, priors.shape[0], 4)
    assert out['roi_boxes'].shape == (1, 8, 6)
    assert out['roi_masks'].shape == (1, 8, 14, 14, n_classes)
    assert out['seg_pred'].shape[0] == 1
    assert out['seg_pred'].shape[-1] == len(cfg.dataset.semantic_labels)


def test_trainer_forward_and_losses(model_and_params):
    cfg, model, variables = model_and_params
    rng = np.random.RandomState(1)
    b, g = 2, 3
    images = jnp.asarray(rng.rand(b, 128, 128, 3) * 255, jnp.float32)
    gt_boxes = np.full((b, g, 6), -1.0, np.float32)
    gt_boxes[0, 0] = [40, 40, 30, 30, 1, 1.0]
    gt_boxes[0, 1] = [90, 80, 40, 24, 0, 1.0]
    gt_boxes[1, 0] = [64, 64, 50, 50, 3, 1.0]
    gt_boxes = jnp.asarray(gt_boxes)
    gt_masks = jnp.asarray(
        (rng.rand(b, g, 128, 128) > 0.5).astype(np.float32))
    gt_seg = jnp.asarray((rng.rand(b, 128, 128, 3) > 0.5).astype(np.float32))
    gt_seg_exist = jnp.ones((b, 3))
    gt_boxes_exist = jnp.ones((b, 5))

    out, mutated = model.apply(
        variables, images, gt_boxes, train=True,
        method='trainer_outputs', mutable=['batch_stats'])

    cls_true, loc_true, assign_mask = jax.vmap(
        lambda gtb: assign_boxes(gtb, out['priors'], 5))(gt_boxes)
    cl = class_loss(cls_true, out['cls_pred'], assign_mask, gt_boxes_exist,
                    weight=cfg.loss.cls_loss_weight)
    bl, state = box_loss(loc_true, out['loc_pred'], assign_mask,
                         BoxLossState.create(cfg.loss.box_loss_beta))
    targets = assign_masks(out['roi_boxes'], gt_boxes, gt_masks,
                           out['roi_masks'].shape[2:4], 5)
    ml = mask_loss(targets, out['roi_masks'])
    seg_assigned = assign_seg(gt_seg, out['seg_pred'])
    sl = seg_loss(seg_assigned, out['seg_pred'], gt_seg_exist)

    for name, loss in (('cls', cl), ('box', bl), ('mask', ml), ('seg', sl)):
        arr = np.asarray(loss)
        assert arr.shape == (b,), name
        assert np.isfinite(arr).all(), name

    iou = class_binary_iou(seg_assigned, out['seg_pred'])
    assert iou.shape == (b, 3)
    p, r, f = detection_iou_metric(out['metric_proposals'], gt_boxes)
    assert p.shape == (b,)


def test_assign_boxes_semantics():
    priors = jnp.asarray([[10, 10, 20, 20], [50, 50, 20, 20],
                          [10, 10, 22, 22], [90, 90, 8, 8]], jnp.float32)
    gt = jnp.asarray([[10, 10, 20, 20, 2, 1.0],
                      [-1, -1, -1, -1, -1, -1]], jnp.float32)
    cls_true, loc_true, mask = assign_boxes(gt, priors, 5)
    # anchor 0: perfect match -> positive, class 2
    assert mask[0, 0] == 0
    assert cls_true[0, 2] == 1
    np.testing.assert_allclose(np.asarray(loc_true[0]), 0, atol=1e-6)
    # anchor 1: no overlap -> negative background
    assert mask[1, 0] == 1
    # anchor 2: IoU ~0.82 >= 0.5 -> positive
    assert mask[2, 0] == 0
    # anchor 3: background
    assert mask[3, 0] == 1


def test_assign_boxes_ignore_band():
    # IoU in [0.4, 0.5) -> ignore (-1)
    priors = jnp.asarray([[14, 10, 20, 20]], jnp.float32)  # shifted overlap
    gt = jnp.asarray([[10, 10, 20, 20, 0, 1.0]], jnp.float32)
    # iou = (16*20)/(2*400-320) = 320/480 = 0.667 -> positive. shift more:
    priors2 = jnp.asarray([[22, 10, 20, 20]], jnp.float32)
    # inter = 8*20 = 160, union = 640 -> 0.25; best-anchor force still wins
    _, _, m2 = assign_boxes(gt, priors2, 5)
    assert m2[0, 0] == 0  # forced best-anchor match
    gt2 = jnp.asarray([[10, 10, 20, 20, 0, 0.0]], jnp.float32)  # conf 0
    _, _, m3 = assign_boxes(gt2, priors2, 5)
    assert m3[0, 0] == 1  # no force for conf<=0, plain background


def test_mask_distribute_levels():
    boxes = jnp.asarray([[[0, 0, 36, 36, 0, 1],      # size 36 -> k=0
                          [0, 0, 72, 72, 0, 1],      # size 72 -> k=1
                          [0, 0, 300, 300, 0, 1],    # huge -> clipped k=2
                          [-1, -1, -1, -1, -1, -1]]], jnp.float32)
    k = mask_distribute(boxes, max_k=2, base_size=36)
    np.testing.assert_array_equal(np.asarray(k[0]), [0, 1, 2, -1])


def test_trim_instances_selects_class_channel():
    roi_boxes = jnp.asarray([[[5, 5, 4, 4, 1, 0.9],
                              [-1, -1, -1, -1, -1, -1]]], jnp.float32)
    masks = jnp.zeros((1, 2, 4, 4, 3))
    masks = masks.at[0, 0, :, :, 1].set(0.7)
    boxes, sel = trim_instances(roi_boxes, masks)
    np.testing.assert_allclose(np.asarray(sel[0, 0]), 0.7)
    np.testing.assert_allclose(np.asarray(sel[0, 1]), -1.0)

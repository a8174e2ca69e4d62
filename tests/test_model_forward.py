"""End-to-end model forward passes (small shapes, CPU, everything jitted —
the test host has a single core, so eager op-by-op dispatch is unusable)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu import ModelConfiguration
from masklab_tpu.data.synthetic import make_random_batch
from masklab_tpu.losses import BoxLossState
from masklab_tpu.models import (assign_boxes, build_masklab, mask_distribute,
                                trim_instances)
from masklab_tpu.prior import generate_priors, priors_from_config
from masklab_tpu.train.steps import compute_losses


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
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    return cfg, model, variables


def test_inference_forward_shapes(model_and_params):
    cfg, model, variables = model_and_params
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3) * 255, jnp.float32)
    out = jax.jit(model.apply)(variables, images)
    n_classes = len(cfg.dataset.instance_labels)
    prior = priors_from_config(cfg)
    priors = generate_priors(128, 128, prior, padding='valid')
    assert out['cls_pred'].shape == (1, priors.shape[0], n_classes)
    assert out['loc_pred'].shape == (1, priors.shape[0], 4)
    assert out['roi_boxes'].shape == (1, 8, 6)
    assert out['roi_masks'].shape == (1, 8, 14, 14, n_classes)
    assert out['seg_pred'].shape[0] == 1
    assert out['seg_pred'].shape[-1] == len(cfg.dataset.semantic_labels)
    cls = np.asarray(out['cls_pred'])
    assert (cls >= 0).all() and (cls <= 1).all()


def test_trainer_losses_finite(model_and_params):
    cfg, model, variables = model_and_params
    batch = {k: jnp.asarray(v)
             for k, v in make_random_batch(2, (128, 128), 3).items()}

    @jax.jit
    def run(variables, batch):
        return compute_losses(model, variables, batch,
                              BoxLossState.create(cfg.loss.box_loss_beta),
                              train=True, with_metrics=True)

    total, (bs, box_state, metrics) = run(variables, batch)
    assert np.isfinite(float(total))
    for k in ('class_loss', 'box_loss', 'mask_loss', 'seg_loss',
              'detection_precision', 'other_road_iou'):
        assert np.isfinite(float(metrics[k])), k
    # box-loss moving stats moved off their init values
    assert not np.allclose(np.asarray(box_state.moving_mean),
                           cfg.loss.box_loss_beta)


def test_gradients_flow_everywhere(model_and_params):
    cfg, model, variables = model_and_params
    batch = {k: jnp.asarray(v)
             for k, v in make_random_batch(1, (128, 128), 2, seed=3).items()}

    @jax.jit
    def grad_fn(params):
        def loss_fn(p):
            v = dict(variables, params=p)
            total, _ = compute_losses(model, v, batch, BoxLossState.create(),
                                      train=True, with_metrics=False)
            return total
        return jax.grad(loss_fn)(params)

    grads = grad_fn(variables['params'])
    flat = jax.tree_util.tree_leaves_with_path(grads)
    nonzero = sum(bool(np.abs(np.asarray(g)).sum() > 0) for _, g in flat)
    # the vast majority of parameters receive gradient signal
    assert nonzero / len(flat) > 0.7
    for path, g in flat:
        assert np.isfinite(np.asarray(g)).all(), jax.tree_util.keystr(path)


def test_assign_boxes_semantics():
    priors = jnp.asarray([[10, 10, 20, 20], [50, 50, 20, 20],
                          [10, 10, 22, 22], [90, 90, 8, 8]], jnp.float32)
    gt = jnp.asarray([[10, 10, 20, 20, 2, 1.0],
                      [-1, -1, -1, -1, -1, -1]], jnp.float32)
    cls_true, loc_true, mask = jax.jit(
        lambda g, p: assign_boxes(g, p, 5))(gt, priors)
    assert mask[0, 0] == 0            # perfect match -> positive
    assert cls_true[0, 2] == 1
    np.testing.assert_allclose(np.asarray(loc_true[0]), 0, atol=1e-6)
    assert mask[1, 0] == 1            # no overlap -> negative
    assert mask[2, 0] == 0            # IoU ~0.83 -> positive
    assert mask[3, 0] == 1


def test_assign_boxes_force_and_conf_gate():
    gt = jnp.asarray([[10, 10, 20, 20, 0, 1.0]], jnp.float32)
    priors2 = jnp.asarray([[22, 10, 20, 20]], jnp.float32)  # IoU 0.25
    fn = jax.jit(lambda g, p: assign_boxes(g, p, 5))
    _, _, m2 = fn(gt, priors2)
    assert m2[0, 0] == 0  # forced best-anchor match
    gt2 = jnp.asarray([[10, 10, 20, 20, 0, 0.0]], jnp.float32)
    _, _, m3 = fn(gt2, priors2)
    assert m3[0, 0] == 1  # conf<=0 -> no force


def test_mask_distribute_levels():
    boxes = jnp.asarray([[[0, 0, 36, 36, 0, 1],
                          [0, 0, 72, 72, 0, 1],
                          [0, 0, 300, 300, 0, 1],
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

"""Jitted multi-task train / eval steps.

Functional re-design of the reference's per-batch work inside
``fit_generator`` (engine/train.py:98-110): the four task losses become one
scalar objective (each ``K.mean``-ed, matching ``add_loss``), gradients flow
through a single ``value_and_grad``, BatchNorm statistics and the BoxLoss
moving mean/var are threaded through the step explicitly, and in-graph
metrics (detection P/R/F1, per-class seg IoU) are computed under the same
jit when requested.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfiguration
from ..losses import box_loss, class_loss, mask_loss, seg_loss
from ..metrics import class_binary_iou, detection_iou_metric
from ..models.detection import assign_boxes
from ..models.instance import assign_masks
from ..models.masklab import MaskLab
from ..models.semantic import assign_seg


def compute_losses(model: MaskLab, variables: Dict, batch: Dict,
                   box_state, train: bool = True,
                   with_metrics: bool = True, dropout_rng=None) -> Tuple:
    """Full trainer forward + losses.

    ``batch`` keys mirror the reference generator's feed dict
    (engine/utils/generator/masklab.py:84-90): images, gt_seg, gt_seg_exist,
    gt_boxes, gt_boxes_exist, gt_masks.
    """
    cfg: ModelConfiguration = model.config
    num_det = len(cfg.dataset.instance_labels)
    lc = cfg.loss

    if train:
        # 'dropout' feeds stochastic regularizers (efficientnet
        # drop-connect); backbones without any are unaffected
        rngs = ({'dropout': dropout_rng} if dropout_rng is not None
                else None)
        out, mutated = model.apply(
            variables, batch['images'], batch['gt_boxes'], train=True,
            method='trainer_outputs', mutable=['batch_stats'],
            rngs=rngs)
        new_batch_stats = mutated['batch_stats']
    else:
        out = model.apply(variables, batch['images'],
                          batch['gt_boxes'], train=False,
                          method='trainer_outputs')
        new_batch_stats = variables.get('batch_stats', {})

    cls_true, loc_true, assign_mask = jax.vmap(
        lambda g: assign_boxes(g, out['priors'], num_det))(batch['gt_boxes'])
    cls_l = class_loss(cls_true, out['cls_pred'], assign_mask,
                       batch['gt_boxes_exist'], weight=lc.cls_loss_weight,
                       alpha=lc.cls_loss_alpha, gamma=lc.cls_loss_gamma)
    box_l, new_box_state = box_loss(
        loc_true, out['loc_pred'], assign_mask, box_state,
        weight=lc.box_loss_weight, momentum=lc.box_loss_momentum,
        beta=lc.box_loss_beta, use_adjust=lc.box_loss_use_adjust)
    mask_targets = assign_masks(out['roi_boxes'], batch['gt_boxes'],
                                batch['gt_masks'],
                                out['roi_masks'].shape[2:4], num_det)
    mask_l = mask_loss(mask_targets, out['roi_masks'],
                       weight=lc.mask_loss_weight,
                       label_smoothing=lc.mask_loss_label_smoothing)
    seg_assigned = assign_seg(batch['gt_seg'], out['seg_pred'])
    seg_l = seg_loss(seg_assigned, out['seg_pred'], batch['gt_seg_exist'],
                     weight=lc.seg_loss_weight,
                     label_smoothing=lc.seg_loss_label_smoothing)

    total = (jnp.mean(cls_l) + jnp.mean(box_l) + jnp.mean(mask_l)
             + jnp.mean(seg_l))
    metrics = {'loss': total, 'class_loss': jnp.mean(cls_l),
               'box_loss': jnp.mean(box_l), 'mask_loss': jnp.mean(mask_l),
               'seg_loss': jnp.mean(seg_l)}
    if with_metrics:
        p, r, f = detection_iou_metric(out['metric_proposals'],
                                       batch['gt_boxes'])
        iou = class_binary_iou(seg_assigned, out['seg_pred'])
        metrics.update(detection_precision=jnp.mean(p),
                       detection_recall=jnp.mean(r),
                       detection_fmeasure=jnp.mean(f))
        for idx, name in enumerate(cfg.dataset.semantic_labels):
            metrics[f'{name}_iou'] = jnp.mean(iou[:, idx])
    return total, (new_batch_stats, new_box_state, metrics)


def make_train_step(model: MaskLab, with_metrics: bool = True,
                    donate: bool = False, seed: int = 42) -> Callable:
    """Build the jitted train step: state, batch -> (state, metrics).

    ``donate=True`` donates the input state's buffers (halves peak memory in
    the training loop) — callers must not reuse the old state afterwards.
    ``seed`` is the run's base RNG seed (config.train.seed): dropout /
    drop-connect noise is PRNGKey(seed) folded with the step counter.
    """

    def train_step(state, batch):
        dropout_rng = jax.random.fold_in(jax.random.PRNGKey(seed),
                                         state.step)

        def loss_fn(params):
            variables = {'params': params}
            if state.batch_stats:
                variables['batch_stats'] = state.batch_stats
            return compute_losses(model, variables, batch,
                                  state.box_loss_state, train=True,
                                  with_metrics=with_metrics,
                                  dropout_rng=dropout_rng)

        grads, (new_bs, new_box_state, metrics) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        new_state = new_state.replace(batch_stats=new_bs,
                                      box_loss_state=new_box_state)
        return new_state, metrics

    if donate:
        return jax.jit(train_step, donate_argnums=(0,))
    return jax.jit(train_step)


def make_eval_step(model: MaskLab, with_metrics: bool = True) -> Callable:
    def eval_step(state, batch):
        _, (_, _, metrics) = compute_losses(
            model, state.variables, batch, state.box_loss_state,
            train=False, with_metrics=with_metrics)
        return metrics

    return jax.jit(eval_step)

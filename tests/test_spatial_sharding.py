"""Spatial (tensor) sharding over the 'model' mesh axis.

SURVEY.md §2.6 lists spatial sharding of feature maps as the TP analog for
this CNN ("if >1 chip per image ever needed"). GSPMD handles halo
exchanges for convolutions automatically; this test proves the raw-heads
forward compiles and matches the unsharded result when the image height is
sharded across two devices.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from masklab_tpu import ModelConfiguration
from masklab_tpu.models import build_masklab


def test_height_sharded_forward_matches():
    devices = jax.devices()
    assert len(devices) >= 2
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    cfg.backbone.num_features = 16
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 16
        g.num_depth = 1
    cfg.semantic.num_aspp_features = 16

    model = build_masklab(cfg)
    images = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3) * 255, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images)

    fwd = jax.jit(lambda v, x: model.apply(v, x, method='raw_heads'))
    base = fwd(variables, images)

    mesh = Mesh(np.asarray(devices[:2]).reshape(1, 2), ('data', 'model'))
    with mesh:
        sharded_x = jax.device_put(
            images, NamedSharding(mesh, P(None, 'model', None, None)))
        repl_v = jax.device_put(variables, NamedSharding(mesh, P()))
        out = fwd(repl_v, sharded_x)

    np.testing.assert_allclose(np.asarray(out['seg_pred']),
                               np.asarray(base['seg_pred']),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['cls_pred']),
                               np.asarray(base['cls_pred']),
                               atol=1e-4, rtol=1e-4)


def test_dpsp_train_step_loss_parity():
    """FULL train step over a 2-D (data=2, model=2) mesh with images /
    gt_seg height-sharded and gt_masks H-sharded (dp x sp): loss is
    bit-identical to the 1-device step on the same global batch (GSPMD
    halo exchanges + contraction psums change nothing numerically here)."""
    from masklab_tpu.data.synthetic import make_random_batch
    from masklab_tpu.parallel import (make_mesh, make_parallel_train_step,
                                      replicate_sharding, shard_batch,
                                      spatial_batch_sharding,
                                      spatial_shard_batch)
    from masklab_tpu.train import TrainState, cyclic_lr, rectified_adam

    devices = jax.devices()
    assert len(devices) >= 4

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    cfg.backbone.num_features = 16
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 16
        g.num_depth = 1
    cfg.semantic.num_aspp_features = 16
    cfg.detection.nms_max_output_size = 8
    cfg.loss.nms_max_output_size = 8
    cfg.compute.nms_candidates_per_class = 16

    model = build_masklab(cfg)
    batch = {k: jnp.asarray(v)
             for k, v in make_random_batch(2, (128, 128), 3).items()}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    batch['images'][:1])
    tx = rectified_adam(cyclic_lr(1e-4, 1e-3, 700))
    state = TrainState.create(variables, tx, box_beta=0.1)

    mesh = make_mesh(data=2, model=2, devices=devices[:4])
    with mesh:
        state_n = jax.device_put(state, replicate_sharding(mesh))
        step = make_parallel_train_step(
            model, mesh, with_metrics=False,
            batch_shardings=spatial_batch_sharding(batch, mesh))
        _, metrics = step(state_n, spatial_shard_batch(batch, mesh))
        loss = float(jax.block_until_ready(metrics['loss']))

    mesh1 = Mesh(np.asarray(devices[:1]).reshape(1, 1), ('data', 'model'))
    with mesh1:
        state_1 = jax.device_put(state, replicate_sharding(mesh1))
        step1 = make_parallel_train_step(model, mesh1, with_metrics=False)
        _, m1 = step1(state_1, shard_batch(batch, mesh1))
        loss1 = float(jax.block_until_ready(m1['loss']))

    assert np.isfinite(loss)
    assert abs(loss - loss1) <= 1e-4 * max(1.0, abs(loss1)), (loss, loss1)

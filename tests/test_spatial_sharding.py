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

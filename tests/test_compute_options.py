"""Compute-config options: bfloat16 convs and backbone remat."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu import ModelConfiguration
from masklab_tpu.models import build_masklab


def _tiny(**compute):
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    cfg.backbone.num_features = 16
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 16
        g.num_depth = 1
    cfg.instance.crop_size = (7, 7)
    cfg.semantic.num_aspp_features = 16
    cfg.detection.nms_max_output_size = 4
    cfg.compute.nms_candidates_per_class = 8
    for k, v in compute.items():
        setattr(cfg.compute, k, v)
    return cfg


def test_bfloat16_compute_path():
    cfg = _tiny(compute_dtype='bfloat16')
    model = build_masklab(cfg)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 255,
                    jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # params stay float32 (master weights)
    leaves = jax.tree_util.tree_leaves(variables['params'])
    assert all(l.dtype == jnp.float32 for l in leaves)
    out = jax.jit(model.apply)(variables, x)
    # postprocess-facing outputs are float32 and finite
    assert out['cls_pred'].dtype == jnp.float32
    assert out['seg_pred'].dtype == jnp.float32
    assert np.isfinite(np.asarray(out['seg_pred'])).all()


def test_remat_backbone_grads_match():
    base = _tiny(remat_backbone=False)
    remat = _tiny(remat_backbone=True)
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3) * 255,
                    jnp.float32)
    m0 = build_masklab(base)
    m1 = build_masklab(remat)
    v = jax.jit(m0.init)(jax.random.PRNGKey(0), x)

    def loss(model):
        def f(params):
            out = model.apply({'params': params,
                               'batch_stats': v['batch_stats']}, x)
            return jnp.sum(out['seg_pred'] ** 2)
        return jax.jit(jax.grad(f))

    g0 = loss(m0)(v['params'])
    g1 = loss(m1)(v['params'])
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

"""Mesh-sharded serving: MaskLabPredictor(mesh=...) shards inference
batches over the mesh 'data' axis (parameters replicated) and must match
the single-device predictor exactly — including the zero-pad path for
batches not divisible by the axis size. Beyond-reference capability: the
reference's TF-Serving deployment was one GPU per container
(serving.py:42-109); here one process serves a whole slice.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu import ModelConfiguration
from masklab_tpu.models import build_masklab
from masklab_tpu.parallel import make_mesh
from masklab_tpu.serving import MaskLabPredictor


def _tiny_cfg():
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
    cfg.postprocess.resolution = (96, 128)
    return cfg


@pytest.fixture(scope='module')
def setup():
    cfg = _tiny_cfg()
    model = build_masklab(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    images = np.uint8(np.random.RandomState(1).rand(4, 96, 128, 3) * 255)
    return cfg, model, variables, images


def test_mesh_predictor_matches_single_device(setup):
    cfg, model, variables, images = setup
    assert len(jax.devices()) >= 4
    mesh = make_mesh(data=4, devices=jax.devices()[:4])

    base = MaskLabPredictor(model, variables, cfg)
    sharded = MaskLabPredictor(model, variables, cfg, mesh=mesh)

    # visualize is the CLI serving default (visualization=True) — the
    # drawing ops must shard over batch too; uint8 overlay rounding gets
    # 1 count of slack
    for mode in ('raw', 'summarize', 'visualize'):
        ref = base.predict(images, mode)
        out = sharded.predict(images, mode)
        assert set(out) == set(ref)
        for k in ref:
            atol = 1.001 if ref[k].dtype == np.uint8 else 1e-4
            np.testing.assert_allclose(
                out[k].astype(np.float32), ref[k].astype(np.float32),
                atol=atol, rtol=1e-4, err_msg=f'{mode}/{k}')


def test_mesh_predictor_pads_indivisible_batch(setup):
    cfg, model, variables, images = setup
    mesh = make_mesh(data=4, devices=jax.devices()[:4])

    base = MaskLabPredictor(model, variables, cfg)
    sharded = MaskLabPredictor(model, variables, cfg, mesh=mesh)

    # batch 3 pads to 4 on device; outputs slice back to 3
    ref = base.predict(images[:3], 'summarize')
    out = sharded.predict(images[:3], 'summarize')
    for k in ref:
        assert out[k].shape == ref[k].shape
        np.testing.assert_allclose(out[k], ref[k], atol=1e-4, rtol=1e-4,
                                   err_msg=k)

    # single image (the serving common case) works too
    ref1 = base.predict(images[0], 'summarize')
    out1 = sharded.predict(images[0], 'summarize')
    for k in ref1:
        assert out1[k].shape == ref1[k].shape


def test_mesh_predictor_hot_reload_keeps_sharding(setup):
    cfg, model, variables, images = setup
    mesh = make_mesh(data=4, devices=jax.devices()[:4])
    sharded = MaskLabPredictor(model, variables, cfg, mesh=mesh)
    # place_variables is the watcher's swap path (batching.py check_once)
    host_tree = jax.tree_util.tree_map(np.asarray, variables)
    placed = sharded.place_variables(host_tree)
    leaf = jax.tree_util.tree_leaves(placed)[0]
    assert leaf.sharding.is_fully_replicated
    sharded.variables = placed
    out = sharded.predict(images, 'raw')
    assert out['det_boxes'].shape[0] == 4

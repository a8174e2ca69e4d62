"""Backbone zoo: endpoint strides, extras, preprocessing, freeze masks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu.nn.backbone import (BACKBONE_REGISTRY, BackboneNetwork,
                                     grid_padding, module_frozen)
from masklab_tpu.nn.backbone.preprocess import preprocess_input


def _build(backbone_type, hw=(64, 64), outputs=('C3', 'C4', 'C5', 'P6', 'P7')):
    model = BackboneNetwork(backbone_type=backbone_type,
                            backbone_outputs=outputs, num_features=32)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(variables, x)
    return model, variables, out


@pytest.mark.parametrize('backbone_type', ['mobilenet', 'mobilenetv2',
                                           'resnet50', 'seresnet34',
                                           'resnext50'])
def test_endpoint_strides(backbone_type):
    h = 128
    _, _, out = _build(backbone_type, hw=(h, h))
    for name, stride in (('C3', 8), ('C4', 16), ('C5', 32)):
        assert out[name].shape[1] == h // stride, (backbone_type, name)
    assert out['P6'].shape[1] == h // 64
    assert out['P7'].shape[1] == h // 128


def test_all_registry_entries_build():
    for name in BACKBONE_REGISTRY:
        _, _, out = _build(name, hw=(64, 64), outputs=('C3', 'C5'))
        assert set(out) == {'C3', 'C5'}


def test_preprocess_modes():
    x = jnp.full((1, 2, 2, 3), 255.0)
    # mode 2 without mean shift -> [-1, 1]
    y = preprocess_input(x, rgb=False, mean_shift=False, normalize=2)
    np.testing.assert_allclose(np.asarray(y), 1.0)
    # mode 1 -> [0, 1]
    y = preprocess_input(x, rgb=True, mean_shift=False, normalize=1)
    np.testing.assert_allclose(np.asarray(y), 1.0)
    # bgr swap moves channel order
    x2 = jnp.asarray([[[[1.0, 2.0, 3.0]]]])
    y = preprocess_input(x2, rgb=False, mean_shift=False, normalize=0)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], [3.0, 2.0, 1.0])


def test_grid_padding_modes():
    assert grid_padding('mobilenet') == 'valid'
    assert grid_padding('resnet50') == 'same'


def test_freeze_mask_depths():
    # resnet family
    assert module_frozen('resnet50', 'stem', 'C5')
    assert module_frozen('resnet50', 'stage5', 'C5')
    assert not module_frozen('resnet50', 'stage3', 'C2')
    assert module_frozen('resnet50', 'stage2', 'C2')
    assert not module_frozen('resnet50', 'extras_P6_conv', 'C5')
    assert not module_frozen('resnet50', 'stem', 'C0')
    # mobilenet
    assert module_frozen('mobilenet', 'pw5', 'C3')
    assert not module_frozen('mobilenet', 'dw6', 'C3')
    assert module_frozen('mobilenet', 'pw13', 'C5')


def test_batchnorm_collections_exist():
    model, variables, _ = _build('mobilenet', hw=(128, 128))
    assert 'batch_stats' in variables
    # train-mode apply mutates batch stats
    x = jnp.ones((1, 128, 128, 3))
    _, mutated = model.apply(variables, x, train=True,
                             mutable=['batch_stats'])
    assert 'batch_stats' in mutated

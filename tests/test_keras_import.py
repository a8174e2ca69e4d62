"""Keras h5 weight import machinery (structure-validated converters)."""
import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from masklab_tpu.utils.keras_import import (ImportMismatch, WeightCursor,
                                            find_group, read_h5_groups,
                                            read_h5_weights, take_bn,
                                            take_conv, take_conv_transpose,
                                            take_depthwise, take_gn)


@pytest.fixture
def h5_file(tmp_path):
    path = str(tmp_path / 'weights.h5')
    with h5py.File(path, 'w') as f:
        root = f.create_group('model_weights')
        root.attrs['layer_names'] = [b'conv1', b'dw1']
        g = root.create_group('conv1')
        g.attrs['weight_names'] = [b'conv1/kernel:0', b'conv1/bias:0']
        g.create_dataset('conv1/kernel:0',
                         data=np.ones((3, 3, 3, 8), np.float32))
        g.create_dataset('conv1/bias:0', data=np.full((8,), 0.5, np.float32))
        g2 = root.create_group('dw1')
        g2.attrs['weight_names'] = [b'dw1/depthwise_kernel:0']
        g2.create_dataset('dw1/depthwise_kernel:0',
                          data=np.ones((3, 3, 8, 1), np.float32) * 2)
    return path


def test_read_h5_groups(h5_file):
    groups = read_h5_groups(h5_file)
    assert list(groups) == ['conv1', 'dw1']
    assert groups['conv1'][0][0] == 'conv1/kernel:0'
    assert groups['conv1'][0][1].shape == (3, 3, 3, 8)
    assert len(read_h5_weights(h5_file)) == 3


def test_cursor_conv_and_depthwise(h5_file):
    groups = read_h5_groups(h5_file)
    cur = WeightCursor(groups['conv1'], 'conv1')
    conv = take_conv(cur)
    cur.finish()
    np.testing.assert_allclose(conv['kernel'], 1.0)
    np.testing.assert_allclose(conv['bias'], 0.5)
    cur = WeightCursor(groups['dw1'], 'dw1')
    dw = take_depthwise(cur)
    cur.finish()
    assert dw['kernel'].shape == (3, 3, 1, 8)


def test_cursor_rejects_wrong_kind_and_shape(h5_file):
    groups = read_h5_groups(h5_file)
    cur = WeightCursor(groups['conv1'], 'conv1')
    with pytest.raises(ImportMismatch):
        take_gn(cur)  # kernel where gamma expected
    cur = WeightCursor(groups['conv1'], 'conv1')
    with pytest.raises(ImportMismatch):
        cur.take('kernel', shape=(1, 1, 3, 8))
    cur = WeightCursor(groups['dw1'], 'dw1')
    take_depthwise(cur)
    with pytest.raises(ImportMismatch):
        cur.take('kernel')  # exhausted
    # unconsumed weights are an error too
    cur = WeightCursor(groups['conv1'], 'conv1')
    cur.take('kernel')
    with pytest.raises(ImportMismatch):
        cur.finish()


def test_take_bn_and_conv_transpose():
    bn_w = [('bn/gamma:0', np.full(4, 2.0, np.float32)),
            ('bn/beta:0', np.full(4, 1.0, np.float32)),
            ('bn/moving_mean:0', np.zeros(4, np.float32)),
            ('bn/moving_variance:0', np.ones(4, np.float32))]
    params, stats = take_bn(WeightCursor(bn_w, 'bn'))
    assert set(params) == {'scale', 'bias'}
    assert set(stats) == {'mean', 'var'}
    k = np.arange(2 * 2 * 3 * 5, dtype=np.float32).reshape(2, 2, 3, 5)
    ct_w = [('up/kernel:0', k), ('up/bias:0', np.zeros(3, np.float32))]
    out = take_conv_transpose(WeightCursor(ct_w, 'up'))
    assert out['kernel'].shape == (2, 2, 5, 3)
    # spatially flipped + (out,in)->(in,out) transposed
    np.testing.assert_allclose(out['kernel'][0, 0, 0, 0], k[1, 1, 0, 0])


def test_find_group():
    names = ['mobilenet', 'feature_pyramid', 'classification_sub_net']
    assert find_group(names, r'^feature_pyramid') == 'feature_pyramid'
    with pytest.raises(ImportMismatch):
        find_group(names, r'^resnet')


def test_convert_backbone_body_names_cover_every_converter():
    """convert_backbone's body_name map must name the REAL flax module
    for every backbone the converter registry supports — a missing or
    wrong entry turns whole-model import/export into a KeyError or a
    silently misplaced subtree (round-3 review finding)."""
    import jax
    import jax.numpy as jnp
    from masklab_tpu.nn.backbone import BackboneNetwork
    from masklab_tpu.utils import keras_import as ki

    src = open(ki.__file__.replace('.pyc', '.py')).read()
    # extract the literal map the function uses
    import re
    m = re.search(r"body_name = \{(.*?)\}\[bt\]", src, re.S)
    assert m, 'body_name map not found'
    body_map = eval('{' + m.group(1) + '}')  # noqa: S307 — repo literal
    assert set(body_map) == set(ki._BACKBONE_CONVERTERS), (
        'body_name map out of sync with _BACKBONE_CONVERTERS')
    for bt, body_name in sorted(body_map.items()):
        net = BackboneNetwork(backbone_type=bt,
                              backbone_outputs=('C3', 'C4', 'C5'),
                              num_features=8, dtype=jnp.float32)
        variables = jax.jit(net.init)(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 64, 64, 3)))
        assert body_name in variables['params'], (
            bt, body_name, sorted(variables['params']))

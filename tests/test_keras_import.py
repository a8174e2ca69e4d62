"""Keras h5 weight import machinery."""
import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from masklab_tpu.utils.keras_import import (assign_in_order,
                                            keras_kernel_to_flax,
                                            read_h5_weights)


@pytest.fixture
def h5_file(tmp_path):
    path = str(tmp_path / 'weights.h5')
    with h5py.File(path, 'w') as f:
        g = f.create_group('model_weights/conv1')
        g.create_dataset('kernel:0', data=np.ones((3, 3, 3, 8), np.float32))
        g.create_dataset('bias:0', data=np.full((8,), 0.5, np.float32))
        g2 = f.create_group('model_weights/dw1')
        g2.create_dataset('depthwise_kernel:0',
                          data=np.ones((3, 3, 8, 1), np.float32) * 2)
    return path


def test_read_h5_weights(h5_file):
    weights = read_h5_weights(h5_file)
    names = [n for n, _ in weights]
    assert any('kernel:0' in n for n in names)
    assert len(weights) == 3


def test_depthwise_kernel_conversion():
    v = np.arange(3 * 3 * 4 * 1, dtype=np.float32).reshape(3, 3, 4, 1)
    out = keras_kernel_to_flax('blk/depthwise_kernel:0', v)
    assert out.shape == (3, 3, 1, 4)


def test_assign_in_order(h5_file):
    params = {
        'conv': {'kernel': np.zeros((3, 3, 3, 8), np.float32),
                 'bias': np.zeros((8,), np.float32)},
        'other': {'w': np.zeros((5, 5), np.float32)},
    }
    weights = read_h5_weights(h5_file)
    new_params, report = assign_in_order(params, weights)
    assert report['assigned'] == 2
    assert report['skipped'] == 1   # the (5,5) leaf has no h5 counterpart
    np.testing.assert_allclose(new_params['conv']['kernel'], 1.0)
    np.testing.assert_allclose(new_params['conv']['bias'], 0.5)
    np.testing.assert_allclose(new_params['other']['w'], 0.0)

"""Pallas kernels vs their XLA counterparts (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu.ops.boxes import cxcywh_to_yxyx
from masklab_tpu.ops.nms import nms_keep_mask, nms_keep_mask_sequential
from masklab_tpu.ops.pallas import nms_keep_mask_pallas


@pytest.mark.parametrize('seed', [0, 1, 2])
@pytest.mark.parametrize('thresh,cap', [(0.4, 100), (0.6, 8)])
def test_pallas_nms_matches_fixpoint(seed, thresh, cap):
    rng = np.random.RandomState(seed)
    n = 64
    boxes = np.stack([rng.uniform(20, 120, n), rng.uniform(20, 120, n),
                      rng.uniform(10, 70, n), rng.uniform(10, 70, n)],
                     -1).astype(np.float32)
    yxyx = np.asarray(cxcywh_to_yxyx(jnp.asarray(boxes)))
    order = np.argsort(-rng.uniform(0, 1, n), kind='stable')
    yxyx = jnp.asarray(yxyx[order])
    valid = jnp.asarray(rng.rand(n) > 0.15)

    got = np.asarray(nms_keep_mask_pallas(yxyx, valid, thresh, cap,
                                          interpret=True))
    want = np.asarray(nms_keep_mask(yxyx, valid, thresh, cap))
    seq = np.asarray(nms_keep_mask_sequential(yxyx, valid, thresh, cap))
    np.testing.assert_array_equal(want, seq)
    np.testing.assert_array_equal(got, want)

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


class TestSegmentTopK:
    def test_matches_xla_extraction(self):
        import numpy as np
        import jax.numpy as jnp
        from masklab_tpu.ops.pallas.topk_kernel import segment_topk_pallas
        rng = np.random.RandomState(0)
        r, m, s = 3, 16, 256
        x = jnp.asarray(rng.rand(r, m, s), jnp.float32)
        cap = 4
        vals, idx = segment_topk_pallas(x, cap, interpret=True)
        xn = np.asarray(x)
        for ri in range(r):
            for j in range(s):
                col = xn[ri, :, j]
                order = np.argsort(-col, kind='stable')[:cap]
                np.testing.assert_allclose(np.asarray(vals)[ri, :, j],
                                           col[order], rtol=0, atol=0)
                np.testing.assert_array_equal(np.asarray(idx)[ri, :, j],
                                              order * s + j)

    def test_tie_breaking_lowest_row(self):
        import numpy as np
        import jax.numpy as jnp
        from masklab_tpu.ops.pallas.topk_kernel import segment_topk_pallas
        x = np.zeros((1, 8, 128), np.float32)
        x[0, 2, 5] = 0.7
        x[0, 6, 5] = 0.7
        vals, idx = segment_topk_pallas(jnp.asarray(x), 2, interpret=True)
        assert np.asarray(vals)[0, 0, 5] == np.float32(0.7)
        assert np.asarray(idx)[0, 0, 5] == 2 * 128 + 5
        assert np.asarray(idx)[0, 1, 5] == 6 * 128 + 5

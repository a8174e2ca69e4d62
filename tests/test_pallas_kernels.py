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


class TestBandGroupNorm:
    """Fused ragged-band GroupNorm kernel (ops/pallas/groupnorm_kernel.py)
    vs the GroupNorm module's flat-band reference path
    (engine/normalization.py:116-160 semantics)."""

    def _ref(self, x, scale, bias, groups):
        from masklab_tpu.nn.layers import GroupNorm
        # the module routes ragged TPU shapes to the kernel; on CPU (the
        # test platform) it IS the flat-band reference implementation
        return GroupNorm(groups, jnp.float32).apply(
            {'params': {'scale': scale, 'bias': bias}}, x)

    @pytest.mark.parametrize('hw,c', [(14, 256), (14, 64), (7, 32)])
    def test_forward_matches_reference(self, hw, c):
        from masklab_tpu.ops.pallas.groupnorm_kernel import (
            band_groupnorm_pallas)
        g = 16
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(5, hw, hw, c).astype(np.float32) * 2 + 1)
        scale = jnp.asarray(rng.rand(c).astype(np.float32))
        bias = jnp.asarray(rng.rand(c).astype(np.float32))
        want = self._ref(x, scale, bias, g)
        got = band_groupnorm_pallas(x.reshape(5, hw * hw, c), scale, bias,
                                    g, interpret=True).reshape(x.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_block_padding_path(self):
        from masklab_tpu.ops.pallas.groupnorm_kernel import (
            band_groupnorm_pallas)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(3, 196, 64).astype(np.float32))
        scale, bias = jnp.ones(64), jnp.zeros(64)
        want = self._ref(x.reshape(3, 14, 14, 64), scale, bias, 16)
        got = band_groupnorm_pallas(x, scale, bias, 16, block_n=4,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(got).reshape(want.shape),
                                   np.asarray(want), atol=2e-5)

    def test_fused_relu(self):
        from masklab_tpu.ops.pallas.groupnorm_kernel import (
            band_groupnorm_pallas)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(4, 196, 64).astype(np.float32))
        scale, bias = jnp.ones(64), jnp.zeros(64)
        a = band_groupnorm_pallas(jnp.maximum(x, 0), scale, bias, 16,
                                  interpret=True)
        b = band_groupnorm_pallas(x, scale, bias, 16, fuse_relu=True,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_gradients_match_reference(self):
        from masklab_tpu.ops.pallas.groupnorm_kernel import band_groupnorm
        g, hw, c, n = 16, 14, 64, 3
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(n, hw, hw, c).astype(np.float32))
        scale = jnp.asarray(rng.rand(c).astype(np.float32))
        bias = jnp.asarray(rng.rand(c).astype(np.float32))
        w = jnp.asarray(rng.randn(n, hw, hw, c).astype(np.float32))

        def loss_ref(x, s, b):
            return jnp.sum(self._ref(x, s, b, g) * w)

        def loss_new(x, s, b):
            y = band_groupnorm(x.reshape(n, hw * hw, c), s, b, g)
            return jnp.sum(y.reshape(x.shape) * w)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        g_new = jax.grad(loss_new, argnums=(0, 1, 2))(x, scale, bias)
        for a, b in zip(g_ref, g_new):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5)

"""Fused per-box-weight mask head: parity against a straightforward
per-level lax.conv computation with the same parameters."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from masklab_tpu.models.fused_mask_head import (FusedMaskSubNet,
                                                select_crops_by_level)


def _reference_head(params, crop, level, groups):
    """Apply the head to one crop with the given level's weights using
    stock lax ops (the 'unfused' ground truth)."""
    x = crop[None]                                  # [1,h,w,C]
    d = 0
    while f'conv{d}_kernel' in params:
        k = params[f'conv{d}_kernel'][level]
        b = params[f'conv{d}_bias'][level]
        x = jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
        x = jax.nn.relu(x)
        c = x.shape[-1]
        g = min(groups, c)
        xg = x.reshape(1, x.shape[1], x.shape[2], g, c // g)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) / jnp.sqrt(var + 1e-5)
        x = xg.reshape(x.shape)
        x = x * params[f'gn{d}_scale'][level] + params[f'gn{d}_bias'][level]
        d += 1
    dk = params['deconv_kernel'][level]             # [2,2,C,F]
    up = jnp.einsum('nijc,abcf->niajbf', x, dk)
    n, h = up.shape[0], up.shape[1]
    w = up.shape[3]
    f = up.shape[-1]
    up = up.reshape(n, h * 2, w * 2, f) + params['deconv_bias'][level]
    up = jax.nn.relu(up)
    out = jnp.einsum('nijf,fc->nijc', up, params['output_kernel'][level])
    return jax.nn.sigmoid(out + params['output_bias'][level])[0]


def test_fused_head_matches_per_level_reference():
    rng = np.random.RandomState(0)
    module = FusedMaskSubNet(num_levels=3, num_classes=4, num_depth=2,
                             num_features=16, groups=8)
    crops = jnp.asarray(rng.rand(1, 5, 7, 7, 12).astype(np.float32))
    levels = jnp.asarray([[0, 2, 1, 0, -1]], jnp.int32)
    variables = module.init(jax.random.PRNGKey(0), crops, levels)
    out = np.asarray(jax.jit(module.apply)(variables, crops, levels))
    assert out.shape == (1, 5, 14, 14, 4)

    params = variables['params']
    for ki in range(4):
        lvl = int(levels[0, ki])
        want = np.asarray(_reference_head(params, crops[0, ki], lvl, 8))
        np.testing.assert_allclose(out[0, ki], want, atol=2e-5, rtol=1e-4)
    # invalid box -> zeros
    np.testing.assert_allclose(out[0, 4], 0.0)


def test_select_crops_by_level():
    per_level = [jnp.full((1, 3, 2, 2, 1), float(l)) for l in range(3)]
    levels = jnp.asarray([[2, 0, -1]], jnp.int32)
    sel = np.asarray(select_crops_by_level(per_level, levels))
    np.testing.assert_allclose(sel[0, 0], 2.0)
    np.testing.assert_allclose(sel[0, 1], 0.0)
    np.testing.assert_allclose(sel[0, 2], 0.0)  # invalid -> zeros


def test_fused_head_gradients():
    module = FusedMaskSubNet(num_levels=2, num_classes=3, num_depth=1,
                             num_features=8, groups=4)
    crops = jnp.ones((1, 3, 7, 7, 8))
    levels = jnp.asarray([[0, 1, 0]], jnp.int32)
    variables = module.init(jax.random.PRNGKey(1), crops, levels)

    @jax.jit
    def loss(params):
        return module.apply({'params': params}, crops, levels).sum()

    grads = jax.grad(loss)(variables['params'])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in leaves) > 0


class TestPackedUpsampleEpilogue:
    """_LevelMaskHead's packed pixel-shuffle epilogue (models/instance.py
    _PixelShuffleUp): identical params, identical outputs vs the plain
    nn.ConvTranspose -> relu -> 1x1 conv -> sigmoid composition."""

    def _composition(self, params, x, num_classes, dtype=jnp.float32):
        from flax import linen as nn

        up = nn.ConvTranspose(params['upsample']['kernel'].shape[-1],
                              (2, 2), strides=(2, 2), padding='SAME',
                              dtype=dtype)
        y = jax.jit(up.apply)({'params': params['upsample']}, x)
        y = jax.nn.relu(y)
        out = nn.Conv(num_classes, (1, 1), dtype=dtype)
        y = jax.jit(out.apply)({'params': params['output']}, y)
        return jax.nn.sigmoid(y)

    def test_matches_conv_transpose_composition(self):
        from masklab_tpu.models.instance import _LevelMaskHead

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(3, 14, 14, 32).astype(np.float32))
        head = _LevelMaskHead(num_classes=4, num_depth=1, num_features=32,
                              use_separable_conv=False, expand_ratio=4.0,
                              use_squeeze_excite=False, squeeze_ratio=16.0,
                              groups=16, dtype=jnp.float32)
        params = jax.jit(head.init)(jax.random.PRNGKey(0), x)['params']
        # random (not zero-init) epilogue weights so the parity is real
        params = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)
                                  * 0.1), params)
        got = jax.jit(head.apply)({'params': params}, x)

        # ground truth: run the block, then the stock composition
        from masklab_tpu.nn.layers import HeadBlock
        block = HeadBlock(1, 32, False, 4.0, False, 16.0, 16, jnp.float32)
        mid = jax.jit(block.apply)({'params': params['block']}, x)
        want = self._composition(params, mid, num_classes=4)
        assert got.shape == want.shape == (3, 28, 28, 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_matches_composition_bf16(self):
        """The packed epilogue must hold at BOTH compute dtypes (round-3
        lesson: a precision-gated path tested only at f32 hid a dead
        branch). bf16 runs the exact same graph in bf16; tolerance covers
        bf16 rounding of sigmoid outputs (values in [0, 1])."""
        from masklab_tpu.models.instance import _LevelMaskHead

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 14, 14, 32).astype(np.float32))
        head = _LevelMaskHead(num_classes=4, num_depth=1, num_features=32,
                              use_separable_conv=False, expand_ratio=4.0,
                              use_squeeze_excite=False, squeeze_ratio=16.0,
                              groups=16, dtype=jnp.bfloat16)
        params = jax.jit(head.init)(jax.random.PRNGKey(0), x)['params']
        params = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)
                                  * 0.1), params)
        got = jax.jit(head.apply)({'params': params}, x)
        assert got.dtype == jnp.bfloat16

        from masklab_tpu.nn.layers import HeadBlock
        block = HeadBlock(1, 32, False, 4.0, False, 16.0, 16, jnp.bfloat16)
        mid = jax.jit(block.apply)({'params': params['block']}, x)
        want = self._composition(params, mid, num_classes=4,
                                 dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=2e-2)

    def test_gradients_flow(self):
        from masklab_tpu.models.instance import _LevelMaskHead

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 7, 7, 16).astype(np.float32))
        head = _LevelMaskHead(num_classes=3, num_depth=1, num_features=16,
                              use_separable_conv=False, expand_ratio=4.0,
                              use_squeeze_excite=False, squeeze_ratio=16.0,
                              groups=8, dtype=jnp.float32)
        variables = jax.jit(head.init)(jax.random.PRNGKey(0), x)

        def loss(v):
            return jnp.sum(head.apply(v, x) ** 2)

        g = jax.jit(jax.grad(loss))(variables)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # upsample + output grads are non-zero
        assert float(jnp.abs(
            g['params']['upsample']['kernel']).sum()) > 0.0
        assert float(jnp.abs(g['params']['output']['kernel']).sum()) > 0.0

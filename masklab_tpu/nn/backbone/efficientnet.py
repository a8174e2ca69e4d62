"""EfficientNet B2/B3/B4 backbones, flax.

Structural equivalents of the ``efficientnet`` package models used by the
reference (engine/backbone/base.py:259-279), with the same endpoint taps
(base.py:168-181): C1..C4 = the *expand activation* of the first block of
stages 2/3/4/6 (i.e. the pre-downsample activations at strides 2/4/8/16)
and C5 = top_activation (stride 32).
"""
from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (expand_ratio, channels, repeats, stride, kernel)
_BASE_BLOCKS = [
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
# stage index (0-based into _BASE_BLOCKS) -> endpoint name for its first
# block's expand activation
_TAPS = {1: 'C1', 2: 'C2', 3: 'C3', 5: 'C4'}

# Endpoint channel widths of the reference's ``efficientnet`` package
# (block{2,3,4,6}a_expand_activation + top_activation,
# engine/backbone/base.py:168-181, 259-279) — asserted by
# tests/test_backbones.py against the built models.
ENDPOINT_CHANNELS = {
    'efficientnetb2': {'C1': 96, 'C2': 144, 'C3': 288, 'C4': 720,
                       'C5': 1408},
    'efficientnetb3': {'C1': 144, 'C2': 192, 'C3': 288, 'C4': 816,
                       'C5': 1536},
    'efficientnetb4': {'C1': 144, 'C2': 192, 'C3': 336, 'C4': 960,
                       'C5': 1792},
}


def _round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-3, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class _MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        expanded = self.in_ch * self.expand
        tap = None
        if self.expand != 1:
            x = nn.Conv(expanded, (1, 1), use_bias=False,
                        dtype=self.dtype)(x)
            x = _BN(self.dtype)(x, train)
            x = nn.swish(x)
        tap = x  # "expand activation" endpoint
        x = nn.Conv(expanded, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding='SAME',
                    feature_group_count=expanded, use_bias=False,
                    dtype=self.dtype)(x)
        x = _BN(self.dtype)(x, train)
        x = nn.swish(x)
        # squeeze-excite
        se_ch = max(1, int(self.in_ch * self.se_ratio))
        se = jnp.mean(x, axis=(-3, -2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), dtype=self.dtype)(se)
        se = nn.swish(se)
        se = nn.Conv(expanded, (1, 1), dtype=self.dtype)(se)
        x = x * nn.sigmoid(se)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = _BN(self.dtype)(x, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            # drop-connect / stochastic depth on the residual branch (the
            # efficientnet package applies it at train time with a rate that
            # grows linearly with block depth). Per-sample binary gate,
            # rescaled by 1/keep_prob; deterministic when no 'dropout' rng
            # is supplied.
            if self.drop_rate > 0.0:
                x = nn.Dropout(
                    rate=self.drop_rate, broadcast_dims=(1, 2, 3))(
                        x, deterministic=not (train
                                              and self.has_rng('dropout')))
            x = x + inputs
        return x, tap


class EfficientNet(nn.Module):
    width: float = 1.0
    depth: float = 1.0
    drop_connect_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        stem_ch = _round_filters(32, self.width)
        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # exact space-to-depth stem (see nn.layers.StemConv); SAME for
            # 3x3/s2 on even extents is exactly (0,1)
            from ..layers import StemConv
            x = StemConv(stem_ch, use_bias=False, kernel_size=(3, 3),
                         pad=((0, 1), (0, 1)), dtype=self.dtype,
                         name='stem')(x)
        else:
            x = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding='SAME',
                        use_bias=False, dtype=self.dtype, name='stem')(x)
        x = _BN(self.dtype, name='stem_bn')(x, train)
        x = nn.swish(x)
        in_ch = stem_ch
        total_blocks = sum(_round_repeats(r, self.depth)
                           for _, _, r, _, _ in _BASE_BLOCKS)
        block_idx = 0
        for si, (expand, ch, repeats, stride, kernel) in \
                enumerate(_BASE_BLOCKS):
            out_ch = _round_filters(ch, self.width)
            reps = _round_repeats(repeats, self.depth)
            for bi in range(reps):
                s = stride if bi == 0 else 1
                # linear stochastic-depth schedule over global block index
                drop = self.drop_connect_rate * block_idx / total_blocks
                x, tap = _MBConv(in_ch, out_ch, expand, s, kernel,
                                 drop_rate=drop, dtype=self.dtype,
                                 name=f'stage{si}_block{bi}')(x, train)
                if bi == 0 and si in _TAPS:
                    endpoints[_TAPS[si]] = tap
                in_ch = out_ch
                block_idx += 1
        top_ch = _round_filters(1280, self.width)
        x = nn.Conv(top_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name='top_conv')(x)
        x = _BN(self.dtype, name='top_bn')(x, train)
        endpoints['C5'] = nn.swish(x)
        return endpoints


def efficientnet_b2(dtype=jnp.float32):
    return EfficientNet(width=1.1, depth=1.2, dtype=dtype)


def efficientnet_b3(dtype=jnp.float32):
    return EfficientNet(width=1.2, depth=1.4, dtype=dtype)


def efficientnet_b4(dtype=jnp.float32):
    return EfficientNet(width=1.4, depth=1.8, dtype=dtype)

"""MobileNet V1 backbone (alpha=1.0), flax.

Structural equivalent of the Keras ``MobileNet`` used by the reference
(engine/backbone/base.py:253-258), exposing the same endpoint taps:
C1..C5 = conv_pw_{1,3,5,11,13}_relu (base.py:161-167), i.e. the pointwise
ReLU6 outputs at strides 2/4/8/16/32. Stride-2 convolutions use the Keras
asymmetric zero-pad ((0,1),(0,1)) + VALID convention, which is why the
prior grid for mobilenet uses 'valid' (floor) rounding
(PriorLayer padding param, detection.py:240-243).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# (pointwise_channels, depthwise_stride) for the 13 separable blocks
_BLOCKS = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
           (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
           (1024, 1)]
# block index (1-based) -> endpoint name
_ENDPOINTS = {1: 'C1', 3: 'C2', 5: 'C3', 11: 'C4', 13: 'C5'}


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def _pad_valid_s2(x):
    """Keras stride-2 padding: zero-pad bottom/right by 1, then VALID."""
    return jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])


class _ConvBN(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.stride == 2 and not self.depthwise and x.shape[-1] <= 4
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # stem form (3 input channels): the Keras asymmetric
            # (0,1)+VALID stride-2 pad expressed through the exact
            # space-to-depth transform — the direct emitter packs 3
            # channels into 8 sublanes at ~6% efficiency (the stem conv +
            # its input relayout copy were ~1.1 ms of the 9.5 ms dense
            # batch-8 trace, round-5 log). Param path stays 'Conv_0'.
            from ..layers import StemConv
            x = StemConv(self.features, use_bias=False,
                         kernel_size=tuple(self.kernel),
                         pad=((0, 1), (0, 1)), dtype=self.dtype,
                         name='Conv_0')(x)
        else:
            if self.stride == 2:
                x = _pad_valid_s2(x)
                padding = 'VALID'
            else:
                padding = 'SAME'
            groups = x.shape[-1] if self.depthwise else 1
            feats = x.shape[-1] if self.depthwise else self.features
            x = nn.Conv(feats, self.kernel,
                        strides=(self.stride, self.stride),
                        padding=padding, feature_group_count=groups,
                        use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        return _relu6(x)


class MobileNetV1(nn.Module):
    """Returns dict of endpoints {'C1': ..., 'C5': ...}."""
    alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        x = _ConvBN(int(32 * self.alpha), (3, 3), stride=2,
                    dtype=self.dtype, name='stem')(x, train)
        for i, (ch, stride) in enumerate(_BLOCKS, start=1):
            x = _ConvBN(0, (3, 3), stride=stride, depthwise=True,
                        dtype=self.dtype, name=f'dw{i}')(x, train)
            x = _ConvBN(int(ch * self.alpha), (1, 1),
                        dtype=self.dtype, name=f'pw{i}')(x, train)
            if i in _ENDPOINTS:
                endpoints[_ENDPOINTS[i]] = x
        return endpoints

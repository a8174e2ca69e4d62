"""MobileNet V2 backbone, flax.

The reference's README and deployment notes name MobileNetV2 as the
real-time backbone (BASELINE.json north-star; README.md architecture
prose), while the code shipped V1 — this framework provides both.
Endpoint taps follow the standard V2 convention:
  C1 = block1 expansion ReLU (stride 2), C2 = block3 input (stride 4),
  C3 = block6 input (stride 8), C4 = block13 input (stride 16),
  C5 = final 1x1 conv activation (stride 32).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

# (expansion t, channels, repeats, first stride)
_CFG = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
# stage index whose FIRST block's input is the endpoint (pre-downsample)
_TAPS = {1: 'C1', 2: 'C2', 3: 'C3', 5: 'C4'}


def _relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.999,
                            epsilon=1e-3, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class _InvertedResidual(nn.Module):
    in_ch: int
    out_ch: int
    expansion: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        hidden = self.in_ch * self.expansion
        if self.expansion != 1:
            x = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype)(x)
            x = _BN(self.dtype)(x, train)
            x = _relu6(x)
        x = nn.Conv(hidden, (3, 3), strides=(self.stride,) * 2,
                    padding='SAME', feature_group_count=hidden,
                    use_bias=False, dtype=self.dtype)(x)
        x = _BN(self.dtype)(x, train)
        x = _relu6(x)
        x = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = _BN(self.dtype)(x, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            x = x + inputs
        return x


class MobileNetV2(nn.Module):
    alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}

        def ch(c):
            v = max(8, int(c * self.alpha + 4) // 8 * 8)
            return v

        if x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # SAME for 3x3/s2 on even extents is exactly (0,1) — routed
            # through the exact space-to-depth stem (see nn.layers.StemConv;
            # 3 input channels run the direct emitter at ~6% MXU). Odd
            # extents keep nn.Conv's SAME (different pad split there).
            from ..layers import StemConv
            x = StemConv(ch(32), use_bias=False, kernel_size=(3, 3),
                         pad=((0, 1), (0, 1)), dtype=self.dtype,
                         name='stem')(x)
        else:
            x = nn.Conv(ch(32), (3, 3), strides=(2, 2), padding='SAME',
                        use_bias=False, dtype=self.dtype, name='stem')(x)
        x = _BN(self.dtype, name='stem_bn')(x, train)
        x = _relu6(x)
        in_ch = ch(32)
        for si, (t, c, reps, stride) in enumerate(_CFG):
            out_ch = ch(c)
            for bi in range(reps):
                s = stride if bi == 0 else 1
                if bi == 0 and si in _TAPS:
                    endpoints[_TAPS[si]] = x
                x = _InvertedResidual(in_ch, out_ch, t, s, self.dtype,
                                      name=f'stage{si}_block{bi}')(x, train)
                in_ch = out_ch
        x = nn.Conv(ch(1280) if self.alpha > 1.0 else 1280, (1, 1),
                    use_bias=False, dtype=self.dtype, name='top_conv')(x)
        x = _BN(self.dtype, name='top_bn')(x, train)
        endpoints['C5'] = _relu6(x)
        return endpoints

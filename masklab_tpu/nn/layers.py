"""Core flax modules shared across all heads.

TPU-native equivalents of the reference's custom Keras layers:
  * GroupNorm    — engine/normalization.py:12-184 (eps 1e-5, affine)
  * SqueezeExcite — engine/layers/misc.py:24-54
  * MobileSeparableConv — engine/layers/misc.py:57-117 (MobileNetV2
    inverted-residual expand -> depthwise -> squeeze + skip)
  * AtrousSeparableConv — engine/layers/semantic.py:32-90

All modules are NHWC and batch-size independent (GroupNorm everywhere, as in
the reference). Convolutions run in ``dtype`` (float32 or bfloat16) with
float32 parameters; normalization statistics are always float32.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def normal_init(stddev: float = 0.01):
    return nn.initializers.normal(stddev=stddev)


class GroupNorm(nn.Module):
    """GroupNorm with the reference's epsilon (1e-5) and affine params."""
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # clamp so narrow feature stacks (tests, small configs) still
        # normalize; the reference required channels >= groups
        groups = min(self.groups, x.shape[-1])
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                            dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class SqueezeExcite(nn.Module):
    """Channel attention: GAP -> bottleneck dense -> sigmoid gate."""
    ratio: float = 16.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        se = jnp.mean(x, axis=(-3, -2))                       # [..., C]
        se = nn.Dense(int(c // self.ratio), use_bias=False,
                      kernel_init=nn.initializers.he_normal(),
                      dtype=self.dtype)(se)
        se = nn.relu(se)
        se = nn.Dense(c, use_bias=False,
                      kernel_init=nn.initializers.glorot_normal(),
                      dtype=self.dtype)(se)
        se = nn.sigmoid(se)
        return x * se[..., None, None, :]


class MobileSeparableConv(nn.Module):
    """Inverted-residual separable conv (expand -> depthwise -> squeeze + skip)."""
    filters: int
    kernel_size: Tuple[int, int] = (3, 3)
    expand_ratio: float = 4.0
    stride: int = 1
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inputs = x
        expanded = int(self.expand_ratio * self.filters)
        x = nn.Conv(expanded, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(expanded, self.kernel_size,
                    strides=(self.stride, self.stride), padding='SAME',
                    feature_group_count=expanded, use_bias=False,
                    dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        return inputs + x


class AtrousSeparableConv(nn.Module):
    """Dilated depthwise 3x3 + GN + ReLU, then pointwise + GN + ReLU."""
    filters: int
    dilation_rate: int = 3
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), padding='SAME',
                    kernel_dilation=(self.dilation_rate, self.dilation_rate),
                    feature_group_count=c, use_bias=False,
                    dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        x = GroupNorm(self.groups, self.dtype)(x)
        return nn.relu(x)


class HeadBlock(nn.Module):
    """One depth-stack of a subnet head: ``num_depth`` x
    [SqueezeExcite? -> Conv3x3-ReLU | MobileSeparableConv -> GroupNorm].

    Shared structure of ClassificationSubNet / BoxRegressionSubNet /
    MaskSubNet / SegmentationSubNet bodies (detection.py:109-130 etc.).
    """
    num_depth: int = 4
    num_features: int = 256
    use_separable_conv: bool = False
    expand_ratio: float = 4.0
    use_squeeze_excite: bool = False
    squeeze_ratio: float = 16.0
    groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_depth):
            if self.use_squeeze_excite:
                x = SqueezeExcite(self.squeeze_ratio, self.dtype)(x)
            if self.use_separable_conv:
                x = MobileSeparableConv(self.num_features, (3, 3),
                                        expand_ratio=self.expand_ratio,
                                        groups=self.groups,
                                        dtype=self.dtype)(x)
            else:
                x = nn.Conv(self.num_features, (3, 3), padding='SAME',
                            kernel_init=normal_init(0.01),
                            dtype=self.dtype)(x)
                x = nn.relu(x)
            x = GroupNorm(self.groups, self.dtype)(x)
        return x

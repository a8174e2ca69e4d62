"""ResNet-family backbones: ResNet50(V1/V2), ResNeXt50, SE-ResNet34/50,
SE-ResNeXt50 — flax, NHWC.

Structural equivalents of the reference's Keras backbones
(engine/backbone/base.py:104-182 lists the C1..C5 endpoint taps;
thirdparty/classification_models provides seresnet34/50 + seresnext50;
engine/backbone/ResNext.py hand-rolls ResNeXt50 through a
DepthwiseConv-based grouped-conv trick). On TPU, grouped convolution is
native (``feature_group_count``) so ResNeXt needs no such trick.

Endpoint convention (matching strides of the reference taps):
  C1 stride 2 (post-stem activation), C2 stride 4 (end of stage2),
  C3 stride 8, C4 stride 16, C5 stride 32 (final activation).

Stage submodules are named ``stem``/``stage2``..``stage5`` so the
progressive-unfreeze driver can freeze by C-depth via parameter-path
prefixes (the reference's freeze_backbone walks Keras layers by name,
base.py:319-345).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


class _BN(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-5, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class _SE(nn.Module):
    """Squeeze-excite for SE variants (classification_models ChannelSE)."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        se = jnp.mean(x, axis=(-3, -2))
        se = nn.Dense(max(1, c // self.reduction), dtype=self.dtype)(se)
        se = nn.relu(se)
        se = nn.Dense(c, dtype=self.dtype)(se)
        se = nn.sigmoid(se)
        return x * se[..., None, None, :]


class BasicBlock(nn.Module):
    """3x3 + 3x3 residual block (resnet18/34 family)."""
    filters: int
    stride: int = 1
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding='SAME', use_bias=False, dtype=self.dtype)(x)
        y = _BN(self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding='SAME', use_bias=False,
                    dtype=self.dtype)(y)
        y = _BN(self.dtype)(y, train)
        if self.use_se:
            y = _SE(dtype=self.dtype)(y)
        if shortcut.shape[-1] != self.filters or self.stride != 1:
            shortcut = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            shortcut = _BN(self.dtype)(shortcut, train)
        return nn.relu(y + shortcut)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 (optionally grouped) -> 1x1 residual bottleneck."""
    filters: int               # inner width
    stride: int = 1
    groups: int = 1            # 32 for ResNeXt
    expansion: int = 4
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * self.expansion
        shortcut = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = _BN(self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding='SAME', feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype)(y)
        y = _BN(self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = _BN(self.dtype)(y, train)
        if self.use_se:
            y = _SE(dtype=self.dtype)(y)
        if shortcut.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype)(x)
            shortcut = _BN(self.dtype)(shortcut, train)
        return nn.relu(y + shortcut)


class PreactBottleneck(nn.Module):
    """BN-ReLU-conv pre-activation bottleneck (resnet v2 family)."""
    filters: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * self.expansion
        pre = _BN(self.dtype)(x, train)
        pre = nn.relu(pre)
        if x.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype)(pre)
        else:
            shortcut = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False,
                    dtype=self.dtype)(pre)
        y = _BN(self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding='SAME', use_bias=False, dtype=self.dtype)(y)
        y = _BN(self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(y)
        return y + shortcut


class _Stage(nn.Module):
    num_blocks: int
    filters: int
    stride: int
    block: str = 'bottleneck'
    groups: int = 1
    expansion: int = 4
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            if self.block == 'basic':
                x = BasicBlock(self.filters, stride, self.use_se,
                               self.dtype)(x, train)
            elif self.block == 'preact':
                x = PreactBottleneck(self.filters, stride,
                                     expansion=self.expansion,
                                     dtype=self.dtype)(x, train)
            else:
                x = BottleneckBlock(self.filters, stride, self.groups,
                                    expansion=self.expansion,
                                    use_se=self.use_se,
                                    dtype=self.dtype)(x, train)
        return x


class ResNet(nn.Module):
    """Generic ResNet/ResNeXt/SE-ResNet body returning C1..C5 endpoints."""
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stage_filters: Sequence[int] = (64, 128, 256, 512)
    block: str = 'bottleneck'
    groups: int = 1
    expansion: int = 4
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        # stem: 7x7/2 conv + BN + ReLU (C1), then 3x3/2 maxpool
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name='stem')(x)
        preact = self.block == 'preact'
        if not preact:
            x = _BN(self.dtype, name='stem_bn')(x, train)
            x = nn.relu(x)
        endpoints['C1'] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        strides = (1, 2, 2, 2)
        for si, (blocks, filters, stride) in enumerate(
                zip(self.stage_blocks, self.stage_filters, strides)):
            x = _Stage(blocks, filters, stride, self.block, self.groups,
                       self.expansion, self.use_se, self.dtype,
                       name=f'stage{si + 2}')(x, train)
            endpoints[f'C{si + 2}'] = x
        if preact:
            # v2: final post-activation ('post_relu' endpoint, base.py:117)
            x = _BN(self.dtype, name='post_bn')(x, train)
            x = nn.relu(x)
            endpoints['C5'] = x
        return endpoints


def resnet50(dtype=jnp.float32):
    return ResNet(block='bottleneck', dtype=dtype)


def resnet50v2(dtype=jnp.float32):
    return ResNet(block='preact', dtype=dtype)


def resnet101v2(dtype=jnp.float32):
    return ResNet(stage_blocks=(3, 4, 23, 3), block='preact', dtype=dtype)


def resnet101(dtype=jnp.float32):
    return ResNet(stage_blocks=(3, 4, 23, 3), block='bottleneck', dtype=dtype)


def resnext50(dtype=jnp.float32):
    # ResNeXt-50 32x4d: inner widths 128..1024, cardinality 32, expansion 2
    return ResNet(stage_filters=(128, 256, 512, 1024), block='bottleneck',
                  groups=32, expansion=2, dtype=dtype)


def seresnet34(dtype=jnp.float32):
    return ResNet(stage_blocks=(3, 4, 6, 3), block='basic', use_se=True,
                  dtype=dtype)


def seresnet50(dtype=jnp.float32):
    return ResNet(block='bottleneck', use_se=True, dtype=dtype)


def seresnext50(dtype=jnp.float32):
    return ResNet(stage_filters=(128, 256, 512, 1024), block='bottleneck',
                  groups=32, expansion=2, use_se=True, dtype=dtype)

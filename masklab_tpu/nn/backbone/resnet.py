"""ResNet-family backbones: ResNet50(V1/V2), ResNeXt50, SE-ResNet34/50,
SE-ResNeXt50 — flax, NHWC.

Faithful structural ports of the reference's Keras backbones, block for
block (verified by weight-transplant parity tests in
tests/test_weight_transplant.py):

  * ``seresnet34`` — classification_models *pre-activation* residual blocks
    (thirdparty/classification_models/models/resnet.py:60-110): BN->ReLU
    before the convs, shortcut from the input (``cut='pre'``) or from the
    pre-activation through a 1x1 conv (``cut='post'`` on each stage's first
    unit), ChannelSE before the Add, ``bn_data`` input BN (scale-less), and
    a final ``bn1``/``relu1``. Endpoint taps C2-C4 are the pre-activation
    ReLU *inside* the first unit of the next stage
    (``stage{k}_unit1_relu1``, engine/backbone/base.py:126-132).
  * ``seresnet50``/``seresnext50`` — senet.py post-activation bottlenecks
    (thirdparty/classification_models/models/senet.py:44-131): stride on
    the *first* 1x1 conv for seresnet50, on the grouped 3x3 for
    seresnext50; SE before Add; explicit (1,1) zero-padding on strided
    3x3 convs (ZeroPadding2D+valid, which differs from XLA 'SAME' at
    stride 2).
  * ``resnet50``/``resnet101`` — keras.applications v1 ("caffe") style:
    stride on the first 1x1 conv, biased convs, BN eps 1.001e-5.
  * ``resnext50`` — engine/backbone/ResNext.py: stride on the grouped 3x3
    with explicit (1,1) padding, bias-free convs, eps 1.001e-5. On TPU,
    grouped convolution is native (``feature_group_count``) so the
    reference's DepthwiseConv split/reduce/merge trick is not needed.
  * ``resnet50v2``/``resnet101v2`` — keras_applications resnet_v2 topology
    (thirdparty/classification_models/models_factory.py:30 maps
    'resnet50v2' to ka.resnet_v2.ResNet50V2; engine/backbone/base.py:204-212
    builds ResNet101V2 directly): stride on each stack's *last* block
    (conv5 unstrided), 1-wide maxpool shortcut on strided identity blocks,
    biased stem conv and per-block 3rd 1x1 conv, BN eps 1.001e-5, final
    post_bn+post_relu. The reference taps mid-stage activations
    (base.py:112-125): resnet50v2 uses each stack's block preact_relu
    (conv4 tapped at block4 of 6), resnet101v2 the *inner* ``_1_relu``
    (64/128/256-channel) of each stack's last block.

Endpoint convention (matching strides of the reference taps):
  C1 stride 2 (post-stem activation), C2 stride 4, C3 stride 8,
  C4 stride 16, C5 stride 32 (final activation).

Submodules are named after the reference layer names where they exist
(``stage{k}_unit{j}``, ``conv0``/``bn0``/``bn1``) so the progressive
unfreeze driver and the keras-h5 importer can address them by name.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_PAD1 = ((1, 1), (1, 1))  # ZeroPadding2D(1) + 'valid' conv equivalent

from ..layers import StemConv, space_to_depth_stem  # noqa: E402  (re-export
# for tests; the transform lives with the shared layers)

# ResNet-family stem: StemConv's defaults ARE the 7x7 / stride-2 / SAME-3
# form, so the alias just documents intent at the three stem sites.
StemConv7x7 = StemConv


class _BN(nn.Module):
    dtype: Any = jnp.float32
    eps: float = 1e-5
    use_scale: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=self.eps, use_scale=self.use_scale,
                            dtype=self.dtype, param_dtype=jnp.float32)(x)


class _SE(nn.Module):
    """ChannelSE (classification_models _common_blocks.py:88-119): GAP ->
    1x1 conv c/r (+bias) -> relu -> 1x1 conv c (+bias) -> sigmoid -> mul.
    Implemented with Dense on the pooled vector (identical math; the h5
    importer squeezes the (1,1,c,c/r) conv kernels to (c,c/r))."""
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        se = jnp.mean(x, axis=(-3, -2))
        se = nn.Dense(max(1, c // self.reduction), dtype=self.dtype,
                      name='fc1')(se)
        se = nn.relu(se)
        se = nn.Dense(c, dtype=self.dtype, name='fc2')(se)
        se = nn.sigmoid(se)
        return x * se[..., None, None, :]


class CMBasicBlock(nn.Module):
    """classification_models pre-activation basic block
    (thirdparty/classification_models/models/resnet.py:60-110).

    preact = ReLU(BN(x)); shortcut = x (cut='pre') or conv1x1(preact)
    (cut='post'); y = conv3x3(preact, stride) -> BN -> ReLU -> conv3x3;
    y = SE(y)?; out = y + shortcut. The preact tensor is returned too —
    it is the backbone's C2-C4 endpoint tap for stage-first units.
    """
    filters: int
    stride: int = 1
    cut: str = 'pre'
    use_se: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        preact = _BN(self.dtype, eps=2e-5, name='bn1')(x, train)
        preact = nn.relu(preact)
        if self.cut == 'post':
            shortcut = nn.Conv(self.filters, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype, name='sc')(preact)
        else:
            shortcut = x
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=_PAD1, use_bias=False, dtype=self.dtype,
                    name='conv1')(preact)
        y = _BN(self.dtype, eps=2e-5, name='bn2')(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=_PAD1, use_bias=False,
                    dtype=self.dtype, name='conv2')(y)
        if self.use_se:
            y = _SE(dtype=self.dtype, name='se')(y)
        return y + shortcut, preact


class CMResNet(nn.Module):
    """classification_models ResNet/SE-ResNet (resnet18/34 family) with
    pre-activation blocks and the reference's endpoint taps:
    C1='relu0', C2-C4='stage{2..4}_unit1_relu1', C5='relu1'
    (engine/backbone/base.py:126-132)."""
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        x = _BN(self.dtype, eps=2e-5, use_scale=False,
                name='bn_data')(x, train)
        x = StemConv7x7(64, use_bias=False, dtype=self.dtype,
                        name='conv0')(x)
        x = _BN(self.dtype, eps=2e-5, name='bn0')(x, train)
        x = nn.relu(x)
        endpoints['C1'] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for si, blocks in enumerate(self.stage_blocks):
            filters = 64 * (2 ** si)
            for bi in range(blocks):
                stride = 2 if (bi == 0 and si > 0) else 1
                cut = 'post' if bi == 0 else 'pre'
                x, preact = CMBasicBlock(
                    filters, stride, cut, self.use_se, self.dtype,
                    name=f'stage{si + 1}_unit{bi + 1}')(x, train)
                if bi == 0 and si > 0:
                    endpoints[f'C{si + 1}'] = preact
        x = _BN(self.dtype, eps=2e-5, name='bn1')(x, train)
        endpoints['C5'] = nn.relu(x)
        return endpoints


class BasicBlock(nn.Module):
    """Post-activation 3x3+3x3 residual block (plain resnet18/34 v1)."""
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


class _BlockDiagGroupedConv(nn.Module):
    """Grouped 3x3 conv computed as a dense conv with a block-diagonal
    kernel.

    XLA's TPU backward for ``feature_group_count=32`` (4-channel groups)
    runs 21x slower than the equivalent dense conv — the 4-wide group
    matmuls waste 97% of the 128-lane MXU (1.391 vs 0.065 ms/call at the
    resnext50 stage-2 train shape, round-3 microbench). Expanding the
    grouped kernel into a dense [kh, kw, C_in, C_out] kernel whose
    cross-group entries are exact zeros computes the identical function
    (zeros contribute exactly zero in bf16 and f32) with exact gradients
    (the mask zeroes cross-group grads), at full MXU utilization.

    The parameter keeps the grouped shape [kh, kw, C_in/G, C_out] and the
    flax ``Conv`` naming, so checkpoints and keras-h5 transplant
    (utils/keras_import.py) are unchanged. Note XLA's FLOP counter sees
    the dense conv, overstating algorithmic FLOPs for these layers G-fold.
    """
    features: int
    groups: int
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        cg = c_in // self.groups
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, cg, self.features), jnp.float32)
        out_group = jnp.arange(self.features) // (self.features
                                                  // self.groups)
        mask = (jnp.arange(self.groups)[:, None]
                == out_group[None, :]).astype(kernel.dtype)     # [G, out]
        dense = (kernel[:, :, None, :, :]
                 * mask[None, None, :, None, :]).reshape(
                     3, 3, c_in, self.features)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), dense.astype(self.dtype), self.strides,
            self.padding, dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        if self.use_bias:
            bias = self.param('bias', nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 (optionally grouped) -> 1x1 post-activation bottleneck.

    ``stride_first`` places the stride on the first 1x1 conv
    (keras.applications v1 "caffe" style and senet.py SEResNetBottleneck);
    otherwise the stride sits on the 3x3 with explicit (1,1) padding
    (ResNeXt / SEResNeXt style, ZeroPadding2D+valid in the reference).
    SE (when enabled) applies before the Add (senet.py:76-81).
    """
    filters: int               # inner width
    stride: int = 1
    groups: int = 1            # 32 for ResNeXt
    expansion: int = 4
    use_se: bool = False
    stride_first: bool = False
    conv_bias: bool = False
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * self.expansion
        shortcut = x
        s1 = (self.stride,) * 2 if self.stride_first else (1, 1)
        s3 = (1, 1) if self.stride_first else (self.stride,) * 2
        y = nn.Conv(self.filters, (1, 1), strides=s1,
                    use_bias=self.conv_bias, dtype=self.dtype,
                    name='Conv_0')(x)
        y = _BN(self.dtype, eps=self.bn_eps)(y, train)
        y = nn.relu(y)
        relu1 = y  # seresnext50's C2-C4 taps sit here (base.py:139-145)
        if self.groups > 1:
            y = _BlockDiagGroupedConv(self.filters, self.groups,
                                      strides=s3, padding=_PAD1,
                                      use_bias=self.conv_bias,
                                      dtype=self.dtype, name='Conv_1')(y)
        else:
            y = nn.Conv(self.filters, (3, 3), strides=s3, padding=_PAD1,
                        use_bias=self.conv_bias, dtype=self.dtype,
                        name='Conv_1')(y)
        y = _BN(self.dtype, eps=self.bn_eps)(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=self.conv_bias,
                    dtype=self.dtype, name='Conv_2')(y)
        y = _BN(self.dtype, eps=self.bn_eps)(y, train)
        if self.use_se:
            y = _SE(dtype=self.dtype)(y)
        if shortcut.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=self.conv_bias, dtype=self.dtype,
                               name='Conv_3')(x)
            shortcut = _BN(self.dtype, eps=self.bn_eps)(shortcut, train)
        return nn.relu(y + shortcut), relu1


class V2Block(nn.Module):
    """keras_applications resnet_v2 ``block2``: BN-ReLU preact, optional
    1x1 conv shortcut (stack-first blocks) or 1-wide maxpool shortcut
    (strided last blocks — pure subsampling), two bias-free convs with an
    explicit (1,1) pad on the 3x3, then a *biased* expanding 1x1.

    Returns ``(out, taps)`` where taps carries the two activations the
    reference's endpoint table addresses (engine/backbone/base.py:112-125):
    ``preact_relu`` and the post-conv1 ``1_relu``.
    """
    filters: int
    stride: int = 1
    conv_shortcut: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * 4
        pre = _BN(self.dtype, eps=1.001e-5, name='preact_bn')(x, train)
        pre = nn.relu(pre)
        if self.conv_shortcut:
            shortcut = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               dtype=self.dtype, name='conv0')(pre)
        elif self.stride > 1:
            # MaxPooling2D(pool_size=1, strides=s) == subsampling
            shortcut = x[:, ::self.stride, ::self.stride, :]
        else:
            shortcut = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name='conv1')(pre)
        y = _BN(self.dtype, eps=1.001e-5, name='bn1')(y, train)
        y = nn.relu(y)
        taps = {'preact_relu': pre, '1_relu': y}
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride,) * 2,
                    padding=_PAD1, use_bias=False, dtype=self.dtype,
                    name='conv2')(y)
        y = _BN(self.dtype, eps=1.001e-5, name='bn2')(y, train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name='conv3')(y)
        return y + shortcut, taps


class ResNetV2(nn.Module):
    """keras_applications resnet_v2 body returning C1..C5 endpoints.

    ``taps`` maps C2..C4 to (stage index, 0-based block index, tap kind)
    where kind is 'preact_relu' or '1_relu' — the reference addresses
    mid-stage activations by layer name (engine/backbone/base.py:112-125).
    C1 is the raw (biased, un-normalized) stem conv output
    ('conv1_conv'); C5 is post_relu.
    """
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    taps: Any = None  # {'C2': (0, 2, 'preact_relu'), ...}
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        x = StemConv7x7(64, use_bias=True, dtype=self.dtype,
                        name='stem')(x)
        endpoints['C1'] = x
        # keras ZeroPadding2D((1,1)) + valid MaxPool: in the preact family
        # the stem conv output is un-relu'd (can be negative), so keras's
        # zero pad participates in the max — flax's -inf pad does not.
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding='VALID')
        tap_of = {(si, bi, kind): name
                  for name, (si, bi, kind) in (self.taps or {}).items()}
        filters = (64, 128, 256, 512)
        for si, blocks in enumerate(self.stage_blocks):
            last_stride = 2 if si < len(self.stage_blocks) - 1 else 1
            for bi in range(blocks):
                x, taps = V2Block(
                    filters[si],
                    stride=last_stride if bi == blocks - 1 else 1,
                    conv_shortcut=(bi == 0), dtype=self.dtype,
                    name=f'stage{si + 2}_block{bi + 1}')(x, train)
                for kind, t in taps.items():
                    name = tap_of.get((si, bi, kind))
                    if name:
                        endpoints[name] = t
        x = _BN(self.dtype, eps=1.001e-5, name='post_bn')(x, train)
        endpoints['C5'] = nn.relu(x)
        return endpoints


class _Stage(nn.Module):
    num_blocks: int
    filters: int
    stride: int
    block: str = 'bottleneck'
    groups: int = 1
    expansion: int = 4
    use_se: bool = False
    stride_first: bool = False
    conv_bias: bool = False
    bn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu1_first = None
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            if self.block == 'basic':
                x = BasicBlock(self.filters, stride, self.use_se,
                               self.dtype)(x, train)
            else:
                x, relu1 = BottleneckBlock(self.filters, stride, self.groups,
                                           expansion=self.expansion,
                                           use_se=self.use_se,
                                           stride_first=self.stride_first,
                                           conv_bias=self.conv_bias,
                                           bn_eps=self.bn_eps,
                                           dtype=self.dtype)(x, train)
                if i == 0:
                    relu1_first = relu1
        return x, relu1_first


class ResNet(nn.Module):
    """Generic post-activation ResNet/ResNeXt/SE-ResNet body returning
    C1..C5 endpoints."""
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stage_filters: Sequence[int] = (64, 128, 256, 512)
    block: str = 'bottleneck'
    groups: int = 1
    expansion: int = 4
    use_se: bool = False
    stride_first: bool = False
    conv_bias: bool = False
    bn_eps: float = 1e-5
    inner_taps: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        # stem: 7x7/2 conv + BN + ReLU (C1), then 3x3/2 maxpool
        x = StemConv7x7(64, use_bias=self.conv_bias, dtype=self.dtype,
                        name='stem')(x)
        x = _BN(self.dtype, eps=self.bn_eps, name='stem_bn')(x, train)
        x = nn.relu(x)
        endpoints['C1'] = x
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        strides = (1, 2, 2, 2)
        for si, (blocks, filters, stride) in enumerate(
                zip(self.stage_blocks, self.stage_filters, strides)):
            x, relu1 = _Stage(blocks, filters, stride, self.block,
                              self.groups, self.expansion, self.use_se,
                              self.stride_first, self.conv_bias,
                              self.bn_eps, self.dtype,
                              name=f'stage{si + 2}')(x, train)
            if self.inner_taps and si >= 1:
                # seresnext50 (base.py:139-145): C{si+1} is the post-conv1
                # relu inside this stage's first block — same stride as
                # the previous stage's output because the stride sits on
                # the 3x3, after the tap
                endpoints[f'C{si + 1}'] = relu1
            endpoints[f'C{si + 2}'] = x
        return endpoints


def resnet50(dtype=jnp.float32):
    # keras.applications v1: stride on the first 1x1, biased convs
    return ResNet(block='bottleneck', stride_first=True, conv_bias=True,
                  bn_eps=1.001e-5, dtype=dtype)


def resnet50v2(dtype=jnp.float32):
    # taps: conv{2,3,4}_block{3,4,4}_preact_relu (base.py:112-117) — note
    # conv4 tapped mid-stage at block4 of 6
    return ResNetV2(taps={'C2': (0, 2, 'preact_relu'),
                          'C3': (1, 3, 'preact_relu'),
                          'C4': (2, 3, 'preact_relu')}, dtype=dtype)


def resnet101v2(dtype=jnp.float32):
    # taps: conv{2,3,4}_block{3,4,23}_1_relu (base.py:119-125) — the inner
    # 64/128/256-channel activation of each stack's last (strided) block
    return ResNetV2(stage_blocks=(3, 4, 23, 3),
                    taps={'C2': (0, 2, '1_relu'),
                          'C3': (1, 3, '1_relu'),
                          'C4': (2, 22, '1_relu')}, dtype=dtype)


def resnet101(dtype=jnp.float32):
    return ResNet(stage_blocks=(3, 4, 23, 3), block='bottleneck',
                  stride_first=True, conv_bias=True, bn_eps=1.001e-5,
                  dtype=dtype)


def resnext50(dtype=jnp.float32):
    # ResNeXt-50 32x4d: inner widths 128..1024, cardinality 32, expansion 2
    # (engine/backbone/ResNext.py:180-235: stride on the grouped 3x3)
    return ResNet(stage_filters=(128, 256, 512, 1024), block='bottleneck',
                  groups=32, expansion=2, bn_eps=1.001e-5, dtype=dtype)


def seresnet34(dtype=jnp.float32):
    # classification_models pre-activation SE-ResNet34 — the production
    # road-config backbone (road_project/train.py:21-63)
    return CMResNet(stage_blocks=(3, 4, 6, 3), use_se=True, dtype=dtype)


def seresnet50(dtype=jnp.float32):
    # senet.py SEResNetBottleneck: stride on the first 1x1 conv; BN eps
    # 9.9999997e-6 (senet.py:27-34)
    return ResNet(block='bottleneck', use_se=True, stride_first=True,
                  bn_eps=1e-5, dtype=dtype)


def seresnext50(dtype=jnp.float32):
    # senet.py SEResNeXtBottleneck: stride on the grouped 3x3; width =
    # (out/4)*base_width*groups/64 -> inner (128, 256, 512, 1024).
    # inner_taps: the reference's C2-C4 (activation_{16,36,66},
    # base.py:139-145) are the post-conv1 relus inside the NEXT stage's
    # first block, not the stage outputs.
    return ResNet(stage_filters=(128, 256, 512, 1024), block='bottleneck',
                  groups=32, expansion=2, use_se=True, bn_eps=1e-5,
                  inner_taps=True, dtype=dtype)

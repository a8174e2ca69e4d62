"""Semantic segmentation path: ASPP + DeepLab V3+ decoder.

Flax re-design of engine/layers/semantic.py:
  * ``ASPPNetwork`` (semantic.py:93-168): 1x1 branch, one atrous-separable
    branch per rate, global-average-pool branch resized back with
    align_corners=True, concat, 1x1 projection (all GroupNorm + ReLU);
  * ``SegmentationSubNet`` (semantic.py:178-246): 1x1 skip projection,
    upsample ASPP output to skip size, concat, depth x conv blocks, 1x1
    **sigmoid** output (multi-label binary, not softmax — semantic.py:219);
  * ``assign_seg`` (semantic.py:304-311): resize gt to pred size + round.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import AtrousSeparableConv, GroupNorm, HeadBlock, normal_init
from ..ops.resize import resize_bilinear, resize_like


class ASPPNetwork(nn.Module):
    num_features: int = 256
    atrous_rate: Sequence[int] = (6, 12, 18)
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # 1x1 branch
        b0 = nn.Conv(self.num_features, (1, 1), use_bias=False,
                     dtype=self.dtype, name='aspp_1x1')(x)
        b0 = GroupNorm(self.groups, self.dtype)(b0)
        b0 = nn.relu(b0)
        # atrous branches
        branches = [b0]
        for rate in self.atrous_rate:
            branches.append(AtrousSeparableConv(
                self.num_features, dilation_rate=rate, groups=self.groups,
                dtype=self.dtype, name=f'aspp_{rate}')(x))
        # image-level pooling branch
        pool = jnp.mean(x, axis=(-3, -2), keepdims=True)
        pool = nn.Conv(self.num_features, (1, 1), use_bias=False,
                       dtype=self.dtype, name='aspp_pool')(pool)
        pool = nn.relu(pool)
        branches.append(resize_like(pool, x))
        # concat projection
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.num_features, (1, 1), use_bias=False,
                    dtype=self.dtype, name='concat_projection')(y)
        y = GroupNorm(self.groups, self.dtype)(y)
        return nn.relu(y)


class SegmentationSubNet(nn.Module):
    num_classes: int = 3
    num_depth: int = 2
    num_features: int = 256
    num_skip_features: int = 48
    use_separable_conv: bool = False
    expand_ratio: float = 4.0
    use_squeeze_excite: bool = False
    squeeze_ratio: float = 16.0
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, dec_input, skip_input):
        skip = nn.Conv(self.num_skip_features, (1, 1), use_bias=False,
                       dtype=self.dtype, name='skip_projection')(skip_input)
        skip = GroupNorm(self.groups, self.dtype)(skip)
        skip = nn.relu(skip)
        up = resize_like(dec_input, skip)
        x = jnp.concatenate([up, skip], axis=-1)
        x = HeadBlock(self.num_depth, self.num_features,
                      self.use_separable_conv, self.expand_ratio,
                      self.use_squeeze_excite, self.squeeze_ratio,
                      self.groups, self.dtype)(x)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name='seg_output')(x)
        return nn.sigmoid(x)


def assign_seg(gt_seg: jnp.ndarray, seg_pred: jnp.ndarray) -> jnp.ndarray:
    """Resize gt seg [B,H,W,C] to the prediction's size and round."""
    resized = resize_bilinear(gt_seg.astype(jnp.float32),
                              seg_pred.shape[-3], seg_pred.shape[-2],
                              align_corners=True)
    return jnp.round(resized)

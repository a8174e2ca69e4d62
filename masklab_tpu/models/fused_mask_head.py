"""Fused per-box-weight mask head.

The straightforward static-shape port of the reference's per-level
``MaskSubNet`` (instance.py:158-240) runs every level's head over every box
and selects afterwards — (max_k + 1)x the FLOPs. This module removes the
redundancy: per-level parameters are stacked on a leading [L, ...] axis,
each box *gathers its own level's weights*, and the convolutions become
per-box batched GEMMs (XLA dot_general with a batch dimension — MXU-
friendly). One head pass over all boxes, identical math per box.

Supports the default head form (plain Conv3x3-ReLU + GroupNorm stacks);
the separable-conv / squeeze-excite variants fall back to the select-based
MaskSubNet (models/instance.py).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import normal_init


def _patches3x3(x: jnp.ndarray) -> jnp.ndarray:
    """[N, h, w, C] -> [N, h, w, 9, C] of SAME-padded 3x3 neighborhoods."""
    padded = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
    h, w = x.shape[1], x.shape[2]
    rows = []
    for dy in range(3):
        for dx in range(3):
            rows.append(padded[:, dy:dy + h, dx:dx + w, :])
    return jnp.stack(rows, axis=3)


def _per_box_conv3x3(x, kernels, bias):
    """x [N,h,w,Cin], kernels [N,3,3,Cin,F], bias [N,F] -> [N,h,w,F]."""
    patches = _patches3x3(x)                                  # [N,h,w,9,Cin]
    k = kernels.reshape(kernels.shape[0], 9, kernels.shape[3],
                        kernels.shape[4])                     # [N,9,Cin,F]
    out = jnp.einsum('nhwpc,npcf->nhwf', patches, k)
    return out + bias[:, None, None, :]


def _per_box_groupnorm(x, groups, scale, bias, eps=1e-5):
    """GroupNorm with per-box affine params. x [N,h,w,C]; scale/bias [N,C]."""
    n, h, w, c = x.shape
    g = min(groups, c)
    xg = x.reshape(n, h, w, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xg.reshape(n, h, w, c).astype(x.dtype)
    return xn * scale[:, None, None, :] + bias[:, None, None, :]


class FusedMaskSubNet(nn.Module):
    num_levels: int
    num_classes: int
    num_depth: int = 4
    num_features: int = 256
    groups: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, crops: jnp.ndarray, levels: jnp.ndarray):
        """crops [B,K,h,w,Cin] (each box cropped from ITS level),
        levels [B,K] int (-1 = invalid) -> [B,K,2h,2w,num_classes]."""
        levs = self.num_levels
        b, k = crops.shape[0], crops.shape[1]
        lv = jnp.clip(levels.reshape(b * k), 0, levs - 1)
        x = crops.reshape((b * k,) + crops.shape[2:]).astype(self.dtype)

        for d in range(self.num_depth):
            cin = x.shape[-1]
            kern = self.param(f'conv{d}_kernel', normal_init(0.01),
                              (levs, 3, 3, cin, self.num_features),
                              jnp.float32)
            bias = self.param(f'conv{d}_bias', nn.initializers.zeros,
                              (levs, self.num_features), jnp.float32)
            x = _per_box_conv3x3(x, kern[lv].astype(self.dtype),
                                 bias[lv].astype(self.dtype))
            x = nn.relu(x)
            scale = self.param(f'gn{d}_scale', nn.initializers.ones,
                               (levs, self.num_features), jnp.float32)
            gbias = self.param(f'gn{d}_bias', nn.initializers.zeros,
                               (levs, self.num_features), jnp.float32)
            x = _per_box_groupnorm(x, self.groups, scale[lv], gbias[lv])

        # 2x transposed conv (2x2, stride 2): disjoint sub-pixel expansion
        f = self.num_features
        dk = self.param('deconv_kernel', normal_init(0.01),
                        (levs, 2, 2, x.shape[-1], f), jnp.float32)
        db = self.param('deconv_bias', nn.initializers.zeros,
                        (levs, f), jnp.float32)
        up = jnp.einsum('nijc,nabcf->niajbf', x, dk[lv].astype(self.dtype))
        n, h, _, w = up.shape[0], up.shape[1], up.shape[2], up.shape[3]
        up = up.reshape(n, h * 2, w * 2, f) + db[lv][:, None, None, :]
        up = nn.relu(up)

        ok = self.param('output_kernel', normal_init(0.01),
                        (levs, f, self.num_classes), jnp.float32)
        ob = self.param('output_bias', nn.initializers.zeros,
                        (levs, self.num_classes), jnp.float32)
        out = jnp.einsum('nijf,nfc->nijc', up, ok[lv].astype(self.dtype))
        out = nn.sigmoid(out + ob[lv][:, None, None, :])
        out = out.astype(jnp.float32)
        out = out.reshape((b, k) + out.shape[1:])
        valid = (levels >= 0)[:, :, None, None, None]
        return jnp.where(valid, out, 0.0)


def select_crops_by_level(per_level_crops, levels):
    """Pick each box's crop from its routed level.

    per_level_crops: list of [B,K,h,w,C]; levels [B,K] -> [B,K,h,w,C].
    """
    stacked = jnp.stack(per_level_crops, axis=0)            # [L,B,K,...]
    onehot = jax.nn.one_hot(levels, stacked.shape[0], axis=0,
                            dtype=stacked.dtype)            # [L,B,K]
    return jnp.einsum('lbkhwc,lbk->bkhwc', stacked, onehot)

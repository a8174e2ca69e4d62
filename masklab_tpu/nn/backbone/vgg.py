"""VGG16 backbone, flax.

Endpoint taps follow the reference (engine/backbone/base.py:154-160):
C1=block2_conv2 (stride 2), C2=block3_conv3 (stride 4), C3=block4_conv3
(stride 8), C4=block5_conv3 (stride 16), C5=block5_pool (stride 32).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

_CFG = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]


class VGG16(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = {}
        for bi, (convs, ch) in enumerate(_CFG, start=1):
            for ci in range(convs):
                x = nn.Conv(ch, (3, 3), padding='SAME', dtype=self.dtype,
                            name=f'block{bi}_conv{ci + 1}')(x)
                x = nn.relu(x)
            if bi == 2:
                endpoints['C1'] = x
            elif bi == 3:
                endpoints['C2'] = x
            elif bi == 4:
                endpoints['C3'] = x
            elif bi == 5:
                endpoints['C4'] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        endpoints['C5'] = x
        return endpoints

"""In-graph backbone input preprocessing.

Pure-function equivalent of ``BackBonePreProcess``
(engine/backbone/base.py:22-84): optional RGB->BGR swap, ImageNet mean
shift, and one of four normalize modes. The per-backbone combination table
mirrors ``load_backbone`` (base.py:190-279), where each combo was selected
by the snake-image preprocessing search (test/backbone_test/READMD.md).
"""
from __future__ import annotations

import jax.numpy as jnp

_MEAN_RGB = (123.68, 116.779, 103.939)
_STD_RGB = (0.225, 0.224, 0.229)

# backbone_type -> (rgb, mean_shift, normalize)
PREPROCESS_COMBOS = {
    'resnet50': (False, True, 0),
    'resnet50v2': (True, True, 2),
    'resnet101v2': (True, False, 2),
    'resnext50': (True, True, 2),
    'seresnet50': (True, True, 3),
    'seresnet34': (True, False, 0),
    'seresnext50': (True, True, 3),
    'vgg16': (False, True, 0),
    'mobilenet': (False, False, 2),
    'mobilenetv2': (False, False, 2),
    'efficientnetb2': (True, True, 3),
    'efficientnetb3': (True, True, 3),
    'efficientnetb4': (True, True, 3),
}


def preprocess_input(images: jnp.ndarray, rgb: bool = True,
                     mean_shift: bool = False, normalize: int = 0) -> jnp.ndarray:
    """Apply a preprocessing combo to RGB [0, 255] images [..., H, W, 3]."""
    x = images.astype(jnp.float32)
    if rgb:
        mean = jnp.asarray(_MEAN_RGB, jnp.float32)
        std = jnp.asarray(_STD_RGB, jnp.float32)
    else:
        x = x[..., ::-1]
        mean = jnp.asarray(_MEAN_RGB[::-1], jnp.float32)
        std = jnp.asarray(_STD_RGB[::-1], jnp.float32)
    if mean_shift:
        x = x - mean
    if normalize == 1:
        return x / 255.0
    if normalize == 2:
        return x / 127.5 if mean_shift else x / 127.5 - 1.0
    if normalize == 3:
        return (x / 255.0) / std
    return x


def preprocess_for(backbone_type: str, images: jnp.ndarray) -> jnp.ndarray:
    rgb, mean_shift, normalize = PREPROCESS_COMBOS[backbone_type.lower()]
    return preprocess_input(images, rgb=rgb, mean_shift=mean_shift,
                            normalize=normalize)

"""Backbone zoo: registry, extras (P6/P7), preprocessing, freeze masks.

TPU-native equivalent of ``engine/backbone/base.py``:
  * ``BACKBONE_REGISTRY`` replaces the Keras model zoo + BACKBONE_LAYERS
    endpoint map (base.py:104-182) — each flax body returns C1..C5 directly;
  * ``BackboneNetwork`` applies the per-backbone preprocessing combo
    in-graph (base.py:190-279), selects the configured endpoints, and
    appends the stride-64/128 P6/P7 extra convs with GroupNorm between them
    (base.py:292-314; note P6 output is the *pre*-GroupNorm conv activation
    and mobilenet uses the zero-pad + VALID variant);
  * ``freeze_mask`` replaces ``freeze_backbone`` (base.py:319-345): instead
    of mutating layer.trainable it produces a boolean pytree over parameters
    for optimizer masking (the functional JAX equivalent).
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import GroupNorm
from .efficientnet import efficientnet_b2, efficientnet_b3, efficientnet_b4
from .mobilenet import MobileNetV1
from .mobilenetv2 import MobileNetV2
from .preprocess import PREPROCESS_COMBOS, preprocess_for
from .resnet import (resnet50, resnet50v2, resnet101, resnet101v2, resnext50,
                     seresnet34, seresnet50, seresnext50)
from .vgg import VGG16

# name -> (body factory, prior-grid padding mode)
BACKBONE_REGISTRY: Dict[str, Callable] = {
    'mobilenet': lambda dtype: MobileNetV1(dtype=dtype),
    'mobilenetv2': lambda dtype: MobileNetV2(dtype=dtype),
    'resnet50': lambda dtype: resnet50(dtype),
    'resnet50v2': lambda dtype: resnet50v2(dtype),
    'resnet101v2': lambda dtype: resnet101v2(dtype),
    'resnext50': lambda dtype: resnext50(dtype),
    'seresnet34': lambda dtype: seresnet34(dtype),
    'seresnet50': lambda dtype: seresnet50(dtype),
    'seresnext50': lambda dtype: seresnext50(dtype),
    'vgg16': lambda dtype: VGG16(dtype=dtype),
    'efficientnetb2': lambda dtype: efficientnet_b2(dtype),
    'efficientnetb3': lambda dtype: efficientnet_b3(dtype),
    'efficientnetb4': lambda dtype: efficientnet_b4(dtype),
}


def grid_padding(backbone_type: str) -> str:
    """'valid' (floor) grid rounding for mobilenet, 'same' otherwise
    (PriorLayer padding parameter, detection.py:240-243)."""
    return 'valid' if backbone_type.lower() == 'mobilenet' else 'same'


class BackboneNetwork(nn.Module):
    """Preprocess -> body -> endpoint selection -> P6/P7 extras.

    Returns a dict {name: tensor} for every name in ``backbone_outputs``.
    """
    backbone_type: str = 'resnet50'
    backbone_outputs: Sequence[str] = ('C3', 'C4', 'C5', 'P6', 'P7')
    num_features: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        name = self.backbone_type.lower()
        if name not in BACKBONE_REGISTRY:
            raise NotImplementedError(
                f'backbone_type must be one of {sorted(BACKBONE_REGISTRY)}')
        x = preprocess_for(name, images)
        body = BACKBONE_REGISTRY[name](self.dtype)
        endpoints = body(x, train=train)

        outputs = {k: v for k, v in endpoints.items()
                   if k in self.backbone_outputs}
        # the last included C endpoint feeds the extras (base.py:294,307)
        c_taps = [endpoints[k] for k in ('C1', 'C2', 'C3', 'C4', 'C5')
                  if k in self.backbone_outputs]
        if not c_taps:
            raise ValueError(
                'backbone_outputs must include at least one C1-C5 '
                f'endpoint (got {tuple(self.backbone_outputs)}); the '
                'P6/P7 extras are built from the last included C '
                'endpoint (base.py:294,307)')
        last_c = c_taps[-1]

        def check_nonempty(level_name, t):
            if t.shape[-3] == 0 or t.shape[-2] == 0:
                raise ValueError(
                    f'input too small: extras level {level_name} came out '
                    f'{t.shape[-3]}x{t.shape[-2]} — empty feature maps '
                    'produce NaN GroupNorm statistics. Use a larger input '
                    'or drop P6/P7 from backbone_outputs.')

        need_extras = ('P6' in self.backbone_outputs or
                       'P7' in self.backbone_outputs)
        if need_extras:
            if name == 'mobilenet':
                z6 = jnp.pad(last_c, [(0, 0), (0, 1), (0, 1), (0, 0)])
                p6 = nn.Conv(self.num_features, (3, 3), strides=(2, 2),
                             padding='VALID', dtype=self.dtype,
                             name='extras_P6_conv')(z6)
            else:
                p6 = nn.Conv(self.num_features, (3, 3), strides=(2, 2),
                             padding='SAME', dtype=self.dtype,
                             name='extras_P6_conv')(last_c)
            p6 = nn.relu(p6)
            check_nonempty('P6', p6)
            if 'P6' in self.backbone_outputs:
                outputs['P6'] = p6
            if 'P7' in self.backbone_outputs:
                # reference GroupNormalization default groups=32
                g6 = GroupNorm(32, self.dtype, name='extras_P6_norm')(p6)
                if name == 'mobilenet':
                    z7 = jnp.pad(g6, [(0, 0), (0, 1), (0, 1), (0, 0)])
                    p7 = nn.Conv(self.num_features, (3, 3), strides=(2, 2),
                                 padding='VALID', dtype=self.dtype,
                                 name='extras_P7_conv')(z7)
                else:
                    p7 = nn.Conv(self.num_features, (3, 3), strides=(2, 2),
                                 padding='SAME', dtype=self.dtype,
                                 name='extras_P7_conv')(g6)
                check_nonempty('P7', p7)
                outputs['P7'] = nn.relu(p7)
        return outputs


# ---- progressive-unfreeze masks ----

# per family: map freeze depth 'C1'..'C5' -> regex matching *frozen* top-level
# submodule names inside the backbone scope.
_RESNET_STAGE_OF_DEPTH = {'C1': 1, 'C2': 2, 'C3': 3, 'C4': 4, 'C5': 5}
_MOBILENET_LAST_FROZEN_BLOCK = {'C1': 1, 'C2': 3, 'C3': 5, 'C4': 11, 'C5': 13}
_VGG_LAST_FROZEN_BLOCK = {'C1': 2, 'C2': 3, 'C3': 4, 'C4': 5, 'C5': 5}
# efficientnet taps sit in the first block of stages 1/2/3/5 -> everything
# strictly before that stage freezes at the corresponding depth
_EFFNET_LAST_FROZEN_STAGE = {'C1': 0, 'C2': 1, 'C3': 2, 'C4': 4, 'C5': 6}


def module_frozen(backbone_type: str, module_name: str,
                  freeze_depth: str) -> bool:
    """Is a backbone submodule (e.g. 'stage3', 'dw7', 'block2_conv1') frozen
    at the given depth? Extras (P6/P7) are never frozen, matching the
    reference where layers after the C5 tap stay trainable (base.py:337-341).
    """
    if freeze_depth == 'C0':
        return False
    if module_name.startswith('extras'):
        return False
    bt = backbone_type.lower()
    if bt == 'seresnet34':
        # classification_models pre-activation family: the C2-C4 taps are
        # the pre-activation ReLU *inside* the next stage's first unit
        # (base.py:126-132), so at depth Ck stages <k freeze fully and
        # stage k's unit 1 freezes only its preact BN ('bn1'), mirroring
        # freeze_backbone's layer-order cutoff (base.py:319-345).
        head, _, child = module_name.partition('/')
        if head in ('bn_data', 'conv0', 'bn0'):
            return True
        if freeze_depth == 'C5':
            return True
        if head == 'bn1':
            return False
        m = re.match(r'stage(\d+)_unit(\d+)$', head)
        if m:
            stage, unit = int(m.group(1)), int(m.group(2))
            depth = int(freeze_depth[1])
            if stage < depth:
                return True
            # in-unit preact rule applies to the C2-C4 taps only: the C1
            # tap is 'relu0' (base.py:127), BEFORE stage1, so
            # stage1_unit1 stays fully trainable at C1 (round-4 review)
            if stage == depth and unit == 1 and depth >= 2:
                return child.partition('/')[0] == 'bn1'
        return False
    if bt in ('resnet50v2', 'resnet101v2'):
        # keras v2 taps sit mid-stage (base.py:112-125): at depth Ck the
        # layer-order cutoff (base.py:336-340) freezes whole blocks before
        # the tap block and, inside it, only the layers built before the
        # tap activation — preact_bn for the preact_relu taps (50v2),
        # preact_bn+conv1+bn1 for the _1_relu taps (101v2).
        if module_name.startswith('stem'):
            return True
        if freeze_depth == 'C5':
            return True
        if freeze_depth == 'C1' or module_name.startswith('post_bn'):
            return False
        tap = {'resnet50v2': {2: (2, 3), 3: (3, 4), 4: (4, 4)},
               'resnet101v2': {2: (2, 3), 3: (3, 4), 4: (4, 23)}}
        ts, tb = tap[bt][int(freeze_depth[1])]
        head, _, child = module_name.partition('/')
        m = re.match(r'stage(\d+)_block(\d+)$', head)
        if not m:
            return False
        stage, block = int(m.group(1)), int(m.group(2))
        if (stage, block) < (ts, tb):
            return True
        if (stage, block) == (ts, tb):
            sub = child.partition('/')[0]
            frozen = ({'preact_bn'} if bt == 'resnet50v2'
                      else {'preact_bn', 'conv1', 'bn1'})
            return sub in frozen
        return False
    if bt == 'mobilenetv2':
        # taps sit at the first block of stages 1/2/3/5, same layout as
        # efficientnet's stage table
        if module_name.startswith('stem'):
            return True
        if module_name.startswith('top'):
            return freeze_depth == 'C5'
        m = re.match(r'stage(\d+)_', module_name)
        if m:
            return int(m.group(1)) <= _EFFNET_LAST_FROZEN_STAGE[freeze_depth]
        return False
    if bt == 'mobilenet':
        if module_name.startswith('stem'):
            return True
        m = re.match(r'(?:dw|pw)(\d+)', module_name)
        if m:
            return int(m.group(1)) <= _MOBILENET_LAST_FROZEN_BLOCK[freeze_depth]
        return False
    if bt == 'vgg16':
        m = re.match(r'block(\d+)_', module_name)
        if m:
            return int(m.group(1)) <= _VGG_LAST_FROZEN_BLOCK[freeze_depth]
        return False
    if bt.startswith('efficientnet'):
        if module_name.startswith('stem'):
            return True
        if module_name.startswith('top'):
            return freeze_depth == 'C5'
        m = re.match(r'stage(\d+)_block(\d+)', module_name)
        if m:
            stage, block = int(m.group(1)), int(m.group(2))
            last = _EFFNET_LAST_FROZEN_STAGE[freeze_depth]
            if stage <= last:
                return True
            # the C1-C4 taps are the expand ACTIVATION inside the next
            # stage's first block (block{2,3,4,6}a_expand_activation,
            # base.py:168-181): the reference's layer-order cutoff also
            # freezes that block's expand conv + BN, which are built
            # BEFORE the tap (same partial-block rule as seresnext50;
            # round-4 review)
            if freeze_depth != 'C5' and stage == last + 1 and block == 0:
                parts = module_name.split('/')
                return (len(parts) >= 2
                        and parts[1] in ('Conv_0', '_BN_0'))
        return False
    if bt == 'seresnext50':
        # inner taps (base.py:139-145): C2-C4 are the post-conv1 relus
        # inside the NEXT stage's first block, so the reference's
        # layer-order cutoff (base.py:319-345) additionally freezes that
        # block's conv1 + bn1 — Conv_0/_BN_0 here — at depths C2-C4
        # (everything built before the tap activation; ADVICE r3).
        if module_name.startswith('stem'):
            return True
        m = re.match(r'stage(\d+)', module_name)
        if not m:
            return False
        stage = int(m.group(1))
        depth = _RESNET_STAGE_OF_DEPTH[freeze_depth]
        if stage <= depth:
            return True
        if freeze_depth in ('C2', 'C3', 'C4') and stage == depth + 1:
            parts = module_name.split('/')
            return (len(parts) >= 3 and parts[1] == 'BottleneckBlock_0'
                    and parts[2] in ('Conv_0', '_BN_0'))
        return False
    # resnet family: stem + stage{2..5}
    if module_name.startswith('stem'):
        return True
    m = re.match(r'stage(\d+)', module_name)
    if m:
        return int(m.group(1)) <= _RESNET_STAGE_OF_DEPTH[freeze_depth]
    return False


__all__ = ['BACKBONE_REGISTRY', 'BackboneNetwork', 'grid_padding',
           'module_frozen', 'preprocess_for', 'PREPROCESS_COMBOS']

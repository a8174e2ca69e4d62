"""Train state and progressive-freeze masks.

The reference's trainer kept weights inside a Keras graph with per-layer
``trainable`` flags mutated between phases (engine/train.py:117-238); here
state is explicit: a flax.struct dataclass holding params, BatchNorm
statistics, optimizer state, and the self-adjusting BoxLoss moving
statistics (the reference stored those as non-trainable weights inside the
loss layer, engine/losses.py:67-74).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import BoxLossState
from ..nn.backbone import module_frozen


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    box_loss_state: BoxLossState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation,
               box_beta: float = 0.11) -> 'TrainState':
        params = variables['params']
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get('batch_stats', {}),
                   opt_state=tx.init(params),
                   box_loss_state=BoxLossState.create(box_beta), tx=tx)

    def apply_gradients(self, grads) -> 'TrainState':
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)

    @property
    def variables(self) -> Dict:
        v = {'params': self.params}
        if self.batch_stats:
            v['batch_stats'] = self.batch_stats
        return v


def trainable_mask(params, backbone_type: str, freeze_depth: str = 'C0'):
    """Boolean pytree over params: True = trainable at this phase depth.

    Replaces ``freeze_backbone`` (base.py:319-345): backbone submodules up
    to the freeze depth are frozen; heads and P6/P7 extras stay trainable.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_trainable(path) -> bool:
        keys = [getattr(p, 'key', str(p)) for p in path]
        if not keys or keys[0] != 'backbone':
            return True
        # ('backbone', '<Body>_0', '<stage>', ...) or ('backbone', 'extras_*')
        if len(keys) >= 2 and keys[1].startswith('extras'):
            module = keys[1]
        elif len(keys) >= 3:
            # joined subpath below the body so families with sub-unit
            # freeze granularity (seresnet34's stage-first preact BN)
            # can address children
            module = '/'.join(keys[2:])
        else:
            module = keys[-1]
        return not module_frozen(backbone_type, module, freeze_depth)

    leaves = {jax.tree_util.keystr(path): path_trainable(path)
              for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: leaves[jax.tree_util.keystr(path)], params)

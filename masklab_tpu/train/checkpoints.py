"""Checkpointing via orbax.

Replaces the reference's ``SaveInferenceModel`` h5 dumps
(engine/callbacks.py:143-158): each epoch the *inference-relevant* state
(params + batch stats) is saved under ``"{loss:.5f}-{epoch}"``; the best
checkpoint is picked by PARSING the loss (deliberate deviation — the
reference's lexical sort, road_project/train.py:84-85, misorders across
powers of ten; see best_checkpoint).
Unlike the reference, optimizer state and the BoxLoss moving statistics are
ALSO saved (full resume — the reference had none, SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import ModelConfiguration


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckpointManager:
    def __init__(self, save_dir: str, config: ModelConfiguration = None):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()
        if config is not None:
            config.save_json(os.path.join(self.save_dir, 'config.json'))

    def save_epoch(self, state, loss: float, epoch: int) -> str:
        """Save ``"{loss:.5f}-{epoch}"`` (callbacks.py:152-158 naming)."""
        name = f'{loss:.5f}-{epoch:02d}'
        path = os.path.join(self.save_dir, name)
        payload = {
            'params': _to_host(state.params),
            'batch_stats': _to_host(state.batch_stats),
            'opt_state': _to_host(state.opt_state),
            'box_loss_state': _to_host(state.box_loss_state._asdict()),
            'step': int(state.step),
        }
        self._ckptr.save(path, payload, force=True)
        return path

    def best_checkpoint(self) -> Optional[str]:
        """Lowest-loss checkpoint by PARSED loss value.

        Deliberate deviation: the reference sorts the h5 names lexically
        (road_project/train.py:84-85), which misorders once losses span a
        power of ten — sorted(['12.31442-00', '3.40781-03'])[0] is the
        WORSE epoch-0 model ('1' < '3'), silently pinning MLflow and the
        serving hot-reload to it. The loss is parsed from the
        '{loss:.5f}-{epoch}' name instead; nan losses rank last.

        Orbax writes in-progress saves as '<name>.orbax-checkpoint-tmp-*'
        siblings before the atomic rename; they must never be picked up
        (the serving CheckpointWatcher polls this mid-training)."""
        names = [n for n in os.listdir(self.save_dir)
                 if os.path.isdir(os.path.join(self.save_dir, n))
                 and '-' in n and 'tmp' not in n]
        if not names:
            return None

        def key(name):
            try:
                loss = float(name.rsplit('-', 1)[0])
            except ValueError:
                return (2, 0.0, name)          # unparseable: last
            if np.isnan(loss):
                return (1, 0.0, name)          # nan loss: after real ones
            return (0, loss, name)
        return os.path.join(self.save_dir, min(names, key=key))

    def restore(self, path: Optional[str] = None) -> Dict:
        path = path or self.best_checkpoint()
        if path is None:
            raise FileNotFoundError(f'no checkpoints in {self.save_dir}')
        return self._ckptr.restore(path)

    def restore_variables(self, path: Optional[str] = None) -> Dict:
        """Just what inference needs: {'params', 'batch_stats'}."""
        payload = self.restore(path)
        out = {'params': payload['params']}
        if payload.get('batch_stats'):
            out['batch_stats'] = payload['batch_stats']
        return out

    def restore_state(self, state_template, path: Optional[str] = None):
        """Full training resume: rebuild a TrainState from a checkpoint.

        ``state_template`` is a freshly-created TrainState (same model +
        optimizer) whose pytree structure guides the restore. The reference
        had NO optimizer-state resume (SURVEY.md §5 — phases always
        restarted the optimizer); here everything round-trips.
        """
        import jax.numpy as jnp
        from flax import serialization

        from ..losses import BoxLossState

        payload = self.restore(path)
        # from_state_dict maps the stored plain dicts back onto the
        # template's containers (NamedTuple optimizer states etc.)
        opt_state = serialization.from_state_dict(
            state_template.opt_state, payload['opt_state'])
        params = serialization.from_state_dict(state_template.params,
                                               payload['params'])
        batch_stats = serialization.from_state_dict(
            state_template.batch_stats, payload['batch_stats'])
        return state_template.replace(
            step=jnp.asarray(payload['step'], jnp.int32),
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            box_loss_state=BoxLossState(
                moving_mean=jnp.asarray(
                    payload['box_loss_state']['moving_mean'], jnp.float32),
                moving_var=jnp.asarray(
                    payload['box_loss_state']['moving_var'], jnp.float32)))

    def load_config(self) -> Optional[ModelConfiguration]:
        """The config snapshot saved next to the weights (train.py:31-32).
        The model MUST be rebuilt from this, not from fresh CLI defaults —
        the reference had the same contract (config.json travels with the
        h5, serving.py:131-137)."""
        path = os.path.join(self.save_dir, 'config.json')
        if os.path.exists(path):
            return ModelConfiguration.load_json(path)
        return None

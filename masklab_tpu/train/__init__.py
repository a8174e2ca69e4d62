"""Training runtime: optimizers, schedules, train state and steps."""
from .optimizers import adamw, cyclic_lr, masked_updates, rectified_adam
from .state import TrainState, trainable_mask
from .steps import compute_losses, make_eval_step, make_train_step

__all__ = ['adamw', 'rectified_adam', 'cyclic_lr', 'masked_updates',
           'TrainState', 'trainable_mask', 'compute_losses',
           'make_train_step', 'make_eval_step']

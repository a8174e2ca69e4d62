"""Optimizers and LR schedules.

Exact functional ports of the reference's custom TF1 Keras optimizers
(engine/optimizers.py) as optax GradientTransformations, plus the cyclic LR
policy (engine/callbacks.py:13-140) as an optax-style schedule:

  * ``adamw`` — decoupled weight decay scaled by ``lr / init_lr``
    (optimizers.py:11-92, the (1/6)..(6/6) comments);
  * ``rectified_adam`` — RAdam with the ``N_sma > 5`` rectification switch
    and optional decoupled weight decay (optimizers.py:94-210);
  * ``cyclic_lr`` — triangular / triangular2 / exp_range cyclical schedule
    (callbacks.py:118-126).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Union[float, Callable[[jnp.ndarray], jnp.ndarray]]


def _lr_at(learning_rate: Schedule, count: jnp.ndarray) -> jnp.ndarray:
    if callable(learning_rate):
        return jnp.asarray(learning_rate(count), jnp.float32)
    return jnp.asarray(learning_rate, jnp.float32)


class _AdamState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def adamw(learning_rate: Schedule, b1: float = 0.9, b2: float = 0.999,
          weight_decay: float = 1e-4, eps: float = 1e-8,
          init_lr: Optional[float] = None) -> optax.GradientTransformation:
    """AdamW with the reference's ``eta_t = lr / init_lr`` decay scaling."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _AdamState(jnp.zeros((), jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = _lr_at(learning_rate, state.count)
        lr0 = jnp.asarray(init_lr if init_lr is not None
                          else _lr_at(learning_rate, jnp.zeros((), jnp.int32)),
                          jnp.float32)
        eta_t = lr / jnp.maximum(lr0, 1e-30)
        lr_t = lr * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, grads)
        updates = jax.tree_util.tree_map(
            lambda m, v, p: -(lr_t * m / (jnp.sqrt(v) + eps)
                              + eta_t * weight_decay * p),
            mu, nu, params)
        return updates, _AdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def rectified_adam(learning_rate: Schedule, b1: float = 0.9,
                   b2: float = 0.999, eps: float = 1e-7,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam matching engine/optimizers.py:142-199."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return _AdamState(jnp.zeros((), jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        t = count.astype(jnp.float32)
        lr = _lr_at(learning_rate, state.count)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * jnp.square(g), state.nu, grads)
        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_sma_max - 2.0 * t * beta2_t / (1.0 - beta2_t)
        rect = jnp.sqrt(jnp.maximum(
            (1.0 - beta2_t) * (n_sma - 4.0) / (n_sma_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_sma_max / (n_sma_max - 2.0), 0.0))
        step_gt = lr * rect / (1.0 - b1 ** t)
        step_lt = lr / (1.0 - b1 ** t)
        use_rect = n_sma > 5.0

        def upd(m, v, p):
            delta_gt = step_gt * m / (jnp.sqrt(v) + eps)
            delta_lt = step_lt * m
            delta = jnp.where(use_rect, delta_gt, delta_lt)
            wd = weight_decay * lr * p
            return -(delta + wd)

        updates = jax.tree_util.tree_map(upd, mu, nu, params)
        return updates, _AdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def cyclic_lr(base_lr: float, max_lr: float, step_size: float,
              mode: str = 'triangular', gamma: float = 1.0) -> Callable:
    """Cyclical learning-rate schedule (callbacks.py:118-126)."""

    def schedule(step):
        it = jnp.asarray(step, jnp.float32)
        cycle = jnp.floor(1.0 + it / (2.0 * step_size))
        x = jnp.abs(it / step_size - 2.0 * cycle + 1.0)
        amp = jnp.maximum(0.0, 1.0 - x)
        if mode == 'triangular':
            scale = 1.0
        elif mode == 'triangular2':
            scale = 1.0 / (2.0 ** (cycle - 1.0))
        elif mode == 'exp_range':
            scale = gamma ** it
        else:
            raise ValueError(f'unknown cyclic mode: {mode}')
        return base_lr + (max_lr - base_lr) * amp * scale

    return schedule


def masked_updates(mask_tree) -> optax.GradientTransformation:
    """Zero the final updates of frozen parameters.

    The functional equivalent of Keras ``layer.trainable = False``
    (engine/backbone/base.py:319-345): masked *after* the optimizer so
    weight decay cannot move frozen parameters either. ``mask_tree`` is a
    pytree of bools matching params: True = trainable.
    """

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        updates = jax.tree_util.tree_map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask_tree)
        return updates, state

    return optax.GradientTransformation(init, update)

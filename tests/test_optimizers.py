"""Optimizer math vs hand-computed reference formulas; cyclic LR shape."""
import numpy as np

import jax.numpy as jnp
import optax

from masklab_tpu.train import adamw, cyclic_lr, masked_updates, rectified_adam


def test_adamw_first_step():
    lr, wd, b1, b2, eps = 0.01, 1e-4, 0.9, 0.999, 1e-8
    tx = adamw(lr, b1, b2, wd, eps, init_lr=lr)
    params = {'w': jnp.asarray([1.0, -2.0])}
    grads = {'w': jnp.asarray([0.5, 0.5])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)
    # t=1: m=(1-b1)g, v=(1-b2)g^2, lr_t=lr*sqrt(1-b2)/(1-b1)
    m = 0.1 * 0.5
    v = 0.001 * 0.25
    lr_t = lr * np.sqrt(1 - b2) / (1 - b1)
    expect = np.asarray([1.0, -2.0]) - lr_t * m / (np.sqrt(v) + eps) \
        - 1.0 * wd * np.asarray([1.0, -2.0])
    np.testing.assert_allclose(np.asarray(new['w']), expect, rtol=1e-5)


def test_rectified_adam_early_steps_use_unrectified_path():
    # for t small, N_sma <= 5 -> p -= lr/(1-b1^t) * m
    lr, b1 = 0.01, 0.9
    tx = rectified_adam(lr, b1=b1)
    params = {'w': jnp.asarray([1.0])}
    grads = {'w': jnp.asarray([2.0])}
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    m = (1 - b1) * 2.0
    expect = -lr / (1 - b1 ** 1) * m
    np.testing.assert_allclose(np.asarray(updates['w']), expect, rtol=1e-5)


def test_rectified_adam_late_steps_rectify():
    tx = rectified_adam(0.01)
    params = {'w': jnp.asarray([1.0])}
    state = tx.init(params)
    up = None
    for _ in range(10):
        up, state = tx.update({'w': jnp.asarray([1.0])}, state, params)
    b2 = 0.999
    t = 10.0
    n_sma_max = 2 / (1 - b2) - 1
    beta2_t = b2 ** t
    n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)
    assert n_sma > 5  # rectified branch active by t=10
    assert np.isfinite(np.asarray(up['w'])).all()


def test_cyclic_lr_triangle():
    sched = cyclic_lr(1e-4, 1e-3, step_size=10)
    lrs = np.asarray([sched(i) for i in range(41)])
    np.testing.assert_allclose(lrs[0], 1e-4)
    np.testing.assert_allclose(lrs[10], 1e-3)
    np.testing.assert_allclose(lrs[20], 1e-4)
    np.testing.assert_allclose(lrs[30], 1e-3)
    assert lrs.max() <= 1e-3 + 1e-9 and lrs.min() >= 1e-4 - 1e-9


def test_cyclic_lr_triangular2_halves():
    sched = cyclic_lr(0.0, 1.0, step_size=10, mode='triangular2')
    np.testing.assert_allclose(sched(10), 1.0)
    np.testing.assert_allclose(sched(30), 0.5)


def test_masked_updates_zeroes_frozen():
    mask = {'a': True, 'b': False}
    tx = optax.chain(optax.sgd(1.0), masked_updates(mask))
    params = {'a': jnp.ones(2), 'b': jnp.ones(2)}
    grads = {'a': jnp.ones(2), 'b': jnp.ones(2)}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates['a']), -1.0)
    np.testing.assert_allclose(np.asarray(updates['b']), 0.0)

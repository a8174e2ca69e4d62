"""Profiling utilities: timers and jax.profiler trace capture."""
import os

import jax
import jax.numpy as jnp

from masklab_tpu.utils import device_trace, timed_blocked


def test_timed_blocked_returns_positive():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((128, 128))
    dt = timed_blocked(f, x, iters=3, warmup=1)
    assert dt > 0


def test_device_trace_writes_artifacts(tmp_path):
    log_dir = str(tmp_path / 'trace')
    f = jax.jit(lambda x: jnp.sum(x * x))
    with device_trace(log_dir):
        f(jnp.ones((64, 64))).block_until_ready()
    # a plugins/profile/<run>/ directory with trace artifacts appears
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, 'profiler wrote no artifacts'

"""Tracing / profiling utilities.

The reference had no systematic profiling — only wall-clock prints around
build stages (SURVEY.md §5). Here: a stage timer with the same ergonomics
plus first-class ``jax.profiler`` integration for TPU traces viewable in
TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import jax


class StageTimer:
    """Named wall-clock stages; replaces the reference's ad-hoc
    ``time.time()`` print brackets (retinamasklab.py:505-638)."""

    def __init__(self, log_fn=print):
        self.log = log_fn
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            self.stages[name] = self.stages.get(name, 0.0) + elapsed
            if self.log:
                self.log(f'[{name}] {elapsed:.3f}s')

    def summary(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.stages.items()})


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TPU trace: ``with device_trace('/tmp/trace'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_blocked(fn, *args, iters: int = 10, warmup: int = 2,
                  **kwargs) -> float:
    """Median-free steady-state seconds/iteration with device sync."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def enable_compilation_cache(path: str = '/root/.jax_cache') -> None:
    """Persistent XLA compile cache (remote TPU compiles are expensive)."""
    jax.config.update('jax_compilation_cache_dir', path)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

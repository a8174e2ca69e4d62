"""Utilities: profiling, tracing, keras-weight import."""
from .profiling import (StageTimer, device_trace, enable_compilation_cache,
                        timed_blocked)

__all__ = ['StageTimer', 'device_trace', 'timed_blocked',
           'enable_compilation_cache']

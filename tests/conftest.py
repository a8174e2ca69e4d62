"""Test harness: force an 8-device virtual CPU mesh.

Tests exercise multi-chip sharding without TPU hardware by asking XLA for
eight host devices (the TPU analog of multi-node testing without a cluster —
SURVEY.md §4).
"""
import os

# the session environment pins JAX_PLATFORMS=axon (the TPU tunnel); tests
# must run on the virtual CPU mesh, so override unconditionally.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '3')

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon jax plugin overrides JAX_PLATFORMS from the environment, so pin
# the platform through the config API before any backend initializes
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# persistent compile cache: the test host has one core and model-sized
# XLA compiles dominate suite time; cache them across runs
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache_cpu')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
assert len(jax.devices()) >= 8, (
    'tests need the 8-device virtual CPU mesh; got '
    f'{jax.devices()}')

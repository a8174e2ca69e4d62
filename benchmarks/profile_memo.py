"""Detect execution memoization on the axon runtime: time the same sort
with (a) one input repeated, (b) rotating distinct inputs, (c) per-call
block_until_ready."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    b, c, n, k = 8, 6, 81840, 256
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.rand(b, c, n), jnp.float32) for _ in range(8)]
    fn = jax.jit(lambda v: jax.lax.top_k(v, k))
    jax.block_until_ready(fn(xs[0]))

    rows = {}
    iters = 32
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(xs[0])
    jax.block_until_ready(out)
    rows['same_input_ms'] = round((time.perf_counter() - t0) / iters * 1000, 2)

    for x in xs:
        jax.block_until_ready(fn(x))  # warm any per-input path
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(xs[i % 8])
    jax.block_until_ready(out)
    rows['varied_input_ms'] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)

    t0 = time.perf_counter()
    for i in range(iters):
        jax.block_until_ready(fn(xs[i % 8]))
    rows['varied_blocked_ms'] = round(
        (time.perf_counter() - t0) / iters * 1000, 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

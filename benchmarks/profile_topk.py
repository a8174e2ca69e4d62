"""Calibrate selection primitives at the NMS shape: full sort, top_k,
approx_max_k, count-above reduce, cumsum — on [8, 6, 81840]."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np

    b, c, n, k = 8, 6, 81840, 256
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, c, n), jnp.float32)

    rows = {}
    rows['topk_ms'] = round(timeit(
        jax.jit(lambda v: jax.lax.top_k(v, k)), x), 2)
    rows['sort_ms'] = round(timeit(
        jax.jit(lambda v: jnp.sort(v, axis=-1)), x), 2)
    rows['approx_ms'] = round(timeit(
        jax.jit(lambda v: jax.lax.approx_max_k(v, k)), x), 2)
    rows['count_above_ms'] = round(timeit(
        jax.jit(lambda v: jnp.sum(v >= 0.5, axis=-1)), x), 2)
    rows['cumsum_ms'] = round(timeit(
        jax.jit(lambda v: jnp.cumsum(v, axis=-1)), x), 2)
    rows['argsort_small_ms'] = round(timeit(
        jax.jit(lambda v: jnp.argsort(v[..., :1536], axis=-1)), x), 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

"""Pinpoint the 3 ms gap: real batched_class_aware_nms vs re-implementation."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=50):
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
    from masklab_tpu.ops import nms as nms_mod
    from masklab_tpu.ops.boxes import cxcywh_to_yxyx
    from masklab_tpu.ops.nms import batched_class_aware_nms, nms_keep_mask

    b, n, c, kc = 8, 49104, 6, 256
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(
        np.stack([rng.rand(b, n) * 512, rng.rand(b, n) * 512,
                  rng.rand(b, n) * 120 + 8, rng.rand(b, n) * 120 + 8],
                 axis=-1), jnp.float32)
    dense_scores = jnp.asarray(rng.rand(b, n, c) * 0.5 + 0.5, jnp.float32)
    rows = {}

    real = jax.jit(lambda s, bx: batched_class_aware_nms(
        s, bx, min_confidence=0.5, nms_iou_threshold=0.4,
        post_iou_threshold=0.65, max_outputs=100, candidates_per_class=kc))
    rows['real_ms'] = round(timeit(real, dense_scores, boxes), 2)

    # identical code path, but without the inner @jit wrapper
    inner = nms_mod.class_aware_nms.__wrapped__

    nojit = jax.jit(lambda s, bx: jax.vmap(
        lambda cc, bb: inner(cc, bb, min_confidence=0.5,
                             nms_iou_threshold=0.4, post_iou_threshold=0.65,
                             max_outputs=100, candidates_per_class=kc))(
                                 s, bx))
    rows['nojit_ms'] = round(timeit(nojit, dense_scores, boxes), 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

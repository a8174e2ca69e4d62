"""Microbenchmark the internals of batched_class_aware_nms on TPU.

Times, at the bench shape (batch 8, 512 px -> 49104 anchors, 6 classes,
256 candidates/class): the per-class top_k alone, candidate gather + IoU,
the stage-1 fixpoint, stage 2, and the full NMS — dense vs sparse scores.
"""
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
    from masklab_tpu.ops.nms import batched_class_aware_nms, nms_keep_mask
    from masklab_tpu.ops.boxes import cxcywh_to_yxyx

    b, n, c, kc = 8, 49104, 6, 256
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(
        np.stack([rng.rand(b, n) * 512, rng.rand(b, n) * 512,
                  rng.rand(b, n) * 120 + 8, rng.rand(b, n) * 120 + 8],
                 axis=-1), jnp.float32)
    dense_scores = jnp.asarray(rng.rand(b, n, c) * 0.5 + 0.5, jnp.float32)
    sparse_scores = jnp.asarray(rng.rand(b, n, c) * 0.01, jnp.float32)

    rows = {}

    topk = jax.jit(lambda s: jax.vmap(jax.vmap(
        lambda sc: jax.lax.top_k(sc, kc)))(
            jnp.transpose(s, (0, 2, 1))))
    rows['topk_per_class_ms'] = round(timeit(topk, dense_scores), 2)

    def stage1(s, bx):
        byx = cxcywh_to_yxyx(bx)

        def per_class(scores_c, byx):
            valid = scores_c >= 0.5
            masked = jnp.where(valid, scores_c, -1.0)
            ts, ti = jax.lax.top_k(masked, kc)
            tb = byx[ti]
            kept = nms_keep_mask(tb, ts >= 0.5, 0.4, 100)
            return ti, jnp.where(kept, ts, -1.0)

        return jax.vmap(lambda sc, bb: jax.vmap(
            lambda s1: per_class(s1, bb))(sc.T))(s, byx)

    stage1 = jax.jit(stage1)
    rows['stage1_dense_ms'] = round(timeit(stage1, dense_scores, boxes), 2)
    rows['stage1_sparse_ms'] = round(timeit(stage1, sparse_scores, boxes), 2)

    full = jax.jit(lambda s, bx: batched_class_aware_nms(
        s, bx, min_confidence=0.5, nms_iou_threshold=0.4,
        post_iou_threshold=0.65, max_outputs=100, candidates_per_class=kc))
    rows['full_dense_ms'] = round(timeit(full, dense_scores, boxes), 2)
    rows['full_sparse_ms'] = round(timeit(full, sparse_scores, boxes), 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

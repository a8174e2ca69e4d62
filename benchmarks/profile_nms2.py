"""Bisect stage 2 of class_aware_nms: which part costs the 3 ms?"""
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
    from masklab_tpu.ops.boxes import cxcywh_to_yxyx, iou_yxyx
    from masklab_tpu.ops.nms import nms_keep_mask

    b, n, c, kc = 8, 49104, 6, 256
    k2 = 600
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(
        np.stack([rng.rand(b, n) * 512, rng.rand(b, n) * 512,
                  rng.rand(b, n) * 120 + 8, rng.rand(b, n) * 120 + 8],
                 axis=-1), jnp.float32)
    dense_scores = jnp.asarray(rng.rand(b, n, c) * 0.5 + 0.5, jnp.float32)
    rows = {}

    def stage1(s, bx):
        byx = cxcywh_to_yxyx(bx)

        def per_class(scores_c, byx):
            valid = scores_c >= 0.5
            masked = jnp.where(valid, scores_c, -1.0)
            ts, ti = jax.lax.top_k(masked, kc)
            tb = byx[ti]
            kept = nms_keep_mask(tb, ts >= 0.5, 0.4, 100)
            return ti, jnp.where(kept, ts, -1.0)

        ci, cs = jax.vmap(lambda sc, bb: jax.vmap(
            lambda s1: per_class(s1, bb))(sc.T))(s, byx)
        return ci, cs, byx

    # stage2 variants, single image then vmapped
    def make_full(fix):
        def s2(ci, cs, byx):
            cls_ids = jnp.broadcast_to(jnp.arange(c)[:, None], ci.shape)
            fs, fi, fc = cs.reshape(-1), ci.reshape(-1), cls_ids.reshape(-1)
            s2s, order = jax.lax.top_k(fs, k2)
            s2a = fi[order]
            s2b = byx[s2a]
            s2v = s2s >= 0.5
            if fix == 'skip':
                kept2 = s2v
            elif fix == 'iou_only':
                iou = iou_yxyx(s2b, s2b)
                kept2 = s2v & (jnp.sum(iou, -1) > -1)
            else:
                kept2 = nms_keep_mask(s2b, s2v, 0.65, 100)
            fsc = jnp.where(kept2, s2s, -jnp.inf)
            os_, osel = jax.lax.top_k(fsc, 100)
            return osel, os_

        def full(s, bx):
            ci, cs, byx = stage1(s, bx)
            return jax.vmap(s2)(ci, cs, byx)
        return jax.jit(full)

    for name in ['skip', 'iou_only', 'fixpoint']:
        rows[f's2_{name}_ms'] = round(
            timeit(make_full(name), dense_scores, boxes), 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

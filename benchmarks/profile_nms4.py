"""Bisect the REAL class_aware_nms by progressively stubbing pieces."""
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
    from masklab_tpu.ops.boxes import cxcywh_to_yxyx
    from masklab_tpu.ops.nms import nms_keep_mask

    b, n, c, kc = 8, 49104, 6, 256
    mc, mo = 0.5, 100
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(
        np.stack([rng.rand(b, n) * 512, rng.rand(b, n) * 512,
                  rng.rand(b, n) * 120 + 8, rng.rand(b, n) * 120 + 8],
                 axis=-1), jnp.float32)
    dense_scores = jnp.asarray(rng.rand(b, n, c) * 0.5 + 0.5, jnp.float32)
    NEG = jnp.float32(-1.0)

    def build(variant):
        def single(cls_pred, bx):
            boxes_ = bx.astype(jnp.float32)
            cls_pred = cls_pred.astype(jnp.float32)
            byx = cxcywh_to_yxyx(boxes_)

            def per_class(scores_c):
                valid = scores_c >= mc
                masked = jnp.where(valid, scores_c, -1.0)
                ts, ti = jax.lax.top_k(masked, kc)
                tb = byx[ti]
                tv = ts >= mc
                if variant >= 4:
                    kept = tv
                else:
                    kept = nms_keep_mask(tb, tv, 0.4, mo)
                return ti, jnp.where(kept, ts, -1.0)

            ci, cs = jax.vmap(per_class)(cls_pred.T)
            cls_ids = jnp.broadcast_to(jnp.arange(c)[:, None], ci.shape)
            fs, fi, fc = cs.reshape(-1), ci.reshape(-1), cls_ids.reshape(-1)
            k2 = min(fs.shape[0], c * mo)
            s2s, order = jax.lax.top_k(fs, k2)
            s2a = fi[order]
            s2c = fc[order]
            s2b = byx[s2a]
            s2v = s2s >= mc
            if variant >= 3:
                kept2 = s2v
            else:
                kept2 = nms_keep_mask(s2b, s2v, 0.65, mo)
            fsc = jnp.where(kept2, s2s, -jnp.inf)
            os_, osel = jax.lax.top_k(fsc, mo)
            if variant >= 2:
                return os_, osel
            ov = jnp.isfinite(os_)
            ob = boxes_[s2a[osel]]
            oc = s2c[osel].astype(jnp.float32)
            pad = lambda v: jnp.where(ov, v, NEG)
            res = jnp.stack([pad(ob[:, 0]), pad(ob[:, 1]), pad(ob[:, 2]),
                             pad(ob[:, 3]), pad(oc),
                             pad(jnp.where(ov, os_, NEG))], axis=-1)
            return jax.lax.stop_gradient(res)

        return jax.jit(lambda s, bx: jax.vmap(single)(s, bx))

    rows = {}
    for v, name in [(1, 'full_copy'), (2, 'no_final_gather'),
                    (3, 'no_stage2_nms'), (4, 'no_stage1_nms')]:
        rows[name] = round(timeit(build(v), dense_scores, boxes), 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

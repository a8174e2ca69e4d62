"""A/B the production serving graph @1080p: unfused mask paste (round 1)
vs fused paste_stats_and_union (round 2).

Times the on-device {visualize, summarize} pipeline tail after the model:
upsample -> paste -> overlays + analytics, which at 1080p/K=100 is where
the HBM traffic is.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
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
    from masklab_tpu.config import ModelConfiguration
    from masklab_tpu.serving.postprocess import crop_and_pad_masks
    from masklab_tpu.serving.summary import fused_summary_union, summary_output
    from masklab_tpu.serving.visualize import (draw_boxes, draw_instance,
                                               draw_segmentation)

    cfg = ModelConfiguration()
    post = cfg.postprocess
    B, K, MH, MW = 1, 100, 28, 28
    H, W = 1080, 1920
    C = len(post.instance_colors)
    rng = np.random.RandomState(0)
    det = np.stack([rng.rand(B, K) * W, rng.rand(B, K) * H,
                    rng.rand(B, K) * 300 + 20, rng.rand(B, K) * 300 + 20,
                    rng.randint(0, C, (B, K)).astype(np.float64),
                    rng.rand(B, K) * 100], -1)
    det = jnp.asarray(np.round(det), jnp.float32)
    masks = jnp.asarray(rng.rand(B, K, MH, MW) > 0.5, jnp.int32)
    seg = np.zeros((B, H, W, 3), np.int32)
    for y in range(H // 3, H):
        x0 = int(W * 0.5 - (y / H) * W * 0.4)
        x1 = int(W * 0.5 + (y / H) * W * 0.4)
        seg[:, y, x0:x1, 1] = 1
    seg[:, 100:150, 500:700, 2] = 1
    seg = jnp.asarray(seg)
    images = jnp.asarray(rng.rand(B, H, W, 3) * 255, jnp.float32)

    def unfused(images, det, masks, seg):
        padded = crop_and_pad_masks(det, masks, (H, W))
        vis = draw_boxes(images, det)
        vis = draw_instance(vis, det, padded, post.instance_colors,
                            post.instance_alpha)
        vis = draw_segmentation(vis, seg, post.semantic_colors,
                                post.semantic_alpha)
        return vis, summary_output(det, seg, padded, post.default_road_size)

    def fused(images, det, masks, seg):
        summary, union = fused_summary_union(det, seg, masks, (H, W), C,
                                             post.default_road_size)
        vis = draw_boxes(images, det)
        vis = draw_segmentation(vis, union, post.instance_colors,
                                post.instance_alpha)
        vis = draw_segmentation(vis, seg, post.semantic_colors,
                                post.semantic_alpha)
        return vis, summary

    # wall clocks lie on this platform (async completion); use traces
    import collections
    import glob
    import gzip

    def device_ms(fn, tag):
        jit_fn = jax.jit(fn)
        jax.block_until_ready(jit_fn(images, det, masks, seg))
        tdir = f'/tmp/serving_trace_{tag}'
        os.system(f'rm -rf {tdir}')
        jax.profiler.start_trace(tdir)
        for _ in range(5):
            out = jit_fn(images, det, masks, seg)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        f = sorted(glob.glob(f'{tdir}/**/*.trace.json.gz',
                             recursive=True))[-1]
        with gzip.open(f) as fh:
            d = json.load(fh)
        tot = collections.Counter()
        for e in d.get('traceEvents', []):
            if e.get('ph') == 'X' and e['name'].startswith('jit_'):
                tot[e['name']] += e.get('dur', 0)
        return max(tot.values()) / 5 / 1000.0 if tot else float('nan')

    rows = {}
    rows['unfused_ms'] = round(device_ms(unfused, 'unfused'), 2)
    rows['fused_ms'] = round(device_ms(fused, 'fused'), 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

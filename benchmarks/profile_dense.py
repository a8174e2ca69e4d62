"""Stage-level profile of the dense-regime joint inference graph.

Times (TPU, bf16, forced-dense weights):
  * raw_heads          — backbone + FPN + cls/loc heads + ASPP/decoder
  * raw_heads + NMS    — adds box decode + class-aware NMS
  * full               — adds the mask branch (compaction path)
plus XLA FLOP counts per stage, to locate where the dense-regime time and
the 814 GFLOP/batch go.
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
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def flops_of(fn, *args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get('flops', 0.0))
    except Exception:
        return None


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.ops.boxes import decode_boxes
    from masklab_tpu.ops.nms import batched_class_aware_nms

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = os.environ.get('BENCH_BACKBONE', 'mobilenet')
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)

    batch = int(os.environ.get('BENCH_BATCH', '8'))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3) * 255, jnp.float32)

    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])

    def bump(path, leaf):
        keys = jax.tree_util.keystr(path)
        if 'cls_subnet' in keys and 'output_' in keys and 'bias' in keys:
            return leaf * 0.0 + 2.0
        return leaf
    dense = {**variables, 'params': jax.tree_util.tree_map_with_path(
        bump, variables['params'])}

    heads = jax.jit(lambda v, x: model.apply(v, x, method='raw_heads'))

    det = cfg.detection

    def heads_nms(v, x):
        out = model.apply(v, x, method='raw_heads')
        restored = decode_boxes(out['loc_pred'], out['priors'])
        proposals = batched_class_aware_nms(
            out['cls_pred'], restored,
            min_confidence=det.min_confidence,
            nms_iou_threshold=det.nms_iou_threshold,
            post_iou_threshold=det.post_iou_threshold,
            max_outputs=det.nms_max_output_size,
            candidates_per_class=cfg.compute.nms_candidates_per_class)
        return out['seg_pred'], proposals

    heads_nms = jax.jit(heads_nms)
    full = jax.jit(lambda v, x: model.apply(v, x))

    rows = {}
    for name, fn in [('raw_heads', heads), ('heads_nms', heads_nms),
                     ('full', full)]:
        ms = timeit(fn, dense, images)
        fl = flops_of(fn, dense, images)
        rows[name] = {'ms': round(ms, 2),
                      'gflops': round(fl / 1e9, 1) if fl else None}
    rows['nms_only_ms'] = round(rows['heads_nms']['ms']
                                - rows['raw_heads']['ms'], 2)
    rows['mask_branch_ms'] = round(rows['full']['ms']
                                   - rows['heads_nms']['ms'], 2)
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

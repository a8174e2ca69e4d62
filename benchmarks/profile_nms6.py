"""Time NMS variants on REAL in-model tensors (forced-dense regime).

Captures cls_pred + decoded boxes from the bench model, then times:
  * real batched_class_aware_nms (XLA fixpoint)
  * fixpoints replaced by the Pallas VMEM kernel
  * no-fixpoint skeleton (static plumbing floor)
Run with an idle host — the 1-core host inflates timings under load.
"""
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
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.ops.boxes import cxcywh_to_yxyx, decode_boxes
    from masklab_tpu.ops import nms as nms_mod
    from masklab_tpu.ops.nms import batched_class_aware_nms, nms_keep_mask
    from masklab_tpu.ops.pallas.nms_kernel import nms_keep_mask_pallas

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)
    batch, size = 8, 512
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
    out = heads(dense, images)
    cls_pred = jax.device_get(out['cls_pred'])
    restored = jax.device_get(decode_boxes(out['loc_pred'], out['priors']))
    cls_pred = jnp.asarray(cls_pred)
    restored = jnp.asarray(restored)
    det = cfg.detection
    kw = dict(min_confidence=det.min_confidence,
              nms_iou_threshold=det.nms_iou_threshold,
              post_iou_threshold=det.post_iou_threshold,
              max_outputs=det.nms_max_output_size,
              candidates_per_class=cfg.compute.nms_candidates_per_class)

    rows = {'n_anchors': int(cls_pred.shape[1]),
            'frac_conf': float((cls_pred >= det.min_confidence).mean())}

    real = jax.jit(lambda s, b: batched_class_aware_nms(s, b, **kw))
    rows['real_xla_ms'] = round(timeit(real, cls_pred, restored), 2)

    # swap fixpoint for the pallas kernel
    orig = nms_mod.nms_keep_mask
    try:
        nms_mod.nms_keep_mask = (
            lambda bx, v, t, mo: nms_keep_mask_pallas(bx, v, t, mo))
        pal = jax.jit(lambda s, b: nms_mod.batched_class_aware_nms(
            s, b, **kw))
        rows['pallas_ms'] = round(timeit(pal, cls_pred, restored), 2)
    finally:
        nms_mod.nms_keep_mask = orig

    # plumbing floor: no suppression at all
    try:
        nms_mod.nms_keep_mask = lambda bx, v, t, mo: v
        floor = jax.jit(lambda s, b: nms_mod.batched_class_aware_nms(
            s, b, **kw))
        rows['floor_ms'] = round(timeit(floor, cls_pred, restored), 2)
    finally:
        nms_mod.nms_keep_mask = orig
    print(json.dumps(rows))


if __name__ == '__main__':
    main()

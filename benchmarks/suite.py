"""Full benchmark suite: the five BASELINE.json configs.

  1. MobileNet backbone forward (single image)
  2. DeepLab V3+ semantic-only path (ASPP + decoder + upsample)
  3. RetinaMask detection path (priors + decode + class-aware NMS)
  4. Full MaskLab joint inference (batched, mobilenet)
  5. MaskLab training step (ResNeXt50 + GroupNorm heads, all losses, RAdam)

Prints one JSON line per config. Run on the TPU chip:
    python benchmarks/suite.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def timed(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.nn.backbone import BackboneNetwork
    from masklab_tpu.ops.boxes import decode_boxes
    from masklab_tpu.ops.nms import batched_class_aware_nms
    from masklab_tpu.prior import generate_priors, priors_from_config
    from masklab_tpu.data.synthetic import make_random_batch
    from masklab_tpu.train import (TrainState, cyclic_lr, make_train_step,
                                   rectified_adam)

    size = int(os.environ.get('BENCH_SIZE', '512'))
    rng = np.random.RandomState(0)
    results = []

    # --- 1. mobilenet backbone forward, single image ---
    bb = BackboneNetwork(backbone_type='mobilenet', num_features=128,
                         dtype=jnp.bfloat16)
    x1 = jnp.asarray(rng.rand(1, size, size, 3) * 255, jnp.float32)
    bvars = jax.jit(bb.init)(jax.random.PRNGKey(0), x1)
    t = timed(jax.jit(lambda v, x: bb.apply(v, x)), bvars, x1)
    results.append({'metric': 'mobilenet_backbone_fwd_ms', 'value':
                    round(t * 1000, 3), 'unit': 'ms/image'})

    # --- 2 & 3 & 4. shared joint model ---
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 128, 128, 3)))
    xb = jnp.asarray(rng.rand(4, size, size, 3) * 255, jnp.float32)

    heads = jax.jit(lambda v, x: model.apply(v, x, method='raw_heads'))
    out = heads(variables, x1)
    seg_path = jax.jit(
        lambda v, x: model.apply(v, x, method='raw_heads')['seg_pred'])
    t = timed(seg_path, variables, x1)
    results.append({'metric': 'deeplabv3plus_semantic_path_ms',
                    'value': round(t * 1000, 3), 'unit': 'ms/image'})

    det = cfg.detection
    nms = jax.jit(lambda c, b: batched_class_aware_nms(
        c, b, min_confidence=det.min_confidence,
        nms_iou_threshold=det.nms_iou_threshold,
        post_iou_threshold=det.post_iou_threshold,
        max_outputs=det.nms_max_output_size,
        candidates_per_class=cfg.compute.nms_candidates_per_class))
    restored = decode_boxes(out['loc_pred'], out['priors'])
    t = timed(nms, out['cls_pred'], restored)
    results.append({'metric': 'retinamask_detection_nms_ms',
                    'value': round(t * 1000, 3), 'unit': 'ms/image'})

    full = jax.jit(lambda v, x: model.apply(v, x))
    t = timed(full, variables, xb)
    fps = 4 / t
    results.append({'metric': 'masklab_joint_inference_fps',
                    'value': round(fps, 2), 'unit': 'images/sec/chip',
                    'vs_baseline': round(fps / 30.0, 2)})

    # --- 5. training step: resnext50 + GN heads, all losses, RAdam ---
    tcfg = ModelConfiguration()
    tcfg.backbone.backbone_type = 'resnext50'
    tcfg.compute.compute_dtype = 'bfloat16'
    tmodel = build_masklab(tcfg)
    batch = {k: jnp.asarray(v) for k, v in
             make_random_batch(4, (256, 256), 8).items()}
    tvars = jax.jit(tmodel.init)(jax.random.PRNGKey(0),
                                 batch['images'][:1])
    tx = rectified_adam(cyclic_lr(1e-4, 1e-3, 700))
    state = TrainState.create(tvars, tx)
    step = make_train_step(tmodel, with_metrics=False)
    state, _ = step(state, batch)  # compile
    jax.block_until_ready(state.params)
    start = time.perf_counter()
    for _ in range(5):
        state, m = step(state, batch)
    jax.block_until_ready(m['loss'])
    t = (time.perf_counter() - start) / 5
    results.append({'metric': 'masklab_train_step_resnext50_ms',
                    'value': round(t * 1000, 2),
                    'unit': 'ms/step (batch 4 @256px)'})

    for r in results:
        print(json.dumps(r))


if __name__ == '__main__':
    main()

"""Diagnose the mask-branch level distribution in the dense bench regime.

Prints per-image per-level box counts of the NMS output at the headline
bench shape (forced-dense, b16 @512), plus the capacity bucket each level
would pick under (a) the current per-image scheme (B x per-image max) and
(b) a global cross-image scheme (total count) — sizing the win of global
compaction before building it.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.models.instance import mask_distribute
    from masklab_tpu.ops.boxes import decode_boxes
    from masklab_tpu.ops.nms import batched_class_aware_nms

    if os.environ.get('BENCH_PRESET') == 'road':
        from masklab_tpu.presets import road_project_config
        cfg = road_project_config()
        cfg.compute.mesh_data = 1
        default_batch = '8'
    else:
        cfg = ModelConfiguration()
        cfg.backbone.backbone_type = os.environ.get('BENCH_BACKBONE',
                                                    'mobilenetv2')
        default_batch = '16'
    cfg.compute.compute_dtype = 'bfloat16'
    batch = int(os.environ.get('BENCH_BATCH', default_batch))
    size = int(os.environ.get('BENCH_SIZE', '512'))
    model = build_masklab(cfg)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3) * 255, jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), images[:1])
    dense_variables = bench._force_dense(variables)

    det = cfg.detection

    @jax.jit
    def levels_of(v, x):
        out = model.apply(v, x, method='raw_heads')
        restored = decode_boxes(out['loc_pred'], out['priors'])
        proposals = batched_class_aware_nms(
            out['cls_pred'], restored,
            min_confidence=det.min_confidence,
            nms_iou_threshold=det.nms_iou_threshold,
            post_iou_threshold=det.post_iou_threshold,
            max_outputs=det.nms_max_output_size,
            candidates_per_class=cfg.compute.nms_candidates_per_class)
        return mask_distribute(proposals, cfg.instance.max_k,
                               cfg.instance.base_size)

    levels = np.asarray(levels_of(dense_variables, images))
    k = levels.shape[1]
    print(f'K={k} batch={batch}')
    import math
    caps = sorted({max(1, int(math.ceil(k * f)))
                   for f in cfg.compute.mask_capacity_fractions} | {k})
    print('caps(per-image):', caps)
    for lvl in range(cfg.instance.max_k + 1):
        counts = (levels == lvl).sum(axis=1)
        total = int(counts.sum())
        mx = int(counts.max())
        bucket = next(c for c in caps if c >= mx)
        # global scheme: capacities as fractions of B*K
        gcaps = sorted({max(1, int(math.ceil(batch * k * f)))
                        for f in cfg.compute.mask_capacity_fractions}
                       | {batch * k})
        gbucket = next(c for c in gcaps if c >= total)
        print(f'level {lvl}: total={total} mean={counts.mean():.1f} '
              f'max={mx} -> per-image pads {batch * bucket} crops, '
              f'global pads {gbucket} crops '
              f'(save {100 * (1 - gbucket / (batch * bucket)):.0f}%)')
    invalid = (levels == -1).sum()
    print('invalid slots:', int(invalid))


if __name__ == '__main__':
    main()

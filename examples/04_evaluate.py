"""Walkthrough 4 — evaluation (reference scripts/"4. Evaluating Network"
and road_project/train.py:101-212).

Runs the mask-mIoU / semantic-mIoU harness over the synthetic validation
set with the best (or random) checkpoint.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(data_dir='/tmp/masklab_demo', save_dir=None):
    import jax
    import jax.numpy as jnp
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.data import (MaskLabDataset, make_synthetic_dataset,
                                  process_dataset)
    from masklab_tpu.eval import evaluate_dataset
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import MaskLabPredictor

    if not os.path.isdir(os.path.join(data_dir, 'images')):
        make_synthetic_dataset(data_dir, num_images=8)
        process_dataset(data_dir, num_workers=1)

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.num_features = 32
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 32
        g.num_depth = 1
    cfg.semantic.num_aspp_features = 32
    cfg.detection.nms_max_output_size = 16
    cfg.compute.nms_candidates_per_class = 32
    cfg.postprocess.resolution = (256, 320)
    cfg.dataset.data_dir = data_dir
    cfg.dataset.min_area = 100.0

    if save_dir and os.path.isdir(save_dir):
        from masklab_tpu.train.checkpoints import CheckpointManager
        ckpt = CheckpointManager(save_dir)
        saved_cfg = ckpt.load_config()
        if saved_cfg is not None:
            saved_cfg.dataset = cfg.dataset
            saved_cfg.postprocess.resolution = cfg.postprocess.resolution
            cfg = saved_cfg
        model = build_masklab(cfg)
        variables = ckpt.restore_variables()
    else:
        model = build_masklab(cfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    predictor = MaskLabPredictor(model, variables, cfg)

    validset = MaskLabDataset(data_dir=data_dir, min_area=100.0)
    metrics = evaluate_dataset(predictor, validset,
                               cfg.dataset.instance_labels,
                               cfg.dataset.semantic_labels, max_images=4)
    for k, v in sorted(metrics.items()):
        print(f'{k}: {v:.4f}')


if __name__ == '__main__':
    main(*sys.argv[1:])

"""On-hardware acceptance run: overfit the synthetic set, then verify the
full pipeline end-to-end.

Trains 600 steps (single scale bucket, CyclicLR 1e-4 -> 1e-3) on the
8-image synthetic road set and evaluates at the training-matched inference
resolution. Expected (reproduced on v5e, round 1): mask mIoU ~0.94,
semantic mIoU ~0.84. Exits nonzero if mask mIoU < 0.8 or semantic mIoU
< 0.6 — a strong end-to-end regression gate for the detection + instance +
semantic paths, NMS, mask paste, and the eval harness.

Runtime: ~10 min on a v5e chip (dominated by first-epoch compiles).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main(data_dir='/tmp/masklab_demo', save_dir='/tmp/masklab_acceptance'):
    from masklab_tpu.data import (MaskLabDataset, make_synthetic_dataset,
                                  process_dataset)
    from masklab_tpu.eval import evaluate_dataset
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import MaskLabPredictor
    from masklab_tpu.train.trainer import train_masklab_model

    if not os.path.isdir(os.path.join(data_dir, 'images')):
        make_synthetic_dataset(data_dir, num_images=8)
        process_dataset(data_dir, num_workers=1)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'ex03', os.path.join(os.path.dirname(__file__), '03_train.py'))
    ex03 = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ex03)

    cfg = ex03.small_road_config(data_dir, save_dir)
    cfg.train.train_head_tune = False
    cfg.train.train_waist_tune = False
    cfg.train.train_all_epoch = 12
    cfg.train.all_base_lr = 1e-4
    cfg.train.all_max_lr = 1e-3
    cfg.train.all_step_size = 300
    cfg.compute.scale_buckets = (0.5,)
    cfg.train.scale_ratio = (0.5, 0.5)
    trainer = train_masklab_model(cfg, max_gt_boxes=8, steps_per_epoch=50)

    # evaluate at the training-matched resolution (0.5 of 256x320)
    eval_cfg = trainer.ckpt.load_config()
    eval_cfg.dataset.data_dir = data_dir
    eval_cfg.postprocess.resolution = (128, 160)
    model = build_masklab(eval_cfg)
    predictor = MaskLabPredictor(model, trainer.ckpt.restore_variables(),
                                 eval_cfg)
    ds = MaskLabDataset(data_dir=data_dir, min_area=200.0)
    metrics = evaluate_dataset(predictor, ds,
                               eval_cfg.dataset.instance_labels,
                               eval_cfg.dataset.semantic_labels)
    for k, v in sorted(metrics.items()):
        print(f'{k}: {v:.4f}')
    assert metrics['mask_miou'] > 0.8, metrics
    assert metrics['semantic_miou'] > 0.6, metrics
    print('ACCEPTANCE OK')


if __name__ == '__main__':
    main(*sys.argv[1:])

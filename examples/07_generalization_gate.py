"""On-hardware acceptance run #2: train/held-out GENERALIZATION gate.

examples/06 overfits the whole synthetic set and evaluates in-sample — a
strong pipeline regression check, but one a subtly-wrong assign/loss
change can still power through (VERDICT r4 weak #6). This gate trains on
the ETL's seed-777 90% train split of a 30-image synthetic set and
evaluates the 3 HELD-OUT images with the full mIoU protocol
(road_project/train.py:101-212), asserting floors below which a semantic
break (not noise) is the only explanation.

The synthetic distribution is narrow (same shape family, same palette), so
a correctly-learning model transfers well; floors are set from the r5
on-hardware calibration run recorded in docs/ROUND5.md, with ~2x headroom.

Runtime: ~10 min on a v5e chip (dominated by first-epoch compiles).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

MASK_MIOU_FLOOR = 0.5
SEMANTIC_MIOU_FLOOR = 0.5


def main(data_dir='/tmp/masklab_gen30', save_dir='/tmp/masklab_gen_gate'):
    from masklab_tpu.data import (MaskLabDataset, make_synthetic_dataset,
                                  process_dataset)
    from masklab_tpu.data.process import load_split_cases
    from masklab_tpu.eval import evaluate_dataset
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import MaskLabPredictor
    from masklab_tpu.train.trainer import train_masklab_model

    if not os.path.isdir(os.path.join(data_dir, 'images')):
        make_synthetic_dataset(data_dir, num_images=30)
        process_dataset(data_dir, num_workers=1)

    train_cases, valid_cases = load_split_cases(data_dir)
    assert train_cases and valid_cases, 'ETL produced no held-out split'
    assert not set(train_cases) & set(valid_cases)

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
    # construct_masklab_datasets picks the split CSVs up on its own; the
    # assert above just keeps this example honest about what it trains on
    trainer = train_masklab_model(cfg, max_gt_boxes=8, steps_per_epoch=50)

    eval_cfg = trainer.ckpt.load_config()
    eval_cfg.dataset.data_dir = data_dir
    eval_cfg.postprocess.resolution = (128, 160)
    model = build_masklab(eval_cfg)
    predictor = MaskLabPredictor(model, trainer.ckpt.restore_variables(),
                                 eval_cfg)
    heldout = MaskLabDataset(valid_cases, data_dir=data_dir, min_area=200.0)
    assert len(heldout) == len(valid_cases)
    metrics = evaluate_dataset(predictor, heldout,
                               eval_cfg.dataset.instance_labels,
                               eval_cfg.dataset.semantic_labels)
    for k, v in sorted(metrics.items()):
        print(f'heldout {k}: {v:.4f}')
    assert metrics['mask_miou'] > MASK_MIOU_FLOOR, metrics
    assert metrics['semantic_miou'] > SEMANTIC_MIOU_FLOOR, metrics
    print('GENERALIZATION GATE OK '
          f'(held out {len(valid_cases)} of {len(valid_cases) + len(train_cases)} images)')


if __name__ == '__main__':
    main(*sys.argv[1:])

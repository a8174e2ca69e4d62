"""End-to-end: synthetic imglab data -> ETL -> 3-phase trainer ->
checkpoints -> predictor -> mIoU eval harness. The CPU analog of the
reference's full road_project/train.py run."""
import os

import numpy as np
import pytest

from masklab_tpu import ModelConfiguration
from masklab_tpu.data import make_synthetic_dataset, process_dataset


@pytest.fixture(scope='module')
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp('e2e'))
    make_synthetic_dataset(d, num_images=4, image_hw=(128, 160), seed=1)
    process_dataset(d, num_workers=1)
    return d


def e2e_config(data_dir, save_dir):
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.num_features = 16
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 16
        g.num_depth = 1
    cfg.instance.crop_size = (7, 7)
    cfg.semantic.num_aspp_features = 16
    cfg.detection.nms_max_output_size = 4
    cfg.loss.nms_max_output_size = 4
    cfg.compute.nms_candidates_per_class = 8
    cfg.compute.scale_buckets = (0.5,)
    cfg.train.scale_ratio = (0.5, 0.5)
    cfg.train.batch_size = 2
    cfg.train.train_head_tune_epoch = 1
    cfg.train.train_waist_tune_epoch = 0
    cfg.train.train_waist_tune = False
    cfg.train.train_all_epoch = 1
    cfg.dataset.data_dir = data_dir
    cfg.dataset.min_area = 50.0
    cfg.train.save_dir = save_dir
    cfg.postprocess.resolution = (128, 160)
    return cfg


def test_full_training_run(data_dir, tmp_path):
    from masklab_tpu.train.trainer import train_masklab_model

    cfg = e2e_config(data_dir, str(tmp_path / 'logs'))
    trainer = train_masklab_model(cfg, max_gt_boxes=6, steps_per_epoch=1)
    assert 'head_loss' in trainer.history
    assert 'all_loss' in trainer.history
    assert all(np.isfinite(v) for vs in trainer.history.values()
               for v in vs)
    best = trainer.ckpt.best_checkpoint()
    assert best is not None

    # metrics.csv: per-epoch rows are step MEANS with a full-validation
    # val_loss column (engine/train.py:106-153 validates the whole valid
    # iterator each epoch)
    import csv
    with open(os.path.join(cfg.train.save_dir, 'metrics.csv')) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2  # head epoch + all epoch
    assert 'val_loss' in rows[0] and 'val_seg_loss' in rows[0]
    assert all(np.isfinite(float(r['val_loss'])) for r in rows)
    assert all(np.isfinite(float(r['train_loss'])) for r in rows)

    # reload into the predictor and run the eval harness
    import jax
    from masklab_tpu.data import MaskLabDataset
    from masklab_tpu.eval import evaluate_dataset
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import MaskLabPredictor

    model = build_masklab(cfg)
    variables = trainer.ckpt.restore_variables()
    predictor = MaskLabPredictor(model, variables, cfg)
    ds = MaskLabDataset(data_dir=data_dir, min_area=50.0)
    metrics = evaluate_dataset(predictor, ds, cfg.dataset.instance_labels,
                               cfg.dataset.semantic_labels, max_images=2)
    assert 'mask_miou' in metrics and 'semantic_miou' in metrics
    assert np.isfinite(metrics['semantic_miou'])

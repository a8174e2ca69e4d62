"""Config round-trip/CLI tests and prior-grid parity with the reference's
pandas table + runtime PriorLayer semantics (engine/prior.py:55-67,
engine/layers/detection.py:269-298)."""
import json

import numpy as np

from masklab_tpu import (ModelConfiguration, PriorBoxes, generate_priors,
                         priors_from_config)


def test_prior_table_matches_reference_formula():
    prior = PriorBoxes(strides=[8, 16], sizes=[32, 64],
                       pr_scales=[1, 2 ** (1 / 3)], pr_ratios=[0.5, 1, 2])
    assert len(prior) == 6
    rows = []
    for size, stride in ((32, 8), (64, 16)):
        for s in (1, 2 ** (1 / 3)):
            for r in (0.5, 1, 2):
                rows.append((stride, int(np.round(size * s * np.sqrt(r))),
                             int(np.round(size * s / np.sqrt(r)))))
    want = np.asarray(rows).reshape(2, 6, 3)
    np.testing.assert_array_equal(prior.table, want)


def test_prior_grid_same_vs_valid_rounding():
    prior = PriorBoxes(strides=[8], sizes=[32], pr_scales=[1], pr_ratios=[1])
    # 'same': ceil(36/8)*8=40 -> centers 4,12,20,28,36 (5)
    same = generate_priors(36, 36, prior, padding='same')
    assert same.shape == (25, 4)
    # 'valid': floor(36/8)*8=32 -> centers 4,12,20,28 (4)
    valid = generate_priors(36, 36, prior, padding='valid')
    assert valid.shape == (16, 4)
    # row-major (y, x, anchor) order; first center at stride//2
    np.testing.assert_allclose(same[0], [4, 4, 32, 32])
    np.testing.assert_allclose(same[1], [12, 4, 32, 32])


def test_prior_grid_count_matches_head_output():
    cfg = ModelConfiguration()
    prior = priors_from_config(cfg)
    pri = generate_priors(512, 512, prior)
    a = len(prior)
    total = 0
    for stride in (8, 16, 32, 64, 128):
        g = int(np.ceil(512 / stride))
        total += g * g * a
    assert pri.shape == (total, 4)


def test_config_json_roundtrip(tmp_path):
    cfg = ModelConfiguration()
    cfg.update('train', 'batch_size', 16)
    cfg.update('backbone', 'backbone_type', 'mobilenet')
    p = tmp_path / 'config.json'
    cfg.save_json(str(p))
    loaded = ModelConfiguration.load_json(str(p))
    assert loaded.train.batch_size == 16
    assert loaded.backbone.backbone_type == 'mobilenet'
    assert loaded.detection.pr_ratios == cfg.detection.pr_ratios
    assert json.loads(p.read_text())['loss']['cls_loss_weight'] == 300.0


def test_config_cli_overrides():
    cfg = ModelConfiguration()
    ns = cfg.get_arg_parser(args=[
        '-train.batch_size', '4',
        '-backbone.backbone_outputs', 'C3', 'C4', 'C5',
        '-detection.use_squeeze_excite', 'true',
    ])
    cfg.apply_namespace(ns)
    assert cfg.train.batch_size == 4
    assert cfg.backbone.backbone_outputs == ('C3', 'C4', 'C5')
    assert cfg.detection.use_squeeze_excite is True

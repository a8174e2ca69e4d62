"""Utility modules: host viz, profiling timers, loggers."""
import os

import numpy as np

from masklab_tpu.utils.loggers import CSVLogger, MultiLogger
from masklab_tpu.utils.profiling import StageTimer
from masklab_tpu.utils.visualize import color_map, draw_instances, draw_semantics


def test_color_map_deterministic():
    a = color_map(seed=40)
    b = color_map(seed=40)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (255, 3) and a.dtype == np.uint8


def test_draw_semantics_and_instances():
    img = np.zeros((32, 32, 3), np.uint8)
    segs = np.zeros((32, 32, 2), np.float32)
    segs[4:12, 4:12, 0] = 1.0
    out = draw_semantics(img, segs)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert out[8, 8].sum() > 0  # colored region

    boxes = np.asarray([[16, 16, 10, 10, 1, 0.9],
                        [-1, -1, -1, -1, -1, -1]], np.float32)
    masks = np.zeros((2, 32, 32), np.float32)
    masks[0, 12:20, 12:20] = 1.0
    out2 = draw_instances(img, boxes, masks, labels=('car', 'bump'))
    assert out2.shape == img.shape


def test_stage_timer_and_csv_logger(tmp_path):
    timer = StageTimer(log_fn=None)
    with timer.stage('a'):
        pass
    assert 'a' in timer.stages
    assert 'a' in timer.summary()

    path = str(tmp_path / 'm.csv')
    logger = MultiLogger(CSVLogger(path))
    logger.log(0, {'loss': 1.5})
    logger.log(1, {'loss': 1.25})
    logger.close()
    lines = open(path).read().strip().splitlines()
    assert lines[0] == 'step,loss'
    assert len(lines) == 3

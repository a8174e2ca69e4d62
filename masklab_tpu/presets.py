"""Configuration presets.

``road_project_config`` reproduces the reference's experiment driver
settings (road_project/train.py:21-63): seresnet34 backbone with C3..P6
outputs, squeeze-excite heads, road-object anchor ratios, min_area 200,
and 2-way data parallelism (gpu_count=2 -> mesh data axis).
"""
from __future__ import annotations

from .config import ModelConfiguration


def road_project_config(data_dir: str = None,
                        save_dir: str = None) -> ModelConfiguration:
    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'seresnet34'
    cfg.backbone.backbone_outputs = ('C3', 'C4', 'C5', 'P6')
    cfg.detection.feature_pyramid_inputs = ('C3', 'C4', 'C5')
    cfg.detection.use_squeeze_excite = True
    cfg.detection.pr_ratios = (1 / 2, 1, 2, 5, 8)
    cfg.instance.use_squeeze_excite = True
    cfg.semantic.use_squeeze_excite = True
    cfg.dataset.min_area = 200.0
    cfg.train.gpu_count = 2
    cfg.compute.mesh_data = 2
    # Trimmed stage-1 NMS pool for the 5-ratio anchor layout: the static
    # per-class candidate pool (a documented deviation from the
    # reference's all-anchors-above-threshold NMS) is lossless whenever
    # fewer than `k` anchors per class clear min_confidence; road scenes
    # rarely exceed ~50 at DETECTION thresholds (docs/PERFORMANCE.md), so
    # 128 keeps that margin while quartering the stage-1 keep-fixpoint
    # matvecs. Identical outputs vs the default 256 in realistic regimes
    # are pinned by tests/test_ops_parity.py::
    # test_pool_trim_lossless_in_realistic_regime. The TRAINER's
    # loss-config NMS (floor ~0.05, where mid-training distributions can
    # clear the floor on >128 anchors/class) keeps the full default pool
    # via nms_candidates_per_class_train.
    cfg.compute.nms_candidates_per_class = 128
    cfg.compute.nms_candidates_per_class_train = 256
    if data_dir is not None:
        cfg.dataset.data_dir = data_dir
    if save_dir is not None:
        cfg.train.save_dir = save_dir
    return cfg

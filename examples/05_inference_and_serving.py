"""Walkthrough 5+6 — inference graph + serving round-trip
(reference scripts/"5. Inference" and "Serving Example").

Loads the best checkpoint (or random weights), runs the end-to-end jitted
predictor with per-stage latency prints, starts the HTTP server, and does
a client round-trip on a synthetic test image — the equivalent of the
reference's test/test_input.jpg smoke check (serving.py:97-106).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main(save_dir=None, port=8601):
    import jax
    import jax.numpy as jnp
    import cv2
    from masklab_tpu import ModelConfiguration
    from masklab_tpu.data.synthetic import make_synthetic_dataset
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import (MaskLabPredictor, MaskLabServer,
                                     send_image_to_server)
    from masklab_tpu.utils import StageTimer

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.backbone.num_features = 32
    for g in (cfg.detection, cfg.instance, cfg.semantic):
        g.num_features = 32
        g.num_depth = 1
    cfg.semantic.num_aspp_features = 32
    cfg.detection.nms_max_output_size = 16
    cfg.compute.nms_candidates_per_class = 32
    cfg.postprocess.resolution = (256, 448)

    timer = StageTimer()
    model = build_masklab(cfg)
    with timer.stage('init'):
        if save_dir and os.path.isdir(save_dir):
            from masklab_tpu.train.checkpoints import CheckpointManager
            variables = CheckpointManager(save_dir).restore_variables()
        else:
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    predictor = MaskLabPredictor(model, variables, cfg, visualization=True)

    # synthetic smoke image (stands in for test/test_input.jpg)
    tmp = '/tmp/masklab_demo_serving'
    make_synthetic_dataset(tmp, num_images=1, image_hw=(256, 448))
    test_image = os.path.join(tmp, 'images', 'frame_0000.jpg')

    with timer.stage('compile+first-predict'):
        with open(test_image, 'rb') as f:
            out = predictor.predict_bytes(f.read())
    with timer.stage('steady-state-predict'):
        with open(test_image, 'rb') as f:
            out = predictor.predict_bytes(f.read())
    print('outputs:', {k: v.shape for k, v in out.items()})

    server = MaskLabServer(predictor, port=port,
                           instance_labels=cfg.dataset.instance_labels)
    server.start(background=True)
    time.sleep(0.5)
    with timer.stage('http-round-trip'):
        resp = send_image_to_server(test_image, port=port)
    print('server objs:', resp.get('objs'))
    print('latency_ms:', resp.get('latency_ms'))
    server.stop()
    print(timer.summary())


if __name__ == '__main__':
    main(*sys.argv[1:])

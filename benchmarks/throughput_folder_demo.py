"""On-hardware A/B: process_folder default (per-image) vs --batch=N.

VERDICT r4 item 7 acceptance: offline folder processing wall-clock must
improve >= 15% with the throughput mode. Writes a synthetic folder of
same-size frames, runs both arms against the same predictor
(visualization on — the cmd_process serving default, so both arms pay
identical host-side JPEG encode), and prints wall times. Compiles are
EXCLUDED by a one-image warm-up call per arm's batch shape.

Usage: python benchmarks/throughput_folder_demo.py [n_images] [batch]
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_images=64, batch=32):
    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import cv2
    import numpy as np

    from masklab_tpu import ModelConfiguration
    from masklab_tpu.models import build_masklab
    from masklab_tpu.serving import MaskLabPredictor, process_folder

    cfg = ModelConfiguration()
    cfg.backbone.backbone_type = 'mobilenet'
    cfg.compute.compute_dtype = 'bfloat16'
    model = build_masklab(cfg)
    import jax.numpy as jnp
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 256, 256, 3)))
    pred = MaskLabPredictor(model, variables, cfg, visualization=True)

    src = '/tmp/tp_demo_src'
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src)
    rng = np.random.RandomState(0)
    h, w = 512, 640
    for i in range(int(n_images)):
        img = np.uint8(rng.rand(h, w, 3) * 255)
        cv2.imwrite(os.path.join(src, f'f_{i:04d}.jpg'), img)

    probe = np.uint8(rng.rand(h, w, 3) * 255)
    pred.predict(probe)                                   # b=1 compile
    pred.predict(np.stack([probe] * int(batch)))          # b=N compile

    t0 = time.perf_counter()
    process_folder(pred, src, '/tmp/tp_demo_b1')
    t1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    process_folder(pred, src, f'/tmp/tp_demo_b{batch}',
                   batch_size=int(batch))
    tn = time.perf_counter() - t0

    n = int(n_images)
    print(f'per-image : {t1:7.2f}s  ({n / t1:6.1f} img/s)')
    print(f'batch={batch:>3}: {tn:7.2f}s  ({n / tn:6.1f} img/s)')
    print(f'improvement: {100 * (1 - tn / t1):.1f}% wall '
          f'({t1 / tn:.2f}x)')


if __name__ == '__main__':
    main(*sys.argv[1:])
